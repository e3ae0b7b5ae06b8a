"""Validation strategies (capability parity with reference training.py T5):

  * validate            — argmax-similarity proposal        (training.py:605-687)
  * validate_threshold  — union of proposals IoP>tau        (training.py:690-870, default)
  * validate_iou_iop    — argmax similarity + IoP>tau extras (training.py:872-968)
  * validate_threshold_from_top_iou — top-5 similarity ∩ IoP>tau (training.py:970-1077)

Each consumes the device outputs (pred_similarity, pred_iou) plus host-side
origin segs, composes the predicted mask, and accumulates gIoU/cIoU exactly
like the reference: both masks nearest-resized to 1024^2, histogram
intersection/union over {bg, fg}, acc_iou[union==0] += 1 (no-object credit),
gIoU = mean per-image fg IoU, cIoU = Σinter/Σunion fg.

NAMING (canonical note): the head called `pred_iou` throughout — here, in
the model, and in the reference (LISA.py:387, lisa_iou_head) — is trained
to regress IoP (intersection over PREDICTION, iou_regression_loss on
gt_iops, LISA.py:449 + utils.py:207-232), not IoU.  Every `iou`/`pred_iou`
argument below and every "IoP>tau" selection therefore thresholds the IoP
regressor.  We keep the reference's name for checkpoint/API parity and
document the mismatch once, here.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional, Tuple

import numpy as np

from llmseg_tpu.utils.metrics import (AverageMeter, Summary,
                                      intersection_and_union)


def _nearest_resize_2d(m: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    H, W = hw
    h, w = m.shape
    rows = np.clip((np.arange(H) * h) // H, 0, h - 1)
    cols = np.clip((np.arange(W) * w) // W, 0, w - 1)
    return m[rows[:, None], cols[None, :]]


def compose_mask(segs_origin: np.ndarray, keep_ids: np.ndarray) -> np.ndarray:
    """Union of selected proposals; (H, W, K) + ids -> (H, W) uint8."""
    if len(keep_ids) == 0:
        return np.zeros(segs_origin.shape[:2], np.uint8)
    return (segs_origin[:, :, keep_ids].sum(axis=-1) > 0).astype(np.uint8)


# ---------------------------------------------------------------------------
# selection rules
# ---------------------------------------------------------------------------


def select_argmax_similarity(sim, iou, valid) -> np.ndarray:
    sim = np.where(valid, sim, -np.inf)
    return np.array([int(np.argmax(sim))])


def select_threshold(sim, iou, valid, threshold: float = 0.5) -> np.ndarray:
    """reference validate_threshold:712-730 (thresholds the IoP head)."""
    return np.nonzero(valid & (iou > threshold))[0]


def select_iou_iop(sim, iou, valid, threshold: float = 0.5) -> np.ndarray:
    """argmax similarity plus all proposals with IoP > tau."""
    ids = set(np.nonzero(valid & (iou > threshold))[0].tolist())
    ids.add(int(np.argmax(np.where(valid, sim, -np.inf))))
    return np.array(sorted(ids))


def select_threshold_from_top_iou(sim, iou, valid, threshold: float = 0.5,
                                  top_k: int = 5) -> np.ndarray:
    """top-K by similarity intersected with IoP > tau."""
    simv = np.where(valid, sim, -np.inf)
    top = np.argsort(-simv)[:top_k]
    return np.array([i for i in top if valid[i] and iou[i] > threshold],
                    np.int64)


SELECTORS = {
    "argmax": select_argmax_similarity,
    "threshold": select_threshold,
    "iou_iop": select_iou_iop,
    "top_iou": select_threshold_from_top_iou,
}


# ---------------------------------------------------------------------------
# metric accumulation
# ---------------------------------------------------------------------------


class SegEvalAccumulator:
    def __init__(self):
        self.intersection = AverageMeter("Intersec", ":6.3f", Summary.SUM)
        self.union = AverageMeter("Union", ":6.3f", Summary.SUM)
        self.acc_iou = AverageMeter("gIoU", ":6.3f", Summary.SUM)

    def add(self, pred: np.ndarray, gt: np.ndarray):
        pred = _nearest_resize_2d(pred.astype(np.uint8), (1024, 1024))
        gt = _nearest_resize_2d(gt.astype(np.uint8), (1024, 1024))
        inter, union, _ = intersection_and_union(pred.astype(np.int32),
                                                 gt.astype(np.int32), 2)
        acc = inter / (union + 1e-8)
        acc[union == 0] += 1.0
        self.intersection.update(inter)
        self.union.update(union)
        self.acc_iou.update(acc, n=1)

    def result(self) -> Dict[str, float]:
        self.intersection.all_reduce()
        self.union.all_reduce()
        self.acc_iou.all_reduce()
        iou_class = self.intersection.sum / (self.union.sum + 1e-10)
        return {"giou": float(np.asarray(self.acc_iou.avg).reshape(-1)[1]),
                "ciou": float(np.asarray(iou_class).reshape(-1)[1])}


def run_validation(eval_step: Callable, params, batches: Iterable,
                   strategy: str = "threshold", threshold: float = 0.5,
                   visualize_dir: Optional[str] = None) -> Dict[str, float]:
    """batches: iterable of (device_batch, extras), any batch size.

    The reference enforces val_batch_size=1 (training.py:384) and loops
    serially; here the device forward is batched (BASELINE configs[3]:
    batch 8 per chip) while the per-IMAGE metric math below stays
    bit-identical to the batch-1 path — each row is selected, composed
    and scored independently.  A padded final batch marks its filler
    rows False in extras["row_valid"] so dataset coverage is exact."""
    selector = SELECTORS[strategy]
    acc = SegEvalAccumulator()

    def _finish(out, extras):
        # pulling the arrays is the device sync point — by the time batch
        # i is pulled here, batch i+1's forward is already enqueued below
        sim_b = np.asarray(out["pred_similarity"])
        iou_b = np.asarray(out["pred_iou"])
        valid_b = np.asarray(out["prop_valid"])
        row_valid = extras.get("row_valid")
        for i in range(sim_b.shape[0]):
            if row_valid is not None and not row_valid[i]:
                continue
            sim, iou, valid = sim_b[i], iou_b[i], valid_b[i]
            keep = selector(sim, iou, valid, threshold) \
                if strategy != "argmax" else selector(sim, iou, valid)
            segs_origin = extras["segs_origin"][i]
            gt = extras["masks_list"][i][0]
            pred = compose_mask(segs_origin, keep)
            if pred.shape != gt.shape:
                pred = _nearest_resize_2d(pred, gt.shape)
            acc.add(pred, gt)
            if visualize_dir:
                _dump_visualization(visualize_dir, extras, pred, gt,
                                    sim, iou, index=i)

    # 1-deep pipeline: JAX dispatch is async, so enqueue the next sample's
    # forward before doing sample i's host work (mask compose + IoU) — the
    # reference eval loop is strictly serial (training.py:690-870)
    pending = None
    for batch, extras in batches:
        out = eval_step(params, batch)
        if pending is not None:
            _finish(*pending)
        pending = (out, extras)
    if pending is not None:
        _finish(*pending)
    return acc.result()


def _dump_visualization(out_dir: str, extras: Dict, pred: np.ndarray,
                        gt: np.ndarray, sim: np.ndarray, iou: np.ndarray,
                        index: int = 0):
    """Qualitative artifacts (reference training.py:778-845): image, pred
    overlay, gt overlay + a txt with the conversation and scores."""
    import os

    import cv2

    os.makedirs(out_dir, exist_ok=True)
    image_path = extras["image_paths"][index]
    if image_path is None or not os.path.exists(image_path):
        return
    name = os.path.splitext(os.path.basename(image_path))[0]
    image = cv2.imread(image_path)
    if image is None:
        return
    ph, pw = image.shape[:2]
    pred_r = _nearest_resize_2d(pred, (ph, pw))
    gt_r = _nearest_resize_2d(gt.astype(np.uint8), (ph, pw))
    cv2.imwrite(os.path.join(out_dir, f"{name}.png"), image)
    for tag, m in (("pred", pred_r), ("gt", gt_r)):
        overlay = image.copy()
        overlay[m > 0] = (overlay[m > 0] * 0.5
                          + np.array([0, 0, 255]) * 0.5).astype(np.uint8)
        cv2.imwrite(os.path.join(out_dir, f"{name}_{tag}.png"), overlay)
    with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
        convs = extras.get("conversations") or [[""]] * (index + 1)
        f.write(str(convs[index]) + "\n")
        f.write("pred_iou: " + " ".join(f"{v:.3f}" for v in iou) + "\n")
        f.write("similarity: " + " ".join(f"{v:.3f}" for v in sim) + "\n")
