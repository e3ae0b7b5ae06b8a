"""AMG filtering primitives, jnp (device) + numpy (host grid generation).

TPU-native equivalents of reference model/segment_anything/utils/amg.py —
the MaskData dict-of-tensors bookkeeping is replaced by fixed-shape arrays
with validity masks so the whole filter cascade stays inside one XLA program.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Point grids (host, numpy) — reference amg.py:179-198
# ---------------------------------------------------------------------------


def build_point_grid(n_per_side: int) -> np.ndarray:
    """(n^2, 2) normalized [0,1] xy grid with half-cell offset."""
    offset = 1.0 / (2 * n_per_side)
    pts = np.linspace(offset, 1.0 - offset, n_per_side)
    gx, gy = np.meshgrid(pts, pts)               # x varies fastest in a row
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def build_all_layer_point_grids(n_per_side: int, n_layers: int,
                                scale_per_layer: int) -> List[np.ndarray]:
    return [build_point_grid(int(n_per_side / (scale_per_layer ** i)))
            for i in range(n_layers + 1)]


def generate_crop_boxes(im_size: Tuple[int, int], n_layers: int,
                        overlap_ratio: float):
    """reference amg.py:201-236: crop boxes (xywh->xyxy) + layer indexes."""
    crop_boxes, layer_idxs = [], []
    im_h, im_w = im_size
    short_side = min(im_h, im_w)
    crop_boxes.append([0, 0, im_w, im_h])
    layer_idxs.append(0)

    def crop_len(orig_len, n_crops, overlap):
        return int(np.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_crops_per_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_crops_per_side))
        crop_w = crop_len(im_w, n_crops_per_side, overlap)
        crop_h = crop_len(im_h, n_crops_per_side, overlap)
        crop_box_x0 = [int((crop_w - overlap) * i) for i in range(n_crops_per_side)]
        crop_box_y0 = [int((crop_h - overlap) * i) for i in range(n_crops_per_side)]
        for x0 in crop_box_x0:
            for y0 in crop_box_y0:
                crop_boxes.append([x0, y0, min(x0 + crop_w, im_w),
                                   min(y0 + crop_h, im_h)])
                layer_idxs.append(i_layer + 1)
    return crop_boxes, layer_idxs


# ---------------------------------------------------------------------------
# Device-side filters (jnp)
# ---------------------------------------------------------------------------


def calculate_stability_score(mask_logits: jnp.ndarray, mask_threshold: float,
                              threshold_offset: float) -> jnp.ndarray:
    """IoU between high/low-threshold binarizations (reference amg.py:156-176).

    mask_logits: (..., H, W) float -> (...) fp32 score.
    """
    hi = jnp.sum((mask_logits > (mask_threshold + threshold_offset))
                 .astype(jnp.float32), axis=(-2, -1))
    lo = jnp.sum((mask_logits > (mask_threshold - threshold_offset))
                 .astype(jnp.float32), axis=(-2, -1))
    return jnp.where(lo > 0, hi / lo, 0.0)


def batched_mask_to_box(masks: jnp.ndarray) -> jnp.ndarray:
    """Binary masks (..., H, W) -> xyxy boxes (..., 4); zeros for empty masks
    (reference amg.py:303-346).

    NOTE: the reference keeps INCLUSIVE right/bottom edges (the max pixel
    index, no +1) — NMS IoUs and the masks.json bbox wire format
    (box_xyxy_to_xywh, amg.py:91 -> w = x1 - x0) inherit that convention, so
    we match it exactly."""
    H, W = masks.shape[-2:]
    m = masks.astype(bool)
    any_row = jnp.any(m, axis=-1)                 # (..., H)
    any_col = jnp.any(m, axis=-2)                 # (..., W)
    rows = jnp.arange(H)
    cols = jnp.arange(W)
    top = jnp.min(jnp.where(any_row, rows, H), axis=-1)
    bottom = jnp.max(jnp.where(any_row, rows, -1), axis=-1)
    left = jnp.min(jnp.where(any_col, cols, W), axis=-1)
    right = jnp.max(jnp.where(any_col, cols, -1), axis=-1)
    empty = ~jnp.any(any_row, axis=-1)
    box = jnp.stack([left, top, right, bottom], axis=-1)
    return jnp.where(empty[..., None], 0, box).astype(jnp.float32)


def is_box_near_crop_edge(boxes: jnp.ndarray, crop_box, orig_box,
                          atol: float = 20.0) -> jnp.ndarray:
    """reference amg.py:78-88: True if box touches crop edge but not image edge."""
    crop = jnp.asarray(crop_box, jnp.float32)
    orig = jnp.asarray(orig_box, jnp.float32)
    offset = jnp.array([crop[0], crop[1], crop[0], crop[1]], jnp.float32)
    b = boxes.astype(jnp.float32) + offset
    near_crop = jnp.abs(b - crop[None]) <= atol
    near_image = jnp.abs(b - orig[None]) <= atol
    return jnp.any(near_crop & ~near_image, axis=-1)


def uncrop_boxes_xyxy(boxes: jnp.ndarray, crop_box) -> jnp.ndarray:
    x0, y0 = crop_box[0], crop_box[1]
    return boxes + jnp.asarray([x0, y0, x0, y0], boxes.dtype)


def uncrop_points(points: jnp.ndarray, crop_box) -> jnp.ndarray:
    return points + jnp.asarray(crop_box[:2], points.dtype)


def bilinear_resize_np(a: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Half-pixel-center bilinear resize on host (numpy), matching
    torch.nn.functional.interpolate(mode='bilinear', align_corners=False)
    and jax.image.resize('bilinear').  Used by the AMG crop cascade to
    replicate the reference's two-stage mask upscale
    (modeling/sam.py:137-172) without per-crop-shape XLA recompiles.

    a: (..., H, W) float -> (..., oh, ow) float32."""
    H, W = a.shape[-2:]
    oh, ow = out_hw
    a = a.astype(np.float32)
    ys = (np.arange(oh) + 0.5) * (H / oh) - 0.5
    xs = (np.arange(ow) + 0.5) * (W / ow) - 0.5
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    wy = (ys - y0).astype(np.float32)[:, None]
    wx = (xs - x0).astype(np.float32)[None, :]
    y0c, y1c = np.clip(y0, 0, H - 1), np.clip(y0 + 1, 0, H - 1)
    x0c, x1c = np.clip(x0, 0, W - 1), np.clip(x0 + 1, 0, W - 1)
    ia = a[..., y0c[:, None], x0c[None, :]]
    ib = a[..., y0c[:, None], x1c[None, :]]
    ic = a[..., y1c[:, None], x0c[None, :]]
    id_ = a[..., y1c[:, None], x1c[None, :]]
    return (ia * (1 - wy) * (1 - wx) + ib * (1 - wy) * wx
            + ic * wy * (1 - wx) + id_ * wy * wx)


def nms_host(boxes: np.ndarray, scores: np.ndarray,
             iou_threshold: float) -> np.ndarray:
    """Greedy NMS on host with torchvision semantics (inclusive-edge boxes
    are NOT assumed: IoU uses the xyxy extents as-is, like torchvision's
    (x1-x0)*(y1-y0)).  Returns kept indices in descending-score order.
    Used where the candidate count is small and dynamic (cross-crop dedup,
    small-region re-dedup) so fixed-shape device NMS would waste a compile
    per survivor count."""
    if len(boxes) == 0:
        return np.zeros((0,), np.int64)
    boxes = boxes.astype(np.float64)
    order = np.argsort(-scores, kind="stable")
    areas = ((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]))
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x0 = np.maximum(boxes[i, 0], boxes[:, 0])
        y0 = np.maximum(boxes[i, 1], boxes[:, 1])
        x1 = np.minimum(boxes[i, 2], boxes[:, 2])
        y1 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(x1 - x0, 0) * np.maximum(y1 - y0, 0)
        iou = inter / np.maximum(areas[i] + areas - inter, 1e-12)
        suppressed |= iou > iou_threshold
    return np.asarray(keep, np.int64)


# ---------------------------------------------------------------------------
# Host-side small-region cleanup (reference amg.py:268-292, cv2)
# ---------------------------------------------------------------------------


def remove_small_regions(mask: np.ndarray, area_thresh: float,
                         mode: str) -> Tuple[np.ndarray, bool]:
    """Remove small disconnected regions / holes via connected components.

    mode 'holes': fill holes smaller than area_thresh;
    mode 'islands': remove foreground blobs smaller than area_thresh.
    Uses scipy.ndimage (cv2-free); returns (mask, modified).
    """
    assert mode in ("holes", "islands")
    from scipy import ndimage

    correct_holes = mode == "holes"
    working = (mask ^ correct_holes).astype(np.uint8)
    # 8-connectivity, matching the reference's
    # cv2.connectedComponentsWithStats(working_mask, 8)
    labels, n = ndimage.label(working, structure=np.ones((3, 3), np.int32))
    if n == 0:
        return mask, False
    sizes = ndimage.sum_labels(np.ones_like(working), labels,
                               index=np.arange(1, n + 1))
    small = [i + 1 for i, s in enumerate(sizes) if s < area_thresh]
    if not small:
        return mask, False
    fill = np.isin(labels, small)
    if correct_holes:
        out = mask | fill
    else:
        out = mask & ~fill
        if not out.any():   # keep the largest island if everything was small
            largest = int(np.argmax(sizes)) + 1
            out = labels == largest
    return out, True
