"""Everything-mode automatic mask generation (AMG), TPU-first.

Capability parity with reference model/segment_anything/automatic_mask_
generator.py:24-372, re-architected for XLA:

  * The reference streams 64-point batches through predictor + per-batch
    Python filtering (MaskData dicts, dynamic shapes).  Here the whole
    cascade — decode all P grid points x 3 masks, IoU filter, stability
    filter, box extraction, NMS, top-K — is ONE jitted program over
    fixed shapes with validity masks.
  * Filtering and boxes run on the 256x256 low-res mask logits instead of
    first upsampling every candidate to 1024^2 (16x less HBM traffic; boxes
    scale linearly so NMS decisions match up to quantization).  Survivors
    only are upsampled, in a second chunked program.
  * RLE encoding happens on the host (ops/rle.py, C++-backed), overlapping
    with the next image's device compute when driven by the prepare CLI.

Output annotation schema matches the reference masks.json exactly
(prepare_datasets/prepare_ReasonSeg.py:86-101).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llmseg_tpu.config import AMGConfig, SamConfig
from llmseg_tpu.models.sam import sam as sam_lib
from llmseg_tpu.ops import amg_utils, nms, rle


def _candidate_filters(low_masks, iou_pred, amg: AMGConfig, cfg: SamConfig,
                       valid_hw: jnp.ndarray):
    """Apply IoU + stability filters on low-res logits.

    low_masks: (N, S, S) logits; iou_pred: (N,).  valid_hw: (2,) dynamic —
    the unpadded extent of the image inside the low-res grid.
    Returns (keep (N,), stability (N,))."""
    S = low_masks.shape[-1]
    row = jnp.arange(S)
    in_h = (row < valid_hw[0])[:, None]
    in_w = (row < valid_hw[1])[None, :]
    region = (in_h & in_w)[None]
    # exclude padded area from thresholded masks
    neg = cfg.mask_threshold - 2.0 * amg.stability_score_offset - 1.0
    masked_logits = jnp.where(region, low_masks, neg)

    keep = iou_pred > amg.pred_iou_thresh
    stability = amg_utils.calculate_stability_score(
        masked_logits, cfg.mask_threshold, amg.stability_score_offset)
    keep &= stability >= amg.stability_score_thresh
    return keep, stability, masked_logits


@functools.partial(jax.jit, static_argnames=("cfg", "amg", "points_total"))
def amg_select(params: dict, cfg: SamConfig, amg: AMGConfig,
               image_embedding: jnp.ndarray, points: jnp.ndarray,
               valid_hw: jnp.ndarray, points_total: int) -> Dict:
    """Device program: grid prompts -> filtered, NMS'd top-K candidates.

    image_embedding: (1, G, G, 256); points: (P, 2) in input-frame pixels;
    valid_hw: (2,) i32 DYNAMIC image extent — one compiled program serves
    every image size (the reference recompiles nothing because it is eager;
    a static extent here would recompile per unique (h, w)).
    Returns dict of fixed-shape arrays (K = amg.max_masks):
      masks_low (K, S, S) logits, iou (K,), stability (K,), boxes (K, 4)
      input-frame xyxy, points (K, 2), valid (K,).
    """
    P = points_total
    B = amg.points_per_batch
    n_chunks = -(-P // B)
    S4 = cfg.prompt.image_embedding_size * 4          # low-res mask size

    pts = jnp.pad(points, ((0, n_chunks * B - P), (0, 0)))
    pts = pts.reshape(n_chunks, B, 1, 2)
    labels = jnp.ones((B, 1), jnp.int32)

    def decode_chunk(chunk_pts):
        masks, iou_pred = sam_lib.decode_masks(
            params, cfg, image_embedding, points=chunk_pts, labels=labels,
            multimask_output=True)
        # bf16 halves the HBM held by the full candidate set (P*3 masks)
        return masks.astype(jnp.bfloat16), iou_pred    # (B,3,S4,S4), (B,3)

    masks, iou_pred = jax.lax.map(decode_chunk, pts)
    M = n_chunks * B * 3
    masks = masks.reshape(M, S4, S4)
    iou_pred = iou_pred.reshape(M)
    point_per_mask = jnp.repeat(pts.reshape(-1, 2), 3, axis=0)

    real = (jnp.arange(M) // 3) < P                    # drop padded points
    lowres_hw = jnp.maximum(valid_hw * S4 // cfg.encoder.img_size, 1)
    keep, stability, masked_logits = _candidate_filters(
        masks, iou_pred, amg, cfg, lowres_hw)
    keep &= real

    binary = masked_logits > cfg.mask_threshold
    boxes_low = amg_utils.batched_mask_to_box(binary)   # low-res coords
    scale = cfg.encoder.img_size / S4
    boxes = boxes_low * scale                           # input-frame coords
    keep &= jnp.any(binary, axis=(-2, -1))              # drop empty masks

    keep_nms = nms.nms(boxes, iou_pred, amg.box_nms_thresh, valid=keep)

    # top-K by predicted IoU among survivors
    score = jnp.where(keep_nms, iou_pred, -jnp.inf)
    K = amg.max_masks
    top = jnp.argsort(-score)[:K]
    return {
        "masks_low": masks[top],
        "iou": iou_pred[top],
        "stability": stability[top],
        "boxes": boxes[top],
        "points": point_per_mask[top],
        "valid": keep_nms[top],
    }


@functools.partial(jax.jit, static_argnames=("out_hw", "threshold"))
def upscale_binary(masks_low: jnp.ndarray, out_hw: Tuple[int, int],
                   threshold: float = 0.0) -> jnp.ndarray:
    """(K, S, S) logits -> (K, H, W//8) BIT-PACKED masks at the input-frame
    resolution (reference postprocess path, sam.py:137-172, minus the
    original-size resize: masks.json stores masks at the preprocessed
    resolution).  Packing on device cuts the host transfer 8x — the
    dominant cost when the host link is thin."""
    K = masks_low.shape[0]
    m = jax.image.resize(masks_low.astype(jnp.float32)[..., None],
                         (K, out_hw[0], out_hw[1], 1), method="bilinear")
    bits = (m[..., 0] > threshold).astype(jnp.uint8)
    bits = bits.reshape(K, out_hw[0], out_hw[1] // 8, 8)
    weights = (2 ** jnp.arange(7, -1, -1)).astype(jnp.uint8)  # big-endian
    return jnp.sum(bits * weights, axis=-1).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _prep_encode(params: dict, cfg: SamConfig, padded: jnp.ndarray,
                 region: jnp.ndarray) -> jnp.ndarray:
    """normalize + re-zero pad region + encoder, as ONE device program
    (eager host-side jnp ops each cost a full roundtrip on remote devices)."""
    x = sam_lib.preprocess(padded, cfg) * region
    return sam_lib.encode_image(params, x, cfg)


class AutomaticMaskGenerator:
    """Host-side driver with the reference's generate() contract
    (automatic_mask_generator.py:126-187)."""

    def __init__(self, params: dict, cfg: SamConfig,
                 amg: Optional[AMGConfig] = None):
        self.params = params
        self.cfg = cfg
        self.amg = amg or AMGConfig()
        self._grid = amg_utils.build_point_grid(self.amg.points_per_side)

    def generate(self, image: np.ndarray) -> List[Dict]:
        """image: (H, W, 3) uint8, longest side <= cfg.encoder.img_size
        (already resized by the caller, as in prepare_ReasonSeg.py:32-40).
        Returns reference-schema annotation dicts sorted by area desc.
        """
        return self.finish(self.submit(image))

    def submit(self, image: np.ndarray) -> Dict:
        """Enqueue the device work (encode + select) WITHOUT blocking.

        JAX dispatch is async: callers can submit image i+1 before finishing
        image i, overlapping i's host transfers + RLE encode with i+1's
        device compute (cli/prepare.py does this — the reference processes
        strictly serially, prepare_ReasonSeg.py:72-116)."""
        h, w = image.shape[:2]
        assert max(h, w) <= self.cfg.encoder.img_size, (
            f"image {h}x{w} exceeds SAM input {self.cfg.encoder.img_size}; "
            "resize longest side first (cli/prepare.py does this)")
        # pad to the square input on host so encode compiles once per size
        s_in = self.cfg.encoder.img_size
        padded = np.zeros((s_in, s_in, 3), image.dtype)
        padded[:h, :w] = image
        # the reference normalizes then pads with zeros; replicate by
        # re-zeroing outside the valid extent after normalization
        region = np.zeros((1, s_in, s_in, 1), np.float32)
        region[:, :h, :w] = 1.0
        emb = _prep_encode(self.params, self.cfg, jnp.asarray(padded)[None],
                           jnp.asarray(region))
        points = jnp.asarray(self._grid * np.array([w, h]), jnp.float32)
        out = amg_select(self.params, self.cfg, self.amg, emb, points,
                         jnp.asarray([h, w], jnp.int32), points.shape[0])
        return {"out": out, "hw": (h, w)}

    def finish(self, handle: Dict) -> List[Dict]:
        """Pull the device results of a submit() and finish on host
        (upscale survivor masks, RLE encode, schema assembly)."""
        out = handle["out"]
        h, w = handle["hw"]
        s_in = self.cfg.encoder.img_size
        # ONE host transfer for all the small outputs
        small = jax.device_get({k: out[k] for k in
                                ("valid", "iou", "stability", "boxes",
                                 "points")})
        valid = small["valid"]
        n = int(valid.sum())
        if n == 0:
            return []
        # bucket the survivor count to powers of two so upscale_binary
        # compiles a handful of shapes, not one per image; upscale to the
        # full square input, download BIT-PACKED, crop on host
        n_buck = min(max(8, 1 << (n - 1).bit_length()), self.amg.max_masks)
        packed = jax.device_get(
            upscale_binary(out["masks_low"][:n_buck], (s_in, s_in),
                           self.cfg.mask_threshold))
        masks = np.unpackbits(packed[:n], axis=-1,
                              count=s_in).reshape(n, s_in, s_in)
        masks = masks[:, :h, :w]
        iou = small["iou"][:n]
        stability = small["stability"][:n]
        boxes = small["boxes"][:n]
        pts = small["points"][:n]

        anns = []
        for i in range(n):
            m = masks[i]
            if self.amg.min_mask_region_area > 0:
                m, _ = amg_utils.remove_small_regions(
                    m.astype(bool), self.amg.min_mask_region_area, "holes")
                m, _ = amg_utils.remove_small_regions(
                    m, self.amg.min_mask_region_area, "islands")
                m = m.astype(np.uint8)
            r = rle.encode(m)
            area = rle.area(r)
            if area == 0:
                continue
            # reference bbox wire format: box_xyxy_to_xywh of the INCLUSIVE-
            # edge mask box (amg.py:91,179) -> w = x_max - x_min (no +1)
            ys, xs = np.nonzero(m)
            bbox = [float(xs.min()), float(ys.min()),
                    float(xs.max() - xs.min()), float(ys.max() - ys.min())]
            anns.append({
                "segmentation": r,
                "area": int(area),
                "bbox": bbox,
                "predicted_iou": float(iou[i]),
                "point_coords": [[float(pts[i][0]), float(pts[i][1])]],
                "stability_score": float(stability[i]),
                "crop_box": [0, 0, w, h],
            })
        anns.sort(key=lambda a: a["area"], reverse=True)
        return anns
