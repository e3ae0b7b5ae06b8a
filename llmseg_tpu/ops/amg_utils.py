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
    labels, n = ndimage.label(working)
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
