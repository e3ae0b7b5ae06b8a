"""Batched box NMS in pure jnp (static shapes, jit/TPU friendly).

TPU-native replacement for the torchvision `batched_nms` C++ op the
reference AMG uses (reference automatic_mask_generator.py:11,245-251,355-360).
Greedy NMS is inherently sequential in the number of kept boxes; we pay one
fori_loop over N with O(N) vector work per step — N is the (static) padded
proposal count, and the IoU matrix is one (N, N) MXU-friendly block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of xyxy boxes: (N, 4) x (M, 4) -> (N, M), fp32."""
    a = boxes_a.astype(jnp.float32)
    b = boxes_b.astype(jnp.float32)
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
        valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Greedy NMS.  boxes (N, 4) xyxy, scores (N,), valid (N,) bool.

    Returns keep (N,) bool (in original order).  Invalid entries never kept
    and never suppress.  Matches torchvision semantics: iterate in descending
    score order; a box is kept iff no higher-scoring kept box overlaps it
    above the threshold.
    """
    n = boxes.shape[0]
    scores = scores.astype(jnp.float32)
    if valid is not None:
        scores = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-scores)                       # descending
    iou = box_iou(boxes[order], boxes[order])          # (N, N) in sorted order
    is_valid = (scores[order] > -jnp.inf)

    def body(i, keep):
        # keep[i] already reflects suppression by earlier kept boxes
        suppress = iou[i] > iou_threshold
        keep_i = keep[i]
        new_keep = jnp.where(
            (jnp.arange(n) > i) & suppress & keep_i, False, keep)
        return new_keep

    keep_sorted = jax.lax.fori_loop(0, n, body, is_valid)
    keep = jnp.zeros(n, bool).at[order].set(keep_sorted)
    return keep


def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                idxs: jnp.ndarray, iou_threshold: float,
                valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Category-aware NMS (torchvision batched_nms): boxes of different idxs
    never suppress each other — implemented by the standard coordinate-offset
    trick."""
    max_coord = jnp.max(jnp.abs(boxes)) + 1.0
    offsets = idxs.astype(jnp.float32)[:, None] * (2.0 * max_coord)
    return nms(boxes + offsets, scores, iou_threshold, valid=valid)
