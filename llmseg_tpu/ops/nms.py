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

    # Exact greedy NMS via fixpoint iteration: keep_{t+1}[i] = valid[i] and
    # no higher-ranked kept box overlaps i.  Converges to the sequential
    # greedy result in as many passes as the longest suppression chain
    # (typically < 10), each pass one (N, N) x (N,) matvec on the MXU —
    # versus N sequential scalar steps for the naive loop (the naive version
    # measured ~7s for N=3072 on TPU).
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    sup = ((iou > iou_threshold) & (col < row)).astype(jnp.float32)

    def cond(state):
        keep, prev, it = state
        return (it < n) & jnp.any(keep != prev)

    def body(state):
        keep, _, it = state
        suppressed = (sup @ keep.astype(jnp.float32)) > 0.0
        return is_valid & ~suppressed, keep, it + 1

    keep0 = is_valid
    keep_sorted, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.zeros_like(keep0), jnp.int32(0)))
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
