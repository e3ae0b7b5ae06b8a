"""On-device run-length encoding for AMG mask downloads.

The AMG finish path's dominant cost on a thin host link is downloading the
upscaled masks: bit-packed (K, 1024, 128) is 8.4 MB at K=64, and this
environment's device->host link runs at ~46 MB/s (~180 ms/image).  A blobby
SAM mask is ~1-2 runs per column, so its COCO RLE is ~100x smaller than its
bitmap.  This module computes the run boundaries on device with vectorized
ops (no scatter/sort) and downloads only:

  * per-column boundary ROW indices, int16, up to ``max_per_col`` slots
    (a boundary = a column-major run start, pycocotools Fortran order),
  * per-column boundary counts, int16,
  * per-mask metadata: area, inclusive-edge bbox, first bit, overflow flag.

That is ~1 MB at K=64 — ~8x less wire time.  Columns with more than
``max_per_col`` boundaries (speckle, not real SAM masks) set the overflow
flag and the caller falls back to the bit-packed download for that mask.

Host-side, boundaries become pycocotools counts by construction:
q = j*h + i over the (h, w) crop, counts = diff(q ++ [h*w]), with a
leading 0 when the mask starts with 1 (reference RLE wire format,
model/segment_anything/utils/amg.py:107-150).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llmseg_tpu.ops import rle


@functools.partial(jax.jit, static_argnames=("out_hw", "threshold", "bucket",
                                             "max_per_col"))
def upscale_rle(masks_low: jnp.ndarray, hw: jnp.ndarray,
                out_hw: Tuple[int, int], threshold: float = 0.0,
                bucket: int = 64, max_per_col: int = 8):
    """(K0, S, S) logits -> column-major run boundaries of the (h, w) crop.

    hw: (2,) int32 [h, w] — TRACED, so one compiled program serves every
    image shape.  Returns (payload16, meta32):
      payload16 (bucket, S*max_per_col + S) int16 — boundary row indices
        (sentinel S when the slot is empty) then per-column counts;
      meta32 (bucket, 7) int32 — area, x0, y0, x1, y1 (inclusive-edge),
        first bit, overflow flag.
    """
    h, w = hw[0], hw[1]
    ml = masks_low[:bucket]
    K = ml.shape[0]
    S = out_hw[0]
    assert out_hw[0] == out_hw[1], "square SAM input expected"
    m = jax.image.resize(ml.astype(jnp.float32)[..., None],
                         (K, S, S, 1), method="bilinear")
    bits = m[..., 0] > threshold                       # (K, S, S)
    rows = jnp.arange(S, dtype=jnp.int32)
    cols = jnp.arange(S, dtype=jnp.int32)
    valid = (rows[:, None] < h) & (cols[None, :] < w)  # (S, S)
    bits = bits & valid

    # previous element in Fortran scan order: (i-1, j), or (h-1, j-1) at
    # the top of a column
    prev_row = jnp.pad(bits[:, :-1, :], ((0, 0), (1, 0), (0, 0)))
    col_last = jnp.take(bits, h - 1, axis=1)           # (K, S) = bits[h-1, :]
    prev_col = jnp.pad(col_last[:, :-1], ((0, 0), (1, 0)))
    prev = jnp.where(rows[None, :, None] > 0, prev_row, prev_col[:, None, :])
    start = (rows[:, None] == 0) & (cols[None, :] == 0)
    boundary = valid & (start[None] | (bits != prev))  # (K, S, S)

    # rank of each boundary within its column (exclusive prefix count)
    b32 = boundary.astype(jnp.int32)
    rank = jnp.cumsum(b32, axis=1) - b32
    slots = []
    for s in range(max_per_col):
        hit = boundary & (rank == s)
        slots.append(jnp.min(jnp.where(hit, rows[None, :, None], S), axis=1))
    pos = jnp.stack(slots, axis=-1).astype(jnp.int16)  # (K, S, max_per_col)
    col_counts = jnp.sum(b32, axis=1)                  # (K, S)
    overflow = jnp.any(col_counts > max_per_col, axis=-1)

    area = jnp.sum(bits, axis=(1, 2), dtype=jnp.int32)
    rows_any = jnp.any(bits, axis=2)                   # (K, S)
    cols_any = jnp.any(bits, axis=1)
    big = jnp.int32(S)
    y0 = jnp.min(jnp.where(rows_any, rows[None], big), axis=1)
    y1 = jnp.max(jnp.where(rows_any, rows[None], -1), axis=1)
    x0 = jnp.min(jnp.where(cols_any, cols[None], big), axis=1)
    x1 = jnp.max(jnp.where(cols_any, cols[None], -1), axis=1)
    first_bit = bits[:, 0, 0].astype(jnp.int32)

    payload16 = jnp.concatenate(
        [pos.reshape(K, S * max_per_col), col_counts.astype(jnp.int16)],
        axis=1)
    meta32 = jnp.stack([area, x0, y0, x1, y1, first_bit,
                        overflow.astype(jnp.int32)], axis=1)
    return payload16, meta32


def decode_boundaries(payload16_row: np.ndarray, h: int, w: int,
                      s_in: int, max_per_col: int) -> list:
    """One mask's downloaded payload row -> pycocotools counts list."""
    pos = payload16_row[:s_in * max_per_col].reshape(s_in, max_per_col)
    col_counts = payload16_row[s_in * max_per_col:].astype(np.int64)
    ncols = min(w, s_in)
    slot_valid = (np.arange(max_per_col)[None, :]
                  < col_counts[:ncols, None])           # (w, P)
    i_flat = pos[:ncols].astype(np.int64)[slot_valid]   # q-ascending order
    j_flat = np.broadcast_to(np.arange(ncols)[:, None],
                             (ncols, max_per_col))[slot_valid]
    q = j_flat * h + i_flat
    if q.size == 0:
        return [h * w]
    counts = np.diff(np.append(q, h * w)).tolist()
    return counts


def annotations_from_rle_payload(payload16: np.ndarray, meta32: np.ndarray,
                                 n: int, h: int, w: int, s_in: int,
                                 max_per_col: int):
    """Downloaded (payload16, meta32) -> per-mask (rle_dict, area, bbox)
    list; masks needing the bit-packed fallback yield None."""
    out = []
    for k in range(n):
        area, x0, y0, x1, y1, first_bit, overflow = (
            int(v) for v in meta32[k])
        if overflow:
            out.append(None)
            continue
        if area == 0:
            out.append(({"size": [h, w], "counts": rle.counts_to_string(
                [h * w])}, 0, [0.0, 0.0, 0.0, 0.0]))
            continue
        counts = decode_boundaries(payload16[k], h, w, s_in, max_per_col)
        if first_bit:
            counts = [0] + counts
        s = rle.counts_to_string(counts)
        bbox = [float(x0), float(y0), float(x1 - x0), float(y1 - y0)]
        out.append(({"size": [h, w], "counts": s}, area, bbox))
    return out
