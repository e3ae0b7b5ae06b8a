"""COCO run-length-encoding codec (pycocotools-compatible, no pycocotools).

The reference depends on the pycocotools C extension for RLE everywhere
(masks.json read/write: reference utils/sam_mask_reader.py, model/
segment_anything/utils/amg.py:107-150,295-300, prepare_datasets/*).  This
module reimplements the exact wire format so our masks.json files are
bit-compatible:

  * runs are column-major (Fortran order), first run counts zeros,
  * the 'counts' string is the pycocotools delta + 5-bit varint encoding.

A C++ fast path (llmseg_tpu/native/rle.cc) is used when built; the numpy
path is the always-available fallback and the golden reference in tests.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Union

import numpy as np

from llmseg_tpu.native import loader as _native

RLE = Dict  # {"size": [H, W], "counts": str | list[int]}


# ---------------------------------------------------------------------------
# counts <-> string (pycocotools rleToString / rleFrString)
# ---------------------------------------------------------------------------


def counts_to_string(counts: Sequence[int]) -> str:
    if _native.available() and len(counts) > 8:
        return _native.counts_to_string(np.asarray(counts, np.int64))
    s = []
    for i, c in enumerate(counts):
        x = int(c)
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            ch = x & 0x1F
            x >>= 5
            more = not ((x == 0 and not (ch & 0x10)) or
                        (x == -1 and (ch & 0x10)))
            if more:
                ch |= 0x20
            s.append(chr(ch + 48))
    return "".join(s)


def string_to_counts(s: str) -> List[int]:
    counts: List[int] = []
    p = 0
    n = len(s)
    while p < n:
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[p]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


# ---------------------------------------------------------------------------
# mask <-> runs
# ---------------------------------------------------------------------------


def mask_to_counts(mask: np.ndarray) -> List[int]:
    """Binary mask (H, W) -> column-major run lengths (first run = zeros)."""
    if _native.available():
        return _native.mask_to_counts(np.ascontiguousarray(mask, np.uint8))
    flat = np.asarray(mask, np.uint8).flatten(order="F")
    if flat.size == 0:
        return [0]
    change = np.nonzero(np.diff(flat))[0] + 1
    idx = np.concatenate([[0], change, [flat.size]])
    runs = np.diff(idx).tolist()
    if flat[0] == 1:
        runs = [0] + runs
    return runs


def counts_to_mask(counts: Sequence[int], h: int, w: int) -> np.ndarray:
    if _native.available():
        return _native.counts_to_mask(
            np.asarray(counts, np.int64), h, w)
    total = int(np.sum(counts))
    assert total == h * w, f"RLE sums to {total}, expected {h*w}"
    vals = np.zeros(len(counts), np.uint8)
    vals[1::2] = 1
    flat = np.repeat(vals, counts)
    return flat.reshape((h, w), order="F")


# ---------------------------------------------------------------------------
# Public API (pycocotools mask-API equivalents)
# ---------------------------------------------------------------------------


def encode(mask: np.ndarray) -> RLE:
    """Binary (H, W) mask -> compressed RLE (counts as str, like the
    reference's coco_encode_rle, amg.py:295-300)."""
    h, w = mask.shape
    return {"size": [h, w], "counts": counts_to_string(mask_to_counts(mask))}


def encode_packed(packed: np.ndarray, h: int, w: int):
    """Bit-packed mask -> (RLE, area, bbox) in one native pass.

    `packed` is (h_pad, stride) uint8 with width bit-packed MSB-first
    (numpy packbits default) — the wire format the AMG device program
    downloads (models/sam/amg.py finish).  Only the top-left (h, w) crop
    is encoded.  bbox is the reference's inclusive-edge xywh
    [x_min, y_min, x_max - x_min, y_max - y_min] (amg.py:91,179).
    The C++ path never materializes the unpacked (h, w) mask."""
    packed = np.ascontiguousarray(packed, np.uint8)
    if _native.available():
        s, a, bbox = _native.packed_encode(packed, h, w)
        return {"size": [h, w], "counts": s}, a, bbox
    mask = np.unpackbits(packed, axis=-1,
                         count=packed.shape[1] * 8)[:h, :w]
    r = encode(mask)
    a = area(r)
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        bbox = [0.0, 0.0, 0.0, 0.0]
    else:
        bbox = [float(xs.min()), float(ys.min()),
                float(xs.max() - xs.min()), float(ys.max() - ys.min())]
    return r, a, bbox


def decode(rle: RLE) -> np.ndarray:
    """RLE (compressed str or uncompressed list counts) -> (H, W) uint8."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        if isinstance(counts, bytes):
            counts = counts.decode("utf-8")
        counts = string_to_counts(counts)
    return counts_to_mask(counts, h, w)


def area(rle: RLE) -> int:
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        if isinstance(counts, bytes):
            counts = counts.decode("utf-8")
        counts = string_to_counts(counts)
    return int(np.sum(np.asarray(counts[1::2], np.int64)))


def to_bbox(rle: RLE) -> np.ndarray:
    """RLE -> xywh bbox (like pycocotools toBbox)."""
    m = decode(rle)
    ys, xs = np.nonzero(m)
    if len(xs) == 0:
        return np.zeros(4, np.float32)
    return np.array([xs.min(), ys.min(), xs.max() - xs.min() + 1,
                     ys.max() - ys.min() + 1], np.float32)


def merge(rles: List[RLE]) -> RLE:
    """Union of masks (pycocotools merge with intersect=False)."""
    out = decode(rles[0])
    for r in rles[1:]:
        out = np.maximum(out, decode(r))
    return encode(out)
