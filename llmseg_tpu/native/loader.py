"""ctypes loader for the native RLE codec, with transparent build + fallback.

If librle.so is missing, tries one `make` in this directory (g++ is in the
image); on any failure everything silently falls back to the numpy paths in
ops/rle.py.  Set LLMSEG_NO_NATIVE=1 to force the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "librle.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("LLMSEG_NO_NATIVE"):
        return None
    src = os.path.join(_DIR, "rle.cc")
    try:
        stale = (not os.path.exists(_LIB_PATH)
                 or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src))
    except OSError:
        # rle.cc absent (prebuilt-.so-only deployment): not stale
        stale = not os.path.exists(_LIB_PATH)
    if stale:
        try:
            subprocess.run(["make", "-C", _DIR, "-B"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            if not os.path.exists(_LIB_PATH):
                return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    if not (hasattr(lib, "rle_packed_encode")
            and hasattr(lib, "rle_counts_to_string")):
        return None  # stale binary without newer symbols; numpy fallback
    lib.rle_mask_to_counts.restype = ctypes.c_int64
    lib.rle_mask_to_counts.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]
    lib.rle_counts_to_mask.restype = ctypes.c_int
    lib.rle_counts_to_mask.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8)]
    lib.rle_packed_encode.restype = ctypes.c_int64
    lib.rle_packed_encode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double)]
    lib.rle_counts_to_string.restype = ctypes.c_int64
    lib.rle_counts_to_string.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_char_p]
    lib.mask_iou_iop.restype = None
    lib.mask_iou_iop.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def mask_to_counts(mask: np.ndarray) -> List[int]:
    lib = _load()
    h, w = mask.shape
    out = np.empty(h * w + 1, np.int64)
    n = lib.rle_mask_to_counts(_u8ptr(mask), h, w,
                               out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out[:n].tolist()


def counts_to_mask(counts: np.ndarray, h: int, w: int) -> np.ndarray:
    lib = _load()
    out = np.zeros((h, w), np.uint8)
    rc = lib.rle_counts_to_mask(
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(counts), h, w, _u8ptr(out))
    if rc != 0:
        raise ValueError(f"RLE counts sum != {h}*{w}")
    return out


_str_buf = np.empty(0, np.uint8)  # reused, never zeroed


def packed_encode(packed: np.ndarray, h: int, w: int):
    """Bit-packed (h_pad, stride) uint8 row-major mask -> (counts_str,
    area, bbox[x, y, dw, dh]) over the top-left (h, w) crop, column-major.
    One C pass; no unpacked mask buffer is ever materialized."""
    global _str_buf
    lib = _load()
    stride = packed.shape[1]
    # worst case: every pixel flips -> h*w+1 runs, <= 13 varint chars each
    need = (h * w + 2) * 13
    if _str_buf.size < need:
        _str_buf = np.empty(need, np.uint8)
    area = ctypes.c_int64()
    bbox = (ctypes.c_double * 4)()
    n = lib.rle_packed_encode(
        _u8ptr(packed), stride, h, w,
        _str_buf.ctypes.data_as(ctypes.c_char_p),
        ctypes.byref(area), bbox)
    return (_str_buf[:n].tobytes().decode("ascii"), int(area.value),
            list(bbox))


def counts_to_string(counts: np.ndarray) -> str:
    """int64 counts -> pycocotools varint string in one C pass."""
    global _str_buf
    lib = _load()
    counts = np.ascontiguousarray(counts, np.int64)
    need = (len(counts) + 1) * 13
    if _str_buf.size < need:
        _str_buf = np.empty(need, np.uint8)
    n = lib.rle_counts_to_string(
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(counts),
        _str_buf.ctypes.data_as(ctypes.c_char_p))
    return _str_buf[:n].tobytes().decode("ascii")


def mask_iou_iop(gt: np.ndarray, props: np.ndarray):
    """gt: (H, W) uint8; props: (K, H, W) uint8 -> (iou (K,), iop (K,))."""
    lib = _load()
    k, h, w = props.shape
    iou = np.empty(k, np.float32)
    iop = np.empty(k, np.float32)
    lib.mask_iou_iop(_u8ptr(gt), _u8ptr(props), k, h, w,
                     iou.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                     iop.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return iou, iop
