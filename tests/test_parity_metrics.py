"""Metric parity vs the actual reference utils (utils/utils.py).

gIoU/cIoU correctness runs through intersectionAndUnionGPU and the per-
proposal IoU/IoP label computation; these tests run the reference torch code
on the same inputs.  (The skimage resize inside reference compute_all_* is
supplied by reference_stubs with the same half-pixel nearest convention our
metrics use — resize itself is covered by D12's dataset tests.)
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(__file__))
import reference_stubs  # noqa: E402

reference_stubs.install()

from llmseg_tpu.utils import metrics as M  # noqa: E402


def test_intersection_and_union_matches_reference():
    from utils.utils import intersectionAndUnionGPU

    rng = np.random.RandomState(0)
    for _ in range(5):
        out = rng.randint(0, 2, size=(37, 53))
        tgt = rng.randint(0, 2, size=(37, 53))
        tgt[rng.rand(37, 53) < 0.1] = 255          # ignore_index regions
        ri, ru, rt = intersectionAndUnionGPU(
            torch.from_numpy(out.copy()).float(),
            torch.from_numpy(tgt.copy()).float(), K=2, ignore_index=255)
        gi, gu, gt_ = M.intersection_and_union(out, tgt, K=2,
                                               ignore_index=255)
        np.testing.assert_allclose(gi, ri.numpy())
        np.testing.assert_allclose(gu, ru.numpy())
        np.testing.assert_allclose(gt_, rt.numpy())


def test_compute_iou_iop_matches_reference():
    from utils.utils import compute_iop, compute_iou

    rng = np.random.RandomState(1)
    for _ in range(5):
        seg = (rng.rand(24, 30) < 0.4).astype(np.uint8)
        gt = (rng.rand(24, 30) < 0.3).astype(np.uint8)
        np.testing.assert_allclose(M.compute_iou(seg, gt),
                                   compute_iou(seg, gt))
        np.testing.assert_allclose(M.compute_iop(seg, gt),
                                   compute_iop(seg, gt))


def test_compute_all_iou_iop_matches_reference():
    """The reference's per-proposal loop (utils/utils.py:234-272) vs our
    one-pass (C++-backed) computation, including the GT nearest resize."""
    from utils.utils import compute_all_iop, compute_all_iou

    rng = np.random.RandomState(2)
    segs = (rng.rand(32, 40, 7) < 0.35).astype(np.uint8)   # (H, W, K)
    gt = (rng.rand(61, 83) < 0.3).astype(np.uint8)         # original size
    ref_iou = np.asarray(compute_all_iou(segs, gt))
    ref_iop = np.asarray(compute_all_iop(segs, gt))
    got_iou, got_iop = M.compute_all_iou_iop(segs, gt)
    np.testing.assert_allclose(got_iou, ref_iou, atol=1e-6)
    np.testing.assert_allclose(got_iop, ref_iop, atol=1e-6)
