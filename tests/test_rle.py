import numpy as np
import pytest

from llmseg_tpu.ops import rle


def _random_mask(h, w, seed, p=0.3):
    rng = np.random.RandomState(seed)
    # blobby mask: threshold smoothed noise
    m = rng.rand(h, w) < p
    return m.astype(np.uint8)


@pytest.mark.parametrize("h,w,seed", [(1, 1, 0), (7, 5, 1), (64, 64, 2),
                                      (100, 37, 3), (256, 256, 4)])
def test_roundtrip(h, w, seed):
    m = _random_mask(h, w, seed)
    r = rle.encode(m)
    assert r["size"] == [h, w]
    assert isinstance(r["counts"], str)
    m2 = rle.decode(r)
    np.testing.assert_array_equal(m, m2)


def test_empty_and_full():
    z = np.zeros((16, 16), np.uint8)
    f = np.ones((16, 16), np.uint8)
    assert rle.area(rle.encode(z)) == 0
    assert rle.area(rle.encode(f)) == 256
    np.testing.assert_array_equal(rle.decode(rle.encode(z)), z)
    np.testing.assert_array_equal(rle.decode(rle.encode(f)), f)


def test_counts_string_roundtrip():
    counts = [0, 5, 3, 100000, 2, 7, 1]
    s = rle.counts_to_string(counts)
    assert rle.string_to_counts(s) == counts


def test_golden_string():
    # Hand-derived golden value following the pycocotools rleToString
    # algorithm: column-major runs [2,1,1,2,2,1,5,1,1], deltas for i>2 give
    # [2,1,1,1,1,-1,3,0,-4]; 5-bit varint chars (+48): "21111O30L".
    m = np.array([[0, 1, 1, 0],
                  [0, 1, 0, 0],
                  [1, 0, 0, 1],
                  [0, 0, 0, 0]], np.uint8)
    r = rle.encode(m)
    assert rle.mask_to_counts(m) == [2, 1, 1, 2, 2, 1, 5, 1, 1]
    assert r["counts"] == "21111O30L"
    assert rle.area(r) == 5
    np.testing.assert_array_equal(rle.decode(r), m)


def test_column_major_semantics():
    # one pixel at (row=2, col=0) in a 4x3 mask -> 2 zeros, 1 one, 9 zeros
    m = np.zeros((4, 3), np.uint8)
    m[2, 0] = 1
    assert rle.mask_to_counts(m) == [2, 1, 9]


def test_bbox_and_merge():
    a = np.zeros((10, 10), np.uint8); a[2:5, 3:7] = 1
    b = np.zeros((10, 10), np.uint8); b[6:9, 0:2] = 1
    ra, rb = rle.encode(a), rle.encode(b)
    np.testing.assert_array_equal(rle.to_bbox(ra), [3, 2, 4, 3])
    merged = rle.decode(rle.merge([ra, rb]))
    np.testing.assert_array_equal(merged, np.maximum(a, b))


def test_native_matches_numpy():
    from llmseg_tpu.native import loader
    if not loader.available():
        pytest.skip("native lib unavailable")
    m = _random_mask(123, 77, 9)
    # independent numpy reference for the run decomposition
    flat = np.asarray(m, np.uint8).flatten(order="F")
    change = np.nonzero(np.diff(flat))[0] + 1
    idx = np.concatenate([[0], change, [flat.size]])
    runs = np.diff(idx).tolist()
    if flat[0] == 1:
        runs = [0] + runs
    assert loader.mask_to_counts(m) == runs
    np.testing.assert_array_equal(
        loader.counts_to_mask(np.asarray(runs, np.int64), 123, 77), m)


def test_native_iou_iop():
    from llmseg_tpu.native import loader
    if not loader.available():
        pytest.skip("native lib unavailable")
    gt = _random_mask(50, 50, 10)
    props = np.stack([_random_mask(50, 50, s) for s in range(3)])
    iou, iop = loader.mask_iou_iop(gt, props)
    for i in range(3):
        inter = np.logical_and(gt, props[i]).sum()
        union = np.logical_or(gt, props[i]).sum()
        np.testing.assert_allclose(iou[i], inter / union, rtol=1e-6)
        np.testing.assert_allclose(iop[i], inter / props[i].sum(), rtol=1e-6)


def test_rle_fuzz_vs_pycocotools():
    """Bit-compat with the pycocotools C extension — the reference's wire
    format (amg.py:295-300).  Skips where pycocotools is absent (this image);
    runs wherever it exists."""
    mask_util = pytest.importorskip("pycocotools.mask")
    rng = np.random.RandomState(0)
    for i in range(100):
        h = int(rng.randint(1, 40))
        w = int(rng.randint(1, 40))
        density = rng.rand()
        m = (rng.rand(h, w) < density).astype(np.uint8)
        ref = mask_util.encode(np.asfortranarray(m))
        ours = rle.encode(m)
        assert ours["counts"] == ref["counts"].decode("utf-8"), f"case {i}"
        assert ours["size"] == list(ref["size"])
        np.testing.assert_array_equal(rle.decode(ours),
                                      mask_util.decode(ref))
        assert rle.area(ours) == int(mask_util.area(ref))
        np.testing.assert_allclose(rle.to_bbox(ours),
                                   mask_util.toBbox(ref))


def test_polygon_raster_vs_pycocotools():
    """Polygon -> mask (coco_api.ann_to_rle cv2.fillPoly path) vs
    pycocotools.frPyObjects scanline rasterization.  Boundary pixels can
    legitimately differ by the two rasterizers' fill conventions; require
    IoU > 0.97 rather than equality.  Skips where pycocotools is absent."""
    mask_util = pytest.importorskip("pycocotools.mask")
    from llmseg_tpu.data import coco_api

    rng = np.random.RandomState(0)
    for i in range(20):
        h, w = 50, 60
        n = rng.randint(3, 8)
        cx, cy = rng.rand(2) * [w * 0.6, h * 0.6] + [w * 0.2, h * 0.2]
        ang = np.sort(rng.rand(n) * 2 * np.pi)
        r = rng.rand(n) * 15 + 4
        xs = np.clip(cx + r * np.cos(ang), 0, w - 1)
        ys = np.clip(cy + r * np.sin(ang), 0, h - 1)
        poly = np.stack([xs, ys], -1).reshape(-1).tolist()
        ref = mask_util.decode(mask_util.merge(
            mask_util.frPyObjects([poly], h, w)))
        got = rle.decode(coco_api.ann_to_rle(
            {"segmentation": [poly]}, h, w))
        inter = np.logical_and(ref, got).sum()
        union = np.logical_or(ref, got).sum()
        assert union == 0 or inter / union > 0.97, f"case {i}"


def test_encode_packed_parity():
    """Fused packed-bits encoder (native/rle.cc rle_packed_encode) matches
    the unpacked encode + area + inclusive-edge bbox on random, structured,
    empty, and full masks with padded packing (the AMG download layout)."""
    rng = np.random.default_rng(7)
    for trial in range(24):
        h = int(rng.integers(1, 150))
        w = int(rng.integers(1, 150))
        kind = trial % 4
        if kind == 0:
            m = rng.random((h, w)) < 0.3
        elif kind == 1:
            m = np.zeros((h, w), bool)
        elif kind == 2:
            m = np.ones((h, w), bool)
        else:
            m = np.zeros((h, w), bool)
            m[h // 4:3 * h // 4, w // 4:3 * w // 4] = True
        pad_w = (w + 21 + 7) // 8 * 8
        full = np.zeros((h + 3, pad_w), np.uint8)
        full[:h, :w] = m
        packed = np.packbits(full, axis=-1)
        r, a, bbox = rle.encode_packed(packed, h, w)
        ref = rle.encode(m.astype(np.uint8))
        assert r["counts"] == ref["counts"] and r["size"] == [h, w]
        assert a == rle.area(ref)
        ys, xs = np.nonzero(m)
        if len(xs):
            exp = [float(xs.min()), float(ys.min()),
                   float(xs.max() - xs.min()), float(ys.max() - ys.min())]
        else:
            exp = [0.0, 0.0, 0.0, 0.0]
        assert bbox == exp


def test_encode_packed_numpy_fallback(monkeypatch):
    from llmseg_tpu.native import loader as native_loader

    monkeypatch.setattr(native_loader, "_lib", None)
    monkeypatch.setattr(native_loader, "_tried", True)
    m = np.zeros((9, 13), np.uint8)
    m[2:5, 3:11] = 1
    packed = np.packbits(np.pad(m, ((0, 2), (0, 3))), axis=-1)
    r, a, bbox = rle.encode_packed(packed, 9, 13)
    ref = rle.encode(m)
    assert r["counts"] == ref["counts"]
    assert a == 24 and bbox == [3.0, 2.0, 7.0, 2.0]


# ---------------------------------------------------------------------------
# on-device RLE (ops/device_rle.py): boundary payload vs the golden codec
# ---------------------------------------------------------------------------


def test_device_rle_matches_golden_codec():
    """upscale_rle boundaries -> counts must be byte-identical to
    rle.encode of the identically-upscaled, cropped bitmap — blobby masks,
    empty masks, and speckle (overflow flag honesty) alike."""
    import jax
    import jax.numpy as jnp

    from llmseg_tpu.ops import device_rle

    rng = np.random.default_rng(0)
    S, P = 64, 8
    for trial in range(12):
        h = int(rng.integers(30, S + 1))
        w = int(rng.integers(30, S + 1))
        K = 5
        low = np.full((K, 16, 16), -8.0, np.float32)
        for k in range(K):
            if trial % 4 == 3 and k == 0:
                low[k] = rng.normal(0, 4, (16, 16))  # speckle
            elif not (trial % 4 == 2 and k == 1):    # k==1: leave empty
                cy, cx = rng.integers(2, 14, 2)
                r = int(rng.integers(2, 7))
                yy, xx = np.meshgrid(np.arange(16), np.arange(16),
                                     indexing="ij")
                low[k][(yy - cy) ** 2 + (xx - cx) ** 2 < r ** 2] = 8.0
        payload16, meta32 = device_rle.upscale_rle(
            jnp.asarray(low), jnp.asarray([h, w], jnp.int32), (S, S),
            0.0, bucket=K, max_per_col=P)
        payload16, meta32 = np.asarray(payload16), np.asarray(meta32)
        up = np.asarray(jax.image.resize(
            jnp.asarray(low, jnp.float32)[..., None], (K, S, S, 1),
            method="bilinear"))[..., 0]
        bits = (up > 0.0)[:, :h, :w]
        got = device_rle.annotations_from_rle_payload(
            payload16, meta32, K, h, w, S, P)
        for k in range(K):
            ref = rle.encode(bits[k].astype(np.uint8))
            if got[k] is None:  # overflow flagged: must be genuinely >P runs
                per_col = max(len(rle.mask_to_counts(bits[k][:, j:j + 1]))
                              for j in range(w))
                assert meta32[k][6] == 1 and per_col >= P
                continue
            r_got, a_got, bbox_got = got[k]
            assert r_got["counts"] == ref["counts"], (trial, k)
            assert a_got == rle.area(ref)
            ys, xs = np.nonzero(bits[k])
            if len(xs):
                assert bbox_got == [float(xs.min()), float(ys.min()),
                                    float(xs.max() - xs.min()),
                                    float(ys.max() - ys.min())]
