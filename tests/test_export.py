"""SAM decoder export (SURVEY M15 equivalent): serialize -> load -> call
matches the in-process decoder."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llmseg_tpu import config as C
from llmseg_tpu.models.sam import export as ex
from llmseg_tpu.models.sam import sam as sam_lib


@pytest.fixture(scope="module")
def tiny_sam():
    cfg = C.sam_tiny()
    params = sam_lib.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _inputs(cfg, batch=2, n_points=1, seed=1):
    rng = np.random.RandomState(seed)
    S = cfg.prompt.image_embedding_size
    D = cfg.prompt.embed_dim
    emb = rng.randn(1, S, S, D).astype(np.float32)
    pts = (rng.rand(batch, n_points, 2) * cfg.encoder.img_size
           ).astype(np.float32)
    lbl = np.ones((batch, n_points), np.int32)
    mask_in = np.zeros((batch, 4 * S, 4 * S, 1), np.float32)
    return emb, pts, lbl, mask_in


def test_export_roundtrip_matches_decode(tiny_sam, tmp_path):
    cfg, params = tiny_sam
    emb, pts, lbl, mask_in = _inputs(cfg)
    path = str(tmp_path / "decoder.stablehlo")
    ex.save_decoder(path, params, cfg, batch=2, n_points=1)
    dec = ex.load_decoder(path)
    up, scores, low = dec(emb, pts, lbl, mask_in, np.float32(0.0))

    ref_masks, ref_scores = sam_lib.decode_masks(
        params, cfg, jnp.asarray(emb), points=jnp.asarray(pts),
        labels=jnp.asarray(lbl), multimask_output=True)
    # exported program returns ALL mask tokens (predict_masks); multimask
    # slice is tokens 1:
    np.testing.assert_allclose(np.asarray(low)[:, 1:], np.asarray(ref_masks),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(scores)[:, 1:],
                               np.asarray(ref_scores), atol=1e-4)
    assert up.shape == (2, low.shape[1], cfg.encoder.img_size,
                        cfg.encoder.img_size)


def test_export_single_mask_and_metrics(tiny_sam):
    cfg, params = tiny_sam
    emb, pts, lbl, mask_in = _inputs(cfg)
    fn = ex.make_decoder_fn(params, cfg, return_single_mask=True,
                            return_extra_metrics=True, orig_hw=(48, 64))
    up, scores, stab, areas, low = fn(
        jnp.asarray(emb), jnp.asarray(pts), jnp.asarray(lbl),
        jnp.asarray(mask_in), jnp.asarray(0.0))
    assert up.shape == (2, 1, 48, 64)
    assert scores.shape == (2, 1)
    assert stab.shape == (2, 1)
    assert np.isfinite(np.asarray(stab)).all()
    assert low.shape[1] == 1   # single-mask selection applied


def test_export_mask_input_blend(tiny_sam):
    cfg, params = tiny_sam
    emb, pts, lbl, mask_in = _inputs(cfg)
    rng = np.random.RandomState(3)
    mask_in = rng.randn(*mask_in.shape).astype(np.float32)
    fn = ex.make_decoder_fn(params, cfg)
    out0 = fn(jnp.asarray(emb), jnp.asarray(pts), jnp.asarray(lbl),
              jnp.asarray(mask_in), jnp.asarray(0.0))[0]
    out1 = fn(jnp.asarray(emb), jnp.asarray(pts), jnp.asarray(lbl),
              jnp.asarray(mask_in), jnp.asarray(1.0))[0]
    # has_mask_input toggles the dense path: outputs must differ
    assert float(jnp.max(jnp.abs(out0 - out1))) > 1e-6


def test_serving_export_roundtrip(tmp_path):
    """Full LLM-Seg predict program: serialize -> load -> call matches the
    in-process model."""
    import jax

    from llmseg_tpu import config as C, serving
    from llmseg_tpu.data.synthetic import make_batch
    from llmseg_tpu.models import llmseg

    cfg = C.llmseg_tiny()
    params = llmseg.init(jax.random.PRNGKey(0), cfg)
    batch = make_batch(cfg, num_images=1, rows_per_image=1, text_len=32)
    path = str(tmp_path / "predict.stablehlo")
    serving.save_predict(path, params, cfg, num_images=1, rows=1,
                         text_len=32, dtype=jnp.float32)
    served = serving.load_predict(path)
    # exported signature excludes host-only keys (labels/gt) — match it
    shapes = serving.predict_arg_shapes(cfg, num_images=1, rows=1,
                                        text_len=32, dtype=jnp.float32)
    got = served({k: batch[k] for k in shapes})
    ref = llmseg.predict(params, cfg, batch)
    np.testing.assert_allclose(np.asarray(got["pred_similarity"]),
                               np.asarray(ref["pred_similarity"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got["pred_iou"]),
                               np.asarray(ref["pred_iou"]), atol=2e-5)


def test_serving_export_roundtrip_w8a8(tmp_path):
    """A W8A8-quantized predict program exports and round-trips: int8
    weights bake in as constants and the s8 x s8 dots survive StableHLO
    serialization (quantized serving artifact, reference load_8bit
    deployment analog)."""
    import jax

    from llmseg_tpu import config as C, serving
    from llmseg_tpu.data.synthetic import make_batch
    from llmseg_tpu.models import llmseg
    from llmseg_tpu.ops import quant

    cfg = C.llmseg_tiny()
    params = llmseg.init(jax.random.PRNGKey(0), cfg)
    quant.quantize_llama_inplace(params["llava"]["llm"], bits=8, w8a8=True)
    batch = make_batch(cfg, num_images=1, rows_per_image=1, text_len=32)
    ref = llmseg.predict(params, cfg, batch)
    path = str(tmp_path / "predict_w8a8.stablehlo")
    serving.save_predict(path, params, cfg, num_images=1, rows=1,
                         text_len=32, dtype=jnp.float32)
    served = serving.load_predict(path)
    shapes = serving.predict_arg_shapes(cfg, num_images=1, rows=1,
                                        text_len=32, dtype=jnp.float32)
    got = served({k: batch[k] for k in shapes})
    np.testing.assert_allclose(np.asarray(got["pred_similarity"]),
                               np.asarray(ref["pred_similarity"]), atol=2e-5)
