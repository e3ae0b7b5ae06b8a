import jax
import jax.numpy as jnp
import numpy as np

from llmseg_tpu import config as C
from llmseg_tpu.models.sam import amg as amg_lib
from llmseg_tpu.models.sam import image_encoder, sam as sam_lib


def test_window_partition_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 10, 8))
    win, hp_wp = image_encoder.window_partition(x, 4)
    assert win.shape == (2 * 3 * 3, 4, 4, 8)
    back = image_encoder.window_unpartition(win, 4, hp_wp, (10, 10))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-6)


def test_rel_pos_bias_shape():
    q = jax.random.normal(jax.random.PRNGKey(1), (3, 2, 16, 8))
    rel = jnp.zeros((2 * 4 - 1, 8))
    bias = image_encoder.decomposed_rel_pos_bias(q, rel, rel, 4)
    assert bias.shape == (3, 2, 16, 16)
    np.testing.assert_allclose(np.asarray(bias), 0.0)


def test_sam_tiny_forward_shapes():
    cfg = C.sam_tiny()
    params = sam_lib.init(jax.random.PRNGKey(0), cfg)
    img = jnp.zeros((1, 48, 64, 3), jnp.float32)   # non-square, pre-resize
    points = jnp.array([[[10.0, 20.0]], [[30.0, 8.0]]])  # 2 prompts x 1 point
    labels = jnp.ones((2, 1), jnp.int32)
    masks, iou = sam_lib.forward(params, cfg, img, points=points,
                                 labels=labels, multimask_output=True)
    S4 = cfg.prompt.image_embedding_size * 4
    assert masks.shape == (2, 3, S4, S4)
    assert iou.shape == (2, 3)
    assert np.isfinite(np.asarray(masks)).all()


def test_sam_encoder_jit_consistency():
    cfg = C.sam_tiny()
    params = sam_lib.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3))
    xp = sam_lib.preprocess(x, cfg)
    e1 = sam_lib.encode_image(params, xp, cfg)
    e2 = jax.jit(lambda p, x: sam_lib.encode_image(p, x, cfg))(params, xp)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2),
                               rtol=2e-5, atol=2e-5)


def test_postprocess_masks_shapes():
    cfg = C.sam_tiny()
    masks = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 16, 16))
    out = sam_lib.postprocess_masks(masks, (48, 64), (300, 400), cfg)
    assert out.shape == (2, 3, 300, 400)


def test_amg_tiny_end_to_end():
    cfg = C.sam_tiny()
    amg_cfg = C.AMGConfig(points_per_side=4, points_per_batch=8,
                          pred_iou_thresh=-1e9, stability_score_thresh=-1.0,
                          box_nms_thresh=0.7, max_masks=16)
    params = sam_lib.init(jax.random.PRNGKey(0), cfg)
    gen = amg_lib.AutomaticMaskGenerator(params, cfg, amg_cfg)
    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, (48, 64, 3), np.uint8)
    anns = gen.generate(image)
    # untrained net: no guarantee of survivors, but schema must hold if any
    for a in anns:
        assert set(a) == {"segmentation", "area", "bbox", "predicted_iou",
                          "point_coords", "stability_score", "crop_box"}
        assert a["segmentation"]["size"] == [48, 64]
        assert a["crop_box"] == [0, 0, 64, 48]
        assert a["area"] > 0
    # areas sorted descending
    areas = [a["area"] for a in anns]
    assert areas == sorted(areas, reverse=True)
