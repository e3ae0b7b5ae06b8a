import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llmseg_tpu import config as C
from llmseg_tpu.models import llama, llava


def test_llama_shapes_and_causality():
    cfg = C.llama_tiny()
    params = llama.init(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0, cfg.vocab_size)
    h = llama.apply(params, cfg, input_ids=ids)
    assert h.shape == (2, 32, cfg.hidden_size)
    lg = llama.logits(params, cfg, h)
    assert lg.shape == (2, 32, cfg.vocab_size) and lg.dtype == jnp.float32

    # causality: perturb token 20, hidden states < 20 unchanged
    ids2 = ids.at[:, 20].set((ids[:, 20] + 1) % cfg.vocab_size)
    h2 = llama.apply(params, cfg, input_ids=ids2)
    np.testing.assert_allclose(np.asarray(h[:, :20]), np.asarray(h2[:, :20]),
                               atol=1e-5, rtol=1e-5)
    assert np.abs(np.asarray(h[:, 20:]) - np.asarray(h2[:, 20:])).max() > 1e-4


@pytest.mark.slow
def test_lora_noop_at_init_then_trains():
    cfg = C.llama_tiny()
    lcfg = C.LoraConfig(rank=4)
    params = llama.init(jax.random.PRNGKey(0), cfg)
    lora = llama.lora_init(jax.random.PRNGKey(1), cfg, lcfg)
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 16), 0, cfg.vocab_size)
    h0 = llama.apply(params, cfg, input_ids=ids)
    h1 = llama.apply(params, cfg, input_ids=ids, lora=lora, lora_cfg=lcfg)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), atol=1e-6)

    def loss(lora):
        h = llama.apply(params, cfg, input_ids=ids, lora=lora, lora_cfg=lcfg)
        return jnp.sum(h ** 2)

    g = jax.grad(loss)(lora)
    ga = np.abs(np.asarray(g["layers"][0]["q"]["a"])).max()
    gb = np.abs(np.asarray(g["layers"][0]["q"]["b"])).max()
    assert gb > 0  # b gets gradient through a != 0
    assert np.isfinite(ga)


def test_splice_image_tokens():
    B, T, N, D = 2, 6, 3, 4
    text = jnp.arange(B * T * D, dtype=jnp.float32).reshape(B, T, D)
    img = -jnp.arange(B * N * D, dtype=jnp.float32).reshape(B, N, D) - 1
    pos = jnp.array([2, 0])
    out = llava.splice_image_tokens(text, img, pos)
    assert out.shape == (B, T + N - 1, D)
    t, i = np.asarray(text), np.asarray(img)
    # row 0: [t0, t1, i0, i1, i2, t3, t4, t5]
    expect0 = np.concatenate([t[0, :2], i[0], t[0, 3:]], axis=0)
    np.testing.assert_array_equal(np.asarray(out[0]), expect0)
    # row 1: [i0, i1, i2, t1..t5]
    expect1 = np.concatenate([i[1], t[1, 1:]], axis=0)
    np.testing.assert_array_equal(np.asarray(out[1]), expect1)


def test_splice_labels():
    labels = jnp.array([[1, 2, 3, 4]])
    out = llava.splice_labels(labels, jnp.array([1]), 3)
    np.testing.assert_array_equal(np.asarray(out),
                                  [[1, -100, -100, -100, 3, 4]])


def test_causal_lm_loss():
    logits = jnp.zeros((1, 4, 10))
    labels = jnp.array([[llava.IGNORE_INDEX, 3, llava.IGNORE_INDEX, 5]])
    loss = llava.causal_lm_loss(logits, labels)
    # uniform logits: loss = log(10), averaged over the 2 valid targets
    np.testing.assert_allclose(float(loss), np.log(10), rtol=1e-5)


def test_llava_forward_tiny():
    cfg = C.llava_tiny()
    params = llava.init(jax.random.PRNGKey(0), cfg)
    R, T = 2, 20
    ids = jax.random.randint(jax.random.PRNGKey(1), (R, T), 0,
                             cfg.llm.vocab_size)
    images = jax.random.normal(jax.random.PRNGKey(2),
                               (R, cfg.vision.img_size, cfg.vision.img_size, 3))
    pos = jnp.array([1, 1])
    h = llava.forward(params, cfg, input_ids=ids, image_pos=pos, images=images)
    assert h.shape == (R, T + cfg.num_image_tokens - 1, cfg.llm.hidden_size)
    assert np.isfinite(np.asarray(h)).all()
