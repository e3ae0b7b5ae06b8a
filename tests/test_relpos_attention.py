import numpy as np

import jax
import jax.numpy as jnp

from llmseg_tpu.models.sam.image_encoder import decomposed_rel_pos_bias
from llmseg_tpu.ops.attention import attention_xla
from llmseg_tpu.ops.relpos_attention import relpos_flash_attention


def test_relpos_flash_matches_xla_bias_path():
    G, H, D = 16, 2, 32       # T = 256 tokens
    T = G * G
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(ks[0], (1, T, H, D))
    k = jax.random.normal(ks[1], (1, T, H, D))
    v = jax.random.normal(ks[2], (1, T, H, D))
    rel_h = 0.1 * jax.random.normal(ks[3], (2 * G - 1, D))
    rel_w = 0.1 * jax.random.normal(ks[4], (2 * G - 1, D))

    bias = decomposed_rel_pos_bias(q.transpose(0, 2, 1, 3), rel_h, rel_w, G)
    ref = attention_xla(q, k, v, bias=bias)
    got = relpos_flash_attention(q, k, v, rel_h, rel_w, G, block_q=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_relpos_flash_bf16():
    G, H, D = 16, 2, 64
    T = G * G
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    q = jax.random.normal(ks[0], (1, T, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (1, T, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (1, T, H, D), jnp.bfloat16)
    rel_h = (0.1 * jax.random.normal(ks[3], (2 * G - 1, D))).astype(jnp.bfloat16)
    rel_w = (0.1 * jax.random.normal(ks[4], (2 * G - 1, D))).astype(jnp.bfloat16)
    bias = decomposed_rel_pos_bias(
        q.transpose(0, 2, 1, 3).astype(jnp.float32),
        rel_h.astype(jnp.float32), rel_w.astype(jnp.float32), G)
    ref = attention_xla(q.astype(jnp.float32), k.astype(jnp.float32),
                        v.astype(jnp.float32), bias=bias)
    got = relpos_flash_attention(q, k, v, rel_h, rel_w, G, block_q=256)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)


def test_flash_attention_bias_matches_xla():
    from llmseg_tpu.ops.attention import flash_attention_bias

    B, T, H, D = 2, 196, 2, 16
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    q = jax.random.normal(ks[0], (B, T, H, D))
    k = jax.random.normal(ks[1], (B, T, H, D))
    v = jax.random.normal(ks[2], (B, T, H, D))
    bias = 0.5 * jax.random.normal(ks[3], (B * H, T, T))
    ref = attention_xla(q, k, v, bias=bias.reshape(B, H, T, T))
    got = flash_attention_bias(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_attention_bias_broadcast():
    from llmseg_tpu.ops.attention import flash_attention_bias

    B, T, H, D = 2, 64, 2, 16
    ks = jax.random.split(jax.random.PRNGKey(4), 4)
    q = jax.random.normal(ks[0], (B, T, H, D))
    bias = 0.5 * jax.random.normal(ks[3], (1, T, T))
    ref = attention_xla(q, q, q, bias=bias[None])
    got = flash_attention_bias(q, q, q, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
