import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llmseg_tpu.ops import attention as A


def _make(B=2, T=128, S=128, H=2, D=32, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, T, H, D), dtype)
    k = jax.random.normal(ks[1], (B, S, H, D), dtype)
    v = jax.random.normal(ks[2], (B, S, H, D), dtype)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("T,S,D", [(128, 128, 32), (160, 96, 40), (256, 256, 64)])
def test_flash_matches_xla_forward(causal, T, S, D):
    q, k, v = _make(T=T, S=S, D=D)
    out_ref = A.attention_xla(q, k, v, causal=causal)
    out = A.flash_attention(q, k, v, causal=causal, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_xla_grads(causal):
    # Small shapes: interpret mode on CPU is slow.  On a real TPU this same
    # comparison holds to ~1e-4; CPU-interpret dots are lower precision, so
    # the tolerance here is loose (the fwd tests pin down exactness).
    q, k, v = _make(B=1, T=64, S=64, H=2, D=32)

    def loss_flash(q, k, v):
        o = A.flash_attention(q, k, v, causal=causal, block_q=32, block_k=32)
        return jnp.sum(jnp.sin(o))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.sin(A.attention_xla(q, k, v, causal=causal)))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=5e-3)


def test_flash_bf16_close():
    q, k, v = _make(T=256, S=256, D=64, dtype=jnp.bfloat16)
    out_ref = A.attention_xla(q.astype(jnp.float32), k.astype(jnp.float32),
                              v.astype(jnp.float32), causal=True)
    out = A.flash_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(out_ref), atol=2e-2, rtol=2e-2)


def test_attention_bias_path():
    q, k, v = _make(T=32, S=48, D=16)
    bias = jnp.where(jnp.arange(48)[None, None, None, :] < 20, 0.0, A.NEG_INF)
    out = A.attention(q, k, v, bias=bias, impl="xla")
    out_trunc = A.attention(q, k[:, :20], v[:, :20], impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_trunc),
                               atol=1e-5, rtol=1e-5)


def test_flash_key_padding_masked():
    # flash masks padded key columns internally: compare S=100 (padded to 128)
    q, k, v = _make(T=128, S=100, D=32)
    out = A.flash_attention(q, k, v, block_q=128, block_k=128)
    out_ref = A.attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=2e-5, rtol=2e-5)
