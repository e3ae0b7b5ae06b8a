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


def test_fused_1pass_adversarial_norms():
    """The fused single-pass kernel bounds the row max by |q|*max|k|
    (Cauchy-Schwarz).  Stress the bound's looseness: near-orthogonal
    big-norm q/k (worst case for bound-minus-max gap, firing the in-kernel
    exact-max rescue) plus ragged key padding must still match XLA, and
    the DINO/CLIP-like shape must route through the one-pass path (single
    k-block, the default)."""
    rng = np.random.RandomState(0)
    B, T, S, H, D = 1, 200, 300, 2, 64
    # orthogonal-ish construction: q lives in dims [0:32), k in [32:64)
    # with a tiny shared component so logits are small but nonzero while
    # norms are huge
    q = np.zeros((B, T, H, D), np.float32)
    k = np.zeros((B, S, H, D), np.float32)
    q[..., :32] = rng.randn(B, T, H, 32) * 30.0
    k[..., 32:] = rng.randn(B, S, H, 32) * 30.0
    q[..., 32] = rng.randn(B, T, H) * 0.3     # small overlap channel
    v = rng.randn(B, S, H, D).astype(np.float32)
    q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    out = A.flash_attention(q, k, v)          # S<=4608 -> single k-block
    out_ref = A.attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=5e-5, rtol=5e-5)


def test_fused_1pass_routing(monkeypatch):
    """The one-pass kernel is the DEFAULT inference primal for non-causal
    single-k-block shapes (the r5 rework keeps the Cauchy bound as a row
    term and the rescue on the same s tile, so it fits Mosaic's scoped
    vmem at every grid — unlike the r4 fused-lane variant).  Causal shapes
    and the escape hatch (LLMSEG_ATTN_ONEPASS=0) keep the exact-max
    kernel; the grad path always does."""
    calls = []
    orig = A._flash_fwd_1pass

    def spy(*a, **k):
        calls.append(k.get("block_q"))
        return orig(*a, **k)

    monkeypatch.setattr(A, "_flash_fwd_1pass", spy)
    q, k, v = _make(T=300, S=300, D=64, dtype=jnp.bfloat16)
    A.flash_attention(q, k, v)
    assert len(calls) == 1     # default: one-pass
    A.flash_attention(q, k, v, causal=True)
    assert len(calls) == 1     # causal keeps the exact-max kernel
    monkeypatch.setattr(A, "ONEPASS", False)
    A.flash_attention(q, k, v)
    assert len(calls) == 1     # opted out: exact-max kernel
    # grad path: exact-max forward (its lse feeds the backward kernels)
    monkeypatch.setattr(A, "ONEPASS", True)
    q32, k32, v32 = (x.astype(jnp.float32) for x in (q, k, v))
    jax.grad(lambda a: jnp.sum(A.flash_attention(a, k32, v32)))(q32)
    assert len(calls) == 1


def test_fused_1pass_matches_exact_max_kernel():
    """One-pass (inference primal) vs the exact-max kernel (grad-path
    forward) on identical inputs: same softmax, different stabilizer."""
    q, k, v = _make(T=384, S=384, D=64, dtype=jnp.bfloat16, seed=3)
    out1 = A.flash_attention(q, k, v)                       # 1-pass route
    # force the multi-block (exact-max) kernel by shrinking block_k
    q32, k32, v32 = (x.astype(jnp.float32) for x in (q, k, v))
    out_ref = A.attention_xla(q32, k32, v32)
    np.testing.assert_allclose(np.asarray(out1, np.float32), out_ref,
                               atol=2e-2, rtol=2e-2)
    # and its gradient path (exact-max fwd + custom bwd) still works
    g = jax.grad(lambda a: jnp.sum(jnp.sin(
        A.flash_attention(a, k32, v32, block_q=128, block_k=128))))(q32)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("transposed", [False, True])
def test_fused_1pass_variants_match_xla(transposed, monkeypatch):
    """Both one-pass layouts (straight and transposed-output) match XLA on
    the DINO/CLIP-like non-causal single-k-block shape, including ragged
    key padding and the adversarial Cauchy-bound rescue."""
    monkeypatch.setattr(A, "ONEPASS", True)
    monkeypatch.setattr(A, "ONEPASS_T", transposed)
    q, k, v = _make(T=200, S=300, D=64, dtype=jnp.float32, seed=7)
    out = A.flash_attention(q, k, v)
    out_ref = A.attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=2e-5, rtol=2e-5)
    # rescue branch: near-orthogonal huge-norm q/k
    rng = np.random.RandomState(1)
    B, T, S, H, D = 1, 200, 300, 2, 64
    qa = np.zeros((B, T, H, D), np.float32)
    ka = np.zeros((B, S, H, D), np.float32)
    qa[..., :32] = rng.randn(B, T, H, 32) * 30.0
    ka[..., 32:] = rng.randn(B, S, H, 32) * 30.0
    qa[..., 32] = rng.randn(B, T, H) * 0.3
    va = rng.randn(B, S, H, D).astype(np.float32)
    out = A.flash_attention(jnp.asarray(qa), jnp.asarray(ka),
                            jnp.asarray(va))
    out_ref = A.attention_xla(jnp.asarray(qa), jnp.asarray(ka),
                              jnp.asarray(va))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=5e-5, rtol=5e-5)
