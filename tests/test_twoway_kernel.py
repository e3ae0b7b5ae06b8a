"""Fused two-way transformer / decode kernel vs the XLA reference path.

Runs in Pallas interpret mode on CPU (tiny shapes); the same kernel code
compiles natively on TPU where mask_decoder.predict_masks auto-routes
AMG-scale prompt batches to it.
"""

import jax
import jax.numpy as jnp
import pytest

from llmseg_tpu.config import SamDecoderConfig
from llmseg_tpu.models.sam import mask_decoder
from llmseg_tpu.models.sam import two_way_transformer as twt
from llmseg_tpu.ops.twoway_kernel import fused_decode_apply, fused_twoway_apply


@pytest.fixture(scope="module")
def tiny_cfg():
    return SamDecoderConfig(transformer_dim=64, transformer_depth=2,
                            transformer_num_heads=8, transformer_mlp_dim=128,
                            iou_head_hidden_dim=32, iou_head_depth=3)


def test_fused_twoway_matches_xla():
    dim, nh = 64, 4
    p = twt.init(jax.random.PRNGKey(0), depth=2, dim=dim, num_heads=nh,
                 mlp_dim=128, dtype=jnp.float32)
    B, S, N = 3, 8, 7
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, S, S, dim)) * 0.5
    pe = jax.random.normal(jax.random.PRNGKey(2), (S, S, dim)) * 0.5
    pts = jax.random.normal(jax.random.PRNGKey(3), (B, N, dim)) * 0.5
    q0, k0 = twt.apply(p, emb, pe, pts, nh, impl="xla")
    q1, k1 = fused_twoway_apply(p, emb, pe, pts, nh)
    assert jnp.abs(q0 - q1).max() < 1e-5
    assert jnp.abs(k0 - k1).max() < 1e-5


def test_fused_decode_matches_predict_masks(tiny_cfg):
    cfg = tiny_cfg
    d = cfg.transformer_dim
    p = mask_decoder.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    B, S = 4, 8
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, S, S, d)) * 0.5
    pe = jax.random.normal(jax.random.PRNGKey(2), (S, S, d)) * 0.5
    sparse = jax.random.normal(jax.random.PRNGKey(3), (B, 2, d)) * 0.5
    dense = jax.random.normal(jax.random.PRNGKey(4), (B, S, S, d)) * 0.1

    m0, i0 = mask_decoder.predict_masks(p, cfg, emb, pe, sparse, dense)
    num_tokens = cfg.num_multimask_outputs + 1
    out_tok = jnp.concatenate([p["iou_token"], p["mask_tokens"]], axis=0)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(out_tok[None], (B, num_tokens + 1, d)), sparse],
        axis=1)
    m1, i1 = fused_decode_apply(p["transformer"], p, emb + dense, pe, tokens,
                                cfg.transformer_num_heads)
    assert m1.shape == (B, num_tokens, 4 * S, 4 * S)
    assert jnp.abs(m0 - m1).max() < 1e-5
    assert jnp.abs(i0 - i1).max() < 1e-5


def test_fused_decode_bf16_close(tiny_cfg):
    """bf16 params/inputs: fused kernel tracks the XLA path within bf16 noise."""
    cfg = tiny_cfg
    d = cfg.transformer_dim
    p = mask_decoder.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    B, S = 2, 8
    emb = (jax.random.normal(jax.random.PRNGKey(1), (B, S, S, d)) * 0.5
           ).astype(jnp.bfloat16)
    pe = (jax.random.normal(jax.random.PRNGKey(2), (S, S, d)) * 0.5
          ).astype(jnp.bfloat16)
    sparse = (jax.random.normal(jax.random.PRNGKey(3), (B, 2, d)) * 0.5
              ).astype(jnp.bfloat16)
    dense = jnp.zeros((B, S, S, d), jnp.bfloat16)

    m0, i0 = mask_decoder.predict_masks(p, cfg, emb, pe, sparse, dense)
    num_tokens = cfg.num_multimask_outputs + 1
    out_tok = jnp.concatenate([p["iou_token"], p["mask_tokens"]], axis=0)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(out_tok[None], (B, num_tokens + 1, d)), sparse],
        axis=1)
    m1, i1 = fused_decode_apply(p["transformer"], p, emb, pe, tokens,
                                cfg.transformer_num_heads)
    scale = float(jnp.abs(m0.astype(jnp.float32)).max()) + 1e-6
    assert float(jnp.abs(m0.astype(jnp.float32)
                         - m1.astype(jnp.float32)).max()) / scale < 0.05


def test_fused_decode_shared_base_matches_broadcast(tiny_cfg):
    """AMG case: (1, S, S, C) image + B prompts takes the shared-base kernel
    (base never broadcast, block-1 projections hoisted) and must equal the
    per-prompt-broadcast path exactly."""
    cfg = tiny_cfg
    d = cfg.transformer_dim
    p = mask_decoder.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    B, S = 4, 8
    emb1 = jax.random.normal(jax.random.PRNGKey(1), (1, S, S, d)) * 0.5
    pe = jax.random.normal(jax.random.PRNGKey(2), (S, S, d)) * 0.5
    sparse = jax.random.normal(jax.random.PRNGKey(3), (B, 2, d)) * 0.5

    num_tokens = cfg.num_multimask_outputs + 1
    out_tok = jnp.concatenate([p["iou_token"], p["mask_tokens"]], axis=0)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(out_tok[None], (B, num_tokens + 1, d)), sparse],
        axis=1)
    # broadcast (per-prompt) fused path
    embB = jnp.broadcast_to(emb1, (B, S, S, d))
    m0, i0 = fused_decode_apply(p["transformer"], p, embB, pe, tokens,
                                cfg.transformer_num_heads)
    # shared-base fused path
    m1, i1 = fused_decode_apply(p["transformer"], p, emb1, pe, tokens,
                                cfg.transformer_num_heads)
    assert jnp.abs(m0 - m1).max() < 1e-5
    assert jnp.abs(i0 - i1).max() < 1e-5
    # and against the unfused reference math
    m2, i2 = mask_decoder.predict_masks(
        p, cfg, emb1, pe, sparse, jnp.zeros((B, S, S, d)))
    assert jnp.abs(m2 - m1).max() < 1e-5
    assert jnp.abs(i2 - i1).max() < 1e-5


def test_should_fuse_rejects_per_batch_pe():
    from llmseg_tpu.ops.twoway_kernel import should_fuse

    pe_shared3 = jnp.zeros((8, 8, 16))
    pe_shared4 = jnp.zeros((1, 8, 8, 16))
    pe_batched = jnp.zeros((4, 8, 8, 16))
    # per-batch pe is unsupported by the fused kernel: must always fall back
    assert not should_fuse(64, 4096, pe_batched)
    # shared pe decisions depend only on scale/backend (False here: CPU)
    import jax as _jax
    expect = _jax.default_backend() == "tpu"
    assert should_fuse(64, 4096, pe_shared3) == expect
    assert should_fuse(64, 4096, pe_shared4) == expect
    assert not should_fuse(4, 4096, pe_shared3)      # too few prompts
    assert not should_fuse(64, 256, pe_shared3)      # too few image tokens


def test_fused_route_differentiable(tiny_cfg):
    """grad through predict_masks with the fused route forced: the
    custom_vjp falls back to the XLA tail for forward+backward (the Pallas
    kernel is forward-only), so a --train_mask_decoder-style loss works at
    any prompt count and matches the impl="xla" gradients exactly."""
    cfg = tiny_cfg
    d = cfg.transformer_dim
    p = mask_decoder.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    B, S = 9, 8           # >= 8 prompts: the auto threshold on TPU
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, S, S, d)) * 0.5
    pe = jax.random.normal(jax.random.PRNGKey(2), (S, S, d)) * 0.5
    sparse = jax.random.normal(jax.random.PRNGKey(3), (B, 2, d)) * 0.5
    dense = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(4), (1, S, S, d)) * 0.1,
        (B, S, S, d))

    def loss(params, impl):
        m, i = mask_decoder.predict_masks(params, cfg, emb, pe, sparse,
                                          dense, impl=impl)
        return (jnp.mean(m.astype(jnp.float32) ** 2)
                + jnp.mean(i.astype(jnp.float32)))

    g_fused = jax.grad(lambda q: loss(q, "fused"))(p)
    g_xla = jax.grad(lambda q: loss(q, "xla"))(p)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), g_fused, g_xla)
    mx = max(jax.tree.leaves(diffs))
    assert mx < 1e-5, mx

    # value path under grad also uses the XLA tail (consistent fwd/bwd)
    v_fused = loss(p, "xla")
    v = jax.value_and_grad(lambda q: loss(q, "fused"))(p)[0]
    assert abs(float(v) - float(v_fused)) < 1e-6


def test_factored_decode_matches_xla(tiny_cfg):
    """The low-rank factored shared-base decode (keys state kept as
    rho(x)(base sigma) + A B, LayerNorms in closed form) reproduces the
    reference-structured path exactly in fp32."""
    from llmseg_tpu.ops.twoway_kernel import factored_decode_ref

    cfg = tiny_cfg
    d = cfg.transformer_dim
    p = mask_decoder.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    B, S = 5, 8
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, S, S, d)) * 0.5
    pe = jax.random.normal(jax.random.PRNGKey(2), (S, S, d)) * 0.5
    sparse = jax.random.normal(jax.random.PRNGKey(3), (B, 2, d)) * 0.5
    dense = jax.random.normal(jax.random.PRNGKey(4), (1, S, S, d)) * 0.1

    m0, i0 = mask_decoder.predict_masks(
        p, cfg, emb, pe, sparse, jnp.broadcast_to(dense, (B, S, S, d)),
        impl="xla")
    num_tokens = cfg.num_multimask_outputs + 1
    out_tok = jnp.concatenate([p["iou_token"], p["mask_tokens"]], axis=0)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(out_tok[None], (B, num_tokens + 1, d)), sparse],
        axis=1)
    m1, i1 = factored_decode_ref(p["transformer"], p, emb + dense, pe,
                                 tokens, cfg.transformer_num_heads)
    assert m1.shape == m0.shape
    assert jnp.abs(m0 - m1).max() < 2e-4, jnp.abs(m0 - m1).max()
    assert jnp.abs(i0 - i1).max() < 2e-5, jnp.abs(i0 - i1).max()
