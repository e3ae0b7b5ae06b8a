"""SAM ViT image encoder, TPU-first.

Capability parity with reference model/segment_anything/modeling/
image_encoder.py:17-426 (ViT-H/L/B: windowed attention with global layers,
decomposed relative position bias, conv neck to 256 channels), re-designed
for XLA:

  * NHWC layout end-to-end (TPU conv/native layout; torch reference is NCHW).
  * Window partition is a static reshape/transpose — batch of 64 windows x
    196 tokens feeds the MXU as one big batched matmul, no dynamic shapes.
  * Decomposed rel-pos bias is computed with two einsums and added to logits
    (same math as reference add_decomposed_rel_pos:321-392) — the (q, rel)
    einsum never materializes the full (T, S, D) tensor.
  * Patch embedding is a reshape+matmul (see layers.patch_embed).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from llmseg_tpu.config import SamEncoderConfig
from llmseg_tpu.models import layers as L


# ---------------------------------------------------------------------------
# Relative position bias (decomposed)
# ---------------------------------------------------------------------------


def _rel_pos_table(rel_pos: jnp.ndarray, q_size: int, k_size: int) -> jnp.ndarray:
    """Select relative positional embeddings (reference get_rel_pos:321-357).

    rel_pos: (2*max(q,k)-1, head_dim) table; returns (q_size, k_size, head_dim).
    Assumes q_size == k_size (always true here), so no interpolation needed.
    """
    max_rel_dist = 2 * max(q_size, k_size) - 1
    assert rel_pos.shape[0] == max_rel_dist, (
        f"rel_pos table {rel_pos.shape[0]} != {max_rel_dist}")
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


def decomposed_rel_pos_bias(q: jnp.ndarray, rel_pos_h: jnp.ndarray,
                            rel_pos_w: jnp.ndarray, hw: int) -> jnp.ndarray:
    """Bias (B, H, q_h*q_w, k_h*k_w) from decomposed rel-pos tables.

    q: (B, heads, q_h*q_w, head_dim) with square hw x hw grids.
    Matches reference add_decomposed_rel_pos:360-392 (einsum bhwc,hkc->bhwk).
    """
    B, H, _, D = q.shape
    Rh = _rel_pos_table(rel_pos_h, hw, hw)            # (hw, hw, D)
    Rw = _rel_pos_table(rel_pos_w, hw, hw)
    qr = q.reshape(B, H, hw, hw, D).astype(jnp.float32)
    rel_h = jnp.einsum("bnhwc,hkc->bnhwk", qr, Rh.astype(jnp.float32))
    rel_w = jnp.einsum("bnhwc,wkc->bnhwk", qr, Rw.astype(jnp.float32))
    bias = rel_h[..., :, None] + rel_w[..., None, :]   # (B,H,hw,hw,hw,hw)
    return bias.reshape(B, H, hw * hw, hw * hw)


# ---------------------------------------------------------------------------
# Attention block
# ---------------------------------------------------------------------------


def attn_init(key, dim: int, num_heads: int, use_rel_pos: bool,
              input_size: int, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    head_dim = dim // num_heads
    p = {"qkv": L.dense_init(k1, dim, dim * 3, dtype=dtype),
         "proj": L.dense_init(k2, dim, dim, dtype=dtype)}
    if use_rel_pos:
        p["rel_pos_h"] = jnp.zeros((2 * input_size - 1, head_dim), dtype)
        p["rel_pos_w"] = jnp.zeros((2 * input_size - 1, head_dim), dtype)
    return p


def attn_apply(p: dict, x: jnp.ndarray, num_heads: int,
               use_rel_pos: bool) -> jnp.ndarray:
    """x: (B, H, W, C) -> (B, H, W, C); H == W (windows or full grid).

    Large square grids (global-attention layers, 64x64 tokens at ViT-H) take
    the fused rel-pos Pallas kernel; small windows (14x14) take the XLA path
    with the bias materialized (cheap at that size)."""
    B, Hs, Ws, C = x.shape
    T = Hs * Ws
    head_dim = C // num_heads
    qkv = L.dense(p["qkv"], x.reshape(B, T, C))
    qkv = qkv.reshape(B, T, 3, num_heads, head_dim)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]     # (B, T, nH, D)

    on_tpu = jax.default_backend() == "tpu"
    if use_rel_pos and Hs == Ws and on_tpu:
        # fused kernel for ANY square grid (64x64 global layers AND 14x14
        # windows): the rel-pos bias is reconstructed blockwise inside the
        # kernel and never materialized
        from llmseg_tpu.ops.relpos_attention import relpos_flash_attention

        out = relpos_flash_attention(q, k, v, p["rel_pos_h"], p["rel_pos_w"],
                                     Hs)
    else:
        bias = None
        if use_rel_pos:
            qh = q.transpose(0, 2, 1, 3)                    # (B, nH, T, D)
            # reference applies rel-pos from the UNSCALED q
            # (image_encoder.py:233-239)
            bias = decomposed_rel_pos_bias(qh, p["rel_pos_h"],
                                           p["rel_pos_w"], Hs)
        from llmseg_tpu.ops.attention import attention_xla

        out = attention_xla(q, k, v, bias=bias)             # (B, T, nH, D)
    out = out.reshape(B, Hs, Ws, C)
    return L.dense(p["proj"], out)


# ---------------------------------------------------------------------------
# Transformer block with windowing
# ---------------------------------------------------------------------------


def block_init(key, cfg: SamEncoderConfig, layer_idx: int, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    windowed = layer_idx not in cfg.global_attn_indexes and cfg.window_size > 0
    input_size = cfg.window_size if windowed else cfg.grid
    return {
        "norm1": L.layernorm_init(cfg.embed_dim, dtype),
        "attn": attn_init(k1, cfg.embed_dim, cfg.num_heads, cfg.use_rel_pos,
                          input_size, dtype),
        "norm2": L.layernorm_init(cfg.embed_dim, dtype),
        "mlp": L.mlp_init(k2, cfg.embed_dim,
                          int(cfg.embed_dim * cfg.mlp_ratio), dtype=dtype),
    }


def window_partition(x: jnp.ndarray, w: int):
    """(B, H, W, C) -> (B*nW, w, w, C); pads H,W to multiples of w.

    Static reshape/transpose (reference window_partition:263-290)."""
    B, H, W, C = x.shape
    pad_h, pad_w = (-H) % w, (-W) % w
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // w, w, Wp // w, w, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w, w, C)
    return x, (Hp, Wp)


def window_unpartition(x: jnp.ndarray, w: int, hp_wp, hw):
    Hp, Wp = hp_wp
    H, W = hw
    B = x.shape[0] // ((Hp // w) * (Wp // w))
    x = x.reshape(B, Hp // w, Wp // w, w, w, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def block_apply(p: dict, x: jnp.ndarray, cfg: SamEncoderConfig,
                layer_idx: int) -> jnp.ndarray:
    windowed = layer_idx not in cfg.global_attn_indexes and cfg.window_size > 0
    shortcut = x
    x = L.layernorm(p["norm1"], x)
    if windowed:
        H, W = x.shape[1], x.shape[2]
        x, hp_wp = window_partition(x, cfg.window_size)
        x = attn_apply(p["attn"], x, cfg.num_heads, cfg.use_rel_pos)
        x = window_unpartition(x, cfg.window_size, hp_wp, (H, W))
    else:
        x = attn_apply(p["attn"], x, cfg.num_heads, cfg.use_rel_pos)
    x = shortcut + x
    return x + L.mlp(p["mlp"], L.layernorm(p["norm2"], x))


# ---------------------------------------------------------------------------
# Full encoder
# ---------------------------------------------------------------------------


def init(key, cfg: SamEncoderConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, cfg.depth + 3)
    p = {
        "patch_embed": L.patch_embed_init(keys[0], cfg.patch_size, cfg.in_chans,
                                          cfg.embed_dim, dtype=dtype),
        "pos_embed": jnp.zeros((1, cfg.grid, cfg.grid, cfg.embed_dim), dtype),
        "blocks": [block_init(keys[i + 1], cfg, i, dtype)
                   for i in range(cfg.depth)],
        "neck": {
            "conv1": L.conv2d_init(keys[-2], cfg.embed_dim, cfg.out_chans, 1,
                                   bias=False, dtype=dtype),
            "ln1": L.layernorm2d_init(cfg.out_chans, dtype),
            "conv2": L.conv2d_init(keys[-1], cfg.out_chans, cfg.out_chans, 3,
                                   bias=False, dtype=dtype),
            "ln2": L.layernorm2d_init(cfg.out_chans, dtype),
        },
    }
    return p


def apply(p: dict, x: jnp.ndarray, cfg: SamEncoderConfig,
          remat: bool = False) -> jnp.ndarray:
    """x: (B, img, img, 3) preprocessed -> (B, grid, grid, out_chans)."""
    x = x.astype(p["patch_embed"]["w"].dtype)
    x = L.patch_embed(p["patch_embed"], x, cfg.patch_size)
    x = x + p["pos_embed"]

    blk = block_apply
    if remat:
        blk = jax.checkpoint(block_apply, static_argnums=(2, 3))
    for i, bp in enumerate(p["blocks"]):
        x = blk(bp, x, cfg, i)

    n = p["neck"]
    x = L.conv2d(n["conv1"], x)
    x = L.layernorm2d(n["ln1"], x)
    x = L.conv2d(n["conv2"], x, padding="SAME")
    x = L.layernorm2d(n["ln2"], x)
    return x
