"""Generic ViT serving both frozen towers:

  * CLIP ViT-L/14 vision tower (reference model/llava/model/multimodal_encoder/
    clip_encoder.py — HF CLIPVisionModel, quickgelu, pre-LN, select layer -2,
    patch features only).
  * DINOv2 ViT-L/14 (reference loads torch.hub dinov2_vitl14, model/LISA.py:48;
    LayerScale, exact gelu, final norm -> x_norm_patchtokens).

One functional implementation, configured by ViTConfig flags.  TPU notes:
tokens stay (B, T, D) with the CLS token at index 0; attention via the shared
ops.attention entry (the Pallas flash kernel on TPU — at DINOv2@896's 4097
tokens it is ~5.5x faster than XLA fused attention; XLA on CPU/tests).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from llmseg_tpu.config import ViTConfig
from llmseg_tpu.models import layers as L
from llmseg_tpu.ops.attention import attention


def _attn_init(key, dim, dtype):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {"q": L.dense_init(k1, dim, dim, dtype=dtype),
            "k": L.dense_init(k2, dim, dim, dtype=dtype),
            "v": L.dense_init(k3, dim, dim, dtype=dtype),
            "out": L.dense_init(k4, dim, dim, dtype=dtype)}


def _attn(p, x, num_heads):
    B, T, C = x.shape
    if T <= 1024 and "w" in p["q"]:
        # latency-bound small-T towers (CLIP @257) with unquantized leaves
        # (quantized ones route through L.dense -> qdense below): one
        # fused (C, 3C) projection beats three (C, C) matmuls' ramp-up —
        # measured CLIP tower 5.5 -> 4.7 ms.  At DINOv2's T=4097 the three
        # gemms are already compute-bound and XLA streams them over one
        # read of x, so the fused concat measured ~1 ms WORSE per tower —
        # hence the gate (isolated-kernel wins vanish in-situ; see
        # COMPONENTS.md measured dead ends)
        w = jnp.concatenate([p["q"]["w"], p["k"]["w"], p["v"]["w"]], axis=1)
        qkv = x @ w
        if "b" in p["q"]:
            qkv = qkv + jnp.concatenate(
                [p["q"]["b"], p["k"]["b"], p["v"]["b"]])
        q, k, v = (y.reshape(B, T, num_heads, -1)
                   for y in jnp.split(qkv, 3, axis=-1))
    else:
        q = L.dense(p["q"], x).reshape(B, T, num_heads, -1)
        k = L.dense(p["k"], x).reshape(B, T, num_heads, -1)
        v = L.dense(p["v"], x).reshape(B, T, num_heads, -1)
    o = attention(q, k, v).reshape(B, T, C)
    return L.dense(p["out"], o)


def block_init(key, cfg: ViTConfig, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    d = cfg.hidden_size
    p = {
        "norm1": L.layernorm_init(d, dtype),
        "attn": _attn_init(k1, d, dtype),
        "norm2": L.layernorm_init(d, dtype),
        "mlp": L.mlp_init(k2, d, int(d * cfg.mlp_ratio), dtype=dtype),
    }
    if cfg.layerscale:
        p["ls1"] = jnp.full((d,), 1e-5, dtype)
        p["ls2"] = jnp.full((d,), 1e-5, dtype)
    return p


def block_apply(p: dict, x: jnp.ndarray, cfg: ViTConfig) -> jnp.ndarray:
    # layerscale gates on key PRESENCE, not just cfg: fold_layerscale_inplace
    # removes ls1/ls2 after folding them into the out-proj/fc2 weights, and
    # the folded params must not pay a (B, T, D) multiply against ones
    act = L.quick_gelu if cfg.use_quick_gelu else jax.nn.gelu
    h = _attn(p["attn"], L.layernorm(p["norm1"], x, eps=cfg.ln_eps), cfg.num_heads)
    if cfg.layerscale and "ls1" in p:
        h = h * p["ls1"]
    x = x + h
    h = L.mlp(p["mlp"], L.layernorm(p["norm2"], x, eps=cfg.ln_eps), act=act)
    if cfg.layerscale and "ls2" in p:
        h = h * p["ls2"]
    return x + h


def fold_layerscale_inplace(p: dict) -> dict:
    """Fold DINOv2's LayerScale diagonals into the producing projections:

        (o @ W_o + b_o) * ls1 == o @ (W_o * ls1) + b_o * ls1
        (h @ W_fc2 + b_fc2) * ls2 == h @ (W_fc2 * ls2) + b_fc2 * ls2

    Exact reparameterization (f32 fold, one bf16 rounding — same class as
    the SmoothQuant fold, ops/quant.py), so the frozen tower loses two
    (B, T, D) elementwise passes per block at inference AND training (the
    tower is frozen behind stop_gradient, reference LISA.py:48,186).
    Mutates `p` (the ls leaves are deleted); returns it for chaining.
    No-op for towers without layerscale (CLIP)."""
    for bp in p.get("blocks", ()):
        for ls_name, proj in (("ls1", bp["attn"]["out"]), ("ls2", bp["mlp"]["fc2"])):
            if ls_name not in bp:
                continue
            ls = bp.pop(ls_name).astype(jnp.float32)
            proj["w"] = (proj["w"].astype(jnp.float32) * ls).astype(
                proj["w"].dtype)
            if "b" in proj:
                proj["b"] = (proj["b"].astype(jnp.float32) * ls).astype(
                    proj["b"].dtype)
    return p


def init(key, cfg: ViTConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, cfg.depth + 3)
    d = cfg.hidden_size
    n_tok = cfg.num_patches + cfg.num_prefix_tokens
    p = {
        "patch_embed": L.patch_embed_init(
            keys[0], cfg.patch_size, 3, d,
            bias=not cfg.layernorm_pre,  # CLIP patch conv has no bias
            dtype=dtype),
        "pos_embed": L._trunc_normal(keys[1], (1, n_tok, d), 0.02, dtype),
        "blocks": [block_init(keys[i + 2], cfg, dtype)
                   for i in range(cfg.depth)],
        "norm": L.layernorm_init(d, dtype),   # CLIP post_layernorm / DINO norm
    }
    if cfg.use_class_embedding:
        p["cls_token"] = L._trunc_normal(keys[-1], (1, 1, d), 0.02, dtype)
    if cfg.layernorm_pre:
        p["pre_norm"] = L.layernorm_init(d, dtype)
    return p


def embed(p: dict, x: jnp.ndarray, cfg: ViTConfig) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, 1+N, D) tokens with CLS + positions."""
    B = x.shape[0]
    x = x.astype(p["patch_embed"]["w"].dtype)
    tok = L.patch_embed(p["patch_embed"], x, cfg.patch_size)
    tok = tok.reshape(B, -1, cfg.hidden_size)
    if cfg.use_class_embedding:
        # add positions to the patch tokens FIRST (token count 4096 is
        # 8-sublane aligned; fusing the add into the misaligned 4097-row
        # post-concat buffer measured ~4 ms/batch slower at DINOv2@896),
        # then concat the single fully-formed cls row
        tok = tok + p["pos_embed"][:, 1:]
        cls = p["cls_token"] + p["pos_embed"][:, :1]
        tok = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, cfg.hidden_size)), tok], axis=1)
    else:
        tok = tok + p["pos_embed"]
    if cfg.layernorm_pre:
        tok = L.layernorm(p["pre_norm"], tok, eps=cfg.ln_eps)
    return tok


def apply(p: dict, x: jnp.ndarray, cfg: ViTConfig, *,
          num_layers: Optional[int] = None, final_norm: bool = True,
          remat: bool = False) -> jnp.ndarray:
    """Run `num_layers` blocks (default all); returns (B, 1+N, D)."""
    tok = embed(p, x, cfg)
    n = cfg.depth if num_layers is None else num_layers
    blk = block_apply
    if remat:
        blk = jax.checkpoint(block_apply, static_argnums=(2,))
    for bp in p["blocks"][:n]:
        tok = blk(bp, tok, cfg)
    if final_norm:
        tok = L.layernorm(p["norm"], tok, eps=cfg.ln_eps)
    return tok


# ---------------------------------------------------------------------------
# Tower-specific entry points
# ---------------------------------------------------------------------------


def clip_features(p: dict, x: jnp.ndarray, cfg: ViTConfig,
                  select_layer: int = -2) -> jnp.ndarray:
    """CLIP vision tower feature_select (reference clip_encoder.py:31-60):
    hidden state at `select_layer` (HF indexing: hidden_states[-2] == output
    of layer depth-1... i.e. run depth+select_layer+1 blocks), patch tokens
    only, no final norm.  (B, H, W, 3) -> (B, N, D)."""
    n = cfg.depth + select_layer + 1
    tok = apply(p, x, cfg, num_layers=n, final_norm=False)
    return tok[:, cfg.num_prefix_tokens:]


def dino_patch_features(p: dict, x: jnp.ndarray, cfg: ViTConfig) -> jnp.ndarray:
    """DINOv2 forward_features()['x_norm_patchtokens'] (reference
    model/LISA.py:186-199): all blocks + final norm, patch tokens.
    (B, H, W, 3) -> (B, N, D)."""
    tok = apply(p, x, cfg, num_layers=None, final_norm=True)
    return tok[:, cfg.num_prefix_tokens:]
