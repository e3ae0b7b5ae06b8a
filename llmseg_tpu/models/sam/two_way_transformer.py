"""SAM two-way transformer (reference modeling/transformer.py:47-213).

Depth-2 token<->image cross attention with attention_downsample_rate=2.
This same module family also backs the LLM-Seg selection head (the reference
duplicates it in model/transformer.py; here it is one implementation).

Functional pytree style; attention uses the shared ops.attention entry.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from llmseg_tpu.models import layers as L
from llmseg_tpu.ops.attention import attention_xla


def attention_init(key, dim: int, num_heads: int,
                   downsample_rate: int = 1, dtype=jnp.float32) -> dict:
    """reference transformer.py Attention:286-340 — projects to dim/downsample."""
    inner = dim // downsample_rate
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {"q": L.dense_init(k1, dim, inner, dtype=dtype),
            "k": L.dense_init(k2, dim, inner, dtype=dtype),
            "v": L.dense_init(k3, dim, inner, dtype=dtype),
            "out": L.dense_init(k4, inner, dim, dtype=dtype)}


def attention_apply(p: dict, q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    num_heads: int,
                    key_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """q: (B, Tq, C), k/v: (B, Tk, C); key_mask: (B, Tk) True=valid."""
    B, Tq, _ = q.shape
    Tk = k.shape[1]
    qh = L.dense(p["q"], q).reshape(B, Tq, num_heads, -1)
    kh = L.dense(p["k"], k).reshape(B, Tk, num_heads, -1)
    vh = L.dense(p["v"], v).reshape(B, Tk, num_heads, -1)
    bias = None
    if key_mask is not None:
        bias = jnp.where(key_mask, 0.0, -1e9)[:, None, None, :]
    out = attention_xla(qh, kh, vh, bias=bias)
    return L.dense(p["out"], out.reshape(B, Tq, -1))


def block_init(key, dim: int, num_heads: int, mlp_dim: int,
               downsample_rate: int = 2, skip_first_layer_pe: bool = False,
               dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 4)
    return {
        "self_attn": attention_init(keys[0], dim, num_heads, 1, dtype),
        "norm1": L.layernorm_init(dim, dtype),
        "cross_attn_t2i": attention_init(keys[1], dim, num_heads,
                                         downsample_rate, dtype),
        "norm2": L.layernorm_init(dim, dtype),
        "mlp": L.mlp_init(keys[2], dim, mlp_dim, dtype=dtype),
        "norm3": L.layernorm_init(dim, dtype),
        "cross_attn_i2t": attention_init(keys[3], dim, num_heads,
                                         downsample_rate, dtype),
        "norm4": L.layernorm_init(dim, dtype),
    }


def block_apply(p: dict, queries: jnp.ndarray, keys: jnp.ndarray,
                query_pe: jnp.ndarray, key_pe: jnp.ndarray, num_heads: int,
                skip_first_layer_pe: bool = False,
                key_mask: Optional[jnp.ndarray] = None,
                query_mask: Optional[jnp.ndarray] = None
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """reference TwoWayAttentionBlock:140-213 (eps=1e-5 LayerNorms in torch
    default; we keep 1e-6 — negligible).  queries attend keys and vice versa."""
    if skip_first_layer_pe:
        queries = attention_apply(p["self_attn"], queries, queries, queries,
                                  num_heads, key_mask=query_mask)
    else:
        q = queries + query_pe
        queries = queries + attention_apply(p["self_attn"], q, q, queries,
                                            num_heads, key_mask=query_mask)
    queries = L.layernorm(p["norm1"], queries)

    q = queries + query_pe
    # keys is unchanged between the two cross attentions, so the (B, S*S, C)
    # positional add — a full HBM pass over the prompt-tiled image tensor —
    # happens once, not twice
    k = keys + key_pe
    queries = queries + attention_apply(p["cross_attn_t2i"], q, k, keys,
                                        num_heads, key_mask=key_mask)
    queries = L.layernorm(p["norm2"], queries)

    queries = queries + L.mlp(p["mlp"], queries, act=jax.nn.relu)
    queries = L.layernorm(p["norm3"], queries)

    q = queries + query_pe
    keys = keys + attention_apply(p["cross_attn_i2t"], k, q, queries,
                                  num_heads, key_mask=query_mask)
    keys = L.layernorm(p["norm4"], keys)
    return queries, keys


def init(key, depth: int, dim: int, num_heads: int, mlp_dim: int,
         dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, depth + 2)
    return {
        "layers": [block_init(keys[i], dim, num_heads, mlp_dim,
                              skip_first_layer_pe=(i == 0), dtype=dtype)
                   for i in range(depth)],
        "final_attn": attention_init(keys[-2], dim, num_heads, 2, dtype),
        "norm_final": L.layernorm_init(dim, dtype),
    }


def apply(p: dict, image_embedding: jnp.ndarray, image_pe: jnp.ndarray,
          point_embedding: jnp.ndarray, num_heads: int,
          impl: str = "auto") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """reference TwoWayTransformer.forward:88-137.

    image_embedding/image_pe: (B, S, S, C) -> flattened; point_embedding:
    (B, N, C).  Returns (queries (B,N,C), keys (B,S*S,C)).

    impl: "auto" routes big prompt batches (the AMG decode hot loop) to the
    fused Pallas kernel on TPU — each prompt's diverging image state stays in
    VMEM for the whole transformer (2.2x over the XLA program, which pays
    ~14 HBM passes over the (B, S*S, C) tensor).  "xla"/"fused" force a path
    (the fused kernel is forward-only; nothing differentiates through this
    module — the selection head uses block_apply directly)."""
    B, Hs, Ws, C = image_embedding.shape
    if impl != "xla":
        from llmseg_tpu.ops.twoway_kernel import (fused_twoway_apply,
                                                  should_fuse)

        if impl == "fused" or (impl == "auto"
                               and should_fuse(B, Hs * Ws, image_pe)):
            return fused_twoway_apply(p, image_embedding, image_pe,
                                      point_embedding, num_heads)
    keys = image_embedding.reshape(B, Hs * Ws, C)
    if image_pe.ndim == 3:                       # (S, S, C)
        key_pe = image_pe.reshape(1, Hs * Ws, C)
    else:                                        # (1 or B, S, S, C)
        key_pe = image_pe.reshape(image_pe.shape[0], Hs * Ws, C)
    key_pe = key_pe.astype(keys.dtype)
    queries = point_embedding.astype(keys.dtype)
    point_embedding = queries

    for i, lp in enumerate(p["layers"]):
        queries, keys = block_apply(lp, queries, keys, point_embedding,
                                    key_pe, num_heads,
                                    skip_first_layer_pe=(i == 0))

    q = queries + point_embedding
    k = keys + key_pe
    queries = queries + attention_apply(p["final_attn"], q, k, keys, num_heads)
    queries = L.layernorm(p["norm_final"], queries)
    return queries, keys
