"""Mask-selection transformer — the trainable core of LLM-Seg.

Capability parity with reference model/LISA.py:35-121 (lisa_* modules) and
model/transformer.py:215-283 (LISA_TwoWayAttentionBlock: NO positional
encodings, attention_downsample_rate=1):

  * text_hidden_fcs: Linear(llm, llm) -> ReLU -> Linear(llm, 256)
  * lisa_dino_conv: 1x1 conv dino_dim -> 256 over the DINOv2 feature map
  * 2x two-way attention blocks fusing proposal embeddings (queries, K per
    row) with the [SEG] text embedding (keys, 1 per row)
  * final token-to-text cross attention + LayerNorm
  * lisa_iou_head: 256 -> 128 -> 1 + Sigmoid   (IoP regression)
  * lisa_embedding_head: 256 -> 2048 -> 256    (similarity embedding)

TPU-first: proposals are padded to a static K with a validity mask threaded
through every attention (invalid keys get -1e9 bias) and through both losses;
the whole head runs batched over rows (R, K, D) — the reference loops per
image in Python (model/LISA.py:357-391).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from llmseg_tpu.config import SelectionHeadConfig
from llmseg_tpu.models import layers as L
from llmseg_tpu.models.sam.two_way_transformer import (attention_apply,
                                                       attention_init)


def _block_init(key, cfg: SelectionHeadConfig, dtype) -> dict:
    ks = jax.random.split(key, 4)
    d = cfg.dim
    return {
        "self_attn": attention_init(ks[0], d, cfg.num_heads, 1, dtype),
        "norm1": L.layernorm_init(d, dtype),
        "cross_t2i": attention_init(ks[1], d, cfg.num_heads, 1, dtype),
        "norm2": L.layernorm_init(d, dtype),
        "mlp": L.mlp_init(ks[2], d, cfg.mlp_dim, dtype=dtype),
        "norm3": L.layernorm_init(d, dtype),
        "cross_i2t": attention_init(ks[3], d, cfg.num_heads, 1, dtype),
        "norm4": L.layernorm_init(d, dtype),
    }


def _block_apply(p, queries, keys, num_heads, prop_valid):
    """queries: (R, K, D) proposals; keys: (R, 1, D) text.  LayerNorm eps
    follows torch default 1e-5."""
    q = attention_apply(p["self_attn"], queries, queries, queries, num_heads,
                        key_mask=prop_valid)
    queries = L.layernorm(p["norm1"], queries + q, eps=1e-5)

    q = attention_apply(p["cross_t2i"], queries, keys, keys, num_heads)
    queries = L.layernorm(p["norm2"], queries + q, eps=1e-5)

    queries = L.layernorm(p["norm3"],
                          queries + L.mlp(p["mlp"], queries, act=jax.nn.relu),
                          eps=1e-5)

    k = attention_apply(p["cross_i2t"], keys, queries, queries, num_heads,
                        key_mask=prop_valid)
    keys = L.layernorm(p["norm4"], keys + k, eps=1e-5)
    return queries, keys


def init(key, cfg: SelectionHeadConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, cfg.depth + 6)
    d = cfg.dim
    return {
        "text_fc1": L.dense_init(ks[0], cfg.llm_dim, cfg.llm_dim, dtype=dtype),
        "text_fc2": L.dense_init(ks[1], cfg.llm_dim, d, dtype=dtype),
        "dino_conv": L.dense_init(ks[2], cfg.dino_dim, d, dtype=dtype),
        "blocks": [_block_init(ks[3 + i], cfg, dtype)
                   for i in range(cfg.depth)],
        "final_attn": attention_init(ks[-3], d, cfg.num_heads, 1, dtype),
        "norm_final": L.layernorm_init(d, dtype),
        "iou_head": L.mlp_stack_init(ks[-2], [d, cfg.iou_head_hidden, 1],
                                     dtype),
        "embedding_head": L.mlp_stack_init(
            ks[-1], [d, cfg.embed_head_hidden, d], dtype),
    }


def project_text(p: dict, hidden: jnp.ndarray) -> jnp.ndarray:
    """text_hidden_fcs (reference LISA.py:55-66): LLM hidden -> 256."""
    return L.dense(p["text_fc2"], jax.nn.relu(L.dense(p["text_fc1"], hidden)))


def project_dino(p: dict, feats: jnp.ndarray) -> jnp.ndarray:
    """lisa_dino_conv as a matmul over (..., dino_dim) features (1x1 conv in
    the reference, LISA.py:92)."""
    return L.dense(p["dino_conv"], feats)


def mask_pooling(features: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """(R, HW, D) features x (R, K, HW) soft mask weights -> (R, K, D)
    (reference LISA.py:201-218: weights @ feats / sum(weights)).  One einsum,
    MXU-bound — this is hot loop #2 of the reference."""
    pooled = jnp.einsum("rkh,rhd->rkd", weights, features,
                        preferred_element_type=jnp.float32)
    denom = jnp.sum(weights, axis=-1, keepdims=True).astype(jnp.float32) + 1e-8
    return (pooled / denom).astype(features.dtype)


def apply(p: dict, cfg: SelectionHeadConfig, prop_embeds: jnp.ndarray,
          text_embed: jnp.ndarray, prop_valid: Optional[jnp.ndarray] = None
          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fuse proposals with the [SEG] embedding (reference LISA.py:357-391).

    prop_embeds: (R, K, 256) mask-pooled proposal embeddings;
    text_embed: (R, 256) projected [SEG] embedding;
    prop_valid: (R, K) bool.
    Returns (similarity (R, K) cosine, pred_iou (R, K) in [0,1],
             seg_features (R, K, 256)).
    """
    queries = prop_embeds
    keys = text_embed[:, None, :]
    for bp in p["blocks"]:
        queries, keys = _block_apply(bp, queries, keys, cfg.num_heads,
                                     prop_valid)
    attn_out = attention_apply(p["final_attn"], queries, keys, keys,
                               cfg.num_heads)
    queries = L.layernorm(p["norm_final"], queries + attn_out, eps=1e-5)

    pred_iou = L.mlp_stack(p["iou_head"], queries,
                           final_act=jax.nn.sigmoid)[..., 0]   # (R, K)
    seg_features = L.mlp_stack(p["embedding_head"], queries)   # (R, K, D)

    t = text_embed.astype(jnp.float32)
    s = seg_features.astype(jnp.float32)
    t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-8)
    s = s / (jnp.linalg.norm(s, axis=-1, keepdims=True) + 1e-8)
    similarity = jnp.einsum("rkd,rd->rk", s, t)
    if prop_valid is not None:
        similarity = jnp.where(prop_valid, similarity, -1.0)
        pred_iou = jnp.where(prop_valid, pred_iou, 0.0)
    return similarity, pred_iou, seg_features
