"""MPT decoder backbone, TPU-native (capability parity with the reference's
vendored MPT branch, model/llava/model/language_model/mpt/ — M21).

The reference keeps MPT as an alternative LLaVA language backbone
(llava_mpt.py) that no LLM-Seg entry point selects; this module provides the
same capability as one functional pytree model:

  * alibi attention bias (attention.py:457-478 gen_slopes/build_alibi_bias:
    per-key relative bias, slopes 2^(-alibi_bias_max*i/n') with the
    odd/even interleave for non-power-of-two head counts) — positions enter
    through the bias, no rotary/learned embedding,
  * fused Wqkv projection with optional clip_qkv clamping and optional
    qk layernorm (attention.py:261-355 MultiheadAttention),
  * MultiQueryAttention via kv_n_heads=1 (attention.py:357-455): one shared
    K/V head broadcast over query heads,
  * pre-LN blocks with GELU(exact) FFN (blocks.py:11-22 MPTMLP),
  * bias-free linears and LayerNorms when no_bias (configuration_mpt.py),
    LayerNorm statistics in fp32 (norm.py LPLayerNorm semantics),
  * weight-tied logits (modeling_mpt.py MPTForCausalLM: logits = h @ wte^T).

The reference's Triton flash kernel (flash_attn_triton.py, M22) maps to the
shared ops.attention entry; the alibi-bias path uses the XLA attention with
fp32 softmax (bias-carrying flash is flash_attention_bias for inference).
Parity: tests/test_mpt.py checks logits against transformers'
MptForCausalLM with identical weights, the alibi table against the
reference's build_alibi_bias, and MQA against the reference's
MultiQueryAttention module.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from llmseg_tpu.config import MptConfig
from llmseg_tpu.models import layers as L
from llmseg_tpu.ops.attention import attention


def gen_slopes(n_heads: int, alibi_bias_max: int = 8) -> np.ndarray:
    """reference attention.py gen_slopes: next-pow2 ladder, odd/even
    interleave when n_heads is not a power of two."""
    n2 = 2 ** math.ceil(math.log2(n_heads))
    m = np.arange(1, n2 + 1, dtype=np.float32) * (alibi_bias_max / n2)
    slopes = 1.0 / np.power(2.0, m)
    if n2 != n_heads:
        slopes = np.concatenate([slopes[1::2], slopes[0::2]])[:n_heads]
    return slopes


def build_alibi_bias(n_heads: int, seq_len: int,
                     alibi_bias_max: int = 8) -> jnp.ndarray:
    """(1, n_heads, 1, seq_len) bias: slope * (k - (S-1)).  Under the causal
    mask this equals the full |q-k| form up to a per-row constant, which
    softmax cancels (reference attention.py build_alibi_bias, full=False)."""
    dist = np.arange(1 - seq_len, 1, dtype=np.float32).reshape(1, 1, 1, -1)
    slopes = gen_slopes(n_heads, alibi_bias_max).reshape(1, -1, 1, 1)
    return jnp.asarray(dist * slopes)


def init(key, cfg: MptConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, cfg.n_layers + 3)
    d = cfg.d_model
    hd = d // cfg.n_heads
    kv_dim = cfg.kv_n_heads * hd
    bias = not cfg.no_bias

    def block(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        p = {
            "norm_1": L.layernorm_init(d, dtype),
            "attn": {
                "wqkv": L.dense_init(k1, d, d + 2 * kv_dim, bias=bias,
                                     dtype=dtype),
                "out_proj": L.dense_init(k2, d, d, bias=bias, dtype=dtype),
            },
            "norm_2": L.layernorm_init(d, dtype),
            "ffn": {
                "up_proj": L.dense_init(k3, d, cfg.expansion_ratio * d,
                                        bias=bias, dtype=dtype),
                "down_proj": L.dense_init(k4, cfg.expansion_ratio * d, d,
                                          bias=bias, dtype=dtype),
            },
        }
        if cfg.qk_ln:
            p["attn"]["q_ln"] = L.layernorm_init(d, dtype)
            p["attn"]["k_ln"] = L.layernorm_init(kv_dim, dtype)
        return p

    p = {
        "wte": L._trunc_normal(keys[0], (cfg.vocab_size, d), 0.02, dtype),
        "blocks": [block(keys[2 + i]) for i in range(cfg.n_layers)],
        "norm_f": L.layernorm_init(d, dtype),
    }
    if not cfg.alibi and cfg.learned_pos_emb:
        p["wpe"] = L._trunc_normal(keys[1], (cfg.max_seq_len, d), 0.02,
                                   dtype)
    return p


def _attn(p: dict, cfg: MptConfig, x: jnp.ndarray,
          bias: jnp.ndarray) -> jnp.ndarray:
    B, T, d = x.shape
    hd = d // cfg.n_heads
    kv_dim = cfg.kv_n_heads * hd
    qkv = L.dense(p["wqkv"], x)
    if cfg.clip_qkv:
        qkv = jnp.clip(qkv, -cfg.clip_qkv, cfg.clip_qkv)
    q = qkv[..., :d]
    k = qkv[..., d:d + kv_dim]
    v = qkv[..., d + kv_dim:]
    if cfg.qk_ln:
        # reference attention.py:337-340: LN over the FLAT projection dim
        q = L.layernorm(p["q_ln"], q, eps=cfg.ln_eps).astype(v.dtype)
        k = L.layernorm(p["k_ln"], k, eps=cfg.ln_eps).astype(v.dtype)
    q = q.reshape(B, T, cfg.n_heads, hd)
    k = k.reshape(B, T, cfg.kv_n_heads, hd)
    v = v.reshape(B, T, cfg.kv_n_heads, hd)
    if cfg.kv_n_heads != cfg.n_heads:
        # MultiQueryAttention: shared K/V broadcast over query heads
        rep = cfg.n_heads // cfg.kv_n_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    scale = cfg.softmax_scale or (1.0 / math.sqrt(hd))
    o = attention(q, k, v, bias=bias, causal=True, scale=scale)
    return L.dense(p["out_proj"], o.reshape(B, T, d))


def apply(params: dict, cfg: MptConfig, *,
          input_ids: Optional[jnp.ndarray] = None,
          inputs_embeds: Optional[jnp.ndarray] = None,
          attention_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Forward to final hidden states (B, T, d).  attention_mask: (B, T)
    True/1 = valid (padding keys are masked out of every softmax, reference
    modeling_mpt.py _attn_bias)."""
    x = params["wte"][input_ids] if inputs_embeds is None else inputs_embeds
    B, T, _ = x.shape
    if cfg.alibi:
        bias = build_alibi_bias(cfg.n_heads, T, cfg.alibi_bias_max)
        bias = jnp.broadcast_to(bias, (1, cfg.n_heads, T, T))
    else:
        if "wpe" in params:
            x = x + params["wpe"][:T][None]
        bias = jnp.zeros((1, cfg.n_heads, T, T), jnp.float32)
    if attention_mask is not None:
        pad = jnp.where(attention_mask[:, None, None, :], 0.0,
                        jnp.float32(-1e9))
        bias = bias + pad
    bias = bias.astype(jnp.float32)   # broadcastable to (B, H, T, S)
    for bp in params["blocks"]:
        a = L.layernorm(bp["norm_1"], x, eps=cfg.ln_eps).astype(x.dtype)
        x = x + _attn(bp["attn"], cfg, a, bias)
        a = L.layernorm(bp["norm_2"], x, eps=cfg.ln_eps).astype(x.dtype)
        h = L.dense(bp["ffn"]["up_proj"], a)
        h = jax.nn.gelu(h, approximate=False)       # MPTMLP GELU(exact)
        x = x + L.dense(bp["ffn"]["down_proj"], h)
    return L.layernorm(params["norm_f"], x, eps=cfg.ln_eps).astype(x.dtype)


def logits(params: dict, cfg: MptConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    """Weight-tied LM head (modeling_mpt.py: F.linear(h, wte.weight))."""
    return jnp.einsum("btd,vd->btv", hidden, params["wte"])
