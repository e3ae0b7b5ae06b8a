"""Autoregressive decoding with a KV cache (greedy).

Backs the legacy pixel-decoder path (reference LISAForCausalLM.evaluate,
model/LISA.py:477-559: HF generate(max_new_tokens=32, num_beams=1) -> [SEG]
hidden states -> SAM prompt decoder).  TPU-first: prefill is one forward over
the padded prompt; the decode loop is a lax.scan over steps with a static
cache of size prompt_len + max_new_tokens.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from llmseg_tpu.config import LlamaConfig, LoraConfig
from llmseg_tpu.models import layers as L
from llmseg_tpu.models import llama
from llmseg_tpu.ops.attention import attention_xla


def _attn_cached(p, lp, x, cache_k, cache_v, pos, cos, sin,
                 cfg: LlamaConfig, scaling: float, prompt_len):
    """One decode step: x (B, 1, D); cache (B, S, H, Dh); pos scalar index."""
    B = x.shape[0]
    q = llama._dense_lora(p["q"], None if lp is None else lp.get("q"), x,
                          scaling)
    k = L.dense(p["k"], x)
    v = llama._dense_lora(p["v"], None if lp is None else lp.get("v"), x,
                          scaling)
    q = q.reshape(B, 1, cfg.num_heads, cfg.head_dim)
    k = k.reshape(B, 1, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(B, 1, cfg.num_kv_heads, cfg.head_dim)
    positions = jnp.full((B, 1), pos, jnp.int32)
    q = L.apply_rope(q, cos, sin, positions)
    k = L.apply_rope(k, cos, sin, positions)
    cache_k = jax.lax.dynamic_update_slice_in_dim(cache_k, k, pos, axis=1)
    cache_v = jax.lax.dynamic_update_slice_in_dim(cache_v, v, pos, axis=1)
    kk, vv = cache_k, cache_v
    if cfg.num_kv_heads != cfg.num_heads:
        rep = cfg.num_heads // cfg.num_kv_heads
        kk = jnp.repeat(kk, rep, axis=2)
        vv = jnp.repeat(vv, rep, axis=2)
    S = cache_k.shape[1]
    # mask future positions (> pos) in the cache
    bias = jnp.where(jnp.arange(S)[None, None, None, :] <= pos, 0.0, -1e9)
    o = attention_xla(q, kk, vv, bias=bias)
    return L.dense(p["o"], o.reshape(B, 1, -1)), cache_k, cache_v


def _layer_cached(p, lp, x, ck, cv, pos, cos, sin, cfg, scaling, prompt_len):
    h, ck, cv = _attn_cached(p["attn"], lp,
                             L.rmsnorm(p["input_norm"], x, cfg.rms_norm_eps),
                             ck, cv, pos, cos, sin, cfg, scaling, prompt_len)
    x = x + h
    x = x + llama._mlp_block(p, x, p["post_norm"], cfg)
    return x, ck, cv


def prefill_cache(params: dict, cfg: LlamaConfig, inputs_embeds: jnp.ndarray,
                  total_len: int, *, lora=None, lora_cfg=None):
    """Run the prompt through the model while recording K/V.

    Returns (hidden (B, T, D) final-norm states, cache dict)."""
    B, T, D = inputs_embeds.shape
    cos, sin = L.rope_frequencies(cfg.head_dim, cfg.max_seq_len,
                                  cfg.rope_theta)
    scaling = 1.0 if lora_cfg is None else lora_cfg.alpha / lora_cfg.rank
    x = inputs_embeds
    cache = {"k": [], "v": []}
    for i, lp in enumerate(params["layers"]):
        llp = None if lora is None else lora["layers"][i]
        xin = L.rmsnorm(lp["input_norm"], x, cfg.rms_norm_eps)
        q = llama._dense_lora(lp["attn"]["q"],
                              None if llp is None else llp.get("q"), xin,
                              scaling)
        k = L.dense(lp["attn"]["k"], xin)
        v = llama._dense_lora(lp["attn"]["v"],
                              None if llp is None else llp.get("v"), xin,
                              scaling)
        q = q.reshape(B, T, cfg.num_heads, cfg.head_dim)
        k = k.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
        q = L.apply_rope(q, cos, sin)
        k = L.apply_rope(k, cos, sin)
        ck = jnp.zeros((B, total_len, cfg.num_kv_heads, cfg.head_dim),
                       k.dtype).at[:, :T].set(k)
        cv = jnp.zeros((B, total_len, cfg.num_kv_heads, cfg.head_dim),
                       v.dtype).at[:, :T].set(v)
        cache["k"].append(ck)
        cache["v"].append(cv)
        kk, vv = k, v
        if cfg.num_kv_heads != cfg.num_heads:
            rep = cfg.num_heads // cfg.num_kv_heads
            kk = jnp.repeat(kk, rep, axis=2)
            vv = jnp.repeat(vv, rep, axis=2)
        from llmseg_tpu.ops.attention import attention

        o = attention(q, kk, vv, causal=True)
        x = x + L.dense(lp["attn"]["o"], o.reshape(B, T, -1))
        x = x + llama._mlp_block(lp, x, lp["post_norm"], cfg)
    hidden = L.rmsnorm(params["norm"], x, cfg.rms_norm_eps)
    return hidden, cache


def greedy_generate(params: dict, cfg: LlamaConfig,
                    inputs_embeds: jnp.ndarray, max_new_tokens: int,
                    *, eos_token_id: int = 2, lora=None, lora_cfg=None,
                    stop_token_ids: Tuple[int, ...] = ()
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy decode.  Returns (tokens (B, N), hidden_states (B, N, D) —
    the final-norm hidden state at each generated position, matching the
    reference's output_hidden_states from generate).

    stop_token_ids: extra ids that latch termination, the TPU equivalent of
    the reference's KeywordsStoppingCriteria (mm_utils.py:56-88).  The
    reference only ever registers ["</s>"] (= EOS, LISA.py:509-512), so
    single-token keywords cover its behavior; decoding stays a fixed-length
    scan either way (XLA static shapes), finished rows just repeat EOS."""
    B, T, D = inputs_embeds.shape
    total = T + max_new_tokens
    assert total <= cfg.max_seq_len
    hidden, cache = prefill_cache(params, cfg, inputs_embeds, total,
                                  lora=lora, lora_cfg=lora_cfg)
    cos, sin = L.rope_frequencies(cfg.head_dim, cfg.max_seq_len,
                                  cfg.rope_theta)
    scaling = 1.0 if lora_cfg is None else lora_cfg.alpha / lora_cfg.rank

    last_hidden = hidden[:, -1:]
    first_tok = jnp.argmax(
        llama.logits(params, cfg, last_hidden)[:, 0], axis=-1)

    ck0 = jnp.stack(cache["k"])         # (L, B, S, H, Dh)
    cv0 = jnp.stack(cache["v"])

    def step(carry, i):
        tok, ck, cv, done = carry
        x = params["embed_tokens"][tok][:, None, :]
        pos = T + i
        new_ck, new_cv = [], []
        for li, lp in enumerate(params["layers"]):
            llp = None if lora is None else lora["layers"][li]
            x, k_i, v_i = _layer_cached(lp, llp, x, ck[li], cv[li], pos,
                                        cos, sin, cfg, scaling, T)
            new_ck.append(k_i)
            new_cv.append(v_i)
        h = L.rmsnorm(params["norm"], x, cfg.rms_norm_eps)
        done = done | (tok == eos_token_id)   # latch BEFORE choosing next
        for sid in stop_token_ids:
            done = done | (tok == sid)
        next_tok = jnp.argmax(llama.logits(params, cfg, h)[:, 0], axis=-1)
        next_tok = jnp.where(done, eos_token_id, next_tok)
        return ((next_tok, jnp.stack(new_ck), jnp.stack(new_cv), done),
                (tok, h[:, 0]))

    done0 = jnp.zeros((B,), bool)
    (_, _, _, _), (tokens, hiddens) = jax.lax.scan(
        step, (first_tok, ck0, cv0, done0), jnp.arange(max_new_tokens))
    # scan stacks along step axis: (N, B, ...) -> (B, N, ...)
    return tokens.transpose(1, 0), hiddens.transpose(1, 0, 2)
