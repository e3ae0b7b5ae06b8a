"""LLaMA decoder, TPU-first.

Replaces the reference's HF `LlamaModel` under `LlavaLlamaForCausalLM`
(reference model/llava/model/language_model/llava_llama.py:39-163).  Causal
attention runs on the Pallas flash kernel; matmuls stay bf16 on the MXU with
fp32 softmax/norm statistics.  Accepts either token ids or pre-spliced input
embeddings (the LLaVA path injects image features, see models/llava.py).

LoRA (reference training.py:182-227: q_proj/v_proj, r=8, alpha=16) is an
optional overlay pytree — base weights stay frozen, the overlay is the
trainable leaf set, so the optimizer state is tiny and pjit shards only what
trains.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from llmseg_tpu.config import LlamaConfig, LoraConfig
from llmseg_tpu.models import layers as L
from llmseg_tpu.ops.attention import attention


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _layer_init(key, cfg: LlamaConfig, dtype) -> dict:
    ks = jax.random.split(key, 7)
    d = cfg.hidden_size
    qd = cfg.num_heads * cfg.head_dim
    kvd = cfg.num_kv_heads * cfg.head_dim
    return {
        "input_norm": L.rmsnorm_init(d, dtype),
        "attn": {
            "q": L.dense_init(ks[0], d, qd, bias=False, dtype=dtype),
            "k": L.dense_init(ks[1], d, kvd, bias=False, dtype=dtype),
            "v": L.dense_init(ks[2], d, kvd, bias=False, dtype=dtype),
            "o": L.dense_init(ks[3], qd, d, bias=False, dtype=dtype),
        },
        "post_norm": L.rmsnorm_init(d, dtype),
        "mlp": {
            "gate": L.dense_init(ks[4], d, cfg.intermediate_size, bias=False,
                                 dtype=dtype),
            "up": L.dense_init(ks[5], d, cfg.intermediate_size, bias=False,
                               dtype=dtype),
            "down": L.dense_init(ks[6], cfg.intermediate_size, d, bias=False,
                                 dtype=dtype),
        },
    }


def init(key, cfg: LlamaConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, cfg.num_layers + 3)
    d = cfg.hidden_size
    p = {
        "embed_tokens": L._trunc_normal(keys[0], (cfg.vocab_size, d), 0.02,
                                        dtype),
        "layers": [_layer_init(keys[i + 1], cfg, dtype)
                   for i in range(cfg.num_layers)],
        "norm": L.rmsnorm_init(d, dtype),
    }
    if not cfg.tie_embeddings:
        p["lm_head"] = L.dense_init(keys[-1], d, cfg.vocab_size, bias=False,
                                    dtype=dtype)
    return p


def lora_init(key, cfg: LlamaConfig, lora: LoraConfig,
              dtype=jnp.float32) -> dict:
    """LoRA A/B for q/v projections of every layer; B starts at zero so the
    overlay is an exact no-op at init (peft convention)."""
    layers = []
    for i in range(cfg.num_layers):
        lk = jax.random.fold_in(key, i)
        layer = {}
        for name, out_dim in (("q", cfg.num_heads * cfg.head_dim),
                              ("v", cfg.num_kv_heads * cfg.head_dim)):
            if f"{name}_proj" not in lora.target_modules:
                continue
            ka = jax.random.fold_in(lk, hash(name) % (2 ** 31))
            layer[name] = {
                "a": (jax.random.normal(ka, (cfg.hidden_size, lora.rank),
                                        jnp.float32)
                      * (1.0 / cfg.hidden_size ** 0.5)).astype(dtype),
                "b": jnp.zeros((lora.rank, out_dim), dtype),
            }
        layers.append(layer)
    return {"layers": layers}


def _dense_lora(p, lp, x, scaling: float):
    y = L.dense(p, x)
    if lp is not None:
        y = y + ((x @ lp["a"]) @ lp["b"]) * scaling
    return y


def _shared_qdense(ps, x):
    """One activation quantization shared by several W8A8 matmuls on the
    same input (exactly equivalent to per-matmul quantization — the quant
    depends only on x; SmoothQuant folding happens statically in the
    weights/norms before quantization, so the runtime path is untouched).
    Returns None when the leaves are not W8A8, so the caller falls back to
    the per-matmul L.dense path."""
    if not all("w_q8a" in p for p in ps):
        return None
    from llmseg_tpu.ops import quant

    qa = quant.quantize_activation(x)
    return [quant.qdense_act(p, qa, x.dtype) for p in ps]


def _colmax(x: jnp.ndarray) -> jnp.ndarray:
    """Per-input-channel |activation| maximum over every token — the
    SmoothQuant calibration statistic (see ops/quant.llama_smooth_plan)."""
    return jnp.max(jnp.abs(x.astype(jnp.float32)),
                   axis=tuple(range(x.ndim - 1)))


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def embed(params: dict, input_ids: jnp.ndarray,
          one_hot: bool = False) -> jnp.ndarray:
    """Token embedding lookup.

    one_hot=True uses a one-hot matmul instead of a gather: with embed_tokens
    sharded (tp, fsdp) under the mesh, a gather's backward is a scatter from
    batch-sharded cotangents into the tp/fsdp-sharded table, which GSPMD can
    only realize by replicating (involuntary full rematerialization); the
    matmul's transpose is another matmul that partitions cleanly.  Costs an
    (R, T, V) one-hot on the MXU — use only under a multi-device mesh.
    """
    table = params["embed_tokens"]
    if not one_hot:
        return table[input_ids]
    oh = jax.nn.one_hot(input_ids, table.shape[0], dtype=table.dtype)
    return jnp.einsum("rtv,vd->rtd", oh, table)


def _rms_qdense(ps, x_raw, norm_p, eps, lp, stats):
    """Fused rmsnorm -> shared per-token quantization -> W8A8 dots: the
    rsqrt cancels inside the int8 values (quant.rms_quantize_activation),
    so the bf16 normed tensor is never materialized.  Returns None when
    any leaf is not W8A8, a LoRA overlay needs the normed tensor, the
    calibration pass wants its column stats, or the opt-in outlier
    decomposition is active — callers fall back to rmsnorm + the unfused
    path."""
    from llmseg_tpu.ops import quant

    if (lp is not None or stats is not None or quant.W8A8_OUTLIER_K > 0
            or not all("w_q8a" in p for p in ps)):
        return None
    qa = quant.rms_quantize_activation(x_raw, norm_p["scale"], eps)
    return [quant.qdense_act(p, qa, x_raw.dtype) for p in ps]


def _attn_block(p, lp, x_raw, norm_p, cos, sin, cfg: LlamaConfig,
                scaling: float, positions=None, stats=None):
    B, T, _ = x_raw.shape
    fused = _rms_qdense((p["q"], p["k"], p["v"]), x_raw, norm_p,
                        cfg.rms_norm_eps, lp, stats)
    if fused is not None:
        q, k, v = fused
    else:
        x = L.rmsnorm(norm_p, x_raw, cfg.rms_norm_eps)
        if stats is not None:
            stats["attn_in"] = _colmax(x)
        shared = _shared_qdense((p["q"], p["k"], p["v"]), x)
        if shared is not None:
            q, k, v = shared
            if lp is not None:
                if "q" in lp:
                    q = q + ((x @ lp["q"]["a"]) @ lp["q"]["b"]) * scaling
                if "v" in lp:
                    v = v + ((x @ lp["v"]["a"]) @ lp["v"]["b"]) * scaling
        else:
            q = _dense_lora(p["q"], None if lp is None else lp.get("q"), x,
                            scaling)
            k = L.dense(p["k"], x)
            v = _dense_lora(p["v"], None if lp is None else lp.get("v"), x,
                            scaling)
    q = q.reshape(B, T, cfg.num_heads, cfg.head_dim)
    k = k.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
    q = L.apply_rope(q, cos, sin, positions)
    k = L.apply_rope(k, cos, sin, positions)
    if cfg.num_kv_heads != cfg.num_heads:
        rep = cfg.num_heads // cfg.num_kv_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    o = attention(q, k, v, causal=True).reshape(B, T, -1)
    if stats is not None:
        stats["o_in"] = _colmax(o)
    return L.dense(p["o"], o)


def _mlp_block(p, x_raw, norm_p, cfg: LlamaConfig, stats=None):
    fused = _rms_qdense((p["mlp"]["gate"], p["mlp"]["up"]), x_raw, norm_p,
                        cfg.rms_norm_eps, None, stats)
    if fused is not None:
        gate, up = fused
    else:
        x = L.rmsnorm(norm_p, x_raw, cfg.rms_norm_eps)
        if stats is not None:
            stats["mlp_in"] = _colmax(x)
        shared = _shared_qdense((p["mlp"]["gate"], p["mlp"]["up"]), x)
        if shared is not None:
            gate, up = shared
        else:
            gate = L.dense(p["mlp"]["gate"], x)
            up = L.dense(p["mlp"]["up"], x)
    h = jax.nn.silu(gate) * up
    if stats is not None:
        stats["down_in"] = _colmax(h)
    return L.dense(p["mlp"]["down"], h)


def _layer(p, lp, x, cos, sin, cfg: LlamaConfig, scaling: float,
           stats=None):
    x = x + _attn_block(p["attn"], lp, x, p["input_norm"],
                        cos, sin, cfg, scaling, stats=stats)
    return x + _mlp_block(p, x, p["post_norm"], cfg, stats=stats)


def apply(params: dict, cfg: LlamaConfig, *,
          input_ids: Optional[jnp.ndarray] = None,
          inputs_embeds: Optional[jnp.ndarray] = None,
          lora: Optional[dict] = None,
          lora_cfg: Optional[LoraConfig] = None,
          remat: bool = False, one_hot_embed: bool = False,
          quant_stats: Optional[list] = None) -> jnp.ndarray:
    """Returns final-norm hidden states (B, T, D) — matching the reference's
    output_hidden_states[-1] (HF appends the post-norm state last).

    quant_stats: pass an empty list to collect, per layer, the column-max
    |input| of each quantized-matmul site (SmoothQuant calibration — one
    dict per layer with attn_in/o_in/mlp_in/down_in).  Collection is a
    calibration-only mode and is incompatible with remat."""
    if inputs_embeds is None:
        inputs_embeds = embed(params, input_ids, one_hot=one_hot_embed)
    x = inputs_embeds
    T = x.shape[1]
    assert T <= cfg.max_seq_len, (
        f"sequence length {T} > cfg.max_seq_len {cfg.max_seq_len}")
    cos, sin = L.rope_frequencies(cfg.head_dim, cfg.max_seq_len,
                                  cfg.rope_theta)
    scaling = 1.0 if lora_cfg is None else lora_cfg.alpha / lora_cfg.rank

    assert not (remat and quant_stats is not None), \
        "quant_stats collection is incompatible with remat"
    layer_fn = _layer
    if remat:
        # remat="dots" keeps matmul outputs (~65MB/layer bf16 at seq 767)
        # so the backward pass skips the re-forward; plain True recomputes
        # everything (minimum memory, the reference's gradient-checkpointing
        # behavior, training.py:166)
        policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                  if remat == "dots" else None)
        layer_fn = jax.checkpoint(_layer, static_argnums=(5, 6),
                                  policy=policy)
    for i, lp in enumerate(params["layers"]):
        llp = None if lora is None else lora["layers"][i]
        if quant_stats is None:
            x = layer_fn(lp, llp, x, cos[:T], sin[:T], cfg, scaling)
        else:
            st: dict = {}
            quant_stats.append(st)
            x = _layer(lp, llp, x, cos[:T], sin[:T], cfg, scaling, stats=st)
    return L.rmsnorm(params["norm"], x, cfg.rms_norm_eps)


def logits(params: dict, cfg: LlamaConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    """(B, T, D) -> (B, T, V) fp32 logits (fp32 accumulation on the MXU)."""
    w = (params["embed_tokens"].T if cfg.tie_embeddings
         else params["lm_head"]["w"])
    return jnp.dot(hidden, w, preferred_element_type=jnp.float32)
