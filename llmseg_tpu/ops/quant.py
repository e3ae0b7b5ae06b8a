"""Weight-only int8 / int4 quantization (capability parity with the
reference's 4/8-bit LLaVA load path, model/llava/model/builder.py
load_4bit/load_8bit — bitsandbytes on GPU).

int8: symmetric per-output-channel scales, dequantized in the matmul
epilogue (the int8 matmul runs natively on the MXU).  Halves LLM weight HBM
(13.5GB -> 6.8GB at 7B).

int4: symmetric per-(input-group, output-channel) scales (group=128, the
bitsandbytes blockwise convention), two nibbles packed per int8 byte along
the input dim and unpacked on the fly.  Quarters resident weight HBM
(13.5GB -> 3.4GB at 7B); the transient dequantized operand costs extra
bandwidth per matmul, so this is a fit-in-memory option, not a speed one —
exactly the reference's load_4bit trade."""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp

# Activation-outlier handling for the W8A8 path (the reference's load_8bit
# is bitsandbytes LLM.int8(), model/llava/model/builder.py:40-47, which
# keeps activation-outlier columns in fp16).  Real LLaMA activations carry
# a few hidden channels 20-100x larger than the rest; they inflate the
# per-TOKEN quant scale and crush every other channel's precision.
#
# Default mechanism: SMOOTHING (SmoothQuant, Xiao et al. 2022) — a one-off
# calibration forward records per-matmul-input column maxima, and each
# outlier column is migrated INTO the weights at quantization time
# (w_row_j *= s_j, activations multiplied by a_inv_j = 1/s_j).  The a_inv
# multiply fuses into the activation-quant pass, so runtime cost is ~0;
# see quantize_llama(smooth_stats=...) and llmseg.calibrate_quant_stats.
#
# Opt-in fallback (no calibration available): LLM.int8-style dynamic
# decomposition — per matmul, the top-K columns by |activation| go through
# a small bf16 side matmul and are ZEROED in the int8 operand.  MEASURED
# DEAD END as a default (2026-08-19, batch-4 7B): the per-forward top_k,
# column gathers, keep-mask pass and unfused side-matmul adds cost +37% on
# the quantized-matmul path (246.7 -> 338.8 ms/32L; e2e 12.16 -> 10.38
# img/s); even with compile-time-constant indices it is +11.5% — over the
# 5% budget either way, hence smoothing is the default and K defaults 0.
W8A8_OUTLIER_K = int(os.environ.get("LLMSEG_W8A8_OUTLIER_K", "0"))

# SmoothQuant migration strength: s_j = a_max_j^alpha / w_max_j^(1-alpha).
# 0.5 splits the dynamic range evenly between activations and weights.
W8A8_SMOOTH_ALPHA = float(os.environ.get("LLMSEG_W8A8_SMOOTH_ALPHA", "0.5"))


def quantize_dense(p: Dict) -> Dict:
    """{'w': (in, out) float, 'b'?} -> {'w_q': int8, 'w_scale': (out,), 'b'?}."""
    w = p["w"].astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out = {"w_q": q, "w_scale": scale.astype(jnp.float32)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantize_dense_w8a8(p: Dict, s: jnp.ndarray | None = None) -> Dict:
    """Like quantize_dense, but stored under 'w_q8a': the apply path also
    quantizes ACTIVATIONS per token and runs the matmul s8 x s8 -> s32 on
    the MXU's double-rate int8 path (v5e: 394 vs 197 TOPs).  Beyond the
    reference's load_8bit (weight-only dequant): measured 1.5x per matmul
    at LLaMA-7B shapes, opt-in because real-weight selection-quality under
    activation quantization is unvalidated in this checkpoint-less
    environment (ranking probe in bench.py --w8a8).

    `s` (in_dim,) applies SmoothQuant folding: the stored weight is
    w * s[:, None] and the leaf carries 'a_inv' = 1/s, which
    quantize_activation multiplies in before quantizing — exact in fp32
    ((x/s) @ (w*s) == x @ w), and the multiply fuses into the quant pass."""
    if s is not None:
        p = dict(p)
        p["w"] = p["w"].astype(jnp.float32) * s[:, None]
    out = dict(quantize_dense(p))
    out["w_q8a"] = out.pop("w_q")
    if s is not None:
        out["a_inv"] = (1.0 / s).astype(jnp.float32)
    return out


def quantize_dense4(p: Dict, group: int = 128) -> Dict:
    """{'w': (in, out) float, 'b'?} -> {'w_q4': (padded_in/2, out) int8
    packed nibbles, 'w_scale4': (n_groups, out)}.  The original in_dim is
    recovered from x.shape[-1] at apply time (no static leaf: ints in the
    pytree would trace under jit and break slicing)."""
    assert group % 2 == 0
    w = p["w"].astype(jnp.float32)
    in_dim, out_dim = w.shape
    n_groups = -(-in_dim // group)
    wp = jnp.pad(w, ((0, n_groups * group - in_dim), (0, 0)))
    wg = wp.reshape(n_groups, group, out_dim)
    scale = jnp.maximum(jnp.max(jnp.abs(wg), axis=1) / 7.0, 1e-8)
    q = jnp.clip(jnp.round(wg / scale[:, None]), -7, 7)
    q = q.reshape(-1, out_dim).astype(jnp.int8)
    lo, hi = q[0::2], q[1::2]
    packed = jnp.bitwise_or(jnp.bitwise_and(lo, 0xF),
                            jnp.left_shift(hi, 4)).astype(jnp.int8)
    out = {"w_q4": packed, "w_scale4": scale.astype(jnp.float32)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def is_quantized(p: Dict) -> bool:
    return "w_q" in p or "w_q4" in p or "w_q8a" in p


def _qdense4(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    packed = p["w_q4"]
    # arithmetic shifts recover the signed nibbles (two's complement)
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    hi = jnp.right_shift(packed, 4)
    w = jnp.stack([lo, hi], axis=1).reshape(-1, packed.shape[1])
    scale = p["w_scale4"]
    group = w.shape[0] // scale.shape[0]
    wd = (w.reshape(scale.shape[0], group, -1).astype(x.dtype)
          * scale[:, None].astype(x.dtype))
    wd = wd.reshape(-1, packed.shape[1])[:x.shape[-1]]
    y = jax.lax.dot_general(
        x, wd, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in p:
        y = y + p["b"]
    return y


def quantize_activation(x: jnp.ndarray, k: int | None = None,
                        a_inv: jnp.ndarray | None = None) -> Dict:
    """Per-token activation quantization, computed ONCE and shared by every
    w8a8 matmul that consumes the same input (q/k/v share their normed
    hidden state; gate/up share theirs — sharing drops the per-layer
    activation-quant passes from 7 to 4).  Returns
    {'xq' int8 outlier-zeroed, 'sc' per-token scale, 'x_out'/'idx' when the
    outlier decomposition is on}.  All fields depend only on x (and the
    weights' shared smoothing vector), so sharing is exactly equivalent to
    recomputing per matmul.

    a_inv (in_dim,) is the SmoothQuant 1/s vector stored on the weight leaf
    (see quantize_dense_w8a8): one constant vector multiply that XLA fuses
    into the quant pass — the smoothed path costs nothing extra."""
    xf = x.astype(jnp.float32)
    if a_inv is not None:
        xf = xf * a_inv
    in_dim = xf.shape[-1]
    k = min(W8A8_OUTLIER_K if k is None else k, in_dim // 2)
    qa: Dict = {}
    if k > 0:
        # outlier decomposition (see W8A8_OUTLIER_K above): the K
        # largest-|activation| columns go through a small bf16 matmul
        # against dequantized weight rows; the int8 operand sees them
        # as zeros, so the per-token scale is computed outlier-free
        colmax = jnp.max(jnp.abs(xf), axis=tuple(range(xf.ndim - 1)))
        _, idx = jax.lax.top_k(colmax, k)
        qa["idx"] = idx
        qa["x_out"] = jnp.take(xf, idx, axis=-1)         # (..., K)
        keep = jnp.ones((in_dim,), jnp.float32).at[idx].set(0.0)
        xf = xf * keep
    sc = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                     1e-6) / 127.0
    qa["sc"] = sc
    qa["xq"] = jnp.clip(jnp.round(xf / sc), -127, 127).astype(jnp.int8)
    return qa


def qdense_act(p: Dict, qa: Dict, out_dtype) -> jnp.ndarray:
    """s8 x s8 -> s32 MXU dot against a pre-quantized activation (see
    quantize_activation), rescaled by the outer product of activation and
    weight scales, plus the bf16 outlier side matmul."""
    xq = qa["xq"]
    y = jax.lax.dot_general(
        xq, p["w_q8a"],
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * qa["sc"] * p["w_scale"]
    if "idx" in qa:
        w_rows = (p["w_q8a"][qa["idx"]].astype(jnp.float32)
                  * p["w_scale"][None, :])               # (K, out)
        y = y + jax.lax.dot_general(
            qa["x_out"], w_rows, (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    y = y.astype(out_dtype)
    if "b" in p:
        y = y + p["b"]
    return y


def qdense(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """x @ dequant(w).  'w_q' (weight-only int8): cast w to x.dtype in the
    matmul prologue, scale in the epilogue — bf16-rate compute, half the
    weight HBM.  'w_q8a' (W8A8): dynamic per-token activation quant + a
    native s8 x s8 -> s32 MXU dot at double rate, rescaled by the outer
    product of activation and weight scales.  int4: unpack +
    blockwise-dequant then matmul."""
    if "w_q4" in p:
        return _qdense4(p, x)
    if "w_q8a" in p:
        return qdense_act(p, quantize_activation(x, a_inv=p.get("a_inv")),
                          x.dtype)
    y = jax.lax.dot_general(
        x, p["w_q"].astype(x.dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = (y * p["w_scale"]).astype(x.dtype)
    if "b" in p:
        y = y + p["b"]
    return y


def _smooth_scales(a_max, w_max, alpha: float) -> jnp.ndarray:
    """SmoothQuant per-input-channel migration strength:
    s_j = a_max_j^alpha / w_max_j^(1-alpha).  s>1 shrinks an activation
    outlier column (and magnifies its weight row); clipping keeps dead
    channels and degenerate stats from exploding either side."""
    a = jnp.maximum(jnp.asarray(a_max, jnp.float32), 1e-5)
    w = jnp.maximum(jnp.asarray(w_max, jnp.float32), 1e-5)
    return jnp.clip(a ** alpha / w ** (1.0 - alpha), 1e-3, 1e3)


def llama_smooth_map(llm_params: Dict, stats, alpha: float | None = None):
    """path-tuple -> smoothing vector for every LLaMA projection covered by
    calibration.  `stats` is the per-layer list from
    llama.apply(quant_stats=...) / llmseg.calibrate_quant_stats: dicts with
    'attn_in' (q/k/v shared input), 'o_in', 'mlp_in' (gate/up shared),
    'down_in' column maxima.  Shared-input groups get ONE s computed from
    the max |w| across the group, so the shared activation quantization in
    llama._shared_qdense stays exactly equivalent to per-matmul quant.
    lm_head has no calibration site and stays unsmoothed."""
    alpha = W8A8_SMOOTH_ALPHA if alpha is None else alpha
    wmax = jax.jit(lambda w: jnp.max(jnp.abs(w.astype(jnp.float32)), axis=1))
    groups = {"attn_in": ("attn", ("q", "k", "v")),
              "o_in": ("attn", ("o",)),
              "mlp_in": ("mlp", ("gate", "up")),
              "down_in": ("mlp", ("down",))}
    smap = {}
    for i, layer in enumerate(llm_params["layers"]):
        for site, (blk, names) in groups.items():
            wm = None
            for n in names:
                m = wmax(layer[blk][n]["w"])
                wm = m if wm is None else jnp.maximum(wm, m)
            s = _smooth_scales(stats[i][site], wm, alpha)
            for n in names:
                smap[("layers", i, blk, n)] = s
    return smap


def _pick_qfn(bits: int, w8a8: bool):
    assert bits in (8, 4), bits
    assert not (w8a8 and bits == 4), "W8A8 is an int8 mode"
    if bits == 4:
        return quantize_dense4
    return quantize_dense_w8a8 if w8a8 else quantize_dense


def quantize_tree(params, predicate=None, bits: int = 8,
                  w8a8: bool = False, smooth=None):
    """Quantize every dense leaf-dict ({'w': 2D}) in a pytree.  predicate
    (path_tuple -> bool) can exclude subtrees (e.g. norms are left alone —
    they are 1D and skipped automatically).  bits: 8 or 4; w8a8 also
    quantizes activations at apply time (see quantize_dense_w8a8).
    smooth: path-tuple -> s vector map (llama_smooth_map) applying
    SmoothQuant folding to the leaves it covers (w8a8 only)."""
    assert smooth is None or w8a8, "smoothing is a W8A8 mechanism"
    qfn = _pick_qfn(bits, w8a8)

    def walk(node, path):
        if isinstance(node, dict):
            if "w" in node and getattr(node["w"], "ndim", 0) == 2 and (
                    predicate is None or predicate(path)):
                s = smooth.get(path) if smooth else None
                return qfn(node, s) if s is not None else qfn(node)
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, path + (i,))
                              for i, v in enumerate(node))
        return node

    return walk(params, ())


def _llama_pred(path):
    joined = "/".join(str(p) for p in path)
    return "attn" in joined or "mlp" in joined or "lm_head" in joined


def quantize_llama(llm_params: Dict, bits: int = 8, w8a8: bool = False,
                   smooth_stats=None, alpha: float | None = None) -> Dict:
    """Quantize LLaMA projection weights; embeddings and norms stay full
    precision (embedding rows are gathered, not matmul'd).  smooth_stats
    (per-layer calibration column maxima, llmseg.calibrate_quant_stats)
    enables SmoothQuant folding on the W8A8 path."""
    smooth = (llama_smooth_map(llm_params, smooth_stats, alpha)
              if w8a8 and smooth_stats is not None else None)
    return quantize_tree(llm_params, _llama_pred, bits=bits, w8a8=w8a8,
                         smooth=smooth)


def quantize_llama_inplace(llm_params: Dict, bits: int = 8,
                           w8a8: bool = False, smooth_stats=None,
                           alpha: float | None = None) -> Dict:
    """In-place variant for memory-tight live trees (7B bf16 weights are
    13.5 GB of a 16 GB chip: building a second quantized tree while the
    first is still referenced would OOM).  Mutates the dicts leaf by leaf,
    dropping each bf16 weight as soon as its int copy exists, so peak extra
    HBM is one layer's weights, not the whole model's.  Donating the source
    buffer into the jitted per-leaf quantizer lets XLA reuse it.  The
    smoothing map (tiny per-channel vectors) is computed up front, before
    any weight is dropped."""
    smooth = (llama_smooth_map(llm_params, smooth_stats, alpha)
              if w8a8 and smooth_stats is not None else None)
    qfn = jax.jit(_pick_qfn(bits, w8a8), donate_argnums=0)
    qfn_s = (jax.jit(quantize_dense_w8a8, donate_argnums=0)
             if smooth else None)

    def walk(node, path):
        if isinstance(node, dict):
            if "w" in node and getattr(node["w"], "ndim", 0) == 2 and (
                    _llama_pred(path)):
                s = smooth.get(path) if smooth else None
                q = qfn_s(dict(node), s) if s is not None else qfn(dict(node))
                node.clear()
                node.update(q)
                return
            for k, v in node.items():
                walk(v, path + (k,))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, path + (i,))

    walk(llm_params, ())
    return llm_params
