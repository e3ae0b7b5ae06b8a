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
# outlier column is migrated INTO the weights at quantization time by a
# STATIC fold (fold_smooth_llama_inplace): w rows *= s_j, and the matching
# 1/s_j goes into whatever PRODUCES that input — the preceding rmsnorm
# gamma for q/k/v and gate/up, the v (resp. up) output columns for the o
# (resp. down) projection.  The quantized program is bit-identical to
# plain W8A8 — zero runtime cost, no extra leaves; see
# quantize_llama(smooth_stats=...) and llmseg.calibrate_quant_stats.
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

# The same static fold doubles as AWQ-style (Lin et al. 2023) salient-
# channel protection for WEIGHT-ONLY int4: scaling high-activation weight
# rows up gives them finer effective resolution inside their quant group,
# compensated exactly by the producing op.  Activations are NOT quantized
# there, so the optimal migration is much weaker — measured on synthetic
# outlier injection (tiny LLaMA, 4 seeds): corr vs bf16 0.93-0.94 plain ->
# 0.95-0.97 folded across alpha in [0.15, 0.5], sweet spot ~0.25.
W4_SMOOTH_ALPHA = float(os.environ.get("LLMSEG_W4_SMOOTH_ALPHA", "0.25"))


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


def quantize_dense_w8a8(p: Dict) -> Dict:
    """Like quantize_dense, but stored under 'w_q8a': the apply path also
    quantizes ACTIVATIONS per token and runs the matmul s8 x s8 -> s32 on
    the MXU's double-rate int8 path (v5e: 394 vs 197 TOPs).  Beyond the
    reference's load_8bit (weight-only dequant): measured 1.5x per matmul
    at LLaMA-7B shapes, opt-in because real-weight selection-quality under
    activation quantization is unvalidated in this checkpoint-less
    environment (ranking probe in bench.py --w8a8).  SmoothQuant outlier
    folding happens BEFORE this, on the bf16 tree
    (fold_smooth_llama_inplace) — the quantized leaf carries nothing
    extra."""
    out = dict(quantize_dense(p))
    out["w_q8a"] = out.pop("w_q")
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


def quantize_activation(x: jnp.ndarray, k: int | None = None) -> Dict:
    """Per-token activation quantization, computed ONCE and shared by every
    w8a8 matmul that consumes the same input (q/k/v share their normed
    hidden state; gate/up share theirs — sharing drops the per-layer
    activation-quant passes from 7 to 4).  Returns
    {'xq' int8 outlier-zeroed, 'sc' per-token scale, 'x_out'/'idx' when the
    outlier decomposition is on}.  All fields depend only on x, so sharing
    is exactly equivalent to recomputing per matmul."""
    xf = x.astype(jnp.float32)
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


def rms_quantize_activation(x: jnp.ndarray, gamma: jnp.ndarray,
                            eps: float = 1e-6) -> Dict:
    """Per-token int8 quantization of rmsnorm(x; gamma) WITHOUT
    materializing the normed tensor: the per-token rsqrt factor cancels
    inside the int8 values —

        xq = round(127 * x*gamma / max_j |x_j*gamma_j|)
        sc = max_j |x_j*gamma_j| * rsqrt(mean x^2 + eps) / 127

    so rmsnorm -> quantize_activation collapses to one pass over x*gamma
    plus two row reductions, deleting the bf16 normed intermediate (and
    its extra traversals) from every W8A8 norm->matmul site.  Slightly
    MORE precise than the unfused pair: the int8 value is computed from
    f32 x*gamma, not from the bf16-rounded normed tensor.  SmoothQuant
    folding composes unchanged (the fold lands in gamma).  Not compatible
    with the opt-in outlier decomposition (W8A8_OUTLIER_K>0) — callers
    fall back to the unfused path there."""
    xf = x.astype(jnp.float32)
    t = xf * gamma.astype(jnp.float32)
    m = jnp.maximum(jnp.max(jnp.abs(t), axis=-1, keepdims=True), 1e-6)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    sc = m * jax.lax.rsqrt(ms + eps) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(t * (127.0 / m)), -127, 127).astype(jnp.int8)
    return {"xq": xq, "sc": sc}


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
        return qdense_act(p, quantize_activation(x), x.dtype)
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
    channels and degenerate stats from exploding either side.  A site with
    DEGENERATE calibration stats (non-finite, or every activation column
    below noise — e.g. the calibration batch never lit the site up) opts
    out entirely (s = ones): smoothing there has no outliers to migrate
    and a garbage s would only waste weight-quant resolution."""
    a = jnp.asarray(a_max, jnp.float32)
    w = jnp.asarray(w_max, jnp.float32)
    ok = (jnp.all(jnp.isfinite(a)) & jnp.all(jnp.isfinite(w))
          & (jnp.max(a) > 1e-4) & (jnp.max(w) > 1e-8))
    s = jnp.clip(jnp.maximum(a, 1e-5) ** alpha
                 / jnp.maximum(w, 1e-5) ** (1.0 - alpha), 1e-3, 1e3)
    return jnp.where(ok, s, jnp.ones_like(s))


def llama_smooth_plan(llm_params: Dict, stats, alpha: float | None = None,
                      head_dim: int | None = None):
    """Per-layer static-fold vectors from calibration stats.  `stats` is the
    per-layer list from llama.apply(quant_stats=...) /
    llmseg.calibrate_quant_stats: dicts with 'attn_in' (q/k/v shared
    input), 'o_in', 'mlp_in' (gate/up shared), 'down_in' column maxima.
    Shared-input groups get ONE s computed from the max |w| across the
    group (their producer — the rmsnorm gamma — is shared, so it must be).

    Returns one {'attn', 'o', 'o_rows', 'mlp', 'down'} dict of fp32 s
    vectors per layer.  'o' is at V-COLUMN granularity (divides v output
    columns), 'o_rows' is the same scales expanded to o-input-row
    granularity (multiplies o weight rows) — identical under MHA.  Under
    GQA one v column feeds `rep = num_heads/num_kv_heads` o input channels
    (the head repeat), so an exact fold needs ONE scale per kv-shared
    group: s is computed from the group max of both the activation stat
    and the o row |w| max, then folded into the v column and ALL `rep`
    matching o rows — exact, because the repeated channels carry the same
    v value.  The grouping needs `head_dim`; without it GQA falls back to
    skipping the o site ('o' is None) as before.

    lm_head has no calibration site and stays unsmoothed (its input, the
    final-norm hidden state, also feeds the unquantized selection head)."""
    alpha = W8A8_SMOOTH_ALPHA if alpha is None else alpha
    wmax = jax.jit(lambda w: jnp.max(jnp.abs(w.astype(jnp.float32)), axis=1))
    plan = []
    for i, layer in enumerate(llm_params["layers"]):
        a, m = layer["attn"], layer["mlp"]
        wm_qkv = jnp.maximum(jnp.maximum(wmax(a["q"]["w"]),
                                         wmax(a["k"]["w"])),
                             wmax(a["v"]["w"]))
        wm_gu = jnp.maximum(wmax(m["gate"]["w"]), wmax(m["up"]["w"]))
        o_in, v_out = a["o"]["w"].shape[0], a["v"]["w"].shape[1]
        rep = o_in // v_out
        if rep == 1:
            s_o = _smooth_scales(stats[i]["o_in"], wmax(a["o"]["w"]), alpha)
            s_o_rows = s_o
        elif head_dim is not None:
            n_kv = v_out // head_dim
            grp = lambda v: jnp.max(                # noqa: E731
                jnp.asarray(v, jnp.float32).reshape(n_kv, rep, head_dim),
                axis=1).reshape(-1)
            s_o = _smooth_scales(grp(stats[i]["o_in"]),
                                 grp(wmax(a["o"]["w"])), alpha)
            s_o_rows = jnp.broadcast_to(
                s_o.reshape(n_kv, 1, head_dim),
                (n_kv, rep, head_dim)).reshape(-1)
        else:
            s_o = s_o_rows = None
        plan.append({
            "attn": _smooth_scales(stats[i]["attn_in"], wm_qkv, alpha),
            "o": s_o,
            "o_rows": s_o_rows,
            "mlp": _smooth_scales(stats[i]["mlp_in"], wm_gu, alpha),
            "down": _smooth_scales(stats[i]["down_in"], wmax(m["down"]["w"]),
                                   alpha),
        })
    return plan


def fold_smooth_llama_inplace(llm_params: Dict, smooth_stats,
                              alpha: float | None = None,
                              donate: bool = True, lora: Dict | None = None,
                              head_dim: int | None = None) -> Dict:
    """Fold SmoothQuant scaling STATICALLY into the live bf16 tree, in
    place, BEFORE quantization — an exact function-preserving
    reparameterization (same outputs in exact arithmetic):

      input_norm gamma /= s_attn;  q/k/v weight rows *= s_attn
      post_norm  gamma /= s_mlp;   gate/up weight rows *= s_mlp
      v columns (+bias) /= s_o;    o weight rows *= s_o_rows
      up columns (+bias) /= s_down; down weight rows *= s_down

    Each 1/s lands in whatever PRODUCES the quantized matmul's input, so
    after quantization the runtime program is bit-identical to plain W8A8:
    zero inference cost, no extra leaves.  The v/o and up/down folds are
    exact because a v (resp. up) output column feeds exactly one o (resp.
    down) input channel — attention mixes tokens with scalar weights and
    the MLP product is elementwise.  Under GQA, kv-group-shared o scales
    make the fold exact there too, given `head_dim` (see
    llama_smooth_plan); without head_dim GQA skips the o site.

    `lora`: a live LoRA overlay tree (llama.lora_init layout) that will be
    APPLIED AT INFERENCE on top of the folded base — it MUST be passed so
    the overlay is compensated, also exactly and in place:

      q/v lora 'a' rows *= s_attn   (its input is the folded x/s_attn)
      v   lora 'b' cols /= s_o      (the o rows multiply s_o back later)

    Without this, LoRA-q/v see a per-channel-attenuated input and the
    LoRA-v delta gets amplified by s_o downstream — silently wrong outputs
    on the --load_8bit/--load_4bit + adapter eval path.

    donate=False when the leaf buffers are shared with another live tree
    (the functional quantize_llama path) — donation would invalidate the
    caller's arrays."""
    plan = llama_smooth_plan(llm_params, smooth_stats, alpha, head_dim)
    dn = (0,) if donate else ()
    rows = jax.jit(lambda w, s: (w.astype(jnp.float32)
                                 * s[:, None]).astype(w.dtype),
                   donate_argnums=dn)
    rows_cols = jax.jit(lambda w, sr, sc: (w.astype(jnp.float32)
                                           * sr[:, None]
                                           / sc[None, :]).astype(w.dtype),
                        donate_argnums=dn)
    cols_div = jax.jit(lambda w, s: (w.astype(jnp.float32)
                                     / s[None, :]).astype(w.dtype),
                       donate_argnums=dn)
    vdiv = jax.jit(lambda g, s: (g.astype(jnp.float32) / s).astype(g.dtype),
                   donate_argnums=dn)
    lora_layers = (lora or {}).get("layers", [None] * len(plan))
    for layer, e, ll in zip(llm_params["layers"], plan, lora_layers):
        a, m = layer["attn"], layer["mlp"]
        layer["input_norm"]["scale"] = vdiv(layer["input_norm"]["scale"],
                                            e["attn"])
        a["q"]["w"] = rows(a["q"]["w"], e["attn"])
        a["k"]["w"] = rows(a["k"]["w"], e["attn"])
        if e["o"] is None:
            a["v"]["w"] = rows(a["v"]["w"], e["attn"])
        else:
            a["v"]["w"] = rows_cols(a["v"]["w"], e["attn"], e["o"])
            if "b" in a["v"]:
                a["v"]["b"] = vdiv(a["v"]["b"], e["o"])
            a["o"]["w"] = rows(a["o"]["w"], e["o_rows"])
        if ll:
            unknown = set(ll) - {"q", "v"}
            assert not unknown, (
                f"LoRA targets {unknown} have no SmoothQuant compensation; "
                "extend fold_smooth_llama_inplace before folding")
            for name in ("q", "v"):
                if name in ll:
                    ll[name]["a"] = rows(ll[name]["a"], e["attn"])
            if "v" in ll and e["o"] is not None:
                ll["v"]["b"] = cols_div(ll["v"]["b"], e["o"])
        layer["post_norm"]["scale"] = vdiv(layer["post_norm"]["scale"],
                                           e["mlp"])
        m["gate"]["w"] = rows(m["gate"]["w"], e["mlp"])
        m["up"]["w"] = rows_cols(m["up"]["w"], e["mlp"], e["down"])
        if "b" in m["up"]:
            m["up"]["b"] = vdiv(m["up"]["b"], e["down"])
        m["down"]["w"] = rows(m["down"]["w"], e["down"])
    return llm_params


def _pick_qfn(bits: int, w8a8: bool):
    assert bits in (8, 4), bits
    assert not (w8a8 and bits == 4), "W8A8 is an int8 mode"
    if bits == 4:
        return quantize_dense4
    return quantize_dense_w8a8 if w8a8 else quantize_dense


def quantize_tree(params, predicate=None, bits: int = 8,
                  w8a8: bool = False):
    """Quantize every dense leaf-dict ({'w': 2D}) in a pytree.  predicate
    (path_tuple -> bool) can exclude subtrees (e.g. norms are left alone —
    they are 1D and skipped automatically).  bits: 8 or 4; w8a8 also
    quantizes activations at apply time (see quantize_dense_w8a8)."""
    qfn = _pick_qfn(bits, w8a8)

    def walk(node, path):
        if isinstance(node, dict):
            if "w" in node and getattr(node["w"], "ndim", 0) == 2 and (
                    predicate is None or predicate(path)):
                return qfn(node)
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
                   smooth_stats=None, alpha: float | None = None,
                   head_dim: int | None = None) -> Dict:
    """Quantize LLaMA projection weights; embeddings and norms stay full
    precision (embedding rows are gathered, not matmul'd).  smooth_stats
    (per-layer calibration column maxima, llmseg.calibrate_quant_stats)
    applies the calibration static fold before quantizing: SmoothQuant
    outlier migration for W8A8, AWQ-style salient-channel protection for
    weight-only int4 (weaker default alpha, W4_SMOOTH_ALPHA); weight-only
    int8's quant error is already negligible, so stats are ignored there.
    The input tree is never mutated (the fold runs on fresh containers,
    without buffer donation).

    If a LoRA overlay will be applied at inference on top of the quantized
    base, use quantize_llama_inplace(lora=...) (or call
    fold_smooth_llama_inplace(lora=...) yourself): with smooth_stats an
    UNCOMPENSATED overlay on the folded base is silently wrong."""
    if smooth_stats is not None and (w8a8 or bits == 4):
        if alpha is None and not w8a8:
            alpha = W4_SMOOTH_ALPHA
        llm_params = jax.tree.map(lambda x: x, llm_params)
        fold_smooth_llama_inplace(llm_params, smooth_stats, alpha,
                                  donate=False, head_dim=head_dim)
    return quantize_tree(llm_params, _llama_pred, bits=bits, w8a8=w8a8)


def quantize_llama_inplace(llm_params: Dict, bits: int = 8,
                           w8a8: bool = False, smooth_stats=None,
                           alpha: float | None = None,
                           lora: Dict | None = None,
                           head_dim: int | None = None) -> Dict:
    """In-place variant for memory-tight live trees (7B bf16 weights are
    13.5 GB of a 16 GB chip: building a second quantized tree while the
    first is still referenced would OOM).  Mutates the dicts leaf by leaf,
    dropping each bf16 weight as soon as its int copy exists, so peak extra
    HBM is one layer's weights, not the whole model's.  Donating the source
    buffer into the jitted per-leaf quantizer lets XLA reuse it.  With
    smooth_stats, the calibration fold runs first, also in place with
    donated buffers (peak extra HBM: one leaf).  `lora`: the live LoRA
    overlay that will be applied at inference — REQUIRED whenever one
    exists and smooth_stats is given, so the fold compensates it (see
    fold_smooth_llama_inplace); `head_dim` enables the exact GQA o-site
    fold."""
    if smooth_stats is not None and (w8a8 or bits == 4):
        if alpha is None and not w8a8:
            alpha = W4_SMOOTH_ALPHA
        fold_smooth_llama_inplace(llm_params, smooth_stats, alpha,
                                  lora=lora, head_dim=head_dim)
    qfn = jax.jit(_pick_qfn(bits, w8a8), donate_argnums=0)

    def walk(node, path):
        if isinstance(node, dict):
            if "w" in node and getattr(node["w"], "ndim", 0) == 2 and (
                    _llama_pred(path)):
                q = qfn(dict(node))
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
