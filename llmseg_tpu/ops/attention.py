"""Attention primitives: Pallas TPU flash attention + XLA reference path.

TPU-native replacement for the reference's two GPU attention routes:
  * vendored Triton flash kernel (reference model/llava/model/language_model/
    mpt/flash_attn_triton.py) and
  * the flash-attn CUDA monkey-patch (reference model/llava/train/
    llama_flash_attn_monkey_patch.py).

One kernel serves LLaMA (causal), the selection head and SAM decoder
(bidirectional, optional additive bias).  The public entry is
:func:`attention`; it dispatches to the Pallas kernel on TPU for sequences
long enough to matter and to a fused XLA softmax-attention otherwise.

Layout: q (B, T, H, D), k/v (B, S, H, D) -> out (B, T, H, D).
Softmax statistics are fp32 throughout; matmuls hit the MXU in input dtype.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIGHEST = jax.lax.Precision.HIGHEST


def _prec(x):
    # HIGHEST forces true-fp32 MXU passes for fp32 operands (and exact CPU
    # matmuls in tests); for bf16 operands the native MXU path is already
    # exact-in-dtype and Mosaic rejects HIGHEST, so use default.
    return HIGHEST if x.dtype == jnp.float32 else None

NEG_INF = -1e9  # finite: keeps exp() NaN-free for fully masked rows
LOG2E = 1.4426950408889634   # log2(e)
INV_LOG2E = 1.0 / LOG2E
# Softmax runs in the exp2 domain, and the full factor scale*log2(e) is
# folded into q OUTSIDE the kernel (XLA fuses it into the pad/transpose
# copy): every exp(s - m) becomes exp2(s - m) on pre-scaled logits, deleting
# both the hidden exp multiply (hardware computes exp as exp2(x * log2e))
# and the explicit scale multiply over each (block_q, S) logits tile from a
# VPU-bound kernel.  All statistics (m, lse) live in the log2 domain; the
# backward kernels consume the same-domain lse, recompute logits from the
# pre-scaled q they received, and apply the single 1/log2(e) correction to
# dq/dk on the small (block, D) outputs.  The q-prescale chain rule is
# handled by XLA autodiff of the outer multiply.


def _interpret():
    return jax.default_backend() != "tpu"


def _cdiv(a, b):
    return -(-a // b)


def _round_up(a, b):
    return _cdiv(a, b) * b


# ---------------------------------------------------------------------------
# XLA reference path
# ---------------------------------------------------------------------------


def attention_xla(q, k, v, *, bias=None, causal=False, scale=None):
    """Plain attention; XLA fuses this well at short sequence lengths.

    q: (B, T, H, D); k, v: (B, S, H, D); bias broadcastable to (B, H, T, S).
    """
    B, T, H, D = q.shape
    S = k.shape[1]
    scale = (1.0 / math.sqrt(D)) if scale is None else scale
    logits = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32,
                        precision=_prec(q)) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
        logits = jnp.where((col <= row)[None, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32,
                     precision=_prec(v))
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention — forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, *refs, causal,
                block_q, block_k, s_real, num_k_blocks, has_bias=False):
    if has_bias:
        bias_ref, o_ref = refs[0], refs[1]
        lse_ref = refs[2] if len(refs) > 2 else None
    else:
        bias_ref, o_ref = None, refs[0]
        lse_ref = refs[1] if len(refs) > 1 else None
    qi = pl.program_id(1)
    q = q_ref[0]                                          # (Bq, D) native dtype
    m = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, q.shape[-1]), jnp.float32)

    if causal:
        hi = jax.lax.div(qi * block_q + block_q + block_k - 1, block_k)
        hi = jnp.minimum(hi, num_k_blocks)
        # k-blocks entirely below the diagonal AND inside s_real need no mask
        full_hi = jnp.minimum(jax.lax.div(qi * block_q, block_k),
                              s_real // block_k)
    else:
        hi = num_k_blocks
        full_hi = jnp.minimum(s_real // block_k, num_k_blocks)

    row_ids = (qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0)) if causal else None

    def body(kj, carry, masked):
        # masked=False skips the iota/compare/where work on the VPU — the
        # kernel is VPU-bound (softmax + masking), not MXU-bound, at small
        # head_dim, so skipping the mask on interior blocks is a real win
        m, l, acc = carry
        kblk = k_ref[0, pl.ds(kj * block_k, block_k), :]
        vblk = v_ref[0, pl.ds(kj * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, kblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(q))              # (Bq, Bk) log2 (q pre-scaled)
        if has_bias:
            # bias is pre-multiplied by LOG2E by the caller
            s = s + bias_ref[0, :, pl.ds(kj * block_k, block_k)].astype(
                jnp.float32)
        if masked:
            if causal:
                col_ids = kj * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1)
                mask = jnp.logical_and(col_ids < s_real, col_ids <= row_ids)
                s = jnp.where(mask, s, NEG_INF)
            else:
                # padding-only mask: one broadcast-add of a (1, Bk) row
                # instead of per-element iota/compare/select over the tile
                col_row = kj * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (1, block_k), 1)
                s = s + jnp.where(col_row < s_real, 0.0, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp2(m - m_new)
        p = jnp.exp2(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot(
            p.astype(vblk.dtype), vblk, preferred_element_type=jnp.float32,
            precision=_prec(vblk))
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(
        0, full_hi, functools.partial(body, masked=False), (m, l, acc))
    m, l, acc = jax.lax.fori_loop(
        full_hi, hi, functools.partial(body, masked=True), (m, l, acc))
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    if lse_ref is not None:
        lse_ref[0] = m + jnp.log2(l_safe)   # log2-domain lse


def _flash_fwd(q, k, v, *, causal, block_q, block_k, s_real,
               with_lse=True, bias=None):
    """q: (BH, T, D) padded AND pre-scaled by scale*log2(e); k, v: (BH, S, D)
    padded; bias optional (BH or 1, T, S) additive log2-domain logits bias.
    with_lse=False for pure inference: the log-sum-exp output (needed only
    by the backward pass) is skipped, saving its HBM allocation."""
    BH, T, D = q.shape
    S = k.shape[1]
    nq, nk = T // block_q, S // block_k
    kern = functools.partial(
        _fwd_kernel, causal=causal, block_q=block_q,
        block_k=block_k, s_real=s_real, num_k_blocks=nk,
        has_bias=bias is not None)
    in_specs = [
        pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, S, D), lambda bh, qi: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, S, D), lambda bh, qi: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = (q, k, v)
    if bias is not None:
        bb = bias.shape[0]
        in_specs.append(
            pl.BlockSpec((1, block_q, S),
                         (lambda bh, qi: (bh, qi, 0)) if bb == BH
                         else (lambda bh, qi: (0, qi, 0)),
                         memory_space=pltpu.VMEM))
        inputs = (q, k, v, bias)
    o_spec = pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0),
                          memory_space=pltpu.VMEM)
    o_shape = jax.ShapeDtypeStruct((BH, T, D), q.dtype)
    cost = pl.CostEstimate(
        flops=4 * BH * T * S * D,
        bytes_accessed=2 * BH * (T + 2 * S) * D * q.dtype.itemsize,
        transcendentals=BH * T * S)
    if not with_lse:
        o = pl.pallas_call(
            kern, grid=(BH, nq), in_specs=in_specs, out_specs=o_spec,
            out_shape=o_shape, cost_estimate=cost,
            interpret=_interpret())(*inputs)
        return o, None
    o, lse = pl.pallas_call(
        kern,
        grid=(BH, nq),
        in_specs=in_specs,
        out_specs=[
            o_spec,
            pl.BlockSpec((1, block_q, 1), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            o_shape,
            jax.ShapeDtypeStruct((BH, T, 1), jnp.float32),
        ],
        cost_estimate=cost,
        interpret=_interpret(),
    )(*inputs)
    return o, lse


# ---------------------------------------------------------------------------
# Pallas flash attention — fused single-pass forward (non-causal inference)
# ---------------------------------------------------------------------------
#
# At DINOv2@896 (T=S=4097, D=64, 16 heads) the exact-max kernel above is
# VPU-bound: with a single k-block it still spends the max and sum reduce
# passes over each (block_q, S) logits tile on top of the irreducible
# sub+exp2+cast pass, while the QK matmul runs at half MXU depth (D=64 of
# 128).  This variant's hot loop is exactly ONE elementwise pass
# (sub+exp2+cast); everything else rides the MXU or is O(rows):
#
#   * stability bias ON THE VPU AS A (Bq, 1) ROW TERM: b_row =
#     max(|q_row| * max_j |k_j|, 1) is a Cauchy-Schwarz upper bound on the
#     row max, so exp2(s - b_row) never overflows and is mathematically
#     the same softmax for ANY b >= rowmax.  |q_row| is a tiny (Bq, D)
#     reduce in-kernel; max_j |k_j| is ONE precomputed f32 scalar per BH
#     row fed through SMEM.  The r4 variant fused b_row into an extra QK
#     contraction lane instead — and paid for it outside the kernel: the
#     q_ext/k_ext concats + norm passes cost ~0.2 ms/layer of HBM traffic,
#     which ate the entire kernel-side win (measured 1.001 vs 1.009).
#   * key-padding handled by DATA, not masking: padded v rows are zero and
#     the denominator lane (below) is 0 there, so padded keys contribute
#     nothing to either output — no iota/compare/select in the hot pass.
#   * softmax denominator ON THE MXU: v_ext = [v, valid] makes the PV dot
#     emit [p @ v, sum_{valid} p] in one pass; the epilogue divides.  The
#     valid-lane (1 real / 0 padded) IS the key mask.
#   * underflow rescue WITHOUT recompute: b_row is not baked into the
#     logits (unlike r4's fused lane, whose subtraction suffered f32
#     cancellation and forced a second clean QK dot — the extra (Bq, S)
#     tile blew Mosaic's 16 MB scoped-vmem stack at the batch-4 grid), so
#     the rare deep-underflow branch reuses the SAME s tile with the exact
#     row max.  Fits at every grid.
#
# Used for the inference-only primal of non-causal single-k-block shapes
# (DINOv2/CLIP towers); training forwards keep the exact-max kernel whose
# lse feeds the backward kernels.  Measured (v5e, slope-timed): 0.834 vs
# 1.009 ms/layer at (1, 4097, 16, 64) — 17% off the DINO attention floor.
# Escape hatch: LLMSEG_ATTN_ONEPASS=0 restores the exact-max primal.
ONEPASS = os.environ.get("LLMSEG_ATTN_ONEPASS", "1") == "1"
# Transposed-output variant of the one-pass kernel: both MXU dots run with
# the q-block on the LANE (output) dimension.  Rationale, measured on v5e
# (isolated dots at the DINOv2@896 batch-4 grid): the straight PV dot
# (320, 4160) @ (4160, 65) leaves half the 128 MXU output lanes idle —
# padding N from 65 to 128 costs nothing (4.09 vs 3.96 us/step) — while the
# transposed form (65, 4160) @ (4160, 320) runs 22% faster (3.17 us).  The
# kernel computes s^T = k @ q^T (Sp, Bq) and o^T = v_ext^T @ p^T (De, Bq),
# so the q-block width (a 128-multiple) fills the lanes of BOTH dots.
ONEPASS_T = os.environ.get("LLMSEG_ATTN_ONEPASS_T", "0") == "1"


def _fwd1_kernel(kmax_ref, q_ref, k_ref, v_ref, o_ref, *, d_out, s_real):
    q = q_ref[0]                                 # (Bq, D) pre-scaled log2
    f32 = jnp.float32
    # Cauchy-Schwarz row bound: |q_row| * max_j |k_j| >= rowmax(s), so
    # p = exp2(s - b) <= 1 (no overflow possible); clamped >= 1 so zero
    # q rows keep padded-key junk (s=0) below 2^-1
    qn = jnp.sqrt(jnp.sum(jnp.square(q.astype(f32)), -1, keepdims=True))
    b_row = jnp.maximum(qn * kmax_ref[pl.program_id(0), 0], 1.0)  # (Bq, 1)
    s = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_prec(q))  # (Bq, S) raw log2 logits
    p = jnp.exp2(s - b_row).astype(v_ref.dtype)  # the ONLY hot VPU pass
    acc = jax.lax.dot(p, v_ref[0], preferred_element_type=jnp.float32,
                      precision=_prec(q))        # (Bq, D+1) = [o*l, l]
    l = acc[:, d_out:d_out + 1]
    # Underflow rescue: the Cauchy bound can sit arbitrarily far above the
    # true row max for near-orthogonal big-norm q/k (p_max = 2^-gap; past
    # gap ~126 the whole row flushes to zero).  Real post-LN activations
    # never get close, so the predicate is ~always false; when it fires,
    # the block redoes the softmax with the exact per-row max ON THE SAME
    # s TILE — b_row was never baked into s, so s is the clean QK dot and
    # no recompute (= no second (Bq, S) f32 tile) is needed.  The
    # threshold is 2^-40-ish, not the underflow line: rows kept on the
    # fast path must have p_max far from subnormals or they shed mantissa
    # bits (seen as 5e-5-level output error in the adversarial test).
    ok = jnp.all(l > 1e-12)   # gap < ~40: p_max well inside normal f32

    @pl.when(ok)
    def _fast():
        o_ref[0] = (acc[:, :d_out] / l).astype(o_ref.dtype)

    @pl.when(jnp.logical_not(ok))
    def _exact():
        col = jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[-1]), 1)
        sm = s + jnp.where(col < s_real, 0.0, NEG_INF)
        m = jnp.max(sm, axis=-1, keepdims=True)
        p2 = jnp.exp2(sm - m).astype(v_ref.dtype)
        acc2 = jax.lax.dot(p2, v_ref[0], preferred_element_type=jnp.float32,
                           precision=_prec(q))
        l2 = acc2[:, d_out:d_out + 1]
        o_ref[0] = (acc2[:, :d_out]
                    / jnp.maximum(l2, 1e-30)).astype(o_ref.dtype)


def _flash_fwd_1pass(q, k, v, *, block_q, s_real):
    """q: (BH, Tp, D) padded AND pre-scaled by scale*log2(e); k, v:
    (BH, Sp, D) padded.  Non-causal, whole key row per instance."""
    BH, Tp, D = q.shape
    Sp = k.shape[1]
    f32 = jnp.float32
    # one scalar per BH row: max key L2 norm (SMEM operand; padded k rows
    # are zero and cannot win the max)
    kmax = jnp.max(jnp.sqrt(jnp.sum(jnp.square(k.astype(f32)), -1)),
                   axis=-1, keepdims=True)            # (BH, 1) f32
    # denominator-and-validity lane: 1 on real keys, 0 on padding — the PV
    # dot then emits sum_{valid} p, and padded keys (zero v rows, zero
    # lane) vanish from both outputs with no in-kernel masking
    col = jax.lax.broadcasted_iota(jnp.int32, (1, Sp, 1), 1)
    lane = jnp.where(col < s_real, 1.0, 0.0).astype(v.dtype)
    v_ext = jnp.concatenate(
        [v, jnp.broadcast_to(lane, (BH, Sp, 1))], -1)
    De = D + 1
    o = pl.pallas_call(
        functools.partial(_fwd1_kernel, d_out=D, s_real=s_real),
        grid=(BH, Tp // block_q),
        in_specs=[
            # whole (BH, 1) array in SMEM (TPU rejects blocked SMEM specs);
            # the kernel indexes its row by program_id
            pl.BlockSpec((BH, 1), lambda bh, qi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp, De), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Tp, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Tp * Sp * De,
            bytes_accessed=2 * BH * (Tp + 2 * Sp) * De * q.dtype.itemsize,
            transcendentals=BH * Tp * Sp),
        interpret=_interpret(),
    )(kmax, q, k, v_ext)
    return o


def _fwd1t_kernel(kmax_ref, qt_ref, k_ref, vt_ref, ot_ref, *, d_out, s_real):
    """Transposed one-pass forward: see the ONEPASS_T note.  qt (D, Bq)
    pre-scaled log2; k (Sp, D); vt = [v; valid-lane]^T (De, Sp);
    out o^T (D, Bq).  Same math as _fwd1_kernel with every tile
    transposed: the stability bound is a (1, Bq) column term, the
    denominator is row d_out of the V^T P dot."""
    qt = qt_ref[0]                               # (D, Bq)
    f32 = jnp.float32
    qn = jnp.sqrt(jnp.sum(jnp.square(qt.astype(f32)), 0, keepdims=True))
    b_col = jnp.maximum(qn * kmax_ref[pl.program_id(0), 0], 1.0)  # (1, Bq)
    s = jax.lax.dot_general(k_ref[0], qt, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_prec(qt))  # (Sp, Bq) raw log2 logits
    p = jnp.exp2(s - b_col).astype(vt_ref.dtype)  # the ONLY hot VPU pass
    acc = jax.lax.dot(vt_ref[0], p, preferred_element_type=jnp.float32,
                      precision=_prec(qt))        # (De, Bq) = [o^T*l; l]
    l = acc[d_out:d_out + 1, :]
    ok = jnp.all(l > 1e-12)   # see _fwd1_kernel: rescue predicate

    @pl.when(ok)
    def _fast():
        ot_ref[0] = (acc[:d_out, :] / l).astype(ot_ref.dtype)

    @pl.when(jnp.logical_not(ok))
    def _exact():
        row = jax.lax.broadcasted_iota(jnp.int32, (s.shape[0], 1), 0)
        sm = s + jnp.where(row < s_real, 0.0, NEG_INF)
        m = jnp.max(sm, axis=0, keepdims=True)
        p2 = jnp.exp2(sm - m).astype(vt_ref.dtype)
        acc2 = jax.lax.dot(vt_ref[0], p2,
                           preferred_element_type=jnp.float32,
                           precision=_prec(qt))
        l2 = acc2[d_out:d_out + 1, :]
        ot_ref[0] = (acc2[:d_out, :]
                     / jnp.maximum(l2, 1e-30)).astype(ot_ref.dtype)


def _flash_fwd_1pass_t(q, k, v, *, block_q, s_real):
    """Transposed-output one-pass kernel.  q: (BH, Tp, D) padded and
    pre-scaled; k, v: (BH, Sp, D) padded.  Returns o (BH, Tp, D); the
    in/out transposes compose with the caller's pad/transpose prep and
    epilogue (XLA folds transpose chains into one copy)."""
    BH, Tp, D = q.shape
    Sp = k.shape[1]
    f32 = jnp.float32
    kmax = jnp.max(jnp.sqrt(jnp.sum(jnp.square(k.astype(f32)), -1)),
                   axis=-1, keepdims=True)            # (BH, 1) f32
    col = jax.lax.broadcasted_iota(jnp.int32, (1, Sp, 1), 1)
    lane = jnp.where(col < s_real, 1.0, 0.0).astype(v.dtype)
    v_ext = jnp.concatenate(
        [v, jnp.broadcast_to(lane, (BH, Sp, 1))], -1)
    De = D + 1
    qt = q.transpose(0, 2, 1)                         # (BH, D, Tp)
    vt = v_ext.transpose(0, 2, 1)                     # (BH, De, Sp)
    ot = pl.pallas_call(
        functools.partial(_fwd1t_kernel, d_out=D, s_real=s_real),
        grid=(BH, Tp // block_q),
        in_specs=[
            pl.BlockSpec((BH, 1), lambda bh, qi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, D, block_q), lambda bh, qi: (bh, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, De, Sp), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, D, block_q), lambda bh, qi: (bh, 0, qi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, D, Tp), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Tp * Sp * De,
            bytes_accessed=2 * BH * (Tp + 2 * Sp) * De * q.dtype.itemsize,
            transcendentals=BH * Tp * Sp),
        interpret=_interpret(),
    )(kmax, qt, k, vt)
    return ot.transpose(0, 2, 1)


# ---------------------------------------------------------------------------
# Pallas flash attention — backward
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, dq_ref, *,
                   causal, block_q, block_k, s_real, num_k_blocks):
    qi = pl.program_id(1)
    q = q_ref[0]
    o = o_ref[0].astype(jnp.float32)
    do = do_ref[0]
    lse = lse_ref[0]                                         # (Bq, 1)
    delta = jnp.sum(do.astype(jnp.float32) * o, axis=-1,
                    keepdims=True)                           # (Bq, 1)
    dq = jnp.zeros((q.shape[0], q.shape[1]), jnp.float32)

    if causal:
        hi = jax.lax.div(qi * block_q + block_q + block_k - 1, block_k)
        hi = jnp.minimum(hi, num_k_blocks)
        full_hi = jnp.minimum(jax.lax.div(qi * block_q, block_k),
                              s_real // block_k)
    else:
        hi = num_k_blocks
        full_hi = jnp.minimum(s_real // block_k, num_k_blocks)

    row_ids = (qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0)) if causal else None

    def body(kj, dq, masked):
        kblk = k_ref[0, pl.ds(kj * block_k, block_k), :]
        vblk = v_ref[0, pl.ds(kj * block_k, block_k), :]
        s = jax.lax.dot_general(q, kblk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=_prec(q))       # q pre-scaled
        if masked:
            if causal:
                col_ids = kj * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1)
                mask = jnp.logical_and(col_ids < s_real, col_ids <= row_ids)
                s = jnp.where(mask, s, NEG_INF)
            else:
                col_row = kj * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (1, block_k), 1)
                s = s + jnp.where(col_row < s_real, 0.0, NEG_INF)
        p = jnp.exp2(s - lse)
        dp = jax.lax.dot_general(do, vblk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=_prec(do))
        ds = p * (dp - delta)
        return dq + jax.lax.dot(ds.astype(kblk.dtype), kblk,
                                preferred_element_type=jnp.float32,
                                precision=_prec(kblk))

    dq = jax.lax.fori_loop(0, full_hi,
                           functools.partial(body, masked=False), dq)
    dq = jax.lax.fori_loop(full_hi, hi,
                           functools.partial(body, masked=True), dq)
    # dq here is w.r.t. the PRE-SCALED q the kernel received; its logits are
    # log2-domain, so the softmax chain carries an extra log2(e) that this
    # 1/log2(e) cancels (the outer q*scale*log2e multiply backprops itself)
    dq_ref[0] = (dq * INV_LOG2E).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                    dk_ref, dv_ref, *, causal, block_q, block_k,
                    s_real, num_q_blocks):
    kj = pl.program_id(1)
    k = k_ref[0]                                             # (Bk, D)
    v = v_ref[0]
    dk = jnp.zeros(k.shape, jnp.float32)
    dv = jnp.zeros(v.shape, jnp.float32)

    if causal:
        lo = jax.lax.div(kj * block_k, block_q)
    else:
        lo = 0
    # q-blocks needing no mask: the whole k-block lies inside s_real and
    # (causal) every row of the q-block is at/after the k-block's last column
    inside = (kj * block_k + block_k) <= s_real
    if causal:
        mlo = jax.lax.div(kj * block_k + block_k - 1 + block_q - 1, block_q)
        mlo = jnp.maximum(mlo, lo)
    else:
        mlo = lo
    mlo = jnp.where(inside, mlo, num_q_blocks)

    if causal:
        col_ids = kj * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        pad_row = None
    else:
        col_ids = None
        col_row = kj * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)
        pad_row = jnp.where(col_row < s_real, 0.0, NEG_INF)

    def body(qi, carry, masked):
        dk, dv = carry
        qblk = q_ref[0, pl.ds(qi * block_q, block_q), :]
        oblk = o_ref[0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        doblk = do_ref[0, pl.ds(qi * block_q, block_q), :]
        lse = lse_ref[0, pl.ds(qi * block_q, block_q), :]
        delta = jnp.sum(doblk.astype(jnp.float32) * oblk, axis=-1,
                        keepdims=True)
        s = jax.lax.dot_general(qblk, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=_prec(qblk))      # q pre-scaled
        if masked:
            if causal:
                row_ids = qi * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0)
                mask = jnp.logical_and(col_ids < s_real, col_ids <= row_ids)
                s = jnp.where(mask, s, NEG_INF)
            else:
                s = s + pad_row
        p = jnp.exp2(s - lse)                                # (Bq, Bk)
        pc = p.astype(doblk.dtype)
        dv = dv + jax.lax.dot_general(pc, doblk, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32,
                                      precision=_prec(doblk))
        dp = jax.lax.dot_general(doblk, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=_prec(v))
        ds = (p * (dp - delta)).astype(qblk.dtype)
        dk = dk + jax.lax.dot_general(ds, qblk, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32,
                                      precision=_prec(qblk))
        return dk, dv

    dk, dv = jax.lax.fori_loop(lo, mlo, functools.partial(body, masked=True),
                               (dk, dv))
    dk, dv = jax.lax.fori_loop(mlo, num_q_blocks,
                               functools.partial(body, masked=False),
                               (dk, dv))
    # 1/log2(e): see _bwd_dq_kernel (kernel q is pre-scaled, logits log2)
    dk_ref[0] = (dk * INV_LOG2E).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd(res, g, *, causal, block_q, block_k, s_real):
    q, k, v, o, lse = res
    BH, T, D = q.shape
    S = k.shape[1]
    nq, nk = T // block_q, S // block_k

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, causal=causal,
                          block_q=block_q, block_k=block_k, s_real=s_real,
                          num_k_blocks=nk),
        grid=(BH, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, T, D), q.dtype),
            interpret=_interpret(),
    )(q, k, v, o, g, lse)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, causal=causal,
                          block_q=block_q, block_k=block_k, s_real=s_real,
                          num_q_blocks=nq),
        grid=(BH, nk),
        in_specs=[
            pl.BlockSpec((1, T, D), lambda bh, kj: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda bh, kj: (bh, kj, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda bh, kj: (bh, kj, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda bh, kj: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda bh, kj: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 1), lambda bh, kj: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, D), lambda bh, kj: (bh, kj, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda bh, kj: (bh, kj, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, S, D), k.dtype),
            jax.ShapeDtypeStruct((BH, S, D), v.dtype),
        ],
            interpret=_interpret(),
    )(q, k, v, o, g, lse)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_attention(q, k, v, causal, block_q, block_k, s_real):
    # inference primal only (the grad path traces _flash_attention_fwd
    # instead): non-causal single-k-block shapes take the fused one-pass
    # kernel — sub+exp2+cast is its only VPU pass over the logits tile
    # (default on; LLMSEG_ATTN_ONEPASS=0 restores the exact-max primal)
    if ONEPASS and not causal and k.shape[1] == block_k:
        if ONEPASS_T:
            return _flash_fwd_1pass_t(q, k, v, block_q=block_q,
                                      s_real=s_real)
        return _flash_fwd_1pass(q, k, v, block_q=block_q, s_real=s_real)
    o, _ = _flash_fwd(q, k, v, causal=causal, block_q=block_q,
                      block_k=block_k, s_real=s_real, with_lse=False)
    return o


def _flash_attention_fwd(q, k, v, causal, block_q, block_k, s_real):
    o, lse = _flash_fwd(q, k, v, causal=causal, block_q=block_q,
                        block_k=block_k, s_real=s_real)
    return o, (q, k, v, o, lse)


def _flash_attention_bwd(causal, block_q, block_k, s_real, res, g):
    return _flash_bwd(res, g, causal=causal, block_q=block_q,
                      block_k=block_k, s_real=s_real)


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


def flash_attention(q, k, v, *, causal=False, scale=None,
                    block_q=None, block_k=None):
    # default 512x512 blocks: measured 2-3x faster than 256x256 at seq 4096
    # on v5e (VMEM can hold q-block + full K/V comfortably at these sizes)
    """Pallas flash attention.  q: (B, T, H, D); k, v: (B, S, H, D).

    T, S, D are padded internally to hardware-friendly multiples; key padding
    is masked inside the kernel, query padding is sliced off the output.
    block_q/block_k default to a measured per-shape policy; explicit values
    are honored.
    """
    B, T, H, D = q.shape
    S = k.shape[1]
    scale = (1.0 / math.sqrt(D)) if scale is None else scale
    bk_user = block_k
    block_q = 512 if block_q is None else block_q
    block_k = 512 if block_k is None else block_k
    if causal and T <= 2048:
        # small causal shapes: 256 q-blocks pad T to the next multiple of
        # 256 instead of 512 (LLaMA's 767-token sequences: 768 vs 1024
        # padded, measured 3.4x faster — 0.046 vs 0.158 ms/layer on v5e)
        # and give the diagonal clamp finer granularity.
        block_q = min(block_q, 256)
        if bk_user is None and S <= 2048:
            # whole key row per step: fewer, fatter grid steps beat the
            # per-block diagonal skip at these sizes (r5 sweep at
            # (4, 767, 32, 128) W8A8 batch point: 0.592 -> 0.495 ms/layer;
            # 768x768 0.531, 512x512 0.662)
            block_k = _round_up(S, 128)
        else:
            block_k = min(block_k, 256)
    block_q = min(block_q, _round_up(T, 128))
    block_k = min(block_k, _round_up(S, 128))
    if not causal and S <= 4608:
        # single k-block: the whole key row in one iteration drops the
        # running-max bookkeeping (one rescale instead of S/block_k) —
        # measured 6% faster at the DINOv2@896 shape.  Causal keeps small
        # blocks: the per-block diagonal clamp skips ~half the work.
        block_k = _round_up(S, 128)
        if ONEPASS and ONEPASS_T:
            # transposed variant: block_q is the LANE dim of both dots, so
            # it must be a 128-multiple; 384 fits the tile budget at the
            # DINOv2@896 grid (s^T 6.4MB f32 + p^T 3.2MB + k/v^T ~1.1MB)
            bpe = 4 + 2 * q.dtype.itemsize
            budget_q = max((12_500_000 // (bpe * block_k)) // 128 * 128,
                           128)
        elif ONEPASS:
            # one-pass tile budget: s f32 + p + rescue p2 in input dtype
            # = 4 + 2*itemsize bytes/logit; ~11MB leaves room for the k/v
            # double buffers under Mosaic's 16MB scoped-vmem cap.  64-
            # granular blocks: at DINOv2@896 this picks block_q=320, and
            # Tp = round_up(4097, 320) = 4160 sheds 1.5% q-padding vs the
            # 128-granular 384/4224 pair.
            bpe = 4 + 2 * q.dtype.itemsize
            budget_q = max((11_000_000 // (bpe * block_k)) // 64 * 64, 128)
        else:
            # exact-max tiles: s f32 only.  block_q * Sp * 4B <= ~7MB picks
            # block_q=384 at S=4224 (1.11 -> 1.01 ms/layer vs 256; 512 is
            # slower again and 1024 exceeds the 16MB kernel stack).  fp32
            # inputs double every q/k/v/acc buffer, so halve the s-tile
            # budget too.
            s_budget = 7_000_000 if q.dtype.itemsize <= 2 else 3_000_000
            budget_q = max((s_budget // (4 * block_k)) // 128 * 128, 128)
        block_q = min(block_q, budget_q)
    Tp, Sp = _round_up(T, block_q), _round_up(S, block_k)
    # Mosaic accepts a block last dim EQUAL to the array dim, so D=64 (the
    # DINOv2/CLIP head size) runs unpadded: the MXU time is identical (the
    # systolic array is 128 deep either way) but k/v DMA and the pad copies
    # halve — measured 1.24 -> 1.11 ms/layer at DINOv2@896, bit-identical.
    Dp = D if D in (64, 128) else _round_up(D, 128)

    def _prep(x, L, Lp):
        x = jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0), (0, Dp - D)))
        return x.transpose(0, 2, 1, 3).reshape(B * H, Lp, Dp)

    # fold scale*log2(e) into q out here (fused into the pad/transpose copy;
    # see the LOG2E note above) — the kernels see pre-scaled log2 logits
    qs = q * jnp.asarray(scale * LOG2E, q.dtype)
    qf, kf, vf = _prep(qs, T, Tp), _prep(k, S, Sp), _prep(v, S, Sp)
    o = _flash_attention(qf, kf, vf, causal, block_q, block_k, S)
    o = o.reshape(B, H, Tp, Dp).transpose(0, 2, 1, 3)
    return o[:, :T, :, :D]


def flash_attention_bias(q, k, v, bias, *, scale=None,
                         block_q=512, block_k=512):
    """Inference-only flash attention with a precomputed additive bias.

    q: (B, T, H, D); k/v: (B, S, H, D); bias: (B*H or 1, T, S) fp32/bf16.
    No custom VJP (used for frozen towers: SAM windowed attention)."""
    B, T, H, D = q.shape
    S = k.shape[1]
    scale = (1.0 / math.sqrt(D)) if scale is None else scale
    block_q = min(block_q, _round_up(T, 8))
    block_k = min(block_k, _round_up(S, 128))
    Tp, Sp = _round_up(T, block_q), _round_up(S, block_k)
    Dp = _round_up(D, 128)

    def _prep(x, L, Lp):
        x = jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0), (0, Dp - D)))
        return x.transpose(0, 2, 1, 3).reshape(B * H, Lp, Dp)

    qs = q * jnp.asarray(scale * LOG2E, q.dtype)   # see LOG2E note
    qf, kf, vf = _prep(qs, T, Tp), _prep(k, S, Sp), _prep(v, S, Sp)
    # kernel logits live in the exp2 domain; scale the bias to match (fused
    # into the pad by XLA, outside the hot loop)
    bias = jnp.pad(bias.astype(jnp.float32) * LOG2E,
                   ((0, 0), (0, Tp - T), (0, Sp - S)))
    o, _ = _flash_fwd(qf, kf, vf, causal=False,
                      block_q=block_q, block_k=block_k, s_real=S,
                      with_lse=False, bias=bias)
    o = o.reshape(B, H, Tp, Dp).transpose(0, 2, 1, 3)
    return o[:, :T, :, :D]


def attention(q, k, v, *, bias=None, causal=False, scale=None, impl="auto"):
    """Dispatching attention entry point.

    impl: 'auto' | 'flash' | 'xla'.  'auto' uses the Pallas kernel on TPU for
    bias-free attention with enough tokens to amortize kernel launch, else
    XLA.  The non-causal cutoff is 2048: at CLIP's T=257 the kernel grid is
    64 launch-bound steps of tiny tiles and XLA's fused attention wins by
    42% (9.0 vs 15.6 ms/tower-batch measured on v5e at batch 4), while at
    DINOv2@896's T=4097 the kernel wins 5-9x.  Causal keeps the 256 cutoff:
    LLaMA's s767 runs 0.046 vs 0.95 ms/layer on the kernel."""
    min_t = 256 if causal else 2048
    if impl == "flash" or (impl == "auto" and bias is None
                           and q.shape[1] >= min_t
                           and jax.default_backend() == "tpu"):
        return flash_attention(q, k, v, causal=causal, scale=scale)
    return attention_xla(q, k, v, bias=bias, causal=causal, scale=scale)
