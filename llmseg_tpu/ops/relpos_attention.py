"""Flash attention with SAM's decomposed relative-position bias fused in.

The reference adds a (B*H, T, S) bias materialized from two einsums
(model/segment_anything/modeling/image_encoder.py:360-392) — at ViT-H's
global layers that is a 537MB fp32 tensor per layer feeding a slow unfused
attention.  Here the bias never exists: the kernel reconstructs it blockwise
from two tiny per-row tables

    rh[(h, w), h'] = q[(h, w)] . Rh[h, h']      (T, G) where T = G*G
    rw[(h, w), w'] = q[(h, w)] . Rw[w, w']      (T, G)

computed outside with two small einsums (~1MB each), using
    bias[(h, w), (h', w')] = rh[(h, w), h'] + rw[(h, w), w'].

Block reconstruction is dynamic-index-free (Mosaic cannot dynamic-slice the
lane dim): the block bias is two tiny selection matmuls,
    bias_blk = rh @ E_kj + rw @ Tile,
where E_kj[h', c] = [h' == kj*m + c//G] (built from iotas per step) and
Tile[w', c] = [w' == c%G] (static, hoisted out of the loop).

Forward only: SAM is frozen in every LLM-Seg workload (offline AMG and the
legacy pixel decoder both run inference-only).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llmseg_tpu.ops.attention import (LOG2E, NEG_INF, _interpret, _prec,
                                      _round_up)


def _kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *,
            block_q, block_k, grid_g):
    G = grid_g
    m = block_k // G                                       # h' rows per block
    q = q_ref[0]                                           # (Bq, D)
    # rh/rw arrive in q's dtype and the selection dots run at _prec(q), the
    # same convention as the QK/PV dots: exact fp32 in tests, single-pass
    # bf16 in production (fp32 HIGHEST here would cost 6 MXU passes per dot).
    rh = rh_ref[0]                                         # (Bq, G)
    rw = rw_ref[0]                                         # (Bq, G)
    m_i = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l_i = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, q.shape[-1]), jnp.float32)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (G, block_k), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (G, block_k), 1)
    tile_mat = (row_ids == col_ids % G).astype(rw.dtype)       # static
    rw_tiled = jax.lax.dot(rw, tile_mat,
                           preferred_element_type=jnp.float32,
                           precision=_prec(rw))                # (Bq, Bk)

    def body(kj, carry):
        m_i, l_i, acc = carry
        kblk = k_ref[0, pl.ds(kj * block_k, block_k), :]
        vblk = v_ref[0, pl.ds(kj * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, kblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(q))            # (Bq, Bk) log2 (q pre-scaled)
        sel = (row_ids == kj * m + col_ids // G).astype(rh.dtype)
        s = s + jax.lax.dot(rh, sel,
                            preferred_element_type=jnp.float32,
                            precision=_prec(rh)) + rw_tiled
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp2(m_i - m_new)
        p = jnp.exp2(s - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot(
            p.astype(vblk.dtype), vblk, preferred_element_type=jnp.float32,
            precision=_prec(vblk))
        return m_new, l_new, acc_new

    num_k_blocks = (G * G) // block_k
    m_i, l_i, acc = jax.lax.fori_loop(0, num_k_blocks, body,
                                      (m_i, l_i, acc))
    l_safe = jnp.where(l_i == 0.0, 1.0, l_i)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)


def _window_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *, grid_g,
                   heads):
    """Whole-window attention, ALL heads in one program.

    At SAM's 14x14 windows one (window, head) pair is ~6 MFLOP; a grid cell
    per pair (400 cells/layer at ViT-H) spends most of its time on program
    overhead, not math.  Gridding per WINDOW (25 cells) and looping heads
    inside cuts the windowed-layer attention ~2.3x.  Single k-block: no
    flash statistics needed, plain exp2-domain softmax (q pre-scaled)."""
    G = grid_g
    T = G * G
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (G, T), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (G, T), 1)
    sel_h = (row_ids == col_ids // G).astype(rh_ref.dtype)
    sel_w = (row_ids == col_ids % G).astype(rw_ref.dtype)
    for h in range(heads):
        q = q_ref[h]                                       # (T, Dp)
        s = jax.lax.dot_general(
            q, k_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_prec(q))
        s = s + jax.lax.dot(rh_ref[h], sel_h,
                            preferred_element_type=jnp.float32,
                            precision=_prec(q))
        s = s + jax.lax.dot(rw_ref[h], sel_w,
                            preferred_element_type=jnp.float32,
                            precision=_prec(q))
        p = jnp.exp2(s - jnp.max(s, axis=-1, keepdims=True))
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[h] = jax.lax.dot(
            p.astype(v_ref.dtype), v_ref[h],
            preferred_element_type=jnp.float32,
            precision=_prec(q)).astype(o_ref.dtype)


def relpos_flash_attention(q, k, v, rel_pos_h, rel_pos_w, grid_g: int, *,
                           scale=None, block_q: int = 512,
                           block_k: int = 512):
    """q/k/v: (B, T, H, D) with T == grid_g^2 (square token grid);
    rel_pos_h/rel_pos_w: (2*G-1, D) tables.  Returns (B, T, H, D)."""
    from llmseg_tpu.models.sam.image_encoder import _rel_pos_table

    B, T, H, D = q.shape
    G = grid_g
    assert T == G * G, (T, G)
    scale = (1.0 / math.sqrt(D)) if scale is None else scale

    # per-row tables (tiny einsums; bias uses the UNSCALED q, reference
    # image_encoder.py:233-239)
    Rh = _rel_pos_table(rel_pos_h, G, G)                   # (G, G, D)
    Rw = _rel_pos_table(rel_pos_w, G, G)
    qg = q.reshape(B, G, G, H, D)
    rh = jnp.einsum("bhwnd,hkd->bnhwk", qg, Rh.astype(q.dtype),
                    preferred_element_type=jnp.float32)
    rw = jnp.einsum("bhwnd,wkd->bnhwk", qg, Rw.astype(q.dtype),
                    preferred_element_type=jnp.float32)
    # logits live in the exp2 domain inside the kernel (see ops/attention.py
    # LOG2E note); the additive bias tables pick up the log2(e) factor here,
    # outside the hot loop, and are handed to the kernel in q's dtype so the
    # in-kernel selection dots run at the main dots' precision
    rh = (rh.reshape(B * H, T, G) * LOG2E).astype(q.dtype)
    rw = (rw.reshape(B * H, T, G) * LOG2E).astype(q.dtype)

    block_q = min(block_q, T)
    block_k = min(block_k, T)
    block_k = max((block_k // G) * G, G)                   # multiple of G
    assert T % block_q == 0 and T % block_k == 0, (T, block_q, block_k)
    # block last dim equal to the array dim is legal, so D=80 runs
    # unpadded: global layer 1.90 -> 1.51 ms (37% less k/v DMA), bit-identical
    Dp = D

    def _prep(x):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))
        return x.transpose(0, 2, 1, 3).reshape(B * H, T, Dp)

    # scale*log2(e) folds into q AFTER rh/rw were taken from the unscaled q
    # (reference adds the bias to scaled logits, image_encoder.py:253-255)
    qs = q * jnp.asarray(scale * LOG2E, q.dtype)
    qf, kf, vf = _prep(qs), _prep(k), _prep(v)

    if T <= 512:
        # small windows: one program per WINDOW, heads looped inside
        o = pl.pallas_call(
            functools.partial(_window_kernel, grid_g=G, heads=H),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((H, T, Dp), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, T, Dp), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, T, Dp), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, T, G), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, T, G), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((H, T, Dp), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * H, T, Dp), q.dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * B * H * T * T * D,
                bytes_accessed=2 * B * H * 3 * T * D * q.dtype.itemsize,
                transcendentals=B * H * T * T),
            interpret=_interpret(),
        )(qf, kf, vf, rh, rw)
        o = o.reshape(B, H, T, Dp).transpose(0, 2, 1, 3)
        return o[..., :D]

    kern = functools.partial(_kernel, block_q=block_q,
                             block_k=block_k, grid_g=G)
    o = pl.pallas_call(
        kern,
        grid=(B * H, T // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, Dp), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, Dp), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, Dp), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, G), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, G), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dp), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, T, Dp), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * T * D,
            bytes_accessed=2 * B * H * 3 * T * D * q.dtype.itemsize,
            transcendentals=B * H * T * T),
        interpret=_interpret(),
    )(qf, kf, vf, rh, rw)
    o = o.reshape(B, H, T, Dp).transpose(0, 2, 1, 3)
    return o[..., :D]
