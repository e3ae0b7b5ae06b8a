"""Fused Pallas kernel for the SAM two-way transformer.

TPU-native replacement for the decode-side hot loop of the reference's
``TwoWayTransformer`` (reference modeling/transformer.py:47-137) as used by
the mask decoder during automatic mask generation: 64 prompts per chunk each
carry their own diverging copy of the (64*64, 256) image state, so the
unfused XLA program materializes ~14 full HBM passes over a (B, 4096, 256)
tensor (pos adds, projections, attention outputs, residuals, LayerNorms).

This kernel grids over prompts and runs the ENTIRE depth-2 transformer plus
final attention for one prompt inside VMEM: the per-prompt image state
(2 MB bf16), the token state (7x256), and all weights (~6.6 MB) fit
comfortably, so HBM traffic drops to one read of the inputs and one write of
the outputs.  Math follows models/sam/two_way_transformer.py exactly
(fp32 softmax + LayerNorm statistics, bf16 MXU matmuls).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret():
    return jax.default_backend() != "tpu"


def should_fuse(num_prompts: int, num_image_tokens: int,
                image_pe=None) -> bool:
    """Single source of truth for routing decode-side work to the fused
    kernels (used by two_way_transformer.apply AND mask_decoder): big prompt
    batches on TPU.  A genuinely per-batch positional encoding is NOT
    supported by the fused path (it reads one shared pe) and falls back."""
    if image_pe is not None and image_pe.ndim == 4 and image_pe.shape[0] > 1:
        return False
    return (num_prompts >= 8 and num_image_tokens >= 1024
            and jax.default_backend() == "tpu")


def _dense(p, x):
    # Mosaic requires a 32-bit matmul accumulator for bf16 operands.
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    return (y + p["b"].astype(jnp.float32)).astype(x.dtype)


def _layernorm(p, x, eps=1e-6):
    orig = x.dtype
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(orig)


def _contract(a, b, dims, out_dtype=None):
    y = jax.lax.dot_general(a, b, (dims, ((), ())),
                            preferred_element_type=jnp.float32)
    return y if out_dtype is None else y.astype(out_dtype)


def _bd(xh, nh):
    """(T, I) -> (nh*T, I) head-block-diagonal: row h*T+t is xh[t] with every
    column outside head h's (I/nh)-wide block zeroed.  Lets one MXU dot over
    the FULL inner width compute all heads' per-head contractions at once —
    the alternative (slicing 16-lane head columns) lowers to sliver matmuls
    and relayouts that dominate kernel time."""
    T, I = xh.shape
    hd = I // nh
    tiled = jnp.concatenate([xh] * nh, axis=0)
    r = jax.lax.broadcasted_iota(jnp.int32, (nh * T, I), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (nh * T, I), 1)
    return jnp.where((r // T) == (c // hd), tiled, jnp.zeros_like(tiled))


def _attn_small_q(p, q, k, v, nh, kh=None, vh=None):
    """Attention where the QUERY side is small (output/prompt tokens):
    softmax over the full Tk lane axis.  kh/vh may be precomputed (shared
    across prompts when the image state has not diverged yet)."""
    qh = _dense(p["q"], q)
    kh = _dense(p["k"], k) if kh is None else kh
    vh = _dense(p["v"], v) if vh is None else vh
    Tq, I = qh.shape
    hd = I // nh
    qbd = _bd(qh, nh) * jnp.asarray(1.0 / math.sqrt(hd), qh.dtype)
    s = _contract(qbd, kh, (((1,), (1,))))                 # (nh*Tq, Tk) fp32
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(vh.dtype)
    o = _contract(probs, vh, (((1,), (0,))))               # (nh*Tq, I) fp32
    lane = jax.lax.broadcasted_iota(jnp.int32, (Tq, I), 1)
    out = jnp.zeros((Tq, I), jnp.float32)
    for h in range(nh):                                    # block-diag extract
        out = out + jnp.where(lane // hd == h, o[h * Tq:(h + 1) * Tq], 0.0)
    return _dense(p["out"], out.astype(q.dtype))


def _attn_small_k(p, q, k, v, nh, qh=None):
    """Attention where the KEY side is small (image tokens attend to prompt
    tokens): scores held transposed (nh*Tk, Tq) so the per-head softmax over
    Tk runs on cheap static sublane slices.  qh may be precomputed."""
    qh = _dense(p["q"], q) if qh is None else qh
    kh, vh = _dense(p["k"], k), _dense(p["v"], v)
    Tk, I = kh.shape
    hd = I // nh
    kbd = _bd(kh, nh) * jnp.asarray(1.0 / math.sqrt(hd), kh.dtype)
    s = _contract(kbd, qh, (((1,), (1,))))                 # (nh*Tk, Tq) fp32
    ps = []
    for h in range(nh):
        sl = s[h * Tk:(h + 1) * Tk]
        m = jnp.max(sl, axis=0, keepdims=True)
        e = jnp.exp(sl - m)
        ps.append(e / jnp.sum(e, axis=0, keepdims=True))
    probs = jnp.concatenate(ps, axis=0).astype(vh.dtype)   # (nh*Tk, Tq)
    # row (h,t) of V_bd is nonzero only in head h's columns, so one dot sums
    # exactly the right (t, head) pairs per output column.  (Collapsing the
    # out projection into the small side via associativity was measured
    # NEUTRAL-to-worse here — 8.71 vs 8.58 ms/chunk — the kernel is
    # layout-bound, not MXU-bound; kept in the reference-shaped form.)
    o = _contract(probs, _bd(vh, nh), (((0,), (0,))))      # (Tq, I) fp32
    return _dense(p["out"], o.astype(v.dtype))  # v: token side, never None


def _attention(p, q, k, v, num_heads):
    """Matches two_way_transformer.attention_apply for a single (2D) example;
    fp32 softmax statistics like ops.attention.attention_xla."""
    if k.shape[0] < q.shape[0]:
        return _attn_small_k(p, q, k, v, num_heads)
    return _attn_small_q(p, q, k, v, num_heads)


def _block(p, queries, keys, query_pe, k_with_pe, num_heads, skip_first_pe,
           pre=None):
    """One TwoWayAttentionBlock (reference transformer.py:140-213) on 2D state.

    ``k_with_pe`` is keys + key_pe, computed by the caller (keys do not change
    between the two cross attentions of a block).  ``pre`` = (kh_t2i, vh_t2i,
    qh_i2t) precomputed keys-side projections for the shared-base first block
    (then k_with_pe/keys enter attention only through them and k_with_pe may
    be None)."""
    if skip_first_pe:
        queries = _attention(p["self_attn"], queries, queries, queries,
                             num_heads)
    else:
        q = queries + query_pe
        queries = queries + _attention(p["self_attn"], q, q, queries,
                                       num_heads)
    queries = _layernorm(p["norm1"], queries)

    kh1, vh1, qi1 = pre if pre is not None else (None, None, None)
    q = queries + query_pe
    queries = queries + _attn_small_q(p["cross_attn_t2i"], q, k_with_pe,
                                      keys, num_heads, kh=kh1, vh=vh1)
    queries = _layernorm(p["norm2"], queries)

    h = _dense(p["mlp"]["fc1"], queries)
    queries = queries + _dense(p["mlp"]["fc2"], jax.nn.relu(h))
    queries = _layernorm(p["norm3"], queries)

    q = queries + query_pe
    keys = keys + _attn_small_k(p["cross_attn_i2t"], k_with_pe, q, queries,
                                num_heads, qh=qi1)
    keys = _layernorm(p["norm4"], keys)
    return queries, keys


def _transformer(p, queries, keys, key_pe, num_heads, depth, pre0=None):
    """pre0: precomputed keys-side projections for block 0 (shared-base
    mode) — block 0 then never touches keys/key_pe directly."""
    query_pe = queries
    for i in range(depth):
        if i == 0 and pre0 is not None:
            queries, keys = _block(p["layers"][0], queries, keys, query_pe,
                                   None, num_heads, skip_first_pe=True,
                                   pre=pre0)
            continue
        k = keys + key_pe
        queries, keys = _block(p["layers"][i], queries, keys, query_pe, k,
                               num_heads, skip_first_pe=(i == 0))
    q = queries + query_pe
    k = keys + key_pe
    queries = queries + _attention(p["final_attn"], q, k, keys, num_heads)
    queries = _layernorm(p["norm_final"], queries)
    return queries, keys


def _kernel(treedef, num_heads, depth, keys_ref, pe_ref, tok_ref, *refs):
    leaf_refs = refs[:-2]
    q_out_ref, k_out_ref = refs[-2], refs[-1]
    p = jax.tree_util.tree_unflatten(treedef, [r[...] for r in leaf_refs])

    keys = keys_ref[0]                            # (L, C)
    key_pe = pe_ref[...].astype(keys.dtype)       # (L, C)
    queries = tok_ref[0].astype(keys.dtype)       # (N, C)
    queries, keys = _transformer(p, queries, keys, key_pe, num_heads, depth)

    q_out_ref[0] = queries
    k_out_ref[0] = keys


def _mlp_stack(layers, x):
    for i, lp in enumerate(layers):
        x = _dense(lp, x)
        if i < len(layers) - 1:
            x = jax.nn.relu(x)
    return x


def _decode_kernel(treedef, num_heads, depth, num_tokens, shared,
                   keys_ref, pe_ref, tok_ref, *refs):
    if shared:
        kh1_ref, vh1_ref, qi1_ref = refs[0], refs[1], refs[2]
        refs = refs[3:]
    leaf_refs = refs[:-2]
    m_out_ref, iou_out_ref = refs[-2], refs[-1]
    p = jax.tree_util.tree_unflatten(treedef, [r[...] for r in leaf_refs])

    keys = keys_ref[0]                                     # (L, C)
    key_pe = pe_ref[...].astype(keys.dtype)
    queries = tok_ref[0].astype(keys.dtype)                # (N, C)
    # shared mode: the image state is identical across prompts until the
    # first i2t update, so layers[0]'s keys-side projections arrive
    # precomputed (once per chunk, in XLA) instead of per prompt
    pre0 = ((kh1_ref[...], vh1_ref[...], qi1_ref[...]) if shared else None)
    queries, keys = _transformer(p["twt"], queries, keys, key_pe,
                                 num_heads, depth, pre0=pre0)
    hp = p["head"]

    iou_out_ref[0] = _mlp_stack(hp["iou"], queries[0:1])    # (1, num_tokens)

    # hypernetwork MLPs -> (num_tokens, co2)
    hyper = jnp.concatenate(
        [_mlp_stack(hp["hyper"][n], queries[1 + n:2 + n])
         for n in range(num_tokens)], axis=0)
    co2 = hyper.shape[-1]

    # H_bd (4*num_tokens, 4*co2) block-diagonal over the 4 (di2,dj2) groups:
    # H_bd[g*T + t, g*co2 + c] = hyper[t, c] -> ONE dot per g1 group computes
    # all 4 sub-pixel positions x num_tokens mask values.
    hbd = jnp.concatenate([hyper] * 4, axis=0)
    hbd = jnp.concatenate([hbd] * 4, axis=1)
    r = jax.lax.broadcasted_iota(jnp.int32, hbd.shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, hbd.shape, 1)
    hbd = jnp.where((r // num_tokens) == (c // co2), hbd,
                    jnp.zeros_like(hbd))

    # conv_transpose 1 (kernel==stride==2) as a single matmul; columns are
    # grouped (di1,dj1, co1) and NEVER mix pixels, so layernorm2d / gelu /
    # conv2 / hypernet all proceed in this permuted layout.
    y1 = _dense(hp["conv1"], keys)                          # (L, 4*co1)
    co1 = y1.shape[-1] // 4
    parts = []
    for g1 in range(4):
        z = y1[:, g1 * co1:(g1 + 1) * co1]
        z = _layernorm(hp["ln"], z)
        z = jax.nn.gelu(z)
        z = jax.nn.gelu(_dense(hp["conv2"], z))             # (L, 4*co2)
        parts.append(jax.lax.dot_general(
            z, hbd, ((((1,), (1,))), ((), ())),
            preferred_element_type=jnp.float32))            # (L, 4*num_tokens)
    # (L, 16*num_tokens) columns ordered (di1,dj1, di2,dj2, token)
    m_out_ref[0] = jnp.concatenate(parts, axis=1).astype(m_out_ref.dtype)


def fused_twoway_apply(params: dict, image_embedding: jnp.ndarray,
                       image_pe: jnp.ndarray, point_embedding: jnp.ndarray,
                       num_heads: int):
    """Drop-in for two_way_transformer.apply on TPU (interpret mode elsewhere).

    image_embedding: (B, S, S, C); image_pe: (S, S, C) or (1|B, S, S, C);
    point_embedding: (B, N, C).  Returns (queries (B, N, C), keys (B, L, C)).
    """
    B, Hs, Ws, C = image_embedding.shape
    L = Hs * Ws
    keys = image_embedding.reshape(B, L, C)
    pe = image_pe.reshape(-1, L, C)[0]            # shared across prompts
    N = point_embedding.shape[1]
    tokens = point_embedding.astype(keys.dtype)
    depth = len(params["layers"])

    # 1D leaves -> (1, dim) so every ref is >= 2D and broadcasts in-kernel.
    params2d = jax.tree_util.tree_map(
        lambda a: a.reshape(1, -1) if a.ndim == 1 else a, params)
    leaves, treedef = jax.tree_util.tree_flatten(params2d)

    shared = pl.BlockSpec(pe.shape, lambda i: (0,) * pe.ndim)
    leaf_specs = [pl.BlockSpec(a.shape, functools.partial(
        lambda nd, i: (0,) * nd, a.ndim)) for a in leaves]

    q_out, k_out = pl.pallas_call(
        functools.partial(_kernel, treedef, num_heads, depth),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, C), lambda i: (i, 0, 0)),
            shared,
            pl.BlockSpec((1, N, C), lambda i: (i, 0, 0)),
            *leaf_specs,
        ],
        out_specs=[
            pl.BlockSpec((1, N, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, L, C), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, C), keys.dtype),
            jax.ShapeDtypeStruct((B, L, C), keys.dtype),
        ],
        interpret=_interpret(),
        # One prompt's whole working set (keys 2MB + projections + weights)
        # lives on the kernel stack; the 16MB default is ~271KB short.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(keys, pe, tokens, *leaves)
    return q_out, k_out


def _b2d(p):
    """dense params with the bias reshaped to (1, -1), matching the
    in-kernel convention so shared precomputation is bit-identical."""
    return {"w": p["w"], "b": p["b"].reshape(1, -1)}


# ---------------------------------------------------------------------------
# Low-rank factored shared-base decode
#
# In the AMG case every prompt shares ONE image base; each prompt's image
# state diverges from it only through the i2t cross attentions, whose update
# is P^T (V_bd W_out) + 1 b^T — rank <= nh*N (56) + 1.  LayerNorm then acts
# per ROW (scale r_l) and per COLUMN (the shared LN scale vector), so the
# whole keys state stays expressible as
#
#     keys_i = rho_i  (x)rows  (base . diag sigma_i)  +  A_i @ B_i
#
# with per-prompt rho (L,), A (L, R_i), B (R_i, C) and SHARED column scale
# sigma_i (the product of LN scale vectors).  Every keys-side projection
# then becomes  rho (x) G  +  A (B W)  + PE + bias  where G = (base sigma) W
# and PE = pe W are computed ONCE PER CHUNK; the per-prompt MXU work drops
# from O(L*C*C) full-width dots to O(L*C*R) rank-width dots (R <= 128), and
# the (L, C) LayerNorms disappear into closed-form row statistics:
#
#     mean = rho*m + Abar rowmean(Bbar)
#     E[x^2] = rho^2 q + (2 rho <Abar, base (Bbar sigma)^T> + Abar Gram Abar)/C
#
# (m, q = shared row stats of base sigma; Gram = Bbar Bbar^T).  Rank grows
# by nh*N + 3 per block: depth-2 production ends at R = 118 < 128.
# ---------------------------------------------------------------------------


def _rowmean(x):
    return jnp.mean(x.astype(jnp.float32), axis=-1)


def _factored_shared(twt_params: dict, base: jnp.ndarray, pe: jnp.ndarray,
                     conv1_w=None):
    """Per-chunk shared precomputes (run in XLA, once per pallas_call).

    base: (L, C) = image embedding + dense prompt; pe: (L, C).
    Returns a dict of 2D arrays (fp32 row-stats vectors are (1, L))."""
    layers = twt_params["layers"]
    depth = len(layers)
    l0 = layers[0]
    bpe = base + pe.astype(base.dtype)
    sh = {
        "kh1": _dense(_b2d(l0["cross_attn_t2i"]["k"]), bpe),
        "vh1": _dense(_b2d(l0["cross_attn_t2i"]["v"]), base),
        "qi1": _dense(_b2d(l0["cross_attn_i2t"]["q"]), bpe),
        "blocks": [],
    }
    sigma = jnp.ones((base.shape[-1],), jnp.float32)
    # norm4 of block 0 sees raw base (sigma = 1)
    stats = [(_rowmean(base)[None],
              _rowmean(jnp.square(base.astype(jnp.float32)))[None])]
    for i in range(1, depth):
        sigma = sigma * layers[i - 1]["norm4"]["scale"].astype(jnp.float32)
        bs = (base.astype(jnp.float32) * sigma[None]).astype(base.dtype)
        li = layers[i]
        sh["blocks"].append({
            "Gk": _contract(bs, li["cross_attn_t2i"]["k"]["w"],
                            ((1,), (0,)), base.dtype),
            "Gv": _contract(bs, li["cross_attn_t2i"]["v"]["w"],
                            ((1,), (0,)), base.dtype),
            "Gq": _contract(bs, li["cross_attn_i2t"]["q"]["w"],
                            ((1,), (0,)), base.dtype),
            "PEk": _contract(pe.astype(base.dtype),
                             li["cross_attn_t2i"]["k"]["w"],
                             ((1,), (0,)), base.dtype),
            "PEq": _contract(pe.astype(base.dtype),
                             li["cross_attn_i2t"]["q"]["w"],
                             ((1,), (0,)), base.dtype),
        })
        stats.append((_rowmean(bs)[None],
                      _rowmean(jnp.square(bs.astype(jnp.float32)))[None]))
    sh["stats_m"] = jnp.concatenate([m for m, _ in stats], axis=0)  # (depth,L)
    sh["stats_q"] = jnp.concatenate([q for _, q in stats], axis=0)
    sigma = sigma * layers[depth - 1]["norm4"]["scale"].astype(jnp.float32)
    bs = (base.astype(jnp.float32) * sigma[None]).astype(base.dtype)
    fa = twt_params["final_attn"]
    sh["Gkf"] = _contract(bs, fa["k"]["w"], ((1,), (0,)), base.dtype)
    sh["Gvf"] = _contract(bs, fa["v"]["w"], ((1,), (0,)), base.dtype)
    sh["PEkf"] = _contract(pe.astype(base.dtype), fa["k"]["w"],
                           ((1,), (0,)), base.dtype)
    if conv1_w is not None:
        sh["Gc1"] = _contract(bs, conv1_w, ((1,), (0,)), base.dtype)
    sh["base"] = base
    return sh


def _fact_proj_scores(qbd, G, PE, W, b, rho, At, Bmat):
    """scores = qbd @ proj^T without materializing proj = rho(x)G + At^T(B W)
    + PE + 1 b^T.  qbd: (nh*Tq, Ci) scaled block-diag queries; rho: (1, L);
    At: (R, L).  Returns (nh*Tq, L) fp32.

    All state lives in row-major (R, L)/(1, L) layout so Mosaic never
    relayouts the big axis."""
    s = _contract(qbd, G, ((1,), (1,))) * rho
    bw = _contract(Bmat, W, ((1,), (0,)), qbd.dtype)           # (R, Ci)
    s = s + _contract(_contract(qbd, bw, ((1,), (1,)), qbd.dtype),
                      At, ((1,), (0,)))
    if PE is not None:
        s = s + _contract(qbd, PE, ((1,), (1,)))
    # bias term as a VPU row-sum: a (Tq, Ci) x (1, Ci) dot lowers to a
    # mixed-dtype vector.broadcast Mosaic rejects
    s = s + jnp.sum(qbd.astype(jnp.float32)
                    * b.reshape(1, -1).astype(jnp.float32),
                    axis=1, keepdims=True)
    return s


def _fact_attend_v(probs, Gv, Wv, bv, rho, At, Bmat):
    """o = probs @ vh without materializing vh = rho(x)Gv + At^T(B Wv)
    + 1 bv^T.  probs: (nh*Tq, L) fp32; returns (nh*Tq, Ci) fp32."""
    pr = (probs * rho).astype(Gv.dtype)
    o = _contract(pr, Gv, ((1,), (0,)))
    bw = _contract(Bmat, Wv, ((1,), (0,)), Gv.dtype)           # (R, Ci)
    pa = _contract(probs.astype(At.dtype), At, ((1,), (1,)), Gv.dtype)
    o = o + _contract(pa, bw, ((1,), (0,)))
    o = o + (jnp.sum(probs, axis=-1, keepdims=True)
             * bv.reshape(1, -1).astype(jnp.float32))
    return o


def _head_extract(o, Tq, nh):
    """(nh*Tq, I) fp32 block rows -> (Tq, I): sum per-head block columns."""
    I = o.shape[-1]
    hd = I // nh
    lane = jax.lax.broadcasted_iota(jnp.int32, (Tq, I), 1)
    out = jnp.zeros((Tq, I), jnp.float32)
    for h in range(nh):
        out = out + jnp.where(lane // hd == h, o[h * Tq:(h + 1) * Tq], 0.0)
    return out


def _fact_norm4(norm_p, m, q, base, sigma_bbar, rho, Abar_t, Bbar, eps=1e-6):
    """Closed-form LayerNorm over X = rho(x)(base sigma) + Abar_t^T Bbar.

    m/q: (1, L) shared rowmean / row-second-moment of (base sigma);
    Abar_t: (R, L); sigma_bbar: Bbar with the CURRENT sigma folded in (for
    the cross term against raw base).  Returns (rho' (1, L), At', B')."""
    C = base.shape[-1]
    # row means of Bbar as a (R, 1) column, then a VPU broadcast-reduce
    # against Abar_t (1-row dots trip Mosaic's mixed-dtype broadcast)
    bmean = jnp.sum(Bbar.astype(jnp.float32), axis=1, keepdims=True) / C
    mu = rho * m + jnp.sum(bmean * Abar_t.astype(jnp.float32),
                           axis=0, keepdims=True)
    cross = rho * jnp.sum(
        _contract(sigma_bbar, base, ((1,), (1,)))              # (R, L) fp32
        * Abar_t.astype(jnp.float32), axis=0, keepdims=True)
    gram = _contract(Bbar, Bbar, ((1,), (1,)))                 # (R, R) fp32
    quad = jnp.sum(_contract(gram.astype(Abar_t.dtype), Abar_t,
                             ((1,), (0,))) * Abar_t.astype(jnp.float32),
                   axis=0, keepdims=True)
    e2 = jnp.square(rho) * q + (2.0 * cross + quad) / C
    var = e2 - jnp.square(mu)
    inv = jax.lax.rsqrt(var + eps)
    scale = norm_p["scale"].reshape(1, -1).astype(jnp.float32)
    bias = norm_p["bias"].reshape(1, -1).astype(jnp.float32)
    dt = Abar_t.dtype
    L = base.shape[0]
    a_new = jnp.concatenate(
        [Abar_t * inv.astype(dt), (-inv * mu).astype(dt),
         jnp.ones((1, L), dt)], axis=0)
    b_new = jnp.concatenate(
        [(Bbar.astype(jnp.float32) * scale).astype(dt),
         scale.astype(dt), bias.astype(dt)], axis=0)
    return rho * inv, a_new, b_new


def _factored_prompt(twt_p, sh, tokens, num_heads):
    """One prompt through the depth-D two-way transformer in factored form.

    tokens: (N, C).  Returns (queries (N, C), rho (1, L), At (R, L),
    B (R, C)) — the final keys state, NEVER materialized as (L, C)."""
    layers = twt_p["layers"]
    depth = len(layers)
    L, C = sh["base"].shape
    dt = sh["base"].dtype
    query_pe = tokens
    queries = tokens

    rho = jnp.ones((1, L), jnp.float32)
    At = None                       # (R, L); None until the first i2t update
    Bmat = None                     # (R, C)
    sigma = jnp.ones((1, C), jnp.float32)

    for i in range(depth):
        p = layers[i]
        # token-side self attention
        if i == 0:
            queries = _attention(p["self_attn"], queries, queries, queries,
                                 num_heads)
        else:
            q = queries + query_pe
            queries = queries + _attention(p["self_attn"], q, q, queries,
                                           num_heads)
        queries = _layernorm(p["norm1"], queries)

        # t2i: tokens read the (factored) image state
        q = queries + query_pe
        ca = p["cross_attn_t2i"]
        qh = _dense(ca["q"], q)
        Tq, Ci = qh.shape
        hd = Ci // num_heads
        qbd = _bd(qh, num_heads) * jnp.asarray(1.0 / math.sqrt(hd), qh.dtype)
        if i == 0:
            s = _contract(qbd, sh["kh1"], ((1,), (1,)))
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
            o = _contract(probs, sh["vh1"], ((1,), (0,)))
        else:
            blk = sh["blocks"][i - 1]
            s = _fact_proj_scores(qbd, blk["Gk"], blk["PEk"], ca["k"]["w"],
                                  ca["k"]["b"], rho, At, Bmat)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            probs = e / jnp.sum(e, axis=-1, keepdims=True)
            o = _fact_attend_v(probs, blk["Gv"], ca["v"]["w"], ca["v"]["b"],
                               rho, At, Bmat)
        out = _head_extract(o, Tq, num_heads)
        queries = queries + _dense(ca["out"], out.astype(dt))
        queries = _layernorm(p["norm2"], queries)

        h = _dense(p["mlp"]["fc1"], queries)
        queries = queries + _dense(p["mlp"]["fc2"], jax.nn.relu(h))
        queries = _layernorm(p["norm3"], queries)

        # i2t: the image state reads the tokens -> rank-(nh*N) update
        ia = p["cross_attn_i2t"]
        q = queries + query_pe
        kh = _dense(ia["k"], q)
        vh = _dense(ia["v"], queries)
        kbd = _bd(kh, num_heads) * jnp.asarray(1.0 / math.sqrt(hd), kh.dtype)
        if i == 0:
            s = _contract(kbd, sh["qi1"], ((1,), (1,)))        # (nh*N, L)
        else:
            blk = sh["blocks"][i - 1]
            s = _fact_proj_scores(kbd, blk["Gq"], blk["PEq"], ia["q"]["w"],
                                  ia["q"]["b"], rho, At, Bmat)
        N = kh.shape[0]
        ps = []
        for hh in range(num_heads):
            sl = s[hh * N:(hh + 1) * N]
            mm = jnp.max(sl, axis=0, keepdims=True)
            ee = jnp.exp(sl - mm)
            ps.append(ee / jnp.sum(ee, axis=0, keepdims=True))
        P = jnp.concatenate(ps, axis=0)                        # (nh*N, L) f32
        M = _contract(_bd(vh, num_heads), ia["out"]["w"],
                      ((1,), (0,)), dt)                        # (nh*N, C)

        # norm4 in closed form; Abar/Bbar absorb the update + out bias.
        # Rank rows padded to a multiple of 8 (zero A-rows paired with zero
        # B-rows contribute nothing): unaligned sublane extents make Mosaic
        # emit masked relayouts on every downstream (R, L) op.
        ab = [P.astype(dt), jnp.ones((1, L), dt)]
        bb = [M, ia["out"]["b"].reshape(1, -1)]
        if At is not None:
            ab, bb = [At] + ab, [Bmat] + bb
        rows = sum(a.shape[0] for a in ab)
        pad = -(rows + 2) % 8       # +2: the rows _fact_norm4 appends
        if pad:
            ab.append(jnp.zeros((pad, L), dt))
            bb.append(jnp.zeros((pad, C), dt))
        Abar_t = jnp.concatenate(ab, axis=0)
        Bbar = jnp.concatenate(bb, axis=0)
        sig_bbar = (Bbar.astype(jnp.float32) * sigma).astype(dt)
        rho, At, Bmat = _fact_norm4(p["norm4"], sh["stats_m"][i:i + 1],
                                    sh["stats_q"][i:i + 1], sh["base"],
                                    sig_bbar, rho, Abar_t, Bbar)
        sigma = sigma * p["norm4"]["scale"].reshape(1, -1).astype(jnp.float32)

    # final token-to-image attention (keys stay factored)
    fa = twt_p["final_attn"]
    q = queries + query_pe
    qh = _dense(fa["q"], q)
    Tq, Ci = qh.shape
    hd = Ci // num_heads
    qbd = _bd(qh, num_heads) * jnp.asarray(1.0 / math.sqrt(hd), qh.dtype)
    s = _fact_proj_scores(qbd, sh["Gkf"], sh["PEkf"], fa["k"]["w"],
                          fa["k"]["b"], rho, At, Bmat)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    o = _fact_attend_v(probs, sh["Gvf"], fa["v"]["w"], fa["v"]["b"],
                       rho, At, Bmat)
    out = _head_extract(o, Tq, num_heads)
    queries = queries + _dense(fa["out"], out.astype(dt))
    queries = _layernorm(twt_p["norm_final"], queries)
    return queries, rho, At, Bmat


def _factored_decode_tail(head, sh, queries, rho, At, Bmat, num_tokens):
    """IoU head + hypernetwork + permuted-layout upscale on the factored
    keys state (conv1 via shared Gc1 + rank-width correction)."""
    iou = _mlp_stack(head["iou"], queries[0:1])

    hyper = jnp.concatenate(
        [_mlp_stack(head["hyper"][n], queries[1 + n:2 + n])
         for n in range(num_tokens)], axis=0)
    co2 = hyper.shape[-1]
    hbd = jnp.concatenate([hyper] * 4, axis=0)
    hbd = jnp.concatenate([hbd] * 4, axis=1)
    r = jax.lax.broadcasted_iota(jnp.int32, hbd.shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, hbd.shape, 1)
    hbd = jnp.where((r // num_tokens) == (c // co2), hbd,
                    jnp.zeros_like(hbd))

    w1, b1 = head["conv1"]["w"], head["conv1"]["b"]
    y1 = (sh["Gc1"].astype(jnp.float32) * rho.reshape(-1, 1)
          + _contract(At, _contract(Bmat, w1, ((1,), (0,)), At.dtype),
                      ((0,), (0,)))
          + b1.reshape(1, -1).astype(jnp.float32)).astype(At.dtype)
    co1 = y1.shape[-1] // 4
    parts = []
    for g1 in range(4):
        z = y1[:, g1 * co1:(g1 + 1) * co1]
        z = _layernorm(head["ln"], z)
        z = jax.nn.gelu(z)
        z = jax.nn.gelu(_dense(head["conv2"], z))
        parts.append(jax.lax.dot_general(
            z, hbd, ((((1,), (1,))), ((), ())),
            preferred_element_type=jnp.float32))
    mask_cols = jnp.concatenate(parts, axis=1)
    return mask_cols, iou


def _convt_as_matmul(p):
    """(2,2,ci,co) conv_transpose weights -> (ci, 4*co) matmul form.

    jax.lax.conv_transpose applies the kernel spatially FLIPPED:
    y[2i+di, 2j+dj, o] = sum_c x[i,j,c] * w[1-di, 1-dj, c, o]  (verified
    numerically; kernel==stride means output pixels never mix inputs)."""
    w = p["w"][::-1, ::-1]                        # (2,2,ci,co) flipped
    ci, co = w.shape[2], w.shape[3]
    return {"w": w.transpose(2, 0, 1, 3).reshape(ci, 4 * co),
            "b": jnp.tile(p["b"], 4)}


def _decode_head_params(decoder_params: dict) -> dict:
    return {
        "conv1": _convt_as_matmul(decoder_params["upscale_conv1"]),
        "ln": decoder_params["upscale_ln"],
        "conv2": _convt_as_matmul(decoder_params["upscale_conv2"]),
        "hyper": [mp["layers"] for mp in decoder_params["hyper_mlps"]],
        "iou": decoder_params["iou_head"]["layers"],
    }


def _unpermute_masks(masks_perm, B, Hs, Ws, num_tokens):
    """kernel mask columns are (di1,dj1, di2,dj2, token) per low-res pixel;
    final pixel = (4i + 2*di1 + di2, 4j + 2*dj1 + dj2)."""
    m = masks_perm.reshape(B, Hs, Ws, 2, 2, 2, 2, num_tokens)
    m = m.transpose(0, 7, 1, 3, 5, 2, 4, 6)
    return m.reshape(B, num_tokens, 4 * Hs, 4 * Ws)


def factored_decode_ref(twt_params: dict, decoder_params: dict,
                        image_embedding: jnp.ndarray, image_pe: jnp.ndarray,
                        point_embedding: jnp.ndarray, num_heads: int):
    """XLA (vmapped) factored shared-base decode.

    Validation/measurement twin of the factored Pallas kernel: identical
    math, per-prompt work vmapped instead of gridded.  image_embedding must
    have leading dim 1 (the base is shared by construction)."""
    Bi, Hs, Ws, C = image_embedding.shape
    assert Bi == 1, "factored decode requires a shared base"
    B = point_embedding.shape[0]
    L = Hs * Ws
    base = image_embedding.reshape(L, C)
    pe = image_pe.reshape(-1, L, C)[0]
    tokens = point_embedding.astype(base.dtype)
    num_tokens = len(decoder_params["hyper_mlps"])

    head = _decode_head_params(decoder_params)
    sh = _factored_shared(twt_params, base, pe, conv1_w=head["conv1"]["w"])

    def one(tok):
        q, rho, A, Bm = _factored_prompt(twt_params, sh, tok, num_heads)
        return _factored_decode_tail(head, sh, q, rho, A, Bm, num_tokens)

    mask_cols, iou = jax.vmap(one)(tokens)
    masks = _unpermute_masks(mask_cols.astype(base.dtype), B, Hs, Ws,
                             num_tokens)
    return masks, iou[:, 0].astype(base.dtype)


def _decode_kernel_factored(treedef, num_heads, num_tokens,
                            tok_ref, *refs):
    leaf_refs = refs[:-2]
    m_out_ref, iou_out_ref = refs[-2], refs[-1]
    p = jax.tree_util.tree_unflatten(treedef, [r[...] for r in leaf_refs])
    tokens = tok_ref[0].astype(p["sh"]["base"].dtype)
    q, rho, At, Bm = _factored_prompt(p["twt"], p["sh"], tokens, num_heads)
    mask_cols, iou = _factored_decode_tail(p["head"], p["sh"], q, rho, At,
                                           Bm, num_tokens)
    m_out_ref[0] = mask_cols.astype(m_out_ref.dtype)
    iou_out_ref[0] = iou.astype(iou_out_ref.dtype)


def factored_decode_fused(twt_params: dict, decoder_params: dict,
                          base2d: jnp.ndarray, pe2d: jnp.ndarray,
                          tokens: jnp.ndarray, num_heads: int,
                          Hs: int, Ws: int):
    """Pallas launch of the low-rank factored shared-base decode.

    base2d/pe2d: (L, C); tokens: (B, N, C).  Shared G/PE/stat precomputes
    run once per chunk in XLA; the kernel grids over prompts, each one
    doing only rank-width (R <= 128) MXU work plus token-side math."""
    B, N, C = tokens.shape
    L = base2d.shape[0]
    num_tokens = len(decoder_params["hyper_mlps"])
    head = _decode_head_params(decoder_params)
    sh = _factored_shared(twt_params, base2d, pe2d,
                          conv1_w=head["conv1"]["w"])
    tree2d = jax.tree_util.tree_map(
        lambda a: a.reshape(1, -1) if a.ndim == 1 else a,
        {"twt": twt_params, "head": head, "sh": sh})
    leaves, treedef = jax.tree_util.tree_flatten(tree2d)
    leaf_specs = [pl.BlockSpec(a.shape, functools.partial(
        lambda nd, i: (0,) * nd, a.ndim)) for a in leaves]

    masks_perm, iou = pl.pallas_call(
        functools.partial(_decode_kernel_factored, treedef, num_heads,
                          num_tokens),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda i: (i, 0, 0)),
            *leaf_specs,
        ],
        out_specs=[
            pl.BlockSpec((1, L, 16 * num_tokens), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, num_tokens), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, 16 * num_tokens), base2d.dtype),
            jax.ShapeDtypeStruct((B, 1, num_tokens), base2d.dtype),
        ],
        interpret=_interpret(),
        # shared G/PE matrices (~15MB) + weights + one prompt's rank-width
        # working set all stay resident
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=80 * 1024 * 1024),
    )(tokens, *leaves)
    return (_unpermute_masks(masks_perm, B, Hs, Ws, num_tokens),
            iou[:, 0])


def fused_decode_apply(twt_params: dict, decoder_params: dict,
                       image_embedding: jnp.ndarray, image_pe: jnp.ndarray,
                       point_embedding: jnp.ndarray, num_heads: int,
                       factored: bool = True):
    """Transformer + upscale + hypernetwork + IoU head in ONE Pallas kernel.

    Covers mask_decoder.predict_masks from the transformer onward: the
    unfused program writes ~400MB of HBM intermediates per 64-prompt chunk
    (per-prompt keys, two conv_transpose feature maps, fp32 masks); here one
    prompt's entire pipeline stays in VMEM and only the low-res mask logits
    (bf16) and IoU predictions leave the chip.

    If image_embedding has a leading dim of 1 while point_embedding has B
    (the AMG case: one image, shared dense prompt), the prompts share ONE
    base and the kernel drops to the LOW-RANK FACTORED form (`factored`,
    default on): the per-prompt keys state lives as rho(x)(base sigma)+A B,
    every keys-side projection is a rank-width dot against per-chunk shared
    G matrices, and the (L, C) LayerNorms become closed-form row stats.
    `factored=False` keeps the materialized shared-base kernel (layers[0]
    projections hoisted, base read per chunk).
    Returns (masks (B, num_tokens, 4S, 4S) in image dtype, iou (B, num_tokens)).
    """
    Bi, Hs, Ws, C = image_embedding.shape
    B = point_embedding.shape[0]
    share_base = Bi == 1 and B > 1
    if share_base and factored:
        L = Hs * Ws
        return factored_decode_fused(
            twt_params, decoder_params, image_embedding.reshape(L, C),
            image_pe.reshape(-1, L, C)[0],
            point_embedding.astype(image_embedding.dtype), num_heads,
            Hs, Ws)
    L = Hs * Ws
    keys = image_embedding.reshape(Bi, L, C)
    pe = image_pe.reshape(-1, L, C)[0]
    N = point_embedding.shape[1]
    tokens = point_embedding.astype(keys.dtype)
    depth = len(twt_params["layers"])
    num_tokens = len(decoder_params["hyper_mlps"])

    head = {
        "conv1": _convt_as_matmul(decoder_params["upscale_conv1"]),
        "ln": decoder_params["upscale_ln"],
        "conv2": _convt_as_matmul(decoder_params["upscale_conv2"]),
        "hyper": [mp["layers"] for mp in decoder_params["hyper_mlps"]],
        "iou": decoder_params["iou_head"]["layers"],
    }
    params2d = jax.tree_util.tree_map(
        lambda a: a.reshape(1, -1) if a.ndim == 1 else a,
        {"twt": twt_params, "head": head})
    leaves, treedef = jax.tree_util.tree_flatten(params2d)

    shared = pl.BlockSpec(pe.shape, lambda i: (0,) * pe.ndim)
    leaf_specs = [pl.BlockSpec(a.shape, functools.partial(
        lambda nd, i: (0,) * nd, a.ndim)) for a in leaves]

    extra_inputs, extra_specs = (), ()
    if share_base:
        # layers[0] keys-side projections, identical for every prompt (same _dense
        # semantics as in-kernel: bf16 dot, fp32 accumulate + bias, cast)
        l0 = twt_params["layers"][0]
        base = keys[0]
        k1pe = base + pe.astype(base.dtype)
        kh1 = _dense(_b2d(l0["cross_attn_t2i"]["k"]), k1pe)
        vh1 = _dense(_b2d(l0["cross_attn_t2i"]["v"]), base)
        qi1 = _dense(_b2d(l0["cross_attn_i2t"]["q"]), k1pe)
        extra_inputs = (kh1, vh1, qi1)
        extra_specs = tuple(pl.BlockSpec(a.shape, lambda i: (0, 0))
                            for a in extra_inputs)
        keys_spec = pl.BlockSpec((1, L, C), lambda i: (0, 0, 0))
    else:
        keys_spec = pl.BlockSpec((1, L, C), lambda i: (i, 0, 0))

    masks_perm, iou = pl.pallas_call(
        functools.partial(_decode_kernel, treedef, num_heads, depth,
                          num_tokens, share_base),
        grid=(B,),
        in_specs=[
            keys_spec,
            shared,
            pl.BlockSpec((1, N, C), lambda i: (i, 0, 0)),
            *extra_specs,
            *leaf_specs,
        ],
        out_specs=[
            pl.BlockSpec((1, L, 16 * num_tokens), lambda i: (i, 0, 0)),
            # 3D so the last two block dims equal the array dims (TPU tiling)
            pl.BlockSpec((1, 1, num_tokens), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, 16 * num_tokens), keys.dtype),
            jax.ShapeDtypeStruct((B, 1, num_tokens), keys.dtype),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(keys, pe, tokens, *extra_inputs, *leaves)

    # un-permute: kernel mask columns are (di1,dj1, di2,dj2, token) per
    # low-res pixel; final pixel = (4i + 2*di1 + di2, 4j + 2*dj1 + dj2)
    m = masks_perm.reshape(B, Hs, Ws, 2, 2, 2, 2, num_tokens)
    m = m.transpose(0, 7, 1, 3, 5, 2, 4, 6)
    return m.reshape(B, num_tokens, 4 * Hs, 4 * Ws), iou[:, 0]
