"""SAM mask decoder (reference modeling/mask_decoder.py:16-191), TPU-first.

IoU token + 4 mask tokens prepended to prompt tokens, two-way transformer
against the image embedding, transposed-conv upscaling (x4), hypernetwork
MLPs per mask token, and the IoU prediction head.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from llmseg_tpu.config import SamDecoderConfig
from llmseg_tpu.models import layers as L
from llmseg_tpu.models.sam import two_way_transformer as twt


def _convt_init(key, in_ch, out_ch, kernel, dtype=jnp.float32):
    return {"w": L._lecun_normal(key, (kernel, kernel, in_ch, out_ch), dtype),
            "b": jnp.zeros((out_ch,), dtype)}


def _convt(p, x, stride):
    """Transposed conv, NHWC.

    Kept as conv_transpose deliberately: with kernel == stride the op is
    expressible as a matmul + pixel shuffle, which wins in isolation
    (3.4 vs 4.4 ms at the AMG decode shape) but LOSES inside the full
    decode program (12.2 vs 9.5 ms/chunk) — XLA fuses the gelu/LN epilogues
    into its conv lowering but not across the explicit 6D shuffle."""
    x = x.astype(p["w"].dtype)
    y = jax.lax.conv_transpose(
        x, p["w"], strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"]


def init(key, cfg: SamDecoderConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 12)
    d = cfg.transformer_dim
    num_tokens = cfg.num_multimask_outputs + 1
    return {
        "iou_token": jnp.asarray(
            jax.random.normal(keys[0], (1, d), jnp.float32), dtype),
        "mask_tokens": jnp.asarray(
            jax.random.normal(keys[1], (num_tokens, d), jnp.float32), dtype),
        "transformer": twt.init(keys[2], cfg.transformer_depth, d,
                                cfg.transformer_num_heads,
                                cfg.transformer_mlp_dim, dtype),
        "upscale_conv1": _convt_init(keys[3], d, d // 4, 2, dtype),
        "upscale_ln": L.layernorm2d_init(d // 4, dtype),
        "upscale_conv2": _convt_init(keys[4], d // 4, d // 8, 2, dtype),
        "hyper_mlps": [L.mlp_stack_init(keys[5 + i], [d, d, d, d // 8], dtype)
                       for i in range(num_tokens)],
        "iou_head": L.mlp_stack_init(
            keys[10], [d] + [cfg.iou_head_hidden_dim] * (cfg.iou_head_depth - 1)
            + [num_tokens], dtype),
    }


def _xla_tail(p: dict, cfg: SamDecoderConfig, src: jnp.ndarray,
              image_pe: jnp.ndarray, tokens: jnp.ndarray
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference-structured decode from the summed src onward: two-way
    transformer + upscale + hypernetwork + IoU head.  Fully differentiable
    (twt.apply pinned to impl="xla" — its auto route is forward-only).
    Returns (masks fp32, iou fp32)."""
    B = tokens.shape[0]
    d = cfg.transformer_dim
    num_tokens = cfg.num_multimask_outputs + 1
    S = src.shape[1]
    if src.shape[0] == 1 and B > 1:
        src = jnp.broadcast_to(src, (B,) + src.shape[1:])

    hs, keys = twt.apply(p["transformer"], src, image_pe, tokens,
                         cfg.transformer_num_heads, impl="xla")
    iou_token_out = hs[:, 0]
    mask_tokens_out = hs[:, 1:1 + num_tokens]

    fmap = keys.reshape(B, S, S, d)
    up = _convt(p["upscale_conv1"], fmap, 2)
    up = jax.nn.gelu(L.layernorm2d(p["upscale_ln"], up))
    up = jax.nn.gelu(_convt(p["upscale_conv2"], up, 2))      # (B, 4S, 4S, d/8)

    hyper = jnp.stack([L.mlp_stack(mp, mask_tokens_out[:, i])
                       for i, mp in enumerate(p["hyper_mlps"])], axis=1)
    masks = jnp.einsum("bnc,bhwc->bnhw", hyper, up,
                       preferred_element_type=jnp.float32)
    iou_pred = L.mlp_stack(p["iou_head"], iou_token_out).astype(jnp.float32)
    return masks, iou_pred


def predict_masks(p: dict, cfg: SamDecoderConfig,
                  image_embeddings: jnp.ndarray, image_pe: jnp.ndarray,
                  sparse_prompt: jnp.ndarray, dense_prompt: jnp.ndarray,
                  dense_shared: bool = False, impl: str = "auto"
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """reference predict_masks:116-164.

    image_embeddings: (B, S, S, C) or (1, S, S, C) broadcast over prompts;
    sparse_prompt: (B, N, C); dense_prompt: (B, S, S, C).
    Returns (masks (B, num_tokens, 4S, 4S), iou_pred (B, num_tokens)).

    impl: "auto" routes AMG-scale prompt batches to the fused Pallas kernel
    on TPU (masks in the image dtype); "xla" forces the reference-structured
    path (fp32 mask logits) — use it when exporting a dtype-stable artifact
    or when results must be invariant to the prompt count crossing the
    fuse threshold (the two paths differ by bf16 rounding).

    Differentiation is always safe: the fused kernel is forward-only, so
    the fused route is wrapped in a custom_vjp whose forward+backward run
    the XLA path (grad-of-predict recomputes via _xla_tail; e.g. a
    --train_mask_decoder dice/BCE loss just works at any prompt count)."""
    B = sparse_prompt.shape[0]
    d = cfg.transformer_dim
    num_tokens = cfg.num_multimask_outputs + 1

    output_tokens = jnp.concatenate([p["iou_token"], p["mask_tokens"]], axis=0)
    output_tokens = jnp.broadcast_to(output_tokens[None], (B, num_tokens + 1, d))
    tokens = jnp.concatenate(
        [output_tokens, sparse_prompt.astype(output_tokens.dtype)], axis=1)

    S = image_embeddings.shape[1]
    from llmseg_tpu.ops.twoway_kernel import should_fuse

    if impl != "xla" and (impl == "fused"
                          or should_fuse(B, S * S, image_pe)):
        # AMG-scale prompt batches: transformer + upscale + hypernetwork +
        # IoU head as ONE Pallas program per prompt (see ops/twoway_kernel);
        # masks come back in the input dtype (bf16 end-to-end under AMG).
        # When the image embedding AND dense prompt are shared (one image,
        # no per-prompt mask prompts), the base is NOT broadcast: the kernel
        # reads it once per chunk and layers[0]'s keys-side projections are
        # hoisted.
        from llmseg_tpu.ops.twoway_kernel import fused_decode_apply

        if image_embeddings.shape[0] == 1 and dense_shared:
            src = image_embeddings + dense_prompt[:1]
        else:
            src = image_embeddings
            if src.shape[0] == 1 and B > 1:
                src = jnp.broadcast_to(src, (B,) + src.shape[1:])
            src = src + dense_prompt
        nh = cfg.transformer_num_heads
        out_dt = src.dtype

        @jax.custom_vjp
        def fused(p_, src_, pe_, tok_):
            return fused_decode_apply(p_["transformer"], p_, src_, pe_,
                                      tok_, nh)

        def fused_fwd(p_, src_, pe_, tok_):
            # AD path: forward AND backward through the differentiable XLA
            # tail, so gradients are exact for the values used (the fused
            # kernel has no VJP).  Output cast to the primal's dtype to
            # satisfy custom_vjp's matching-aval contract.
            out, vjp = jax.vjp(
                lambda a, b, c, e: _xla_tail(a, cfg, b, c, e),
                p_, src_, pe_, tok_)
            return jax.tree.map(lambda x: x.astype(out_dt), out), vjp

        def fused_bwd(vjp, cts):
            return vjp(jax.tree.map(lambda c: c.astype(jnp.float32), cts))

        fused.defvjp(fused_fwd, fused_bwd)
        return fused(p, src, image_pe, tokens)

    src = image_embeddings
    if src.shape[0] == 1 and B > 1:
        src = jnp.broadcast_to(src, (B,) + src.shape[1:])
    src = src + dense_prompt
    return _xla_tail(p, cfg, src, image_pe, tokens)


def apply(p: dict, cfg: SamDecoderConfig, image_embeddings, image_pe,
          sparse_prompt, dense_prompt, multimask_output: bool = True,
          dense_shared: bool = False, impl: str = "auto"):
    """reference MaskDecoder.forward:77-114: slice multimask (1:4) or single (0:1)."""
    masks, iou_pred = predict_masks(p, cfg, image_embeddings, image_pe,
                                    sparse_prompt, dense_prompt,
                                    dense_shared=dense_shared, impl=impl)
    if multimask_output:
        return masks[:, 1:], iou_pred[:, 1:]
    return masks[:, 0:1], iou_pred[:, 0:1]
