"""LLaVA: CLIP tower + linear projector + LLaMA with image-token splicing.

Capability parity with reference model/llava/model/llava_arch.py:85-398
(`prepare_inputs_labels_for_multimodal`) and llava_llama.py:39-163, but the
ragged per-sample splice loop is replaced by a STATIC-SHAPE splice: the host
collator emits text token ids with ONE image-placeholder position per row
(`image_pos`), and the device inserts the N projected image tokens there with
a single gather — every batch compiles to the same program.

Sequence layout per row (reference assumes exactly one image near the front,
model/LISA.py:262-266):
    [tok_0 .. tok_{p-1} | img_0 .. img_{N-1} | tok_p .. ]  padded to T_total
where p = image_pos (the placeholder token itself is consumed).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from llmseg_tpu.config import LlavaConfig, LoraConfig
from llmseg_tpu.models import layers as L
from llmseg_tpu.models import llama, vit

IGNORE_INDEX = -100  # reference model/llava/constants.py


def init(key, cfg: LlavaConfig, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "vision_tower": vit.init(k1, cfg.vision, dtype),
        "mm_projector": L.dense_init(k2, cfg.mm_hidden_size,
                                     cfg.llm.hidden_size, dtype=dtype),
        "llm": llama.init(k3, cfg.llm, dtype),
    }


def encode_images(params: dict, cfg: LlavaConfig,
                  images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) CLIP-preprocessed -> (B, N, llm_dim) projected tokens
    (reference llava_arch.py:93-96: frozen tower, linear mm_projector)."""
    feats = vit.clip_features(params["vision_tower"], images, cfg.vision,
                              select_layer=cfg.vision_select_layer)
    return L.dense(params["mm_projector"], feats)


def splice_image_tokens(text_embeds: jnp.ndarray, image_embeds: jnp.ndarray,
                        image_pos: jnp.ndarray) -> jnp.ndarray:
    """Insert image tokens at per-row positions with one static gather.

    text_embeds: (B, T, D) — embedding of token ids where the placeholder
    position holds an arbitrary token (it is overwritten).
    image_embeds: (B, N, D); image_pos: (B,) int — placeholder index.
    Returns (B, T + N - 1, D).

    Gather formulation: output index j maps to
      text[j]              for j <  pos
      image[j - pos]       for pos <= j < pos + N
      text[j - N + 1]      for j >= pos + N
    """
    B, T, D = text_embeds.shape
    N = image_embeds.shape[1]
    T_out = T + N - 1
    j = jnp.arange(T_out)[None, :]                        # (1, T_out)
    pos = image_pos[:, None]                              # (B, 1)
    in_image = (j >= pos) & (j < pos + N)
    text_idx = jnp.where(j < pos, j, j - N + 1)
    text_idx = jnp.clip(text_idx, 0, T - 1)
    img_idx = jnp.clip(j - pos, 0, N - 1)
    # One-hot einsums, not take_along_axis: the transpose of a gather is a
    # scatter, which forces an SPMD full-rematerialization of the (B, T, D)
    # activations under the dp/fsdp mesh; the transpose of an einsum is
    # another einsum.  Masking the one-hot rows replaces the final where.
    oh_text = jax.nn.one_hot(text_idx, T, dtype=text_embeds.dtype)
    oh_text = oh_text * (~in_image)[..., None].astype(text_embeds.dtype)
    oh_img = jax.nn.one_hot(img_idx, N, dtype=text_embeds.dtype)
    oh_img = oh_img * in_image[..., None].astype(text_embeds.dtype)
    return (jnp.einsum("bts,bsd->btd", oh_text, text_embeds)
            + jnp.einsum("bts,bsd->btd", oh_img,
                         image_embeds.astype(text_embeds.dtype)))


def splice_labels(labels: jnp.ndarray, image_pos: jnp.ndarray,
                  num_image_tokens: int) -> jnp.ndarray:
    """Same splice for labels: image token span gets IGNORE_INDEX
    (reference llava_arch.py:128-259 label padding).  Integer labels carry no
    gradient, so take_along_axis is safe here (no scatter in any backward)."""
    B, T = labels.shape
    N = num_image_tokens
    j = jnp.arange(T + N - 1)[None, :]
    pos = image_pos[:, None]
    in_image = (j >= pos) & (j < pos + N)
    text_idx = jnp.clip(jnp.where(j < pos, j, j - N + 1), 0, T - 1)
    gathered = jnp.take_along_axis(labels, text_idx, axis=1)
    return jnp.where(in_image, IGNORE_INDEX, gathered)


def forward(params: dict, cfg: LlavaConfig, *,
            input_ids: jnp.ndarray, image_pos: jnp.ndarray,
            images: Optional[jnp.ndarray] = None,
            image_embeds: Optional[jnp.ndarray] = None,
            lora: Optional[dict] = None,
            lora_cfg: Optional[LoraConfig] = None,
            remat: bool = False, one_hot_embed: bool = False,
            quant_stats: Optional[list] = None) -> jnp.ndarray:
    """Full multimodal forward -> final hidden states (B, T+N-1, D).

    Provide `images` (CLIP pixel input, possibly fewer rows than input_ids
    with the caller pre-expanding) or precomputed `image_embeds`.
    quant_stats: SmoothQuant calibration collector (see llama.apply).
    """
    if image_embeds is None:
        image_embeds = encode_images(params, cfg, images)
    text_embeds = llama.embed(params["llm"], input_ids, one_hot=one_hot_embed)
    x = splice_image_tokens(text_embeds, image_embeds.astype(text_embeds.dtype),
                            image_pos)
    return llama.apply(params["llm"], cfg.llm, inputs_embeds=x, lora=lora,
                       lora_cfg=lora_cfg, remat=remat,
                       quant_stats=quant_stats)


def forward_mpt(params: dict, cfg: LlavaConfig, mpt_cfg, *,
                input_ids: jnp.ndarray, image_pos: jnp.ndarray,
                images: Optional[jnp.ndarray] = None,
                image_embeds: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """LLaVA with the MPT backbone (reference llava_mpt.py
    LlavaMPTForCausalLM — the dormant M21 branch): identical CLIP tower +
    projector + image-token splice, MPT decoder instead of LLaMA.
    params["llm"] holds a models/mpt.py tree; mpt_cfg a config.MptConfig."""
    from llmseg_tpu.models import mpt as mpt_lib

    if image_embeds is None:
        image_embeds = encode_images(params, cfg, images)
    text_embeds = params["llm"]["wte"][input_ids]
    x = splice_image_tokens(text_embeds,
                            image_embeds.astype(text_embeds.dtype),
                            image_pos)
    return mpt_lib.apply(params["llm"], mpt_cfg, inputs_embeds=x)


def causal_lm_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Shifted CE with IGNORE_INDEX masking, mean over valid targets
    (reference llava_llama.py:107-118 / HF convention: one global mean)."""
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    token_ll = jnp.take_along_axis(logp, safe_labels[..., None],
                                   axis=-1)[..., 0]
    total = jnp.sum(jnp.where(valid, -token_ll, 0.0))
    count = jnp.maximum(jnp.sum(valid), 1)
    return total / count
