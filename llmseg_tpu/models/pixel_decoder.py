"""Legacy LISA-style pixel-decoder path (capability parity with reference
LISAForCausalLM.evaluate, model/LISA.py:477-559): autoregressive generate ->
[SEG] hidden states -> text_hidden_fcs -> SAM prompt encoder (text_embeds
pathway, prompt_encoder.py:121,145,176-177) -> mask decoder -> postprocess.

This is the path --train_mask_decoder + dice/BCE losses exist for; the
default LLM-Seg forward selects SAM proposals instead.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from llmseg_tpu.config import LLMSegConfig, LoraConfig, SamConfig
from llmseg_tpu.models import generate as gen_lib
from llmseg_tpu.models import llava, selection_head
from llmseg_tpu.models.sam import sam as sam_lib


def evaluate(params: dict, cfg: LLMSegConfig, sam_params: dict,
             sam_cfg: SamConfig, *,
             images_clip: jnp.ndarray, images_sam: jnp.ndarray,
             input_ids: jnp.ndarray, image_pos: jnp.ndarray,
             input_hw, original_hw, max_new_tokens: int = 32,
             lora_cfg: Optional[LoraConfig] = None
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generate an answer and decode a mask per [SEG] token.

    images_clip: (B, 224, 224, 3); images_sam: (B, 1024, 1024, 3)
    preprocessed; input_ids: (B, T) with the image placeholder consumed
    (image_pos per row).  Returns (output tokens (B, N),
    pred_masks (B, origH, origW) fp32 logits for the FIRST [SEG]).
    """
    lv = cfg.llava
    lora = params.get("lora")

    img_embeds = llava.encode_images(params["llava"], lv, images_clip)
    text_embeds = params["llava"]["llm"]["embed_tokens"][input_ids]
    x = llava.splice_image_tokens(text_embeds,
                                  img_embeds.astype(text_embeds.dtype),
                                  image_pos)
    tokens, hiddens = gen_lib.greedy_generate(
        params["llava"]["llm"], lv.llm, x, max_new_tokens,
        lora=lora, lora_cfg=lora_cfg)

    # first [SEG] among the generated tokens; its hidden state is the prompt
    is_seg = tokens == cfg.seg_token_id
    has_seg = jnp.any(is_seg, axis=1)
    seg_idx = jnp.argmax(is_seg, axis=1)
    seg_hidden = jnp.take_along_axis(
        hiddens, seg_idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    pred_embeddings = selection_head.project_text(params["select"],
                                                  seg_hidden)  # (B, 256)

    image_embeddings = sam_lib.encode_image(sam_params, images_sam, sam_cfg)
    masks, iou = sam_lib.decode_masks(
        sam_params, sam_cfg, image_embeddings,
        text_embeds=pred_embeddings[:, None, :], multimask_output=False)
    pred = sam_lib.postprocess_masks(masks, input_hw, original_hw, sam_cfg)
    pred = jnp.where(has_seg[:, None, None, None], pred, -1e9)
    return tokens, pred[:, 0]
