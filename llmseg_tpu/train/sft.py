"""LLaVA supervised-finetuning train step (reference M24,
model/llava/train/train.py:810-1038 ``train()``).

The reference's HF-Trainer run has two parameter regimes:
  * ``tune_mm_mlp_adapter`` (feature-alignment pretrain, train.py:963-971):
    everything frozen except the mm_projector;
  * ``lora_enable`` (instruction SFT, train.py:897-915): LoRA adapters on
    the LLM q/v projections (+ the projector kept trainable via
    non_lora_trainables, train.py:1020-1033).

Both are expressed here as a trainable/frozen partition (train/optim.py)
so gradients + Adam state exist only for the trainable subset, and the
loss is the pure causal-LM objective (llava.causal_lm_loss) over the
spliced sequence — no segmentation heads involved.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from llmseg_tpu.config import LlavaConfig, LoraConfig
from llmseg_tpu.models import llama, llava


def sft_trainable_mask(params: dict, *, tune_mm_mlp_adapter: bool = False,
                       lora_enable: bool = False) -> dict:
    """Bool pytree over a llava.init (+ optional "lora") tree."""

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (str(k),)) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, path + (str(i),))
                              for i, v in enumerate(node))
        joined = "/".join(path)
        if joined.startswith("mm_projector"):
            return True
        if lora_enable and joined.startswith("lora/"):
            return True
        if not tune_mm_mlp_adapter and not lora_enable:
            # full SFT (reference default without lora): LLM + projector
            return joined.startswith("llm/") or joined.startswith("lora/")
        return False

    return walk(params, ())


def sft_loss(params: dict, cfg: LlavaConfig, batch: dict, *,
             lora_cfg: Optional[LoraConfig] = None,
             remat: bool = False) -> jnp.ndarray:
    """Causal-LM loss over the spliced multimodal sequence.

    batch: images_clip (B,H,W,3), input_ids (B,T), labels (B,T),
    image_pos (B,), has_image (B,).  Text-only rows get their image
    embeddings zeroed; the collator parked their splice position in the
    padded tail (see data/llava_sft.sft_collate).
    """
    image_embeds = llava.encode_images(params, cfg, batch["images_clip"])
    image_embeds = image_embeds * batch["has_image"].astype(
        image_embeds.dtype)[:, None, None]
    hidden = llava.forward(params, cfg,
                           input_ids=batch["input_ids"],
                           image_pos=batch["image_pos"],
                           image_embeds=image_embeds,
                           lora=params.get("lora"), lora_cfg=lora_cfg,
                           remat=remat)
    logits = llama.logits(params["llm"], cfg.llm, hidden)
    labels = llava.splice_labels(batch["labels"], batch["image_pos"],
                                 cfg.num_image_tokens)
    return llava.causal_lm_loss(logits, labels)


def make_sft_train_step(cfg: LlavaConfig, tx: optax.GradientTransformation,
                        *, lora_cfg: Optional[LoraConfig] = None,
                        remat: bool = True):
    """Partitioned train step (see optim.partition): jittable
    (trainable, skeleton, opt_state, batch) -> (trainable, opt_state, metrics)."""

    def train_step(trainable, skeleton, opt_state, batch):
        from llmseg_tpu.train import optim

        def loss(tf):
            params = optim.combine(skeleton, tf)
            return sft_loss(params, cfg, batch, lora_cfg=lora_cfg,
                            remat=remat)

        l, grads = jax.value_and_grad(loss)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, {"ce_loss": l,
                                      "grad_norm": optax.global_norm(grads)}

    return train_step
