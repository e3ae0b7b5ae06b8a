"""Serving artifacts: the full LLM-Seg inference program as a serialized,
platform-retargetable StableHLO module.

`jax.export` stages llmseg.predict (CLIP -> splice -> LLaMA -> [SEG] gather
-> DINOv2 pooling -> selection head) with the parameters baked in as
constants, so a deployment runtime needs only jax + the artifact — no model
code, no checkpoint loading, no Python-side config.  This is the production
analog of the reference's ad-hoc eval entry points (training.py --eval_only):
one immutable program per deployment shape, compiled by the target's XLA.

Batch shapes are static by design (XLA): export one artifact per serving
configuration (images x rows x text length); the collator already pads to
these shapes (data/collate.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from llmseg_tpu.config import LLMSegConfig, LoraConfig
from llmseg_tpu.models import llmseg


def predict_arg_shapes(cfg: LLMSegConfig, *, num_images: int = 1,
                       rows: int = 1, text_len: int = 512,
                       dtype=jnp.bfloat16) -> dict:
    """The batch contract of llmseg.predict as ShapeDtypeStructs."""
    B, R, K, G = num_images, rows, cfg.max_proposals, cfg.seg_grid
    lv = cfg.llava
    f = jax.ShapeDtypeStruct
    return {
        "images_dino": f((B, cfg.dino.img_size, cfg.dino.img_size, 3), dtype),
        "images_clip": f((B, lv.vision.img_size, lv.vision.img_size, 3),
                         dtype),
        "input_ids": f((R, text_len), jnp.int32),
        "image_pos": f((R,), jnp.int32),
        "row_to_image": f((R,), jnp.int32),
        "row_valid": f((R,), jnp.bool_),
        "sam_segs": f((B, K, G, G), dtype),
        "prop_valid": f((B, K), jnp.bool_),
    }


def export_predict(params: dict, cfg: LLMSegConfig, *,
                   lora_cfg: Optional[LoraConfig] = None,
                   num_images: int = 1, rows: int = 1, text_len: int = 512,
                   dtype=jnp.bfloat16) -> "jax.export.Exported":
    shapes = predict_arg_shapes(cfg, num_images=num_images, rows=rows,
                                text_len=text_len, dtype=dtype)

    def fn(batch):
        return llmseg.predict(params, cfg, batch, lora_cfg=lora_cfg)

    return jax.export.export(jax.jit(fn))(shapes)


def save_predict(path: str, params: dict, cfg: LLMSegConfig, **kw) -> None:
    exported = export_predict(params, cfg, **kw)
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_predict(path: str):
    """Load a serialized predict program; returns batch_dict -> outputs.
    Needs only jax — not this package."""
    with open(path, "rb") as f:
        exported = jax.export.deserialize(f.read())
    return lambda batch: exported.call(batch)
