"""SAM assembly: preprocess → encoder → prompt encoder → decoder → postprocess.

Capability parity with reference modeling/sam.py:18-184 and build_sam.py,
TPU-first: NHWC, static shapes, one jitted program per (prompt-count) shape.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from llmseg_tpu.config import SamConfig, sam_vit_b, sam_vit_h, sam_vit_l
from llmseg_tpu.models.sam import image_encoder, mask_decoder, prompt_encoder


MODEL_REGISTRY = {
    "vit_h": sam_vit_h,
    "vit_l": sam_vit_l,
    "vit_b": sam_vit_b,
    "default": sam_vit_h,
}


def init(key, cfg: SamConfig, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "image_encoder": image_encoder.init(k1, cfg.encoder, dtype),
        "prompt_encoder": prompt_encoder.init(k2, cfg.prompt, dtype),
        "mask_decoder": mask_decoder.init(k3, cfg.decoder, dtype),
    }


def preprocess(x: jnp.ndarray, cfg: SamConfig) -> jnp.ndarray:
    """Normalize pixel values and pad bottom/right to a square input
    (reference sam.py:174-184).  x: (B, H, W, 3) uint8/float, H,W <= img_size
    after the host-side longest-side resize."""
    mean = jnp.asarray(cfg.pixel_mean, jnp.float32)
    std = jnp.asarray(cfg.pixel_std, jnp.float32)
    x = (x.astype(jnp.float32) - mean) / std
    s = cfg.encoder.img_size
    B, H, W, C = x.shape
    return jnp.pad(x, ((0, 0), (0, s - H), (0, s - W), (0, 0)))


def encode_image(params: dict, x: jnp.ndarray, cfg: SamConfig,
                 remat: bool = False) -> jnp.ndarray:
    """(B, img, img, 3) preprocessed -> (B, grid, grid, 256)."""
    return image_encoder.apply(params["image_encoder"], x, cfg.encoder,
                               remat=remat)


def decode_masks(params: dict, cfg: SamConfig, image_embedding: jnp.ndarray,
                 *, points=None, labels=None, boxes=None, masks=None,
                 text_embeds=None, multimask_output: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One image embedding (1 or B, S, S, 256) + prompt batch -> low-res masks.

    Returns (masks (B, M, 4S, 4S) logits, iou_pred (B, M)).  On TPU, prompt
    batches >= 8 against >= 1024 image tokens take the fused Pallas decode
    (ops/twoway_kernel.py) and return masks in the IMAGE dtype (bf16
    end-to-end under AMG, which casts anyway); smaller batches return fp32
    logits from the XLA path."""
    sparse, dense = prompt_encoder.apply(
        params["prompt_encoder"], cfg.prompt, points=points, labels=labels,
        boxes=boxes, masks=masks, text_embeds=text_embeds,
        batch=image_embedding.shape[0])
    pe = prompt_encoder.dense_pe(params["prompt_encoder"],
                                 cfg.prompt.image_embedding_size)[None]
    return mask_decoder.apply(
        params["mask_decoder"], cfg.decoder, image_embedding, pe,
        sparse, dense, multimask_output=multimask_output,
        dense_shared=masks is None)


def postprocess_masks(masks: jnp.ndarray, input_hw: Tuple[int, int],
                      original_hw: Tuple[int, int], cfg: SamConfig
                      ) -> jnp.ndarray:
    """Upscale low-res mask logits to the original image resolution
    (reference sam.py:137-172): resize to img_size, crop padding, resize to
    original.  Shapes static per (input_hw, original_hw)."""
    s = cfg.encoder.img_size
    B, M = masks.shape[:2]
    m = masks.reshape(B * M, *masks.shape[2:])[..., None]
    m = jax.image.resize(m, (B * M, s, s, 1), method="bilinear")
    m = m[:, :input_hw[0], :input_hw[1]]
    m = jax.image.resize(m, (B * M, *original_hw, 1), method="bilinear")
    return m[..., 0].reshape(B, M, *original_hw)


def forward(params: dict, cfg: SamConfig, image: jnp.ndarray, *,
            points=None, labels=None, boxes=None,
            multimask_output: bool = True):
    """End-to-end promptable segmentation for one preprocessed image batch."""
    emb = encode_image(params, preprocess(image, cfg), cfg)
    return decode_masks(params, cfg, emb, points=points, labels=labels,
                        boxes=boxes, multimask_output=multimask_output)
