"""SAM prompt encoder (reference modeling/prompt_encoder.py:16-238), TPU-first.

Encodes point/box/mask/text prompts into sparse + dense embeddings.  All
prompt batches are static-shape: points are passed as a fixed-size array with
a label of -10 meaning "absent" (padding), so one compiled program serves any
number of prompts.  Includes the LISA-era ``text_embeds`` pathway
(reference prompt_encoder.py:121,145,176-177) used by the legacy pixel-decoder
evaluate() path.

Point labels follow the reference convention:
  -10 pad/absent, -1 'not a point' (box corner pad), 0 negative, 1 positive,
  2/3 box corners.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from llmseg_tpu.config import SamPromptConfig
from llmseg_tpu.models import layers as L


def init(key, cfg: SamPromptConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 10)
    d = cfg.embed_dim
    return {
        "pe": L.position_embedding_random_init(keys[0], d // 2, dtype=dtype),
        # 0: neg point, 1: pos point, 2: box top-left, 3: box bottom-right
        "point_embeddings": jnp.asarray(
            jax.random.normal(keys[1], (4, d), jnp.float32), dtype),
        "not_a_point_embed": jnp.asarray(
            jax.random.normal(keys[2], (1, d), jnp.float32), dtype),
        "no_mask_embed": jnp.asarray(
            jax.random.normal(keys[3], (1, d), jnp.float32), dtype),
        "mask_downscale": {
            "conv1": L.conv2d_init(keys[4], 1, cfg.mask_in_chans // 4, 2, dtype=dtype),
            "ln1": L.layernorm2d_init(cfg.mask_in_chans // 4, dtype),
            "conv2": L.conv2d_init(keys[5], cfg.mask_in_chans // 4,
                                   cfg.mask_in_chans, 2, dtype=dtype),
            "ln2": L.layernorm2d_init(cfg.mask_in_chans, dtype),
            "conv3": L.conv2d_init(keys[6], cfg.mask_in_chans, d, 1, dtype=dtype),
        },
    }


def _embed_points(p: dict, points: jnp.ndarray, labels: jnp.ndarray,
                  cfg: SamPromptConfig) -> jnp.ndarray:
    """points: (B, N, 2) pixel coords; labels: (B, N) int."""
    pts = (points.astype(jnp.float32) + 0.5) / cfg.input_image_size
    pe = L.position_embedding_random(p["pe"], pts)          # (B, N, D)
    lab = labels[..., None]
    emb = jnp.where(lab == -1, p["not_a_point_embed"][0],
                    pe
                    + jnp.where(lab == 0, p["point_embeddings"][0], 0.0)
                    + jnp.where(lab == 1, p["point_embeddings"][1], 0.0)
                    + jnp.where(lab == 2, p["point_embeddings"][2], 0.0)
                    + jnp.where(lab == 3, p["point_embeddings"][3], 0.0))
    emb = jnp.where(lab == -10, 0.0, emb)                    # padding slots
    return emb


def dense_pe(p: dict, size: int) -> jnp.ndarray:
    """Positional encoding over the image-embedding grid -> (size, size, D)."""
    return L.position_grid(p["pe"], size)


def _embed_masks(p: dict, masks: jnp.ndarray) -> jnp.ndarray:
    """masks: (B, 4*S, 4*S, 1) -> (B, S, S, D)."""
    m = p["mask_downscale"]
    masks = masks.astype(m["conv1"]["w"].dtype)
    x = L.conv2d(m["conv1"], masks, stride=2, padding="VALID")
    x = jax.nn.gelu(L.layernorm2d(m["ln1"], x))
    x = L.conv2d(m["conv2"], x, stride=2, padding="VALID")
    x = jax.nn.gelu(L.layernorm2d(m["ln2"], x))
    return L.conv2d(m["conv3"], x)


def apply(p: dict, cfg: SamPromptConfig, *,
          points: Optional[jnp.ndarray] = None,
          labels: Optional[jnp.ndarray] = None,
          boxes: Optional[jnp.ndarray] = None,
          masks: Optional[jnp.ndarray] = None,
          text_embeds: Optional[jnp.ndarray] = None,
          batch: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (sparse (B, N, D), dense (B, S, S, D)).

    Boxes (B, 4) xyxy are encoded as two corner points (reference :100-109).
    Point prompts get a padding point appended (label -1) when no box is
    given, matching reference predictor behavior.
    """
    d = cfg.embed_dim
    sparse = []
    B = batch
    if points is not None:
        assert labels is not None
        B = points.shape[0]
        pad_point = jnp.zeros((B, 1, 2), points.dtype)
        pad_label = -jnp.ones((B, 1), labels.dtype)
        if boxes is None:
            points = jnp.concatenate([points, pad_point], axis=1)
            labels = jnp.concatenate([labels, pad_label], axis=1)
        sparse.append(_embed_points(p, points, labels, cfg))
    if boxes is not None:
        B = boxes.shape[0]
        corners = boxes.reshape(-1, 2, 2)
        corner_labels = jnp.broadcast_to(jnp.array([2, 3]), (B, 2))
        sparse.append(_embed_points(p, corners, corner_labels, cfg))
    if text_embeds is not None:
        B = text_embeds.shape[0]
        sparse.append(text_embeds)
    sparse_out = (jnp.concatenate(sparse, axis=1) if sparse
                  else jnp.zeros((B, 0, d)))

    if masks is not None:
        dense = _embed_masks(p, masks)
    else:
        s = cfg.image_embedding_size
        dense = jnp.broadcast_to(p["no_mask_embed"].reshape(1, 1, 1, d),
                                 (B, s, s, d))
    return sparse_out, dense
