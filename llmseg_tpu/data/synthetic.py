"""Synthetic batches matching the model's batch contract.

Used by unit tests, bench.py and __graft_entry__ — lets the full compute path
compile and run without the (large, external) ReasonSeg assets.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from llmseg_tpu.config import LLMSegConfig


def make_batch(cfg: LLMSegConfig, *, num_images: int = 1,
               rows_per_image: int = 1, text_len: int = 64,
               seed: int = 0, dtype=jnp.float32) -> Dict:
    """Random batch with valid structure: one image placeholder at position 1,
    one [SEG] token near the end of each row, blobby proposal masks."""
    rng = np.random.RandomState(seed)
    B = num_images
    R = num_images * rows_per_image
    K = cfg.max_proposals
    G = cfg.seg_grid
    lv = cfg.llava
    T = text_len

    vocab = lv.llm.vocab_size
    ids = rng.randint(4, vocab - 4, size=(R, T))
    seg_pos = T - 4
    ids[:, seg_pos] = cfg.seg_token_id
    labels = ids.copy()
    labels[:, : T // 2] = -100

    segs = (rng.rand(B, K, G, G) < 0.2).astype(np.float32)
    gt_iou = rng.rand(R, K).astype(np.float32)
    gt_iop = rng.rand(R, K).astype(np.float32)

    return {
        "images_dino": jnp.asarray(
            rng.randn(B, cfg.dino.img_size, cfg.dino.img_size, 3), dtype),
        "images_clip": jnp.asarray(
            rng.randn(B, lv.vision.img_size, lv.vision.img_size, 3), dtype),
        "input_ids": jnp.asarray(ids, jnp.int32),
        "labels": jnp.asarray(labels, jnp.int32),
        "image_pos": jnp.ones((R,), jnp.int32),
        "row_to_image": jnp.asarray(
            np.repeat(np.arange(B), rows_per_image), jnp.int32),
        "row_valid": jnp.ones((R,), bool),
        "sam_segs": jnp.asarray(segs, dtype),
        "prop_valid": jnp.broadcast_to(jnp.arange(K) < max(K - 2, 1), (B, K)),
        "gt_ious": jnp.asarray(gt_iou, dtype),
        "gt_iops": jnp.asarray(gt_iop, dtype),
    }
