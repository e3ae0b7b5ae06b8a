"""Serializable SAM decoder program — the TPU-native equivalent of the
reference's ONNX export (model/segment_anything/utils/onnx.py:17-157,
SURVEY M15).

The reference traces prompt-encoder + mask-decoder + postprocessing into an
ONNX graph so the decoder can run outside PyTorch.  The JAX-native analog is
`jax.export`: the same composition is staged into a self-contained StableHLO
artifact that any XLA runtime (TPU/CPU/GPU, PJRT C API) can load and execute
without this package or its weights — parameters are baked into the program
as constants, exactly like ONNX initializers.

Differences by design (XLA static-shape discipline):
  * shapes (prompt batch, points-per-prompt, original image size) are fixed
    at export; export one artifact per deployment shape instead of ONNX
    dynamic axes,
  * the caller passes raw click points — the padding point is appended
    inside (predictor semantics), unlike SamOnnxModel which requires the
    caller to pad.

Options mirror SamOnnxModel: return_single_mask (the num_points-2.5 score
reweighting trick, onnx.py:103-116), use_stability_score, and
return_extra_metrics.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from llmseg_tpu.config import SamConfig
from llmseg_tpu.models.sam import mask_decoder, prompt_encoder
from llmseg_tpu.ops import amg_utils

STABILITY_SCORE_OFFSET = 1.0   # onnx.py:38


def make_decoder_fn(params: dict, cfg: SamConfig, *,
                    return_single_mask: bool = False,
                    use_stability_score: bool = False,
                    return_extra_metrics: bool = False,
                    orig_hw: Optional[Tuple[int, int]] = None):
    """Build the traceable decoder function (the SamOnnxModel.forward
    equivalent).

    fn(image_embedding (1|B, S, S, D), point_coords (B, N, 2) input-frame px,
       point_labels (B, N) i32, mask_input (B, 4S, 4S, 1), has_mask_input ())
      -> (masks, scores[, stability, areas, low_masks])
    masks are logits at `orig_hw` (or the model input frame when None).
    """
    pp = params["prompt_encoder"]
    pd = params["mask_decoder"]

    def fn(image_embedding, point_coords, point_labels, mask_input,
           has_mask_input):
        n_points = point_coords.shape[1]
        sparse, dense_m = prompt_encoder.apply(
            pp, cfg.prompt, points=point_coords, labels=point_labels,
            masks=mask_input)
        _, dense_nm = prompt_encoder.apply(
            pp, cfg.prompt, points=point_coords, labels=point_labels,
            masks=None)
        w = has_mask_input.astype(dense_m.dtype)
        dense = w * dense_m + (1.0 - w) * dense_nm
        pe = prompt_encoder.dense_pe(pp, cfg.prompt.image_embedding_size)[None]
        # impl="xla": a serialized artifact must have batch-size-independent
        # numerics/dtype — the fused TPU kernel would switch mask logits to
        # the image dtype for prompt batches >= 8
        masks, scores = mask_decoder.predict_masks(
            pd, cfg.decoder, image_embedding, pe, sparse, dense, impl="xla")

        if use_stability_score:                       # onnx.py:135-138
            scores = amg_utils.calculate_stability_score(
                masks, cfg.mask_threshold, STABILITY_SCORE_OFFSET)

        if return_single_mask:                        # onnx.py:103-116
            nt = masks.shape[1]
            reweight = jnp.array([[1000.0] + [0.0] * (nt - 1)], scores.dtype)
            score = scores + (n_points - 2.5) * reweight
            best = jnp.argmax(score, axis=1)
            rows = jnp.arange(masks.shape[0])
            masks = masks[rows, best][:, None]
            scores = scores[rows, best][:, None]

        # postprocess to the input frame (and optionally the original size)
        B, M = masks.shape[:2]
        s = cfg.encoder.img_size
        m = masks.reshape(B * M, *masks.shape[2:])[..., None]
        m = jax.image.resize(m.astype(jnp.float32), (B * M, s, s, 1),
                             method="bilinear")
        if orig_hw is not None:
            scale = s / max(orig_hw)
            ph = int((orig_hw[0] * scale) + 0.5)
            pw = int((orig_hw[1] * scale) + 0.5)
            m = m[:, :ph, :pw]
            m = jax.image.resize(m, (B * M, orig_hw[0], orig_hw[1], 1),
                                 method="bilinear")
        up = m[..., 0].reshape(B, M, *m.shape[1:3])

        if return_extra_metrics:                      # onnx.py:141-146
            stab = amg_utils.calculate_stability_score(
                up, cfg.mask_threshold, STABILITY_SCORE_OFFSET)
            areas = jnp.sum(up > cfg.mask_threshold, axis=(-2, -1))
            return up, scores, stab, areas, masks
        return up, scores, masks

    return fn


def export_decoder(params: dict, cfg: SamConfig, *, batch: int = 1,
                   n_points: int = 1, dtype=jnp.float32,
                   **options) -> "jax.export.Exported":
    """Stage the decoder into a platform-retargetable StableHLO artifact."""
    S = cfg.prompt.image_embedding_size
    D = cfg.prompt.embed_dim
    S4 = 4 * S
    fn = make_decoder_fn(params, cfg, **options)
    args = (
        jax.ShapeDtypeStruct((1, S, S, D), dtype),
        jax.ShapeDtypeStruct((batch, n_points, 2), dtype),
        jax.ShapeDtypeStruct((batch, n_points), jnp.int32),
        jax.ShapeDtypeStruct((batch, S4, S4, 1), dtype),
        jax.ShapeDtypeStruct((), dtype),
    )
    return jax.export.export(jax.jit(fn))(*args)


def save_decoder(path: str, params: dict, cfg: SamConfig, **kw) -> None:
    exported = export_decoder(params, cfg, **kw)
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_decoder(path: str):
    """Load a serialized decoder; returns a callable (jit-compiled on the
    local backend).  Needs only jax — not this package's model code."""
    with open(path, "rb") as f:
        exported = jax.export.deserialize(f.read())
    return lambda *args: exported.call(*args)
