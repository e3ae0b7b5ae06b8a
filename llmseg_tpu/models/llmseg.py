"""Top-level LLM-Seg model: LLaVA + DINOv2 + selection head (+ optional SAM).

Capability parity with reference model/LISA.py:18-559 (LISAForCausalLM), laid
out as one pure function over a static-shape batch:

  * images -> DINOv2 patch features -> 1x1 proj -> 256^2 upsample
  * SAM proposal masks (offline AMG, padded to K) -> mask pooling
  * LLaVA forward -> hidden state left of the [SEG] token -> text_hidden_fcs
  * selection head -> per-proposal similarity + IoP
  * losses: LLaVA CE + KL align + weighted-MSE IoP regression

Batch layout (replaces the reference's ragged offset/lists, collate_fn_new,
utils/dataset.py:33-170): images are batched (B,) and conversation rows (R,)
carry `row_to_image` indices; everything is padded with validity masks.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from llmseg_tpu import losses as LS
from llmseg_tpu.config import LLMSegConfig, LoraConfig
from llmseg_tpu.models import llama, llava, selection_head, vit


def init(key, cfg: LLMSegConfig, dtype=jnp.float32,
         lora_cfg: Optional[LoraConfig] = None) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "llava": llava.init(k1, cfg.llava, dtype),
        "dino": vit.init(k2, cfg.dino, dtype),
        "select": selection_head.init(k3, cfg.select, dtype),
    }
    if lora_cfg is not None:
        p["lora"] = llama.lora_init(k4, cfg.llava.llm, lora_cfg, dtype)
    return p


def dino_features(params: dict, cfg: LLMSegConfig,
                  images: jnp.ndarray,
                  precomputed: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(B, 896, 896, 3) -> (B, seg_grid^2, 256) projected + upsampled features
    (reference LISA.py:186-199,244-245,350-354: frozen dino -> lisa_dino_conv
    -> fp32 bilinear 64 -> 256).

    precomputed: raw patch tokens (B, grid^2, dino_dim) to use instead of
    running the tower — for feature caching and cross-implementation parity
    tests (the tower is frozen, so offline feature extraction is exact)."""
    if precomputed is not None:
        feats = jax.lax.stop_gradient(precomputed)
    else:
        feats = jax.lax.stop_gradient(
            vit.dino_patch_features(params["dino"], images, cfg.dino))
    feats = selection_head.project_dino(params["select"], feats)
    B, N, D = feats.shape
    g = cfg.dino.grid
    fmap = feats.reshape(B, g, g, D).astype(jnp.float32)
    fmap = _bilinear_upsample(fmap, cfg.seg_grid)
    return fmap.reshape(B, cfg.seg_grid * cfg.seg_grid, D).astype(feats.dtype)


def _interp_matrix(n_in: int, n_out: int) -> jnp.ndarray:
    """(n_out, n_in) f32 bilinear interpolation weights — exactly
    jax.image.resize('bilinear') applied to the identity (two nonzeros per
    row).  Cached as a concrete host constant so jit traces embed it."""
    key = (n_in, n_out)
    m = _INTERP_CACHE.get(key)
    if m is None:
        import numpy as np

        # numpy, not jax.image.resize-of-eye: inside a jit trace every jnp
        # op stages to a tracer, and this matrix must be a host constant.
        # Same math as jax.image.resize('bilinear') upsampling: half-pixel
        # sample coords, triangle kernel, edge rows renormalized.
        scale = n_out / n_in
        x = (np.arange(n_out, dtype=np.float64) + 0.5) / scale - 0.5
        i = np.arange(n_in, dtype=np.float64)
        w = np.maximum(0.0, 1.0 - np.abs(x[:, None] - i[None, :]))
        w = w / w.sum(-1, keepdims=True)
        m = w.astype(np.float32)
        _INTERP_CACHE[key] = m
    # cache holds NUMPY (a jnp constant created inside one jit trace is a
    # tracer and must not leak into the next); jnp.asarray per-trace is free
    return jnp.asarray(m)


_INTERP_CACHE: Dict = {}


def _bilinear_upsample(fmap: jnp.ndarray, out: int) -> jnp.ndarray:
    """f32 bilinear (B, g, g, D) -> (B, out, out, D) as two separable
    matmuls against the (out, g) interpolation matrix: identical math to
    jax.image.resize (each output row is the same 2-term convex combination;
    precision=HIGHEST keeps the f32 dot exact), but rides the MXU instead
    of the resize gather — measured 2.26 -> 1.73 ms at (4, 64->256, 256)."""
    M = _interp_matrix(fmap.shape[1], out)
    hi = jax.lax.Precision.HIGHEST
    t = jnp.einsum("oh,bhwd->bowd", M, fmap, precision=hi)
    return jnp.einsum("ow,bhwd->bhod", M, t, precision=hi)


def _pool_dino_proposals(params: dict, cfg: LLMSegConfig,
                         batch: Dict) -> jnp.ndarray:
    """Mask pooling WITHOUT materializing the (B, seg_grid^2, D) upsampled
    feature map: pooling is a weighted sum and the fp32 bilinear upsample is
    linear, so

        segs @ upsample(F)  ==  (upsample^T segs) @ F        (exactly)

    — the adjoint (M x M)^T lands on the (K, G, G) proposal masks instead of
    the (seg_grid^2, D) features, deleting the 256^2 x D materialization and
    its pooling traversal from the e2e step.  The denominator (mask area) is
    unchanged — computed on the full-resolution masks.  Numerically this is
    MORE precise than dino_features + mask_pooling: the f32 adjoint/einsum
    never rounds the upsampled map to bf16.  Same reference semantics as the
    unfused pair (LISA.py:186-218: dino -> 1x1 conv -> fp32 bilinear 64->256
    -> weights @ feats / sum(weights)); `dino_features` remains the public
    unfused path (feature caching, HF parity tests, bench --tower dino).
    Escape hatch: LLMSEG_POOL_ADJOINT=0 restores the unfused route."""
    feats = batch.get("dino_feats")
    if feats is not None:
        feats = jax.lax.stop_gradient(feats)
    else:
        feats = jax.lax.stop_gradient(
            vit.dino_patch_features(params["dino"], batch["images_dino"],
                                    cfg.dino))
    feats = selection_head.project_dino(params["select"], feats)
    B = feats.shape[0]
    g = cfg.dino.grid
    segs = batch["sam_segs"].astype(jnp.float32)            # (B, K, G, G)
    hi = jax.lax.Precision.HIGHEST
    if cfg.seg_grid != g:
        M = _interp_matrix(g, cfg.seg_grid)                 # (seg_grid, g)
        t = jnp.einsum("Oh,bkOW->bkhW", M, segs, precision=hi)
        segs_g = jnp.einsum("Ww,bkhW->bkhw", M, t, precision=hi)
    else:
        segs_g = segs
    w = segs_g.reshape(B, -1, g * g)
    pooled = jnp.einsum("bkh,bhd->bkd", w, feats.astype(jnp.float32),
                        precision=hi)
    denom = jnp.sum(segs, axis=(-1, -2))[..., None] + 1e-8
    return (pooled / denom).astype(feats.dtype)


def seg_hidden_index(input_ids: jnp.ndarray, cfg: LLMSegConfig):
    """Index (in the SPLICED sequence) of the hidden state used as the [SEG]
    intent embedding, per row.

    The reference takes the hidden state one position LEFT of the [SEG] token
    (seg_token_mask built from input_ids[:, 1:], LISA.py:254-266) and shifts
    by the 255 inserted image tokens (:262-266).  Returns (idx (R,),
    has_seg (R,))."""
    is_seg = input_ids == cfg.seg_token_id
    has_seg = jnp.any(is_seg, axis=1)
    text_pos = jnp.argmax(is_seg, axis=1)                # first [SEG]
    n_img = cfg.llava.num_image_tokens
    idx = text_pos - 1 + (n_img - 1)
    return jnp.maximum(idx, 0), has_seg


def forward(params: dict, cfg: LLMSegConfig, batch: Dict, *,
            lora_cfg: Optional[LoraConfig] = None,
            remat: bool = False, one_hot_embed: bool = False,
            quant_stats: Optional[list] = None) -> Dict:
    """Shared train/inference forward.

    batch keys (shapes; B=images, R=conversation rows, K=max_proposals,
    T=text tokens, G=seg_grid):
      images_dino (B, 896, 896, 3), images_clip (B, 224, 224, 3),
      input_ids (R, T) i32, image_pos (R,) i32, row_to_image (R,) i32,
      row_valid (R,) bool, sam_segs (B, K, G, G) f32 soft masks,
      prop_valid (B, K) bool.
    Returns dict with similarity (R, K), pred_iou (R, K), hidden, logits-fn
    inputs.
    """
    lora = params.get("lora")
    lv = cfg.llava

    # 1. DINOv2 proposal features + mask pooling (frozen tower)
    import os

    if os.environ.get("LLMSEG_POOL_ADJOINT", "1") != "0":
        pooled = _pool_dino_proposals(params, cfg, batch)
        B = pooled.shape[0]
    else:
        feat_flat = dino_features(params, cfg, batch["images_dino"],
                                  precomputed=batch.get("dino_feats"))
        B = feat_flat.shape[0]
        segs = batch["sam_segs"].reshape(B, batch["sam_segs"].shape[1], -1)
        pooled = selection_head.mask_pooling(feat_flat,
                                             segs.astype(feat_flat.dtype))

    row_img = batch["row_to_image"]
    prop_embeds = pooled[row_img]                          # (R, K, 256)
    prop_valid = batch["prop_valid"][row_img]              # (R, K)

    # 2. LLaVA forward (frozen CLIP; LLM trainable via LoRA + embeds)
    img_embeds = llava.encode_images(params["llava"], lv,
                                     batch["images_clip"])
    img_embeds = jax.lax.stop_gradient(img_embeds)         # tower frozen
    img_embeds = img_embeds[row_img]
    hidden = llava.forward(params["llava"], lv,
                           input_ids=batch["input_ids"],
                           image_pos=batch["image_pos"],
                           image_embeds=img_embeds,
                           lora=lora, lora_cfg=lora_cfg, remat=remat,
                           one_hot_embed=one_hot_embed,
                           quant_stats=quant_stats)

    # 3. [SEG] embedding -> text projection.  One-hot einsum instead of
    # take_along_axis: its transpose is another einsum, not a scatter —
    # scatters force an SPMD full-rematerialization under the dp/fsdp mesh.
    seg_idx, has_seg = seg_hidden_index(batch["input_ids"], cfg)
    onehot = jax.nn.one_hot(seg_idx, hidden.shape[1], dtype=hidden.dtype)
    seg_hidden = jnp.einsum("rt,rtd->rd", onehot, hidden)
    pred_embeddings = selection_head.project_text(params["select"],
                                                  seg_hidden)   # (R, 256)

    # 4. selection head
    similarity, pred_iou, seg_features = selection_head.apply(
        params["select"], cfg.select, prop_embeds, pred_embeddings,
        prop_valid)

    return {
        "hidden": hidden,
        "similarity": similarity,
        "pred_iou": pred_iou,
        "seg_features": seg_features,
        "pred_embeddings": pred_embeddings,
        "prop_valid": prop_valid,
        "row_valid": batch["row_valid"] & has_seg,
    }


def fold_frozen_inplace(params: dict) -> dict:
    """Inference-time exact reparameterizations of the frozen towers —
    currently the DINOv2 LayerScale fold (vit.fold_layerscale_inplace),
    which deletes two (B, T, D) elementwise passes per block.  Safe under
    training too (the towers sit behind stop_gradient, reference
    LISA.py:48,186), but wired on the inference/bench paths so saved
    checkpoints keep the canonical tree shape."""
    if "dino" in params:
        vit.fold_layerscale_inplace(params["dino"])
    return params


def calibrate_quant_stats(params: dict, cfg: LLMSegConfig, batch,
                          lora_cfg: Optional[LoraConfig] = None):
    """bf16 forward(s) on calibration data, recording per LLM layer the
    column-max |input| of every quantized-matmul site (SmoothQuant, Xiao et
    al. 2022 — the TPU-native replacement for bitsandbytes LLM.int8()'s
    runtime outlier decomposition, reference
    model/llava/model/builder.py:40-47).  `batch` is one batch dict or an
    iterable of same-shape batch dicts (one compile); multi-batch stats are
    merged by elementwise max — SmoothQuant's statistic is the column max
    over ALL calibration tokens.  Feed the result to
    quant.quantize_llama_inplace(smooth_stats=...) BEFORE quantizing; run
    on bf16 weights.  Returns None when `batch` is an empty iterable."""
    import jax
    import numpy as np

    if isinstance(batch, dict):
        batch = (batch,)

    @jax.jit
    def f(p, b):
        st: list = []
        forward(p, cfg, b, lora_cfg=lora_cfg, quant_stats=st)
        return st

    merged = None
    for b in batch:
        st = jax.device_get(f(params, b))
        if merged is None:
            merged = st
        else:
            merged = [{k: np.maximum(m[k], s[k]) for k in m}
                      for m, s in zip(merged, st)]
    return merged


def loss_fn(params: dict, cfg: LLMSegConfig, batch: Dict, *,
            lora_cfg: Optional[LoraConfig] = None,
            remat: bool = False, one_hot_embed: bool = False) -> tuple:
    """Total training loss (reference LISA.py:416-474).

    Extra batch keys: labels (R, T), gt_ious (R, K), gt_iops (R, K).
    Align/regression: per-row loss, averaged over rows of each image, then
    averaged over images with >=1 valid row (reference's
    round-mean -> batch-mean, LISA.py:420-463).
    """
    out = forward(params, cfg, batch, lora_cfg=lora_cfg, remat=remat,
                  one_hot_embed=one_hot_embed)
    B = batch["images_dino"].shape[0]
    lv = cfg.llava

    # CE over splice-adjusted labels
    logits = llama.logits(params["llava"]["llm"], lv.llm, out["hidden"])
    labels = llava.splice_labels(batch["labels"], batch["image_pos"],
                                 lv.num_image_tokens)
    labels = jnp.where(batch["row_valid"][:, None], labels,
                       llava.IGNORE_INDEX)
    ce = llava.causal_lm_loss(logits, labels)

    # per-row align + regression
    def row_losses(seg_feat, pred_emb, gt_iou, gt_iop, p_iou, valid_k):
        al = LS.softmax_align_loss(seg_feat, pred_emb, gt_iou, valid_k,
                                   cfg.loss.align_temperature)
        rg = LS.iou_regression_loss(p_iou, gt_iop, valid_k,
                                    scale=cfg.loss.regression_scale)
        return al, rg

    align_r, reg_r = jax.vmap(row_losses)(
        out["seg_features"], out["pred_embeddings"], batch["gt_ious"],
        batch["gt_iops"], out["pred_iou"], out["prop_valid"])

    rv = out["row_valid"].astype(jnp.float32)
    align_r = align_r * rv
    reg_r = reg_r * rv
    rows_per_img = jax.ops.segment_sum(rv, batch["row_to_image"],
                                       num_segments=B)
    align_img = jax.ops.segment_sum(align_r, batch["row_to_image"],
                                    num_segments=B)
    reg_img = jax.ops.segment_sum(reg_r, batch["row_to_image"],
                                  num_segments=B)
    img_valid = rows_per_img > 0
    denom = jnp.maximum(rows_per_img, 1e-8)
    n_img = jnp.maximum(jnp.sum(img_valid.astype(jnp.float32)), 1.0)
    align = jnp.sum(jnp.where(img_valid, align_img / denom, 0.0)) / n_img
    reg = jnp.sum(jnp.where(img_valid, reg_img / denom, 0.0)) / n_img

    ce = ce * cfg.loss.ce_weight
    align = align * cfg.loss.align_weight
    reg = reg * cfg.loss.regression_weight
    total = ce + align + reg
    return total, {"loss": total, "ce_loss": ce, "align_loss": align,
                   "regression_loss": reg}


def predict(params: dict, cfg: LLMSegConfig, batch: Dict, *,
            lora_cfg: Optional[LoraConfig] = None) -> Dict:
    """Inference: similarity + IoP per proposal (reference inference branch
    LISA.py:268-283,393-414 — a single teacher-forced pass, no decoding)."""
    out = forward(params, cfg, batch, lora_cfg=lora_cfg)
    return {"pred_similarity": out["similarity"], "pred_iou": out["pred_iou"],
            "prop_valid": out["prop_valid"], "row_valid": out["row_valid"]}
