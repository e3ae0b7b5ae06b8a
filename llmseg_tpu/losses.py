"""Training objectives (capability parity with reference model/loss.py).

All losses take explicit validity masks so padded proposals / rows never
contribute — the reference relies on ragged tensors instead.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def softmax_align_loss(proposal_embeds: jnp.ndarray, target_embed: jnp.ndarray,
                       gt_ious: jnp.ndarray,
                       valid: Optional[jnp.ndarray] = None,
                       temperature: float = 0.05) -> jnp.ndarray:
    """KL(softmax(gt_iou/T) || softmax(cos_sim/T)) over K proposals, summed
    (reference loss.py:50-80, RegionCLIP-style).

    proposal_embeds: (K, D); target_embed: (D,) or (1, D); gt_ious: (K,);
    valid: (K,) bool.  Invalid proposals are excluded from both softmaxes.
    """
    p = proposal_embeds.astype(jnp.float32)
    t = target_embed.reshape(-1).astype(jnp.float32)
    p = p / (jnp.linalg.norm(p, axis=-1, keepdims=True) + 1e-8)
    t = t / (jnp.linalg.norm(t) + 1e-8)
    sim = p @ t                                           # (K,)
    sim_l = sim / temperature
    gt_l = gt_ious.astype(jnp.float32) / temperature
    if valid is not None:
        sim_l = jnp.where(valid, sim_l, -1e9)
        gt_l = jnp.where(valid, gt_l, -1e9)
    log_sim = jax.nn.log_softmax(sim_l)
    gt_p = jax.nn.softmax(gt_l)
    log_gt = jax.nn.log_softmax(gt_l)
    kl = gt_p * (log_gt - log_sim)
    if valid is not None:
        kl = jnp.where(valid, kl, 0.0)
    return jnp.sum(kl)


def iou_regression_loss(pred_ious: jnp.ndarray, gt_ious: jnp.ndarray,
                        valid: Optional[jnp.ndarray] = None,
                        weighted: bool = True,
                        scale: float = 50.0) -> jnp.ndarray:
    """Weighted MSE on IoP (reference loss.py:82-94): mse * exp(gt-1),
    mean over proposals, x50 ('as if every sample had 50 proposals')."""
    pred = pred_ious.astype(jnp.float32)
    gt = gt_ious.astype(jnp.float32)
    err = jnp.square(pred - gt)
    if not weighted:
        if valid is not None:
            err = jnp.where(valid, err, 0.0)
        return jnp.sum(err)
    err = err * jnp.exp(gt - 1.0)
    if valid is not None:
        err = jnp.where(valid, err, 0.0)
        denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    else:
        denom = err.size
    return jnp.sum(err) / denom * scale


def sigmoid_align_loss(proposal_embeds: jnp.ndarray, target_embed: jnp.ndarray,
                       gt_ious: jnp.ndarray, temperature: jnp.ndarray,
                       bias: jnp.ndarray,
                       valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """SigLIP-style pairwise sigmoid alignment (reference loss.py:97-129 —
    retained for parity; unused by the default forward).

    Matches the reference exactly: the learnable `temperature` is a LOG
    scale (logits use exp(temperature)), and the loss is
    -log(sigmoid(z * logits) + 1e-8) — the epsilon floors each element at
    -log(1e-8) ~= 18.42 instead of growing linearly."""
    p = proposal_embeds.astype(jnp.float32)
    t = target_embed.reshape(-1).astype(jnp.float32)
    p = p / (jnp.linalg.norm(p, axis=-1, keepdims=True) + 1e-8)
    t = t / (jnp.linalg.norm(t) + 1e-8)
    sim = p @ t
    logits = sim * jnp.exp(temperature) + bias
    # soft labels in [-1, 1]: 2*iou - 1
    z = 2.0 * gt_ious.astype(jnp.float32) - 1.0
    loss = -jnp.log(jax.nn.sigmoid(z * logits) + 1e-8)
    if valid is not None:
        loss = jnp.where(valid, loss, 0.0)
    return jnp.sum(loss)


def dice_loss(inputs: jnp.ndarray, targets: jnp.ndarray, num_masks: jnp.ndarray,
              scale: float = 1000.0, eps: float = 1e-6) -> jnp.ndarray:
    """DICE on mask logits (reference loss.py:4-27; legacy SAM-decoder path).
    inputs/targets: (N, H*W)."""
    x = jax.nn.sigmoid(inputs.astype(jnp.float32))
    t = targets.astype(jnp.float32)
    numerator = 2 * jnp.sum(x / scale * t, axis=-1)
    denominator = jnp.sum(x / scale, axis=-1) + jnp.sum(t / scale, axis=-1)
    loss = 1 - (numerator + eps) / (denominator + eps)
    return jnp.sum(loss) / (num_masks + 1e-8)


def sigmoid_ce_loss(inputs: jnp.ndarray, targets: jnp.ndarray,
                    num_masks: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel BCE on mask logits (reference loss.py:30-47)."""
    x = inputs.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    loss = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    loss = jnp.mean(loss, axis=-1)
    return jnp.sum(loss) / (num_masks + 1e-8)
