"""Optimizer: AdamW + WarmupDecayLR + grad clip, trainable-subset masked.

Capability parity with the reference DeepSpeed config (training.py:296-332):
AdamW (betas 0.9/0.95, wd 0), 100-step linear warmup then linear decay to 0
over total steps, grad clip 1.0, grad accumulation.  The trainable set
mirrors reference training.py:231-242: lm_head, embed_tokens,
text_hidden_fcs (select/text_*), every lisa_* module (the whole selection
head), and LoRA — all vision towers and base LLaMA weights frozen.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from llmseg_tpu.config import TrainConfig


def trainable_mask(params: dict) -> dict:
    """Bool pytree: True = trainable leaf."""

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (str(k),)) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, path + (str(i),))
                              for i, v in enumerate(node))
        joined = "/".join(path)
        if joined.startswith("select/") or joined.startswith("lora/"):
            return True
        if "llm/embed_tokens" in joined or "llm/lm_head" in joined:
            return True
        return False

    return walk(params, ())


def warmup_decay_schedule(cfg: TrainConfig) -> optax.Schedule:
    """DeepSpeed WarmupDecayLR: linear 0->lr over warmup_steps, then linear
    lr->0 over the remaining total steps."""
    total = cfg.epochs * cfg.steps_per_epoch
    return optax.join_schedules(
        [optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps),
         optax.linear_schedule(cfg.lr, 0.0, max(total - cfg.warmup_steps, 1))],
        [cfg.warmup_steps])


def make_optimizer(cfg: TrainConfig, params: dict) -> optax.GradientTransformation:
    """Masked optimizer over the FULL param tree (frozen leaves get zero
    updates).  Prefer partition() + make_trainable_optimizer() for large
    models: it allocates grads/optimizer state only for the trainable subset."""
    mask = trainable_mask(params)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(warmup_decay_schedule(cfg), b1=cfg.beta1, b2=cfg.beta2,
                    weight_decay=cfg.weight_decay),
    )
    tx = optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()},
        jax.tree.map(lambda t: "train" if t else "freeze", mask))
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx


def make_trainable_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Optimizer over the trainable-subset tree returned by partition()."""
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(warmup_decay_schedule(cfg), b1=cfg.beta1, b2=cfg.beta2,
                    weight_decay=cfg.weight_decay),
    )
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx


# ---------------------------------------------------------------------------
# Trainable/frozen partition (the DeepSpeed-free ZeRO-friendly layout:
# gradients + optimizer state exist ONLY for the trainable subset — with
# LoRA + heads that is ~0.6GB at 7B instead of 27GB)
# ---------------------------------------------------------------------------


def partition(params: dict, mask: dict = None):
    """-> (trainable: {path_str: leaf}, skeleton: params with None holes).
    `mask` overrides the default llmseg trainable set (e.g. train/sft.py's
    projector-only / LoRA regimes)."""
    if mask is None:
        mask = trainable_mask(params)
    trainable = {}

    def walk(node, m, path):
        if isinstance(node, dict):
            return {k: walk(v, m[k], path + (str(k),)) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, m[i], path + (str(i),))
                              for i, v in enumerate(node))
        if m:
            trainable["/".join(path)] = node
            return None
        return node

    skeleton = walk(params, mask, ())
    return trainable, skeleton


def combine(skeleton: dict, trainable: dict) -> dict:
    """Inverse of partition(): fill the None holes from the flat dict."""

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (str(k),)) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, path + (str(i),))
                              for i, v in enumerate(node))
        if node is None:
            return trainable["/".join(path)]
        return node

    return walk(skeleton, ())


def quantize_skeleton(skeleton: dict, bits: int = 8) -> dict:
    """QLoRA-style: quantize the frozen LLaMA base weights inside the
    skeleton (int8 halves their HBM, int4 quarters it; LoRA/heads stay
    full precision)."""
    from llmseg_tpu.ops import quant

    out = dict(skeleton)
    if "llava" in out and "llm" in out["llava"]:
        llava = dict(out["llava"])
        llava["llm"] = quant.quantize_llama(llava["llm"], bits=bits)
        out["llava"] = llava
    return out
