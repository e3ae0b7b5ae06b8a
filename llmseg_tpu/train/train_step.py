"""The jitted train step: loss -> grads -> masked AdamW update.

Data parallelism is implicit: params/opt-state are sharded by
parallel.mesh rules, batches shard their leading axes over the data axes,
and XLA GSPMD inserts the gradient reduce-scatter/all-reduce — the TPU
equivalent of DeepSpeed ZeRO-2's backward hooks (reference
training.py:546-547).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from llmseg_tpu.config import LLMSegConfig, LoraConfig, TrainConfig
from llmseg_tpu.models import llmseg


def make_train_step(cfg: LLMSegConfig, tx: optax.GradientTransformation,
                    lora_cfg: Optional[LoraConfig] = None,
                    remat: bool = True, one_hot_embed: bool = False):
    """Returns jittable (params, opt_state, batch) -> (params, opt_state, metrics)."""

    def train_step(params, opt_state, batch):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: llmseg.loss_fn(p, cfg, batch, lora_cfg=lora_cfg,
                                     remat=remat,
                                     one_hot_embed=one_hot_embed),
            has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        return params, opt_state, {**aux, "grad_norm": gnorm}

    return train_step


def make_eval_step(cfg: LLMSegConfig,
                   lora_cfg: Optional[LoraConfig] = None):
    def eval_step(params, batch):
        return llmseg.predict(params, cfg, batch, lora_cfg=lora_cfg)
    return eval_step


def make_partitioned_train_step(cfg: LLMSegConfig,
                                tx: optax.GradientTransformation,
                                lora_cfg: Optional[LoraConfig] = None,
                                remat: bool = True,
                                one_hot_embed: bool = False):
    """Train step over a (trainable, skeleton) partition (see optim.partition):
    gradients and optimizer state exist only for the trainable subset, and
    the frozen skeleton may hold int8-quantized base weights (QLoRA layout).
    This is what makes single-chip 7B training fit: full-tree grads + Adam
    state would add ~27GB; here they are ~1GB."""

    def train_step(trainable, skeleton, opt_state, batch):
        def loss(tf):
            from llmseg_tpu.train import optim

            params = optim.combine(skeleton, tf)
            return llmseg.loss_fn(params, cfg, batch, lora_cfg=lora_cfg,
                                  remat=remat, one_hot_embed=one_hot_embed)

        (l, aux), grads = jax.value_and_grad(loss, has_aux=True)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, {**aux,
                                      "grad_norm": optax.global_norm(grads)}

    return train_step
