"""Training loop (capability parity with reference training.py:336-602 +
finetune_llmseg.py): epochs x steps with grad accumulation, meters + progress
printing, TensorBoard logging, per-epoch validation, best-gIoU checkpointing
and auto-resume.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from llmseg_tpu.config import ExperimentConfig, LoraConfig
from llmseg_tpu.models import llmseg
from llmseg_tpu.parallel import mesh as M
from llmseg_tpu.train import checkpoint as ckpt_lib
from llmseg_tpu.train import evaluate as eval_lib
from llmseg_tpu.train import optim, train_step as ts_lib
from llmseg_tpu.utils.metrics import AverageMeter, ProgressMeter, Summary


class Trainer:
    def __init__(self, cfg: ExperimentConfig, *,
                 lora_cfg: Optional[LoraConfig] = None,
                 params=None, writer=None):
        self.cfg = cfg
        self.lora_cfg = lora_cfg if lora_cfg is not None else cfg.train.lora
        self.mesh = M.make_mesh(cfg.train.mesh)
        dtype = jnp.bfloat16 if cfg.train.precision == "bf16" else jnp.float32
        if params is None:
            with self.mesh:
                params = llmseg.init(jax.random.PRNGKey(cfg.train.seed),
                                     cfg.model, dtype=dtype,
                                     lora_cfg=self.lora_cfg)
        with self.mesh:
            params = M.shard_params(params, self.mesh)
            # trainable/frozen partition: grads + Adam state only for the
            # trainable subset; optional int8 frozen base (QLoRA)
            self.trainable, self.skeleton = optim.partition(params)
            if cfg.train.quantize_frozen:
                self.skeleton = optim.quantize_skeleton(
                    self.skeleton, bits=cfg.train.quantize_bits)
            self.tx = optim.make_trainable_optimizer(cfg.train)
            self.opt_state = self.tx.init(self.trainable)
        remat = {"none": False, "full": True}.get(
            cfg.train.remat_policy, cfg.train.remat_policy)
        step_fn = ts_lib.make_partitioned_train_step(
            cfg.model, self.tx, lora_cfg=self.lora_cfg, remat=remat)
        self.train_step = jax.jit(step_fn, donate_argnums=(0, 2))
        self.eval_step = jax.jit(
            ts_lib.make_eval_step(cfg.model, lora_cfg=self.lora_cfg))
        self.global_step = 0
        self.writer = writer
        self.log_dir = cfg.train.log_dir
        os.makedirs(self.log_dir, exist_ok=True)
        self.best = ckpt_lib.BestKeeper(self.log_dir,
                                        cfg.train.save_best_metric)

    @property
    def params(self):
        return optim.combine(self.skeleton, self.trainable)

    # -- checkpointing ------------------------------------------------------

    def maybe_resume(self, weights_only: bool = False):
        step = ckpt_lib.latest_step(self.log_dir)
        if step is None:
            return False
        params, opt_state, step = ckpt_lib.restore(
            self.log_dir, step, params_like=self.params,
            opt_state_like=None if weights_only else self.opt_state)
        self.trainable, self.skeleton = optim.partition(params)
        if self.cfg.train.quantize_frozen:
            self.skeleton = optim.quantize_skeleton(
                self.skeleton, bits=self.cfg.train.quantize_bits)
        if opt_state is not None:
            self.opt_state = opt_state
            self.global_step = step
        print(f"resumed from step {step} (weights_only={weights_only})")
        return True

    # -- loops --------------------------------------------------------------

    def train_epoch(self, batches: Iterable, epoch: int,
                    profile_steps: int = 0):
        """profile_steps > 0: capture a jax.profiler trace of that many
        leading micro-steps into <log_dir>/profile (SURVEY §5 tracing)."""
        from llmseg_tpu.utils.profiling import trace

        tcfg = self.cfg.train
        meters = {name: AverageMeter(name, ":.4f") for name in
                  ("loss", "ce_loss", "align_loss", "regression_loss")}
        batch_time = AverageMeter("time", ":.3f")
        data_time = AverageMeter("data", ":.3f")
        progress = ProgressMeter(
            tcfg.steps_per_epoch,
            [batch_time, data_time] + list(meters.values()),
            prefix=f"Epoch: [{epoch}]")

        micro = 0
        end = time.time()
        profiler = None
        with self.mesh:
            for host_batch in batches:
                if isinstance(host_batch, tuple):
                    host_batch = host_batch[0]
                data_time.update(time.time() - end)
                if profile_steps and micro == 0:
                    profiler = trace(os.path.join(self.log_dir, "profile"))
                    profiler.__enter__()
                batch = M.shard_batch(
                    {k: jnp.asarray(v) for k, v in host_batch.items()},
                    self.mesh)
                self.trainable, self.opt_state, metrics = self.train_step(
                    self.trainable, self.skeleton, self.opt_state, batch)
                if profiler is not None and micro + 1 == profile_steps:
                    jax.block_until_ready(metrics)
                    profiler.__exit__(None, None, None)
                    profiler = None
                micro += 1
                if micro % tcfg.grad_accum_steps == 0:
                    self.global_step += 1
                    for name, m in meters.items():
                        m.update(float(metrics[name]))
                    batch_time.update(time.time() - end)
                    step_in_epoch = (micro // tcfg.grad_accum_steps)
                    if step_in_epoch % tcfg.print_freq == 0 and \
                            jax.process_index() == 0:
                        progress.display(step_in_epoch)
                        if self.writer is not None:
                            for name, m in meters.items():
                                self.writer.add_scalar(f"train/{name}", m.val,
                                                       self.global_step)
                            self.writer.add_scalar(
                                "metrics/total_secs_per_batch",
                                batch_time.avg, self.global_step)
                end = time.time()
            if profiler is not None:     # epoch shorter than profile_steps
                profiler.__exit__(None, None, None)
        return {name: m.avg for name, m in meters.items()}

    def validate(self, batches: Iterable, strategy: str = "threshold",
                 threshold: float = 0.5, visualize_dir: Optional[str] = None
                 ) -> Dict[str, float]:
        with self.mesh:
            results = eval_lib.run_validation(
                self.eval_step, self.params, batches, strategy=strategy,
                threshold=threshold, visualize_dir=visualize_dir)
        if self.writer is not None and jax.process_index() == 0:
            self.writer.add_scalar("val/giou", results["giou"],
                                   self.global_step)
            self.writer.add_scalar("val/ciou", results["ciou"],
                                   self.global_step)
        return results

    def save_best(self, metrics: Dict[str, float]):
        return self.best.update(self.global_step, metrics, self.params,
                                self.opt_state)
