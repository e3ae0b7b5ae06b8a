"""Checkpoint save/resume with best-metric policy.

Capability parity with the reference's DeepSpeed checkpointing
(training.py:405-477, SURVEY.md T9): save per step into
<log_dir>/ckpt/<step>/, keep a `latest` pointer, best-gIoU-only policy with a
meta breadcrumb, auto-resume (params+opt state+step), and weights-only resume
for the finetune stage (finetune_llmseg.py:434).  Format: Orbax.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save(log_dir: str, step: int, params: Any,
         opt_state: Optional[Any] = None,
         metrics: Optional[Dict] = None):
    root = os.path.join(log_dir, "ckpt", str(step))
    cp = _ckptr()
    cp.save(os.path.join(root, "params"), params, force=True)
    if opt_state is not None:
        cp.save(os.path.join(root, "opt_state"), opt_state, force=True)
    with open(os.path.join(log_dir, "ckpt", "latest"), "w") as f:
        f.write(str(step))
    if metrics is not None:
        with open(os.path.join(root, "meta.json"), "w") as f:
            json.dump({"step": step, **metrics}, f)


def latest_step(log_dir: str) -> Optional[int]:
    path = os.path.join(log_dir, "ckpt", "latest")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return int(f.read().strip())


def restore(log_dir: str, step: Optional[int] = None, *,
            params_like: Any, opt_state_like: Optional[Any] = None
            ) -> Tuple[Any, Optional[Any], int]:
    """Restore (params, opt_state, step).  Pass opt_state_like=None for a
    weights-only resume (finetune stage)."""
    if step is None:
        step = latest_step(log_dir)
        assert step is not None, f"no checkpoint under {log_dir}"
    root = os.path.join(log_dir, "ckpt", str(step))
    cp = _ckptr()
    params = cp.restore(os.path.join(root, "params"), item=params_like)
    opt_state = None
    if opt_state_like is not None and os.path.exists(
            os.path.join(root, "opt_state")):
        opt_state = cp.restore(os.path.join(root, "opt_state"),
                               item=opt_state_like)
    return params, opt_state, step


class BestKeeper:
    """Best-only checkpoint policy keyed on a metric (reference
    training.py:455-477 + meta_log_giou_ciou.pth breadcrumb).

    Resume-from-best semantics: update() saves BOTH params and, when the
    caller passes one (trainer.save_best does), the optimizer state — so
    resuming from the best checkpoint restores the full training state.
    The reference's best checkpoint is a DeepSpeed save_checkpoint dir with
    optimizer shards, so parity holds either way; a weights-only best can be
    produced by passing opt_state=None."""

    def __init__(self, log_dir: str, metric: str = "giou"):
        self.log_dir = log_dir
        self.metric = metric
        self.best = -float("inf")
        path = os.path.join(log_dir, "best_meta.json")
        if os.path.exists(path):
            with open(path) as f:
                self.best = json.load(f).get(metric, -float("inf"))

    def update(self, step: int, metrics: Dict, params: Any,
               opt_state: Optional[Any] = None) -> bool:
        val = metrics.get(self.metric)
        if val is None or val <= self.best:
            return False
        self.best = val
        save(self.log_dir, step, params, opt_state, metrics)
        with open(os.path.join(self.log_dir, "best_meta.json"), "w") as f:
            json.dump({"step": step, **metrics}, f)
        return True
