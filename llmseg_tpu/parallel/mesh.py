"""Device mesh + sharding rules.

TPU-native replacement for the reference's DeepSpeed ZeRO-2 / NCCL stack
(reference training.py:292-332,369-381; SURVEY.md T7): a ("dp", "fsdp", "tp")
mesh over ICI, params sharded by rule, XLA GSPMD inserting all-gathers /
reduce-scatters.  The reference only has data parallelism; fsdp gives the
ZeRO-sharding equivalent and tp adds tensor parallelism for the LLM.

Conventions:
  * batch arrays shard their leading axis over ("dp", "fsdp") — fsdp acts as
    a second data axis (ZeRO style: params sharded over fsdp, data too).
  * LLaMA weights shard over "tp" on the head/ffn axis and "fsdp" on the
    other axis; small modules (selection head etc.) replicate.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llmseg_tpu.config import MeshConfig

AXES = ("dp", "fsdp", "tp")


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    cfg = cfg or MeshConfig()
    fsdp, tp = max(cfg.fsdp, 1), max(cfg.tensor, 1)
    dp = cfg.data if cfg.data > 0 else n // (fsdp * tp)
    need = dp * fsdp * tp
    assert need <= n, f"mesh {dp}x{fsdp}x{tp} needs {need} devices, have {n}"
    arr = np.asarray(devices[:need]).reshape(dp, fsdp, tp)
    return Mesh(arr, AXES)


# ---------------------------------------------------------------------------
# Param partition rules
# ---------------------------------------------------------------------------


def _llm_spec(path: tuple, leaf) -> P:
    """Sharding for LLaMA subtree leaves; path is the key tuple inside llm."""
    joined = "/".join(str(p) for p in path)
    if leaf.ndim < 2:
        return P()
    if "embed_tokens" in joined:
        return P("tp", "fsdp")          # (V, D)
    if "lm_head" in joined:
        return P("fsdp", "tp")          # (D, V)
    if "attn/q" in joined or "attn/k" in joined or "attn/v" in joined:
        return P("fsdp", "tp")          # (D, heads*hd): heads over tp
    if "attn/o" in joined:
        return P("tp", "fsdp")
    if "mlp/gate" in joined or "mlp/up" in joined:
        return P("fsdp", "tp")
    if "mlp/down" in joined:
        return P("tp", "fsdp")
    if joined.endswith("/a"):           # lora A: (D, r)
        return P("fsdp", None)
    if joined.endswith("/b"):           # lora B: (r, out)
        return P(None, "tp")
    return P()


def param_spec(params: dict) -> dict:
    """PartitionSpec pytree for the llmseg (or bare llama) param tree.

    LLaMA tensors shard over (fsdp, tp); the frozen vision towers and the
    selection head replicate (they are small next to the 7B LLM)."""

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, path + (i,)) for i, v in enumerate(node))
        in_llm = any(p in ("llm", "lora") for p in path if isinstance(p, str))
        if in_llm:
            # strip the prefix up to llm/lora for rule matching
            for i, p in enumerate(path):
                if p in ("llm", "lora"):
                    return _llm_spec(path[i + 1:], node)
        return P()

    return walk(params, ())


def shard_params(params: dict, mesh: Mesh) -> dict:
    spec = param_spec(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, spec,
        is_leaf=lambda x: isinstance(x, P))


def batch_spec(batch: dict) -> dict:
    """Shard every batch leaf's leading axis over the data axes."""
    return {k: P(("dp", "fsdp")) for k in batch}


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    return {k: jax.device_put(v, NamedSharding(mesh, P(("dp", "fsdp"))))
            for k, v in batch.items()}
