"""Functional neural-net building blocks.

Design: every module is a pair of pure functions
    ``<name>_init(key, ...) -> params`` and ``<name>(params, x, ...) -> y``
with params as plain dict pytrees.  No module classes — explicit pytrees keep
weight import (torch checkpoints → here) and pjit sharding rules trivial, and
everything composes under jax transforms.

Weight layout convention: dense kernels are stored ``(in_dim, out_dim)``
(column-major for ``x @ w``); torch ``nn.Linear.weight`` is ``(out, in)`` and
gets transposed on import (see import_weights/torch_import.py).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


Params = dict


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------


def _trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32).astype(dtype)


def _lecun_normal(key, shape, dtype=jnp.float32):
    fan_in = shape[0] if len(shape) == 2 else math.prod(shape[:-1])
    std = 1.0 / math.sqrt(fan_in)
    return (std * jax.random.normal(key, shape, jnp.float32)).astype(dtype)


# ---------------------------------------------------------------------------
# Dense
# ---------------------------------------------------------------------------


def dense_init(key, in_dim: int, out_dim: int, bias: bool = True,
               dtype=jnp.float32, std: Optional[float] = None) -> Params:
    if std is None:
        w = _lecun_normal(key, (in_dim, out_dim), dtype)
    else:
        w = _trunc_normal(key, (in_dim, out_dim), std, dtype)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((out_dim,), dtype)
    return p


def dense(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "w_q" in p or "w_q4" in p or "w_q8a" in p:  # quantized leaf
        from llmseg_tpu.ops.quant import qdense

        return qdense(p, x)
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------


def layernorm_init(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layernorm(p: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    orig = x.dtype
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(orig)


def rmsnorm_init(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype)}


def rmsnorm(p: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    orig = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    y = x * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32)).astype(orig)


def layernorm2d_init(dim: int, dtype=jnp.float32) -> Params:
    """Channel LayerNorm over NHWC maps (reference modeling/common.py LayerNorm2d,
    which is NCHW in torch; we keep NHWC on TPU)."""
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layernorm2d(p: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    return layernorm(p, x, eps)


# ---------------------------------------------------------------------------
# Activations / MLP
# ---------------------------------------------------------------------------


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def mlp_init(key, dim: int, hidden: int, out_dim: Optional[int] = None,
             dtype=jnp.float32) -> Params:
    out_dim = dim if out_dim is None else out_dim
    k1, k2 = jax.random.split(key)
    return {"fc1": dense_init(k1, dim, hidden, dtype=dtype),
            "fc2": dense_init(k2, hidden, out_dim, dtype=dtype)}


def mlp(p: Params, x: jnp.ndarray, act=jax.nn.gelu) -> jnp.ndarray:
    return dense(p["fc2"], act(dense(p["fc1"], x)))


def mlp_stack_init(key, dims: Sequence[int], dtype=jnp.float32) -> Params:
    """N-layer MLP with ReLU between layers (reference mask_decoder.py MLP:169-191
    and LISA.py lisa_iou_head / lisa_embedding_head)."""
    keys = jax.random.split(key, len(dims) - 1)
    return {"layers": [dense_init(k, dims[i], dims[i + 1], dtype=dtype)
                       for i, k in enumerate(keys)]}


def mlp_stack(p: Params, x: jnp.ndarray, final_act=None) -> jnp.ndarray:
    n = len(p["layers"])
    for i, lp in enumerate(p["layers"]):
        x = dense(lp, x)
        if i < n - 1:
            x = jax.nn.relu(x)
    if final_act is not None:
        x = final_act(x)
    return x


# ---------------------------------------------------------------------------
# Conv / patch embedding
# ---------------------------------------------------------------------------


def conv2d_init(key, in_ch: int, out_ch: int, kernel: int, bias: bool = True,
                dtype=jnp.float32) -> Params:
    w = _lecun_normal(key, (kernel, kernel, in_ch, out_ch), dtype)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((out_ch,), dtype)
    return p


def conv2d(p: Params, x: jnp.ndarray, stride: int = 1, padding="SAME") -> jnp.ndarray:
    """NHWC conv (HWIO kernel)."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        y = y + p["b"]
    return y


def patch_embed_init(key, patch: int, in_ch: int, dim: int, bias: bool = True,
                     dtype=jnp.float32) -> Params:
    return conv2d_init(key, in_ch, dim, patch, bias=bias, dtype=dtype)


def patch_embed(p: Params, x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B,H,W,C) -> (B,H/p,W/p,dim).  On TPU the XLA conv emitter beats the
    manual reshape+matmul form: the latter's 6-D transpose has a last dim of
    3 (3 of 128 lanes live), and the conv emitter's own space-to-depth
    handles it (measured 2.59 -> 2.28 ms at DINOv2@896 batch 4, bit-equal
    output).  CPU/tests keep the matmul form — it is exact in f32 and
    XLA:CPU convs are slow."""
    if jax.default_backend() == "tpu":
        y = jax.lax.conv_general_dilated(
            x, p["w"], window_strides=(patch, patch), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    else:
        B, H, W, C = x.shape
        gh, gw = H // patch, W // patch
        x = x.reshape(B, gh, patch, gw, patch, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, gh, gw, patch * patch * C)
        y = x @ p["w"].reshape(-1, p["w"].shape[-1])
    if "b" in p:
        y = y + p["b"]
    return y


# ---------------------------------------------------------------------------
# Rotary embeddings (LLaMA)
# ---------------------------------------------------------------------------


def rope_frequencies(head_dim: int, max_len: int, theta: float = 10000.0):
    inv = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv)                      # (T, D/2)
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
               positions: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x: (B, T, H, D). HF-LLaMA 'half rotation' convention:
    rotate_half(x) = [-x2, x1] with x split into halves (not interleaved),
    matching transformers.models.llama rotary implementation so imported
    weights reproduce reference logits."""
    B, T, H, D = x.shape
    if positions is None:
        c = cos[:T][None, :, None, :]
        s = sin[:T][None, :, None, :]
    else:
        c = cos[positions][:, :, None, :]
        s = sin[positions][:, :, None, :]
    # cos/sin are (.., D/2) — tile to D in half layout
    c = jnp.concatenate([c, c], axis=-1)
    s = jnp.concatenate([s, s], axis=-1)
    x1, x2 = jnp.split(x, 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * c + rotated.astype(jnp.float32) * s).astype(x.dtype)


# ---------------------------------------------------------------------------
# Sinusoidal / random positional encodings
# ---------------------------------------------------------------------------


def position_embedding_random_init(key, num_pos_feats: int = 64,
                                   scale: float = 1.0, dtype=jnp.float32) -> Params:
    """SAM PositionEmbeddingRandom (reference prompt_encoder.py:189-238)."""
    return {"gaussian": scale * jax.random.normal(key, (2, num_pos_feats), jnp.float32).astype(dtype)}


def position_embedding_random(p: Params, coords: jnp.ndarray) -> jnp.ndarray:
    """coords in [0,1], shape (..., 2) -> (..., 2*num_pos_feats)."""
    c = 2.0 * coords.astype(jnp.float32) - 1.0
    c = c @ p["gaussian"].astype(jnp.float32)
    c = 2.0 * jnp.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def position_grid(p: Params, size: int) -> jnp.ndarray:
    """Dense positional map for a size x size grid -> (size, size, C)."""
    y = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    x = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    grid = jnp.stack(jnp.meshgrid(x, y, indexing="xy"), axis=-1)  # (S,S,2) = (x,y)
    return position_embedding_random(p, grid)
