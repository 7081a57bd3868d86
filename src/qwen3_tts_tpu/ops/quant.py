"""Weight-only affine quantization: pack/unpack and reference dequant.

Layout (MLX-compatible semantics, so 8-bit checkpoints from the
mlx-community repos — reference config.py:17,26,35 — load losslessly):
a weight ``W[out, in]`` is stored per output row in groups of ``G`` along the
input dimension as

    W[o, g*G + j]  ≈  scale[o, g] * q[o, g*G + j] + bias[o, g]

with ``q`` unsigned codes (uint8 for 8-bit). ``quantize_weights`` picks
scale/bias per group from min/max (exactly MLX's affine scheme), so
quantizing and dequantizing a checkpoint that was already affine-quantized
with the same grid is lossless.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

QuantParams = dict[str, Any]  # {"q": uint8 [out,in], "scale","bias": [out, in/G]}


def is_quantized(p: dict) -> bool:
    """True for a quantized-linear param dict. Checks the full structure:
    an attention block also has a key named "q" (the query projection), so
    key presence alone is not enough."""
    return (
        "q" in p
        and "scale" in p
        and "bias" in p
        and not isinstance(p["q"], dict)
    )


def quantize_weights(
    w: np.ndarray, group_size: int = 64, bits: int = 8
) -> QuantParams:
    """Affine per-group quantization of ``w[out, in]`` (numpy, load-time).

    Returns uint8 codes + float32 scale/bias per (row, group).
    """
    w = np.asarray(w, dtype=np.float32)
    out_dim, in_dim = w.shape
    assert in_dim % group_size == 0, (in_dim, group_size)
    n_groups = in_dim // group_size
    levels = (1 << bits) - 1

    grouped = w.reshape(out_dim, n_groups, group_size)
    w_min = grouped.min(axis=-1)
    w_max = grouped.max(axis=-1)
    scale = (w_max - w_min) / levels
    scale = np.where(scale == 0.0, 1e-8, scale)
    bias = w_min

    q = np.clip(np.round((grouped - bias[..., None]) / scale[..., None]), 0, levels)
    return {
        "q": q.reshape(out_dim, in_dim).astype(np.uint8),
        "scale": scale.astype(np.float32),
        "bias": bias.astype(np.float32),
    }


def dequantize(p: QuantParams, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Reference dequantization -> dense ``[..., out, in]`` array (leading
    dims, e.g. a stacked layer axis, pass through)."""
    q = jnp.asarray(p["q"])
    scale = jnp.asarray(p["scale"], dtype=jnp.float32)
    bias = jnp.asarray(p["bias"], dtype=jnp.float32)
    *lead, out_dim, in_dim = q.shape
    n_groups = scale.shape[-1]
    group = in_dim // n_groups
    w = q.astype(jnp.float32).reshape(*lead, out_dim, n_groups, group)
    w = w * scale[..., None] + bias[..., None]
    return w.reshape(*lead, out_dim, in_dim).astype(dtype)


def dequantize_tree(params, dtype=jnp.bfloat16):
    """Convert every quantized linear ({"q","scale","bias"} dict) in a param
    pytree to a dense ``{"w"}`` dict of ``dtype``.

    The TPU-first compute-format decision: int8 is the *storage/transport*
    format (MLX checkpoints, disk, host RAM — matching the reference's
    memory story, README.md:76-79), but on a 16 GB-HBM chip the decode hot
    path is faster with resident bf16 weights — the per-step dequantization
    is VPU-bound and costs more than the 2x HBM traffic saved. Engine
    loaders call this once at load when compute dtype is bf16.
    """

    def deq(node):
        # host-side numpy when the tree still lives on host (load time):
        # avoids one remote-compile round trip per weight shape
        q = node["q"]
        if isinstance(q, np.ndarray):
            *lead, out_dim, in_dim = q.shape
            scale = np.asarray(node["scale"], np.float32)
            bias = np.asarray(node["bias"], np.float32)
            group = in_dim // scale.shape[-1]
            w = q.astype(np.float32).reshape(*lead, out_dim, -1, group)
            w = w * scale[..., None] + bias[..., None]
            w = w.reshape(*lead, out_dim, in_dim)
            return {"w": w.astype(np.dtype(dtype))}
        return {"w": dequantize(node, dtype=dtype)}

    def convert(node):
        if isinstance(node, dict):
            if is_quantized(node):
                return deq(node)
            return {k: convert(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(convert(v) for v in node)
        return node

    return convert(params)


def unpack_mlx_uint32(
    packed: np.ndarray, bits: int, in_dim: int | None = None
) -> np.ndarray:
    """Unpack MLX's uint32-packed quantized weights to per-element codes.

    MLX stores ``32/bits`` codes per uint32, little-endian within the word
    (element i occupies bits ``[i*bits, (i+1)*bits)``). For the 8-bit
    checkpoints this is simply a byte view.
    """
    packed = np.ascontiguousarray(packed.astype(np.uint32))
    per_word = 32 // bits
    mask = (1 << bits) - 1
    parts = [
        ((packed >> (bits * i)) & mask).astype(np.uint8) for i in range(per_word)
    ]
    codes = np.stack(parts, axis=-1).reshape(*packed.shape[:-1], -1)
    if in_dim is not None:
        codes = codes[..., :in_dim]
    return codes
