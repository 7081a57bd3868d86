"""Pallas TPU kernel: grouped-layout fused int8-dequant matmul (decode).

Why a second kernel next to ops/pallas_matmul.py: the row-major kernel
expands per-group scale/bias to per-element via a one-hot MXU matmul —
at group_size 64 that costs ~4·G f32 MXU flops per weight element
(~128 flops/el at K=2048), which alone exceeds the int8 HBM stream time,
so int8-resident weights measured SLOWER than bf16 in the decode loop
(PERF.md round-3 A/B: bf16 6.4x vs int8-pallas 4.1x). This kernel never
expands scales. Weights are relayouted ONCE at load into a grouped layout

    qg [G, gs, N]  uint8    (w[n, g*gs+j] codes, transposed per group)
    sg [G, N]      float32  scale per (group, out-col)
    bg [G, N]      float32  affine bias per (group, out-col)

and the kernel accumulates per-group partial products on the MXU,
applying the affine transform to the [M, TILE_N] PARTIAL SUMS instead of
the [TILE_N, K] weight tile:

    out[m, n] = sum_g sg[g, n] * (x[m, g*gs:])·(qg[g, :, n])
              + sum_g bg[g, n] * xsum[m, g]

The scale multiply costs M/gs VPU ops per weight element (~0.25 at M=16)
and the bias term is one [M, G] @ [G, TILE_N] MXU matmul — both noise
next to the u8->bf16 widening (~2 VPU ops/el), so the kernel runs at the
int8 HBM streaming rate the format promises.

Numerics: the row-major paths round the dequantized weight to the
activation dtype BEFORE the matmul (w = (q*s+b).astype(bf16)); this
kernel keeps s/b in f32 and applies them to f32 partial sums — slightly
MORE accurate, but not bit-identical to ops/linear.quantized_matmul_xla.
Its own XLA reference (quantized_matmul_grouped_xla) computes the same
factorization, and both sit within the quantization step of the float
weights (tests/test_grouped_qmv.py).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import is_quantized

# One program per N-tile; VMEM per step = K*TILE_N u8 (qg block, double-
# buffered by Pallas) + M*K bf16 (xg) + 2*G*TILE_N f32 (sg/bg) + M*TILE_N
# f32 (acc): ~1.6 MB at K=2048, TILE_N=512.
_TILE_N = 512
_MIN_M = 16    # bf16 sublane minimum
_MAX_M = 64    # above this the op is MXU-bound: route to the dense path


def grouped_layout() -> bool:
    """Whether int8-resident decode should relayout quantized linears into
    the grouped format at engine construction. QWEN3_TTS_INT8_LAYOUT =
    auto|grouped|rowmajor; auto = grouped on TPU, row-major elsewhere
    (CPU tests exercise grouped explicitly). Note: the grouped layout is
    for the replicated single-chip decode path — tp-sharded decode plans
    keep row-major trees (their shardings name the [N, K] axes)."""
    mode = os.environ.get("QWEN3_TTS_INT8_LAYOUT", "auto")
    if mode in ("grouped", "rowmajor"):
        return mode == "grouped"
    if mode != "auto":
        raise ValueError(
            f"QWEN3_TTS_INT8_LAYOUT={mode!r}: expected auto|grouped|rowmajor"
        )
    from . import default_backend

    return default_backend() == "tpu"


def is_grouped(p) -> bool:
    """True for a grouped-layout quantized linear param dict."""
    return isinstance(p, dict) and "qg" in p and "sg" in p and "bg" in p


def pack_grouped(p: dict) -> dict:
    """Row-major quantized linear {"q" [*, N, K], "scale"/"bias" [*, N, G]}
    -> grouped {"qg" [*, G, gs, N], "sg"/"bg" [*, G, N]}. Leading (stacked
    layer) axes pass through; non-quant keys (additive "b", LoRA adapters)
    are preserved. Works on device (jnp) or host (numpy) leaves."""
    q, scale, bias = p["q"], p["scale"], p["bias"]
    xp = jnp if isinstance(q, jnp.ndarray) else np
    *lead, n, k = q.shape
    g = scale.shape[-1]
    gs = k // g
    nd = len(lead)
    # [*, N, K] -> [*, N, G, gs] -> [*, G, gs, N]
    qg = xp.transpose(
        q.reshape(*lead, n, g, gs),
        tuple(range(nd)) + (nd + 1, nd + 2, nd),
    )
    perm = tuple(range(nd)) + (nd + 1, nd)
    out = {
        "qg": qg,
        "sg": xp.transpose(scale, perm).astype(xp.float32),
        "bg": xp.transpose(bias, perm).astype(xp.float32),
    }
    out.update({key: v for key, v in p.items()
                if key not in ("q", "scale", "bias")})
    return out


def pack_grouped_tree(params):
    """Convert every row-major quantized linear in a pytree to the grouped
    layout (identity on everything else, leaves shared)."""
    def convert(node):
        if isinstance(node, dict):
            if is_quantized(node):
                return pack_grouped(node)
            return {k: convert(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(convert(v) for v in node)
        return node

    return convert(params)


def _xsum_xg(x2: jnp.ndarray, g: int, gs: int):
    """x [M, K] -> (xg [G, M, gs] in x.dtype, xsum [M, G] f32)."""
    m = x2.shape[0]
    x3 = x2.reshape(m, g, gs)
    return jnp.transpose(x3, (1, 0, 2)), x3.astype(jnp.float32).sum(-1)


def quantized_matmul_grouped_xla(x, qg, sg, bg):
    """XLA reference for the grouped factorization (same math as the
    kernel: f32 affine on f32 per-group partial sums). Used on CPU, for
    parity tests, and for M > _MAX_M where the op is compute-bound."""
    g, gs, n = qg.shape
    k = g * gs
    lead = x.shape[:-1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    if m > _MAX_M:
        # compute-bound shape: reconstruct the dense weight once (HBM
        # round-trip amortized over M rows) and run a full-rate matmul
        w = (qg.astype(jnp.float32) * sg[:, None, :] + bg[:, None, :])
        w = w.reshape(k, n).astype(x.dtype)
        out = jax.lax.dot_general(
            x2, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out.reshape(*lead, n).astype(x.dtype)
    xg, xsum = _xsum_xg(x2, g, gs)
    # batched per-group matmuls: [G, M, gs] @ [G, gs, N] -> [G, M, N]
    p = jax.lax.dot_general(
        xg, qg.astype(x.dtype),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out = (p * sg[:, None, :]).sum(0) + xsum @ bg
    return out.reshape(*lead, n).astype(x.dtype)


def _qmv_grouped_kernel(xg_ref, xsum_ref, qg_ref, sg_ref, bg_ref, o_ref):
    """One N-tile: bias term via one MXU matmul on the group sums, then a
    fori over groups accumulating scaled partial products. All affine
    arithmetic stays f32 on [M, TILE_N] partials — nothing of size
    [TILE_N, K] is ever materialized beyond the streamed u8 tile."""
    n_groups = qg_ref.shape[0]
    acc0 = jax.lax.dot_general(
        xsum_ref[:], bg_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    def body(gi, acc):
        xg = xg_ref[gi]                                   # [M, gs]
        # u8 widens through i32 on Mosaic, then to the activation dtype
        w = qg_ref[gi].astype(jnp.int32).astype(xg.dtype)  # [gs, TN]
        p = jax.lax.dot_general(
            xg, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc + p * sg_ref[gi][None, :]

    o_ref[:] = jax.lax.fori_loop(0, n_groups, body, acc0)


@partial(jax.jit, static_argnames=("interpret",))
def _qmv_2d(xg, xsum, qg, sg, bg, interpret=False):
    g, m, gs = xg.shape
    n = qg.shape[2]
    k = g * gs
    tile_n = next(t for t in (_TILE_N, 256, 128) if n % t == 0)
    out = pl.pallas_call(
        _qmv_grouped_kernel,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((g, m, gs), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, g), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, gs, tile_n), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k + 2 * m * g * n,
            bytes_accessed=n * k + 2 * g * n * 4 + m * k * 2 + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xg, xsum, qg, sg, bg)
    return out


def pallas_grouped_compatible(x_shape, qg_shape) -> bool:
    """Shapes the kernel tiles cleanly (wrapper falls back to XLA else)."""
    g, gs, n = qg_shape
    return n % 128 == 0 and gs % 8 == 0 and g * gs == x_shape[-1]


def quantized_matmul_grouped(
    x: jnp.ndarray,
    qg: jnp.ndarray,
    sg: jnp.ndarray,
    bg: jnp.ndarray,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """x [..., K] x grouped-quantized W -> [..., N]; decode entry point.

    Pads M up to the bf16 sublane minimum; routes compute-bound (large-M)
    and non-tileable shapes to the XLA reference."""
    g, gs, n = qg.shape
    k = g * gs
    lead = x.shape[:-1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    if m > _MAX_M or not pallas_grouped_compatible(x.shape, qg.shape):
        return quantized_matmul_grouped_xla(x, qg, sg, bg)
    mp = max(_MIN_M, -(-m // _MIN_M) * _MIN_M)
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    xg, xsum = _xsum_xg(x2, g, gs)
    out = _qmv_2d(xg, xsum, qg, sg, bg, interpret=interpret)
    if mp != m:
        out = out[:m]
    return out.reshape(*lead, n).astype(x.dtype)
