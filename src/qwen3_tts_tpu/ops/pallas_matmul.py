"""Pallas TPU kernel: fused int8-dequant matmul.

Single-token decode of the 1.7B talker is HBM-bandwidth-bound: each step must
stream ~1.4 GB of weights. Keeping those weights uint8 in HBM and
dequantizing in VMEM (per N-tile, fused into the matmul) is what makes the
≥20× real-time target reachable (BASELINE.md); the XLA fallback would
materialise a bf16 copy of every weight matrix in HBM on every call.

Kernel shape contract (wrapper pads/aligns as needed):
    x      [M, K]  activation (bf16/f32), M small (decode: 1..batch)
    q      [N, K]  uint8 codes
    scale  [N, G]  float32, G = K // group_size
    bias   [N, G]  float32
    out    [M, N]  float32 accumulate, cast back to x.dtype

Grid: one program per N-tile; each program streams its q tile from HBM into
VMEM (Pallas double-buffers across grid steps automatically), dequantizes
w = q * scale + bias in f32, and runs one MXU matmul against x.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# N-tile size. VMEM per tile at K (the kernel materializes FULL-K f32
# intermediates — widened q, expanded scale, expanded bias, each
# [TILE_N, K] f32): 3 x 256 x K x 4 B ≈ 6 MB at K=2048, ~18 MB at K=6144,
# plus the u8 input tile and double buffering. Shrink _TILE_N before
# raising K-side bucket sizes; pallas_compatible() bounds neither K nor M.
_TILE_N = 256
_MIN_M = 16  # bf16 sublane minimum


def _dequant_matmul_kernel(x_ref, q_ref, s_ref, b_ref, o_ref, *, group_size):
    """Mosaic-friendly per-group dequant: no reshapes/gathers on the lane
    axis. The per-group scale/bias are expanded to per-element via a one-hot
    expansion matmul (E[g, k] = [k//group == g]) built from iota — an MXU op
    instead of an unsupported lane-splitting reshape.

    Dequant arithmetic stays f32 (exact parity with the XLA reference and
    the checkpoint's f16 scales); a bf16 variant halves the VPU work but
    rounds scales to 8 mantissa bits (~0.4%/element) — measured not worth
    it while bf16-resident weights are the default compute format
    (PERF.md)."""
    # u8 -> f32 must widen through i32 on Mosaic
    q = q_ref[:].astype(jnp.int32).astype(jnp.float32)   # [TN, K]
    tn, k = q.shape
    g = k // group_size
    col_group = jax.lax.broadcasted_iota(jnp.int32, (g, k), 1) // group_size
    row = jax.lax.broadcasted_iota(jnp.int32, (g, k), 0)
    expand = (col_group == row).astype(jnp.float32)      # [G, K] one-hot
    s_full = jnp.dot(s_ref[:], expand, preferred_element_type=jnp.float32)
    b_full = jnp.dot(b_ref[:], expand, preferred_element_type=jnp.float32)
    w = (q * s_full + b_full).astype(x_ref.dtype)
    # x [M, K] @ w.T [K, TN] -> [M, TN] on the MXU, f32 accumulation
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@partial(jax.jit, static_argnames=("interpret",))
def _qmm_2d(x, q, scale, bias, interpret=False):
    M, K = x.shape
    N = q.shape[0]
    G = scale.shape[1]
    group_size = K // G
    tile_n = _TILE_N if N % _TILE_N == 0 else 128
    grid = (N // tile_n,)

    out = pl.pallas_call(
        partial(_dequant_matmul_kernel, group_size=group_size),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, G), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, G), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K + 2 * N * K,
            bytes_accessed=N * K + 2 * N * G * 4 + M * K * 2 + M * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, q, scale, bias)
    return out


def pallas_compatible(x_shape, q_shape, group_size: int) -> bool:
    """Shapes the kernel handles without host-side reshuffling."""
    K = x_shape[-1]
    N = q_shape[0]
    return (
        K == q_shape[1]
        and K % 128 == 0
        and N % 128 == 0
        and K % group_size == 0
        and group_size % 8 == 0
    )


def quantized_matmul_pallas(
    x: jnp.ndarray,
    q: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """x [..., K] × quantized W[N, K] -> [..., N]. Pads M up to the bf16
    sublane minimum; falls back to the XLA path for non-tileable shapes."""
    K = x.shape[-1]
    N, G = scale.shape
    group_size = K // G
    if not pallas_compatible(x.shape, q.shape, group_size):
        from .linear import quantized_matmul_xla

        return quantized_matmul_xla(x, q, scale, bias)

    lead = x.shape[:-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    Mp = max(_MIN_M, -(-M // _MIN_M) * _MIN_M)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    out = _qmm_2d(x2, q, scale, bias, interpret=interpret)
    if Mp != M:
        out = out[:M]
    return out.reshape(*lead, N).astype(x.dtype)
