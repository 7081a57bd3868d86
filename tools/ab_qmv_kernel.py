"""Kernel-level A/B: decode-shape matmul formats on the real TPU.

Times x[M,K] @ W[N,K]^T at the talker/cp decode shapes for
  dense_bf16       resident bf16 weights, plain MXU dot (current default)
  grouped_pallas   int8 grouped layout, ops/grouped_qmv kernel
  rowmajor_pallas  int8 row-major, ops/pallas_matmul one-hot-expansion kernel
  rowmajor_xla     int8 row-major, dequantize + dot (XLA fusion decides)

Measurement per CLAUDE.md gotchas: all arms chained inside ONE jitted
lax.scan (inputs evolve every iteration, so the value-cache can't replay),
timed with a device_get of a probe that data-depends on every iteration.

Usage: python tools/ab_qmv_kernel.py [--m 16] [--iters 50] [--reps 3]
       [--tiny]   (CPU smoke: shrinks shapes, interpret-mode kernels)
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--arms", nargs="+", default=[
        "dense_bf16", "grouped_pallas", "rowmajor_pallas", "rowmajor_xla"])
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    else:
        from qwen3_tts_tpu.device_lock import require_device_lock

        require_device_lock("ab_qmv_kernel.py")

    from qwen3_tts_tpu.engine import enable_compilation_cache
    from qwen3_tts_tpu.ops.grouped_qmv import (
        pack_grouped,
        quantized_matmul_grouped,
    )
    from qwen3_tts_tpu.ops.linear import quantized_matmul_xla
    from qwen3_tts_tpu.ops.pallas_matmul import quantized_matmul_pallas
    from qwen3_tts_tpu.ops.quant import quantize_weights

    enable_compilation_cache()
    interp = args.tiny
    # decode shapes: talker qkv-ish, mlp up, mlp down
    if args.tiny:
        shapes = [(256, 128), (384, 128), (128, 384)]   # (N, K)
        gs = 32
    else:
        shapes = [(2048, 2048), (6144, 2048), (2048, 6144)]
        gs = 64
    M = args.m

    rng = np.random.default_rng(0)
    weights = [rng.normal(size=(n, k)).astype(np.float32) * 0.02
               for n, k in shapes]
    qps = [quantize_weights(w, group_size=gs) for w in weights]
    gps = [pack_grouped(p) for p in qps]
    bytes_per_iter_bf16 = sum(n * k * 2 for n, k in shapes)
    bytes_per_iter_int8 = sum(
        n * k + 2 * 4 * n * (k // gs) for n, k in shapes)

    def chain(mm_list):
        """One jitted scan: x -> [mm(x) for shapes] -> fold back into x."""
        def step(x, _):
            acc = 0.0
            for mm, (n, k) in zip(mm_list, shapes):
                y = mm(x[:, :k] if x.shape[1] >= k else jnp.tile(
                    x, (1, -(-k // x.shape[1])))[:, :k])
                acc = acc + y.astype(jnp.float32).mean()
            x = x * 0.999 + (acc * 1e-4).astype(x.dtype)
            return x, ()

        @jax.jit
        def run(x0):
            xf, _ = jax.lax.scan(step, x0, None, length=args.iters)
            return xf.astype(jnp.float32).sum()

        return run

    K0 = max(k for _, k in shapes)
    x0 = jnp.asarray(rng.normal(size=(M, K0)).astype(np.float32) * 0.1,
                     dtype=jnp.bfloat16)

    # Null chain: same scan + fetch, zero heavy matmuls. Its wall clock is
    # the dispatch + tunnel RTT + scan overhead that pollutes every arm's
    # measurement (one fetch RTT is 20-100 ms — comparable to 50 iters of
    # real compute), subtracted below.
    @jax.jit
    def null_run(x0_):
        def step(x, _):
            return x * 0.999 + 1e-4, ()
        xf, _ = jax.lax.scan(step, x0_, None, length=args.iters)
        return xf.astype(jnp.float32).sum()

    def arm_fns(name):
        if name == "dense_bf16":
            ws = [jnp.asarray(w, dtype=jnp.bfloat16) for w in weights]
            return [
                (lambda x, w=w: jax.lax.dot_general(
                    x, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(x.dtype))
                for w in ws
            ]
        if name == "grouped_pallas":
            ts = [{k2: jnp.asarray(v) for k2, v in g.items()} for g in gps]
            return [
                (lambda x, t=t: quantized_matmul_grouped(
                    x, t["qg"], t["sg"], t["bg"], interpret=interp))
                for t in ts
            ]
        ts = [{k2: jnp.asarray(v) for k2, v in p.items()} for p in qps]
        if name == "rowmajor_pallas":
            return [
                (lambda x, t=t: quantized_matmul_pallas(
                    x, t["q"], t["scale"], t["bias"], interpret=interp))
                for t in ts
            ]
        return [
            (lambda x, t=t: quantized_matmul_xla(
                x, t["q"], t["scale"], t["bias"]))
            for t in ts
        ]

    print(f"M={M} shapes={shapes} gs={gs} iters={args.iters} "
          f"bf16 {bytes_per_iter_bf16 / 1e6:.0f} MB/iter, "
          f"int8 {bytes_per_iter_int8 / 1e6:.0f} MB/iter", flush=True)

    def measure(run, x):
        times = []
        for _ in range(args.reps):
            x = x * 1.0009  # evolve inputs: defeat the service value-cache
            t0 = time.perf_counter()
            jax.device_get(run(x))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    jax.device_get(null_run(x0))  # compile + warm
    null_s = measure(null_run, x0)
    print(f"[null chain {null_s * 1e3:.1f} ms — dispatch+RTT+scan overhead, "
          "subtracted]", flush=True)

    results = {}
    for name in args.arms:
        run = chain(arm_fns(name))
        t0 = time.perf_counter()
        jax.device_get(run(x0))  # compile + warm
        print(f"[{name} compile+warm {time.perf_counter() - t0:.0f}s]",
              flush=True)
        per = max(measure(run, x0) - null_s, 1e-9) / args.iters
        nbytes = (bytes_per_iter_bf16 if name == "dense_bf16"
                  else bytes_per_iter_int8)
        results[name] = per
        print(f"  {name:>16}: {per * 1e6:8.1f} us/iter   "
              f"{nbytes / per / 1e9:6.0f} GB/s effective", flush=True)

    if "dense_bf16" in results:
        base = results["dense_bf16"]
        for name, per in results.items():
            print(f"  {name:>16}: {base / per:5.2f}x vs dense_bf16")


if __name__ == "__main__":
    main()
