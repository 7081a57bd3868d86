"""A/B the MTP width (frames_per_step) for the single-stream headline.

Measured so far (PERF.md): fps=2 -> 30.2x RTF / 78 ms TTFA p50; fps=4 ->
33.9x / 258 ms (the 3-deep sequential MTP chain inflates the first chunk).
fps=3 sits between: a 2-deep chain should keep TTFA well under the 300 ms
target while cutting talker bytes/frame another 1.5x vs fps=2. This decides
whether the bench headline config moves to fps=3.

One model per fps (the MTP head shapes differ), both in one process and
interleaved (tunnel drift cancels). Inputs evolve per run (the axon service
caches executions by value).

Usage: python tools/ab_fps.py [--reps 3] [--fps 2 3] [--frames 240]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--fps", type=int, nargs="+", default=[2, 3])
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config on CPU (harness smoke test, no TPU)")
    args = ap.parse_args()
    if args.tiny:  # CPU smoke mode: no shared device, no lock
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from qwen3_tts_tpu.device_lock import require_device_lock

        require_device_lock("ab_fps.py")

    from qwen3_tts_tpu.engine import configs, enable_compilation_cache
    from qwen3_tts_tpu.engine.api import Qwen3TTSModel
    from qwen3_tts_tpu.runtime.prompts import PromptSpec

    enable_compilation_cache()
    models = {}
    for fps in args.fps:
        t0 = time.perf_counter()
        if args.tiny:
            cfg = configs.with_frames_per_step(configs.tiny("custom"), fps)
        else:
            cfg = configs.flagship("custom", frames_per_step=fps)
        models[fps] = Qwen3TTSModel.synthetic(cfg, seed=0, fast=True)
        print(f"[fps={fps} load {time.perf_counter() - t0:.0f}s]", flush=True)

    seq = [0]

    def prompt(toks=48):
        seq[0] += 1
        cfg = next(iter(models.values())).cfg
        return PromptSpec(
            text_tokens=(np.arange(toks) * (3 + seq[0])
                         % cfg.talker.vocab_size).astype(np.int32),
            speaker_id=seq[0] % 9,
        )

    # warmup compiles (prefill bucket + chunk schedule + codec buckets)
    for fps, m in models.items():
        m.generator.synthesize(prompt(), max_frames=64, seed=0)

    scores: dict[int, list] = {fps: [] for fps in args.fps}
    for rep in range(args.reps):
        for fps, m in models.items():
            r = m.generator.synthesize(
                prompt(), max_frames=args.frames, seed=seq[0]
            )
            scores[fps].append((r.rtf, r.ttfa_s))
            print(f"rep{rep} fps={fps}: {r.rtf:5.1f}x  ttfa {r.ttfa_s*1e3:5.0f} ms",
                  flush=True)

    print("\nsingle-stream by frames_per_step (median over reps):")
    for fps, vals in scores.items():
        rtfs = [v[0] for v in vals]
        ttfas = [v[1] * 1e3 for v in vals]
        print(f"  fps={fps}: {np.median(rtfs):5.1f}x RTF, "
              f"ttfa p50 {np.median(ttfas):4.0f} ms  (runs: "
              + ", ".join(f"{r:.1f}" for r in rtfs) + ")")


if __name__ == "__main__":
    main()
