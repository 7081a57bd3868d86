"""A/B harness for serving scale knobs on the real TPU: slot count x chunk.

The B=8 stage profile (tools/profile_stages.py) shows the fused serve step
produces 64 frames of audio in ~46 ms of device compute (~115x aggregate
ceiling), while end-to-end serving measures ~52x — half the wall clock is
host/tunnel overhead. Both more slots (shared weight streaming) and bigger
chunks (fewer per-chunk round trips) attack that gap; this measures the
(streams, chunk) grid in one process with interleaved reps.

Usage: python tools/ab_scale.py [--reps 3] [--frames 120]
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
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--streams", type=int, nargs="+", default=[8],
                    help="slot counts; ONE engine per process — two live "
                         "engines (8+16 slots) over-subscribe HBM and hang "
                         "the remote service")
    ap.add_argument("--chunks", type=int, nargs="+", default=[8, 16])
    ap.add_argument("--kv", choices=["dense", "int8"], default="dense",
                    help="KV-cache format (pinned at engine build). int8 "
                         "halves cache HBM — the safer format for the "
                         "16-slot experiments")
    args = ap.parse_args()
    from qwen3_tts_tpu.device_lock import require_device_lock

    require_device_lock('ab_scale.py')
    os.environ["QWEN3_TTS_KV"] = args.kv
    print(f"[kv format: {args.kv}]", flush=True)

    from qwen3_tts_tpu.engine import configs, enable_compilation_cache
    from qwen3_tts_tpu.engine.api import Qwen3TTSModel
    from qwen3_tts_tpu.runtime.prompts import PromptSpec
    from qwen3_tts_tpu.runtime.serving import ServingEngine

    enable_compilation_cache()
    t0 = time.perf_counter()
    cfg = configs.flagship("custom", frames_per_step=2)
    model = Qwen3TTSModel.synthetic(cfg, seed=0, fast=True)
    print(f"[load {time.perf_counter() - t0:.0f}s]", flush=True)

    seq = [0]

    def prompts(n, toks=40):
        seq[0] += 1
        base = 3 + seq[0]
        return [
            PromptSpec(
                text_tokens=(np.arange(toks) * (i + base) % cfg.talker.vocab_size)
                .astype(np.int32),
                speaker_id=i % 9,
            )
            for i in range(n)
        ]

    engines: dict[int, ServingEngine] = {}
    for n in args.streams:
        t1 = time.perf_counter()
        engines[n] = ServingEngine(model, max_streams=n)
        print(f"[engine {n}-slot alloc {time.perf_counter() - t1:.0f}s]",
              flush=True)

    grid = [(n, c) for n in args.streams for c in args.chunks]
    # warmup every condition (compiles its serve-step + prefill variants)
    for n, chunk in grid:
        t1 = time.perf_counter()
        eng = engines[n]
        eng.chunk = chunk
        eng.run(prompts(n), max_frames=chunk)
        print(f"[warm {n}s/c{chunk} {time.perf_counter() - t1:.0f}s]",
              flush=True)

    scores: dict[tuple, list] = {g: [] for g in grid}
    ttfas: dict[tuple, list] = {g: [] for g in grid}
    for rep in range(args.reps):
        for n, chunk in grid:
            eng = engines[n]
            eng.chunk = chunk
            t1 = time.perf_counter()
            results = eng.run(prompts(n), max_frames=args.frames)
            wall = time.perf_counter() - t1
            audio = sum(len(w) for w, _ in results) / cfg.codec.sample_rate
            rtf = audio / wall
            ttfa = float(np.median(
                [s.ttfa_s for _, s in results if s.ttfa_s]
            ))
            scores[(n, chunk)].append(rtf)
            ttfas[(n, chunk)].append(ttfa)
            print(f"rep{rep} {n:2d} streams chunk {chunk:2d}: {rtf:6.1f}x "
                  f"ttfa_p50 {ttfa * 1e3:5.0f} ms", flush=True)

    print("\naggregate RTF (median) / cold ttfa p50:")
    for g in grid:
        print(f"  {g[0]:2d} streams chunk {g[1]:2d}: "
              f"{np.median(scores[g]):6.1f}x  "
              f"{np.median(ttfas[g]) * 1e3:5.0f} ms   (runs: "
              + ", ".join(f"{v:.1f}" for v in scores[g]) + ")")


if __name__ == "__main__":
    main()
