"""A/B harness for decode-loop host-interaction knobs on the real TPU.

Conditions, interleaved (ABAB) to cancel tunnel drift, one process so every
variant shares compiles:
  - serving pipeline_depth 1 / 2 / 3
  - QWEN3_TTS_ASYNC_FETCH on/off (copy_to_host_async at dispatch)
  - single-stream with async fetch on/off

Inputs evolve every run (the axon service caches executions by value).
Usage: python tools/ab_serving.py [--reps 3] [--frames 120]
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
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--kv", choices=["dense", "int8"], default="dense",
                    help="KV-cache format (set before engine build: the "
                         "cache pytree is a compile-time structure, so "
                         "dense-vs-int8 is one process per format)")
    args = ap.parse_args()
    from qwen3_tts_tpu.device_lock import require_device_lock

    require_device_lock('ab_serving.py')
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

    # accumulate_wav builds the (small) device wav buffer up front; the
    # mode itself toggles per run below — the fused decode is identical,
    # only the per-chunk fetch/scatter differs, so one engine (one set of
    # HBM caches — CLAUDE.md) measures both paths
    engine = ServingEngine(
        model, max_streams=args.streams, accumulate_wav=True,
        accum_cap_frames=args.frames + 160,
    )
    engine.accum = False
    seq = [0]  # evolving prompt seed across every run

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

    # warmup: compile prefill + serve-step + codec buckets
    engine.run(prompts(1), max_frames=engine.chunk * 2)
    engine.run(prompts(args.streams), max_frames=engine.chunk * 2)

    def serve_once(depth: int, async_fetch: bool, defer: bool = False,
                   accum: bool = False) -> float:
        os.environ["QWEN3_TTS_ASYNC_FETCH"] = "1" if async_fetch else "0"
        os.environ["QWEN3_TTS_DEFER_WAV"] = "1" if defer else "0"
        engine.accum = accum
        t = time.perf_counter()
        results = engine.run(
            prompts(args.streams), max_frames=args.frames,
            pipeline_depth=depth,
        )
        wall = time.perf_counter() - t
        audio = sum(len(w) for w, _ in results) / cfg.codec.sample_rate
        os.environ["QWEN3_TTS_DEFER_WAV"] = "0"
        engine.accum = False
        return audio / wall

    # compile the accum-mode scatter variants once before timing
    serve_once(2, True, accum=True)

    conditions = [
        ("serve d1 sync ", lambda: serve_once(1, False)),
        ("serve d1 async", lambda: serve_once(1, True)),
        ("serve d2 sync ", lambda: serve_once(2, False)),
        ("serve d2 async", lambda: serve_once(2, True)),
        ("serve d3 sync ", lambda: serve_once(3, False)),
        ("serve d3 async", lambda: serve_once(3, True)),
        ("serve d3 defer", lambda: serve_once(3, True, defer=True)),
        ("serve d2 defer", lambda: serve_once(2, True, defer=True)),
        ("serve d1 accum", lambda: serve_once(1, True, accum=True)),
        ("serve d2 accum", lambda: serve_once(2, True, accum=True)),
        ("serve d3 accum", lambda: serve_once(3, True, accum=True)),
    ]
    scores: dict[str, list[float]] = {name: [] for name, _ in conditions}
    for rep in range(args.reps):
        for name, fn in conditions:
            rtf = fn()
            scores[name].append(rtf)
            print(f"rep{rep} {name}: {rtf:6.1f}x", flush=True)

    print("\naggregate serving RTF (median over reps):")
    for name, vals in scores.items():
        print(f"  {name}: {np.median(vals):6.1f}x  (runs: "
              + ", ".join(f"{v:.1f}" for v in vals) + ")")

    # single-stream async on/off
    gen = model.generator
    def single_once(async_fetch: bool) -> float:
        os.environ["QWEN3_TTS_ASYNC_FETCH"] = "1" if async_fetch else "0"
        p = prompts(1, toks=48)[0]
        r = gen.synthesize(p, max_frames=240, seed=seq[0])
        return r.rtf

    single_once(True)  # warm any remaining compiles
    s_scores = {"single sync ": [], "single async": []}
    for rep in range(args.reps):
        s_scores["single sync "].append(single_once(False))
        s_scores["single async"].append(single_once(True))
        print(f"rep{rep} single sync/async: "
              f"{s_scores['single sync '][-1]:.1f} / "
              f"{s_scores['single async'][-1]:.1f}", flush=True)

    print("\nsingle-stream RTF (median):")
    for name, vals in s_scores.items():
        print(f"  {name}: {np.median(vals):6.1f}x  (runs: "
              + ", ".join(f"{v:.1f}" for v in vals) + ")")


if __name__ == "__main__":
    main()
