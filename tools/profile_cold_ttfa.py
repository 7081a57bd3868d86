"""Decompose the 8-stream COLD-START TTFA on the raw-import shape
(residual_sum, fps=1): BENCH r4 measured serving ttfa_s_p50 ~1.17 s against
the 300 ms budget while join-TTFA under load was 145 ms — so the cost is in
the cold path (batched prefill + first chunks), not steady-state decode.

Times every engine.step() wall from an 8-stream cold submit until every
stream has first audio, and prints each stream's recorded ttfa_s. Steps
are timed at the host, so each number includes dispatch + (pipelined)
fetch; the first steps carry the batched cold-start prefill and the
4-frame first chunk.

Usage: python tools/profile_cold_ttfa.py [--streams 8] [--fps 1] [--dg 1]
       [--steps 16] [--tiny]
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
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--fps", type=int, default=1)
    ap.add_argument("--dg", type=int, default=1)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()
    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from qwen3_tts_tpu.device_lock import require_device_lock

        require_device_lock("profile_cold_ttfa.py")

    from qwen3_tts_tpu.engine import configs, enable_compilation_cache
    from qwen3_tts_tpu.engine.api import Qwen3TTSModel
    from qwen3_tts_tpu.runtime.prompts import PromptSpec
    from qwen3_tts_tpu.runtime.serving import ServingEngine

    enable_compilation_cache()
    if args.tiny:
        cfg = configs.tiny_feedback("custom", frames_per_step=args.fps,
                                    depth_group=min(args.dg, 3))
    else:
        cfg = configs.flagship_feedback_code2wav(
            "custom", frames_per_step=args.fps, depth_group=args.dg)
    t0 = time.perf_counter()
    model = Qwen3TTSModel.synthetic(cfg, seed=0, fast=True)
    engine = ServingEngine(model, max_streams=args.streams)
    print(f"[chunk schedule: {engine.chunk_schedule}]", flush=True)

    seq = [0]

    def prompts(n, toks=40):
        seq[0] += 1
        return [
            PromptSpec(
                text_tokens=(np.arange(toks) * (i + 3 + 29 * seq[0])
                             % cfg.talker.vocab_size).astype(np.int32),
                speaker_id=i % 9,
            )
            for i in range(n)
        ]

    warm_frames = sum(engine.chunk_schedule) + engine.chunk_schedule[-1]
    engine.run(prompts(1), max_frames=warm_frames)
    engine.run(prompts(args.streams), max_frames=warm_frames)
    print(f"[warm {time.perf_counter() - t0:.0f}s]", flush=True)

    for rep in range(args.reps):
        ps = prompts(args.streams)
        t_submit = time.perf_counter()
        ids = []
        sub_walls = []
        for p in ps:
            t0 = time.perf_counter()
            ids.append(engine.submit(p, max_frames=48))
            sub_walls.append(time.perf_counter() - t0)
        print("  submit ms:", " ".join(f"{1e3*w:5.1f}" for w in sub_walls),
              flush=True)
        walls = []
        while len(walls) < args.steps:
            # phase-timed step(): prefill dispatch / chunk dispatch /
            # collect+fetch (step() == collect_step(dispatch_step()), and
            # dispatch_step leads with _advance_prefills)
            t0 = time.perf_counter()
            ta = tb = t0
            payload = engine.dispatch_step()
            tb = time.perf_counter()
            engine.collect_step(payload)
            tc = time.perf_counter()
            walls.append(tc - t0)
            if len(walls) <= 3:
                print(f"    step{len(walls)-1}: dispatch "
                      f"{1e3*(tb-ta):5.0f} ms  collect {1e3*(tc-tb):5.0f} ms",
                      flush=True)
            if all(engine.streams[i].ttfa_s is not None for i in ids):
                break
        ttfas = sorted(
            (engine.streams[i].ttfa_s or float("nan")) for i in ids
        )
        print(f"rep{rep}: submit->loop {1e3*(time.perf_counter()-t_submit-sum(walls)):.0f} ms-ish")
        print("  step walls ms:",
              " ".join(f"{1e3*w:6.0f}" for w in walls))
        print(f"  ttfa_s: p0 {ttfas[0]:.3f}  p50 "
              f"{ttfas[len(ttfas)//2]:.3f}  max {ttfas[-1]:.3f}", flush=True)
        # drain so the next rep starts cold
        while any(not engine.streams[i].done for i in ids):
            engine.step()


if __name__ == "__main__":
    main()
