"""Decompose the raw-import single-stream gap (VERDICT r4 #3).

BENCH r4's `raw_import_fps1` single-stream RTF sat at 6.36× against the
builder's ~10.4× bytes/frame speed-of-light bound (PERF.md arithmetic) —
~61% captured vs 82% measured on the rvq codec in round 3. This harness
separates the candidates ON the real shape (published residual_sum
protocol, fps=1, dg=1, code2wav codec), all arms interleaved in ONE
process so tunnel drift cancels:

  base        the DEFAULT schedule at pipeline depth 2 — the bench
              configuration (round 5 onward that is (4, 32) / (8, 32);
              the round-5 measurements below were taken against the old
              (4, 8, 16, 32) default they retired);
  steady32    (32,)-only — does the adaptive ramp (extra compile
              variants, small early chunks) cost steady state?
  d4          default schedule at pipeline depth 4 — are chunk fetches
              under-hidden at depth 2?
  steady64    (64,)-only — do bigger chunks amortize dispatch/fetch
              further? (new compile variant per run)

Per arm: RTF over ``--frames`` frames (median of ``--reps``), plus the
derived per-frame wall at the steady chunk — compare against the SoL
arithmetic's ~7.7 ms/frame HBM bound.

Usage: python tools/profile_feedback_decode.py [--frames 240] [--reps 3]
       [--arms base steady32 d4 steady64] [--tiny]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--arms", nargs="+",
                    default=["base", "steady32", "d4", "steady64"])
    ap.add_argument("--protocol", default="feedback",
                    choices=["feedback", "cb0"],
                    help="feedback = raw-import published shape (fps=1); "
                    "cb0 = the HEADLINE shape (MTP fps=2, code2wav)")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()
    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from qwen3_tts_tpu.device_lock import require_device_lock

        require_device_lock("profile_feedback_decode.py")

    from qwen3_tts_tpu.engine import configs, enable_compilation_cache
    from qwen3_tts_tpu.engine.api import Qwen3TTSModel
    from qwen3_tts_tpu.runtime.generate import Generator
    from qwen3_tts_tpu.runtime.prompts import PromptSpec
    from qwen3_tts_tpu.runtime.sampling import SamplingConfig

    enable_compilation_cache()
    if args.tiny:
        cfg = (configs.tiny_feedback("custom")
               if args.protocol == "feedback" else configs.tiny("custom"))
    elif args.protocol == "feedback":
        cfg = configs.flagship_feedback_code2wav("custom")
    else:
        cfg = configs.flagship_code2wav("custom", frames_per_step=2)
    t0 = time.perf_counter()
    model = Qwen3TTSModel.synthetic(cfg, seed=0, fast=True)
    print(f"[load {time.perf_counter() - t0:.0f}s]", flush=True)

    greedy = SamplingConfig(greedy=True)

    def gen_for(arm: str) -> Generator:
        sched = {"base": None, "d4": None,
                 "steady32": (32,), "steady64": (64,),
                 "ramp432": (4, 32), "ramp832": (8, 32)}[arm]
        depth = 4 if arm == "d4" else 2
        return Generator(
            cfg=cfg, params=model.params, cp_params=model.cp_params,
            codec_params=model.codec_params, sampling=greedy,
            chunk_schedule=sched, pipeline_depth=depth,
        )

    gens = {}
    for arm in args.arms:
        try:
            g = gen_for(arm)
            # warmup: every chunk variant + prompt bucket (inputs evolve
            # below — the service caches executions by value)
            p = PromptSpec(
                text_tokens=(np.arange(48) * 7 % cfg.talker.vocab_size)
                .astype(np.int32), speaker_id=0)
            t0 = time.perf_counter()
            g.synthesize(p, max_frames=sum(g.chunk_schedule)
                         + g.chunk_schedule[-1], seed=0)
            print(f"[{arm}: schedule {g.chunk_schedule} depth "
                  f"{g.pipeline_depth}, warm {time.perf_counter()-t0:.0f}s]",
                  flush=True)
            gens[arm] = g
        except Exception as e:
            print(f"[{arm}: FAILED to build/warm: {type(e).__name__}: "
                  f"{str(e)[:200]}]", flush=True)

    seq = [0]

    def prompt():
        seq[0] += 1
        return PromptSpec(
            text_tokens=((np.arange(48) * (11 + seq[0]) + seq[0])
                         % cfg.talker.vocab_size).astype(np.int32),
            speaker_id=seq[0] % 9,
        )

    results: dict = {a: [] for a in gens}
    for rep in range(args.reps):
        for arm, g in gens.items():
            r = g.synthesize(prompt(), max_frames=args.frames,
                             seed=100 + rep)
            results[arm].append(r)
            print(f"rep{rep} {arm}: rtf {r.rtf:6.3f}  wall {r.wall_s:6.3f}s"
                  f"  ttfa {r.ttfa_s*1e3:5.0f} ms  frames {r.frames}",
                  flush=True)

    out = {}
    for arm, rs in results.items():
        rtfs = sorted(r.rtf for r in rs)
        best = max(rs, key=lambda r: r.rtf)
        frame_ms = 1e3 * best.wall_s / max(best.frames, 1)
        out[arm] = {"rtf_median": round(rtfs[len(rtfs) // 2], 3),
                    "rtf_best": round(rtfs[-1], 3),
                    "ms_per_frame_best": round(frame_ms, 2)}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
