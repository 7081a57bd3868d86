"""A/B the batched-cp MTP variant (TalkerConfig.mtp_cp_batch) on the
real-checkpoint decode shape (flagship_feedback_code2wav).

At fps>1 the published protocol's binding bytes are the code predictor's
per-frame weight streams (PERF.md: ~3.8 GB/frame at fps=2 vs the talker's
~1.7). The full-feedback MTP chain forces one cp pass PER FRAME (frame
j+1's chain hidden conditions on frame j's residual sum); mtp_cp_batch
conditions the chain on cb0 embeddings alone so ONE batched cp pass
covers all fps frames — cp weight bytes per frame divide by fps. Both
arms share one parameter tree (the flag is config-only; fresh jit caches
per arm), one process, interleaved reps so tunnel drift cancels.

Arms:
  chain    — mtp_cp_batch=False (the full-feedback chain, current ladder)
  batched  — mtp_cp_batch=True

Like the other fps/dg extensions this is a fine-tune target: the synthetic
weights measure COST, not quality (finetune.py --mtp-cp-batch trains it;
quality.py gates it).

Usage: python tools/ab_cp_batch.py [--reps 3] [--frames 240] [--fps 2]
       [--dg 1] [--spec] [--tiny]
"""

from __future__ import annotations

import argparse
import dataclasses as dc
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--fps", type=int, default=2)
    ap.add_argument("--dg", type=int, default=1,
                    help="depth_group for BOTH arms (the recovery ladder "
                    "composes: fps x dg x cp-batch)")
    ap.add_argument("--spec", action="store_true",
                    help="spec_decode on both arms (needs --dg > 1)")
    ap.add_argument("--arms", nargs="+", default=["chain", "batched"])
    ap.add_argument("--serving", type=int, default=0, metavar="N",
                    help="also measure the N-stream serving aggregate per "
                    "arm (bench.py's _serving_metrics — one engine per "
                    "arm, sequential; adds several compiles)")
    ap.add_argument("--serving-only", action="store_true",
                    help="skip the single-stream warm/reps entirely (use "
                    "with --arms <one> --serving N: the remote service "
                    "frees buffers lazily, and a resident generator next "
                    "to an 8-slot engine has crashed the TPU worker)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config on CPU (harness smoke test, no TPU)")
    args = ap.parse_args()
    if args.serving_only and not args.serving:
        ap.error("--serving-only requires --serving N (otherwise there is "
                 "nothing to measure)")
    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from qwen3_tts_tpu.device_lock import require_device_lock

        require_device_lock("ab_cp_batch.py")

    from qwen3_tts_tpu.engine import configs, enable_compilation_cache
    from qwen3_tts_tpu.engine.api import Qwen3TTSModel
    from qwen3_tts_tpu.runtime.prompts import PromptSpec
    from qwen3_tts_tpu.runtime.sampling import SamplingConfig

    enable_compilation_cache()

    def build(batched: bool):
        kw = dict(frames_per_step=args.fps, spec_decode=args.spec,
                  mtp_cp_batch=batched)
        if args.tiny:
            return configs.tiny_feedback(
                "custom", depth_group=min(args.dg, 3), **kw)
        return configs.flagship_feedback_code2wav(
            "custom", depth_group=args.dg, **kw)

    t0 = time.perf_counter()
    base = Qwen3TTSModel.synthetic(build(False), seed=0, fast=True)
    base.sampling = SamplingConfig(greedy=True)
    print(f"[load {time.perf_counter() - t0:.0f}s]", flush=True)

    arms: dict[str, Qwen3TTSModel] = {}
    if "chain" in args.arms:
        arms["chain"] = base
    if "batched" in args.arms:
        # shared tree, fresh jits; _generator/_serving cleared explicitly
        # so arm construction is order-independent (a warmed base would
        # otherwise leak its compiled stages into the replaced arm)
        m = dc.replace(base, cfg=build(True), _generator=None, _serving=None)
        m.sampling = base.sampling
        arms["batched"] = m

    seq = [0]

    def prompt(toks=48):
        seq[0] += 1   # inputs must evolve (the service caches by value)
        return PromptSpec(
            text_tokens=(np.arange(toks) * (3 + seq[0])
                         % base.cfg.talker.vocab_size).astype(np.int32),
            speaker_id=seq[0] % 4,
        )

    if not args.serving_only:
        for name, m in arms.items():
            t0 = time.perf_counter()
            m.generator.synthesize(prompt(), max_frames=args.frames, seed=0)
            print(f"[{name} warm {time.perf_counter() - t0:.0f}s]",
                  flush=True)

        scores: dict[str, list] = {name: [] for name in arms}
        for rep in range(args.reps):
            for name, m in arms.items():
                r = m.generator.synthesize(
                    prompt(), max_frames=args.frames, seed=seq[0]
                )
                scores[name].append((r.rtf, r.ttfa_s))
                print(f"rep{rep} {name:>8}: {r.rtf:5.2f}x  "
                      f"ttfa {r.ttfa_s * 1e3:5.0f} ms", flush=True)

        print(f"\ncp-batch A/B fps={args.fps} dg={args.dg} "
              f"spec={args.spec} (median over reps):")
        for name, vals in scores.items():
            rtfs = [v[0] for v in vals]
            ttfas = [v[1] * 1e3 for v in vals]
            print(f"  {name:>8}: {np.median(rtfs):6.2f}x RTF, ttfa p50 "
                  f"{np.median(ttfas):4.0f} ms  (runs: "
                  + ", ".join(f"{r:.2f}" for r in rtfs) + ")")

    if args.serving:
        # one engine per arm (sequential — two big-cache engines resident
        # at once risks the HBM wedge, CLAUDE.md); drops EVERY arm's
        # single-stream buffers first, not just the current arm's — the
        # remote service frees lazily, and the other arm's resident
        # generator next to an 8-slot engine has crashed the TPU worker
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from bench import _free_model, _serving_metrics

        for m in arms.values():
            _free_model(m)
        for name, m in arms.items():
            t0 = time.perf_counter()
            sm = _serving_metrics(m, args.serving)
            print(f"  {name:>8} serving{args.serving}: "
                  f"agg {sm['agg_rtf']:6.2f}x, ttfa p50 "
                  f"{sm['ttfa_s_p50'] * 1e3:4.0f} ms, join-ttfa "
                  f"{sm['join_ttfa_s_under_load'] * 1e3:4.0f} ms "
                  f"[{time.perf_counter() - t0:.0f}s]", flush=True)
            _free_model(m)


if __name__ == "__main__":
    main()
