"""A/B the speculative depth decode (code_predictor.predict_residuals_spec)
on the real-checkpoint decode shape (flagship_feedback_code2wav, fps=1).

The published protocol's fps=1 cost is bound by the code predictor's 15
sequential weight passes per frame (~3.4 GB/frame, PERF.md speed-of-light
section). Speculative depth decode replaces them with (draft passes +
verify rounds) while keeping the output BIT-EXACT dg=1 greedy
(tests/test_spec_decode.py). Arms (one process, interleaved reps):

  base          — fps=1, dg=1, plain decode (the raw-import shape)
  spec_ceiling  — dg=15 draft + verify, cp output heads ZEROED so every
                  logit row is constant and the draft always agrees:
                  acceptance = 1.0 exactly, one confirming verify round.
                  This is a REAL execution of the spec graph (not a flag),
                  measuring its best case: 1 draft + 1 verify pass/frame.
  spec_floor    — dg=15 draft + verify on raw random weights: the draft
                  never agrees, every frame pays the full correction loop
                  (~n_res rounds) — the worst case / overhead bound.

A trained checkpoint lands between floor and ceiling at its measured
draft-acceptance rate.

``--sampled`` switches every arm to the PUBLISHED sampled decode (talker
sampling on, cp.generate args top_k=50/top_p=0.8): the spec path then
runs exact speculative sampling (predict_residuals_spec_sampled —
distribution-identical to the sequential dg=1 stream). The ceiling arm's
zeroed heads make draft == target distribution, so acceptance is ~1.0
there too.

Usage: python tools/ab_spec_cp.py [--reps 3] [--frames 240] [--sampled]
       [--tiny]
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
    ap.add_argument("--fps", type=int, default=1,
                    help="frames_per_step for ALL arms (MTP composes with "
                    "the spec cp: draft+verify per frame, talker bytes /fps)")
    ap.add_argument("--dg", type=int, default=15,
                    help="draft group size (15 = whole frame in one pass)")
    ap.add_argument("--arms", nargs="+",
                    default=["base", "spec_ceiling", "spec_floor"])
    ap.add_argument("--accept", type=float, default=None, metavar="A",
                    help="add a spec arm with draft acceptance pinned to A "
                    "via partial head surgery (zero round(A*n_res) depth "
                    "heads — draft == verifier argmax exactly there; "
                    "bench.py _pin_draft_acceptance, measured default from "
                    "tools/measure_acceptance.py)")
    ap.add_argument("--plain-dg", type=int, default=0, metavar="K",
                    help="add a plain (non-spec) grouped arm at dg=K — "
                    "the lossy ladder shape, for same-process comparison")
    ap.add_argument("--sampled", action="store_true",
                    help="published sampled decode on every arm (talker "
                    "sampling + cp.generate args; spec = exact speculative "
                    "sampling)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config on CPU (harness smoke test, no TPU)")
    args = ap.parse_args()
    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from qwen3_tts_tpu.device_lock import require_device_lock

        require_device_lock("ab_spec_cp.py")

    import jax.numpy as jnp

    from qwen3_tts_tpu.engine import configs, enable_compilation_cache
    from qwen3_tts_tpu.engine.api import Qwen3TTSModel
    from qwen3_tts_tpu.runtime.prompts import PromptSpec
    from qwen3_tts_tpu.runtime.sampling import SamplingConfig

    enable_compilation_cache()

    def build(dg: int, spec: bool):
        if args.tiny:
            n_res = 3
            cfg = configs.tiny_feedback(
                "custom", frames_per_step=args.fps,
                depth_group=min(dg, n_res), spec_decode=spec)
            if args.sampled:  # tiny default cp is greedy; give it the
                # published-args shape so cp_samples() engages
                cfg = dc.replace(cfg, code_predictor=dc.replace(
                    cfg.code_predictor, top_k=4, top_p=0.9))
            return cfg
        return configs.flagship_feedback_code2wav(
            "custom", frames_per_step=args.fps, depth_group=dg,
            spec_decode=spec)

    t0 = time.perf_counter()
    base = Qwen3TTSModel.synthetic(build(1, False), seed=0, fast=True)
    # greedy battery: bit-exact spec verification. --sampled: the
    # published decode (talker samples; cp_samples() then samples the
    # residuals per the config's cp.generate args -> exact speculative
    # sampling on the spec arms).
    base.sampling = (SamplingConfig() if args.sampled
                     else SamplingConfig(greedy=True))
    print(f"[load {time.perf_counter() - t0:.0f}s]", flush=True)

    arms: dict[str, Qwen3TTSModel] = {}
    if "base" in args.arms:
        arms["base"] = base
    # every dc.replace clears _generator/_serving explicitly so arm
    # construction is order-independent (a warmed base would otherwise
    # leak its compiled stages into the replaced arm)
    if "spec_floor" in args.arms:
        m = dc.replace(base, cfg=build(args.dg, True),
                       _generator=None, _serving=None)
        arms["spec_floor"] = m
    if "spec_ceiling" in args.arms:
        # zeroed cp output heads: constant logit rows, draft == verify
        # argmax everywhere -> acceptance exactly 1.0 (the while_loop runs
        # its single confirming round). Only the heads tensor is copied;
        # the rest of the tree is shared.
        cp2 = dict(base.cp_params)
        cp2["heads"] = jnp.zeros_like(base.cp_params["heads"])
        m = dc.replace(base, cfg=build(args.dg, True),
                       _generator=None, _serving=None)
        m.cp_params = cp2
        arms["spec_ceiling"] = m

    if args.accept is not None:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from bench import _pin_draft_acceptance

        m = dc.replace(base, cfg=build(args.dg, True),
                       _generator=None, _serving=None)
        m.cp_params = dict(base.cp_params)
        pinned = _pin_draft_acceptance(m, args.accept)
        arms[f"spec_accept{args.accept:g}"] = m
        print(f"[spec_accept arm: {pinned} of "
              f"{m.cfg.codec.num_codebooks - 1} depths pinned accepted]",
              flush=True)

    if args.plain_dg > 1:
        arms[f"plain_dg{args.plain_dg}"] = dc.replace(
            base, cfg=build(args.plain_dg, False),
            _generator=None, _serving=None)

    seq = [0]

    def prompt(toks=48):
        seq[0] += 1
        cfg = base.cfg
        return PromptSpec(
            text_tokens=(np.arange(toks) * (3 + seq[0])
                         % cfg.talker.vocab_size).astype(np.int32),
            speaker_id=seq[0] % 4,
        )

    for name, m in arms.items():
        t0 = time.perf_counter()
        m.generator.synthesize(prompt(), max_frames=args.frames, seed=0)
        print(f"[{name} warm {time.perf_counter() - t0:.0f}s]", flush=True)

    scores: dict[str, list] = {name: [] for name in arms}
    for rep in range(args.reps):
        for name, m in arms.items():
            r = m.generator.synthesize(
                prompt(), max_frames=args.frames, seed=seq[0])
            scores[name].append((r.rtf, r.ttfa_s))
            print(f"rep{rep} {name:>13}: {r.rtf:5.2f}x  "
                  f"ttfa {r.ttfa_s * 1e3:5.0f} ms", flush=True)

    print(f"\nspec-cp fps={args.fps} dg-draft={args.dg} single-stream "
          "(median over reps):")
    for name, vals in scores.items():
        rtfs = [v[0] for v in vals]
        ttfas = [v[1] * 1e3 for v in vals]
        print(f"  {name:>13}: {np.median(rtfs):6.2f}x RTF, ttfa p50 "
              f"{np.median(ttfas):4.0f} ms  (runs: "
              + ", ".join(f"{r:.2f}" for r in rtfs) + ")")


if __name__ == "__main__":
    main()
