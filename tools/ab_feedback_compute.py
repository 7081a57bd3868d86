"""A/B the weight compute format for the REAL-checkpoint decode shape.

VERDICT r2 #2: the published protocol's untuned single-stream RTF (8.5x at
fps=1) is bound by cp-in-loop weight streaming (~3.8 GB/frame at talker
width) next to the talker's ~3.4 GB. int8-resident weights halve BOTH with
no fine-tune — but the round-0 rejection of the fused int8 path (3.3x vs
10.3x) predates the fused-chunk/pipelined loop, so this re-measures it in
the CURRENT loop, on the config real checkpoints actually run
(flagship_feedback_code2wav: residual-sum protocol + code2wav codec).

Arms (one process, interleaved reps — tunnel drift cancels):
  bf16        — dense bf16-resident weights (current default)
  int8_pallas — int8-resident, Pallas fused dequant matmul
  int8_xla    — int8-resident, XLA dequantize+dot (fuses at small M;
                at B=1 the matvec is purely bandwidth-bound)

The two int8 arms SHARE one parameter tree (formats differ only at trace
time via QWEN3_TTS_PALLAS), so HBM holds ~1 int8 + 1 bf16 model.

Usage: python tools/ab_feedback_compute.py [--reps 3] [--frames 240]
       [--fps 1] [--dg 1] [--tiny]
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
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--fps", type=int, default=1)
    ap.add_argument("--dg", type=int, default=1)
    ap.add_argument("--arms", nargs="+",
                    default=["bf16", "int8_pallas", "int8_xla"],
                    help="bf16 | int8_pallas | int8_xla | int8_grouped "
                    "(grouped layout + ops/grouped_qmv kernel)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config on CPU (harness smoke test, no TPU)")
    args = ap.parse_args()
    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from qwen3_tts_tpu.device_lock import require_device_lock

        require_device_lock("ab_feedback_compute.py")

    from qwen3_tts_tpu.engine import configs, enable_compilation_cache
    from qwen3_tts_tpu.engine.api import Qwen3TTSModel
    from qwen3_tts_tpu.runtime.prompts import PromptSpec

    enable_compilation_cache()

    def build_cfg(quant: bool):
        if args.tiny:
            cfg = configs.tiny_feedback(
                "custom", frames_per_step=args.fps,
                depth_group=args.dg if args.dg > 1 else 1,
            )
            if quant:
                cfg = configs.with_quant(cfg, True)
            return cfg
        cfg = configs.flagship_feedback_code2wav(
            "custom", frames_per_step=args.fps, depth_group=args.dg
        )
        if not quant:
            return cfg
        return configs.with_quant(cfg, True) if not cfg.quant.enabled else cfg

    # one model per FORMAT (env read by apply_compute_format at load);
    # the int8 arms share one row-major tree and differ at trace time —
    # except int8_grouped, whose generator packs a grouped COPY of the
    # tree at construction (ops/grouped_qmv layout). Arm tuples are
    # (model, QWEN3_TTS_PALLAS, QWEN3_TTS_INT8_LAYOUT) — the layout env
    # matters at generator CONSTRUCTION, the pallas env at trace time.
    arms: dict[str, tuple] = {}
    want_bf16 = "bf16" in args.arms
    want_int8 = any(a.startswith("int8") for a in args.arms)
    if want_bf16:
        os.environ["QWEN3_TTS_COMPUTE"] = "bf16"
        t0 = time.perf_counter()
        m = Qwen3TTSModel.synthetic(build_cfg(quant=True), seed=0, fast=True)
        print(f"[bf16 load {time.perf_counter() - t0:.0f}s]", flush=True)
        arms["bf16"] = (m, "auto", "rowmajor")
    if want_int8:
        os.environ["QWEN3_TTS_COMPUTE"] = "int8"
        t0 = time.perf_counter()
        base = Qwen3TTSModel.synthetic(build_cfg(quant=True), seed=0,
                                       fast=True)
        print(f"[int8 load {time.perf_counter() - t0:.0f}s]", flush=True)
        import dataclasses as _dc

        if "int8_pallas" in args.arms:
            arms["int8_pallas"] = (base,
                                   "always" if not args.tiny else "auto",
                                   "rowmajor")
        # fresh engine caches, shared tree — _generator/_serving cleared
        # explicitly so arm construction is order-independent
        if "int8_xla" in args.arms:
            view = _dc.replace(base, _generator=None, _serving=None)
            arms["int8_xla"] = (view, "never", "rowmajor")
        if "int8_grouped" in args.arms:
            gview = _dc.replace(base, _generator=None, _serving=None)
            arms["int8_grouped"] = (gview,
                                    "always" if not args.tiny else "auto",
                                    "grouped")
    os.environ.pop("QWEN3_TTS_COMPUTE", None)

    seq = [0]

    def prompt(toks=48):
        seq[0] += 1
        cfg = next(iter(arms.values()))[0].cfg
        return PromptSpec(
            text_tokens=(np.arange(toks) * (3 + seq[0])
                         % cfg.talker.vocab_size).astype(np.int32),
            speaker_id=seq[0] % 4,
        )

    # warmup compiles per arm, tracing under the arm's Pallas mode; the
    # layout env must be set BEFORE first .generator access (the generator
    # packs the grouped tree at construction)
    for name, (m, pallas, layout) in arms.items():
        os.environ["QWEN3_TTS_PALLAS"] = pallas
        os.environ["QWEN3_TTS_INT8_LAYOUT"] = layout
        t0 = time.perf_counter()
        m.generator.synthesize(prompt(), max_frames=args.frames, seed=0)
        print(f"[{name} warm {time.perf_counter() - t0:.0f}s]", flush=True)

    scores: dict[str, list] = {name: [] for name in arms}
    for rep in range(args.reps):
        for name, (m, pallas, layout) in arms.items():
            os.environ["QWEN3_TTS_PALLAS"] = pallas
            os.environ["QWEN3_TTS_INT8_LAYOUT"] = layout
            r = m.generator.synthesize(
                prompt(), max_frames=args.frames, seed=seq[0]
            )
            scores[name].append((r.rtf, r.ttfa_s))
            print(f"rep{rep} {name:>12}: {r.rtf:5.2f}x  "
                  f"ttfa {r.ttfa_s * 1e3:5.0f} ms", flush=True)
    os.environ.pop("QWEN3_TTS_PALLAS", None)
    os.environ.pop("QWEN3_TTS_INT8_LAYOUT", None)

    print(f"\nfeedback fps={args.fps} dg={args.dg} single-stream "
          "(median over reps):")
    for name, vals in scores.items():
        rtfs = [v[0] for v in vals]
        ttfas = [v[1] * 1e3 for v in vals]
        print(f"  {name:>12}: {np.median(rtfs):6.2f}x RTF, ttfa p50 "
              f"{np.median(ttfas):4.0f} ms  (runs: "
              + ", ".join(f"{r:.2f}" for r in rtfs) + ")")


if __name__ == "__main__":
    main()
