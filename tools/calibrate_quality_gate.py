"""Calibrate the offline decode-recovery quality gate on a LOW-DRIFT rig
(VERDICT r4 #5).

Round 3's calibration was drift-dominated: the 200-step recovery
fine-tune alone moved a memorized toy ~27 dB (mel-DTW) even when decoded
at the ORIGINAL shape, so the absolute fps/dg deltas said nothing about
the decode extensions themselves (PERF.md "Decode-recovery quality
gate"). This rig fixes the calibration with FREEZE-BASE recovery
(``finetune.py --freeze-base``: only the grafted MTP chain and the cp's
DRAFT adapter copy train — the base weights never move), which pins
drift at the 0.011 dB determinism floor EXACTLY. Two softer arms were
measured and rejected on the same rig: the weight-space L2-SP anchor
(``--anchor``, ~1e-3 weight moves still flip greedy tokens → ~31 dB) and
sequential-path distillation (``--distill`` at W=1, grouped CE fights
the KL on the SHARED cp tables → 30–33 dB). Stages:

1. train the tiny published-protocol model to memorization (the "base");
2. run the documented recovery fine-tunes FROM it (default freeze-base):
   fps=2 / dg=3 / fps=2+dg=3 / dg=3+spec (tiny analogs of the flagship
   ladder — the tiny codec has 3 residual books);
3. for every recovery export measure, over the training texts (a toy
   memorizes; held-out texts measure nothing but noise):
   - DRIFT   = mel-DTW(original@base-shape, recovered@base-shape)
     — the fine-tune's weight movement alone;
   - TOTAL   = mel-DTW(original@base-shape, recovered@trained-shape)
     — what the user hears after switching the decode shape;
4. test each ladder shape against the explicit gate thresholds
   (quality.MEL_DRIFT_MAX_DB / MEL_GATE_MAX_DB; ``total`` gates only
   LOSSLESS claims — see the constants' comment) and print the table
   PERF.md quotes.

Usage:
    python tools/calibrate_quality_gate.py [--steps1 600] [--steps2 300]
        [--lr2 3e-4] [--full [--anchor W] [--distill W]] [--keep DIR]
        [--shapes fps=2 dg=3 ...]

Offline, CPU, tiny configs — no TPU, no weights, ~10-20 min.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))
sys.path.insert(0, os.path.dirname(__file__))

from measure_acceptance import _TRAIN_TEXTS, _make_dataset  # noqa: E402


def _mel_pair(model_a, model_b, texts, *, max_frames, sr) -> float:
    """Median mel-DTW distance (dB) between the two models' greedy
    renderings of ``texts``."""
    from qwen3_tts_tpu.quality import _synthesize, mel_dtw_dist

    dists = []
    for text in texts:
        a, _ = _synthesize(model_a, text, None, max_frames, None)
        b, _ = _synthesize(model_b, text, None, max_frames, None)
        dists.append(mel_dtw_dist(a, b, sr))
    return float(np.median(dists))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps1", type=int, default=600)
    ap.add_argument("--steps2", type=int, default=300)
    ap.add_argument("--lr1", type=float, default=1e-3)
    ap.add_argument("--lr2", type=float, default=3e-4,
                    help="recovery lr (with --freeze-base the base never "
                    "moves, so the draft/MTP params can learn at a normal "
                    "rate)")
    ap.add_argument("--anchor", type=float, default=0.0,
                    help="L2-SP (weight-space) anchor for the recovery "
                    "stage — measured insufficient alone: ~1e-3 weight "
                    "moves still flip greedy tokens (AR chaos, 31 dB)")
    ap.add_argument("--distill", type=float, default=0.0,
                    help="function-space anchor weight (finetune.py "
                    "--distill) — measured insufficient alone at W=1: "
                    "grouped CE fights sequential KL on the SHARED cp "
                    "tables (30-33 dB drift)")
    ap.add_argument("--full", action="store_true",
                    help="full (shared-weight) recovery instead of the "
                    "default --freeze-base strict recovery; combine with "
                    "--anchor/--distill to measure those arms")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--texts", type=int, default=6)
    ap.add_argument("--max-frames", type=int, default=48)
    ap.add_argument("--shapes", nargs="+",
                    default=["fps=2", "dg=3", "fps=2+dg=3", "dg=3+spec=1"])
    ap.add_argument("--keep", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from qwen3_tts_tpu import finetune
    from qwen3_tts_tpu.engine.api import load_model
    from qwen3_tts_tpu.quality import (
        MEL_DRIFT_MAX_DB,
        MEL_GATE_MAX_DB,
        mel_gate_passes,
        parse_variant,
        variant_model,
    )
    from qwen3_tts_tpu.runtime.sampling import SamplingConfig

    work = args.keep or tempfile.mkdtemp(prefix="q3tts_gatecal_")
    os.makedirs(work, exist_ok=True)
    train_dir = os.path.join(work, "train")
    _make_dataset(train_dir, _TRAIN_TEXTS, base_freq=220.0)
    texts = _TRAIN_TEXTS[: args.texts]
    base_dir = os.path.join(work, "base")

    print(f"[stage1: {args.steps1} steps to memorization]", flush=True)
    rc = finetune.main([
        "--model", "synthetic-tiny-feedback", "--data", train_dir,
        "--steps", str(args.steps1), "--batch-size", str(args.batch_size),
        "--lr", str(args.lr1), "--export", base_dir,
    ])
    assert rc == 0, f"stage1 failed rc={rc}"

    greedy = SamplingConfig(greedy=True)
    base = load_model(base_dir)
    base.sampling = greedy
    sr = base.cfg.codec.sample_rate

    report: dict = {
        "steps1": args.steps1, "steps2": args.steps2,
        "lr2": args.lr2, "anchor": args.anchor, "distill": args.distill,
        "freeze_base": not args.full,
        "thresholds": {"drift_max_db": MEL_DRIFT_MAX_DB,
                       "gate_max_db": MEL_GATE_MAX_DB},
        "rows": [],
    }
    floor = _mel_pair(base, base, texts, max_frames=args.max_frames, sr=sr)
    report["determinism_floor_db"] = round(floor, 3)
    print(f"[determinism floor: {floor:.3f} dB]", flush=True)

    for shape in args.shapes:
        opts = parse_variant(shape)
        out_dir = os.path.join(work, "rec_" + shape.replace("=", "")
                               .replace("+", "_"))
        cli = ["--model", base_dir, "--data", train_dir,
               "--steps", str(args.steps2),
               "--batch-size", str(args.batch_size),
               "--lr", str(args.lr2), "--anchor", str(args.anchor),
               "--distill", str(args.distill),
               "--export", out_dir]
        if not args.full:
            cli.append("--freeze-base")
        if opts.get("fps", 1) > 1:
            cli += ["--mtp-fps", str(opts["fps"])]
        if opts.get("dg", 1) > 1:
            cli += ["--depth-group", str(opts["dg"])]
        if opts.get("spec"):
            cli += ["--spec"]
        print(f"[recovery {shape}: {args.steps2} steps, lr {args.lr2}, "
              f"anchor {args.anchor}, distill {args.distill}]", flush=True)
        rc = finetune.main(cli)
        assert rc == 0, f"recovery {shape} failed rc={rc}"
        tuned = load_model(out_dir)
        tuned.sampling = greedy
        # recovered decoded at the BASE shape: drift alone
        tuned_base_shape = variant_model(
            tuned, {"fps": 1, "dg": 1, "spec": False}
        )
        tuned_base_shape.sampling = greedy
        drift = _mel_pair(base, tuned_base_shape, texts,
                          max_frames=args.max_frames, sr=sr)
        total = _mel_pair(base, tuned, texts,
                          max_frames=args.max_frames, sr=sr)
        lossless = bool(opts.get("spec"))
        row = {
            "shape": shape,
            "lossless_claim": lossless,
            "drift_db": round(drift, 3),
            "total_db": round(total, 3),
            "drift_ok": drift <= MEL_DRIFT_MAX_DB,
            # lossy shapes produce DIFFERENT valid token streams — mel-DTW
            # between different streams saturates (~30 dB) regardless of
            # audible quality, so total gates only LOSSLESS claims; lossy
            # fidelity rides the ASR-WER path (quality.py constants)
            "gate_pass": mel_gate_passes(drift, total, lossless),
        }
        report["rows"].append(row)
        print(f"[{shape}: drift {drift:.3f} dB, total {total:.3f} dB, "
              f"gate {'PASS' if row['gate_pass'] else 'FAIL'}]", flush=True)

    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
