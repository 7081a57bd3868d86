"""Quality gate for decode-recovery configurations on REAL weights.

The measured perf ladder on the published protocol (PERF.md: 8.5x raw ->
11.9x fps=2 -> 19.1x +dg=5 -> 28.3x fps=3+dg=15) leans on decode
extensions whose fidelity cost was previously unmeasured; PERF.md calls
dg=15 "the riskiest point on the fidelity/speed curve". This CLI scores
each candidate decode configuration against the fps=1/dg=1 baseline of the
SAME weights (src/qwen3_tts_tpu/quality.py):

    python tools/decode_quality.py --model <ckpt-or-synthetic> \
        --variants fps=2 fps=2+dg=5 fps=3+dg=15 kv=int8 \
        [--texts f.txt] [--asr whisper-jax] [--max-wer-delta 0.02]

Exit 0 iff every ASR-scored variant's median WER delta <= --max-wer-delta.
fps/dg variants legitimately change the token stream, so the waveform
identical-prefix metric is informational there; for kv=int8 (same
protocol, perturbed numerics) it localises where divergence starts.
finetune.py --eval-quality runs the same harness post-train; offline CI
covers the mechanics (tests/test_decode_quality.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    help="checkpoint path or synthetic:tiny/flagship spec")
    ap.add_argument("--variants", nargs="+",
                    default=["fps=2", "fps=2+dg=5", "fps=3+dg=5", "kv=int8"],
                    help="decode configs to score, e.g. fps=2+dg=5 kv=int8")
    ap.add_argument("--baseline", default="fps=1+dg=1",
                    help="baseline decode config (default: the raw import "
                    "shape fps=1+dg=1)")
    ap.add_argument("--texts", help="file with one text per line")
    ap.add_argument("--asr", default=None,
                    help="transcription provider name (default: first "
                    "available)")
    ap.add_argument("--voice", default="ryan")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--max-wer-delta", type=float, default=0.02)
    ap.add_argument("--json", action="store_true",
                    help="emit the full report as one JSON line")
    args = ap.parse_args()

    from qwen3_tts_tpu.device_lock import require_device_lock

    require_device_lock("decode_quality.py")

    from qwen3_tts_tpu.engine import enable_compilation_cache

    enable_compilation_cache()  # variants recompile per decode shape

    from qwen3_tts_tpu import transcription
    from qwen3_tts_tpu.engine.api import load_model
    from qwen3_tts_tpu.quality import (
        DEFAULT_TEXTS,
        compare_decode_configs,
        gate_passes,
        parse_variant,
    )

    if args.asr:
        os.environ["QWEN3_TTS_ASR_BACKEND"] = args.asr
    transcribe = (
        transcription.transcribe_wav if transcription.asr_available()
        else None
    )
    if transcribe is None:
        print("WARNING: no ASR provider available — WER deltas will be "
              "unmeasured (waveform metrics only); the gate cannot pass "
              "variants it cannot score", file=sys.stderr)

    texts = DEFAULT_TEXTS
    if args.texts:
        with open(args.texts) as f:
            texts = [ln.strip() for ln in f if ln.strip()]

    model = load_model(args.model)
    report = compare_decode_configs(
        model,
        {spec: parse_variant(spec) for spec in args.variants},
        texts,
        transcribe,
        voice=args.voice,
        max_frames=args.max_frames,
        baseline=parse_variant(args.baseline),
    )
    for name, v in report["variants"].items():
        d = v["median_wer_delta"]
        print(f"{name:>16}: WER delta "
              f"{'unmeasured' if d is None else f'{d:+.4f}'} | "
              f"mel dist {v['median_mel_dist']:.2f} dB | "
              f"identical {v['median_identical_frac']:.2%}"
              f"{' (protocol-changing)' if v['protocol_changing'] else ''}")
    if args.json:
        slim = {
            "baseline": report["baseline"],
            "variants": {
                n: {k: v[k] for k in
                    ("opts", "median_wer_delta", "median_identical_frac",
                     "median_mel_dist", "protocol_changing")}
                for n, v in report["variants"].items()
            },
        }
        print(json.dumps(slim))
    measured = [v for v in report["variants"].values()
                if v["median_wer_delta"] is not None]
    ok = bool(measured) and gate_passes(report, args.max_wer_delta)
    print(f"gate {'PASS' if ok else 'FAIL'} "
          f"(<= {args.max_wer_delta} on {len(measured)} measured variants)")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
