"""Quality gate for the int8 KV cache: dense-vs-int8 on REAL weights.

QWEN3_TTS_KV=int8 perturbs K/V rows by ~0.4% relative; greedy token
streams can diverge late in an utterance, so the flag stays off by default
until this gate passes on a real checkpoint. The gate synthesizes the same
texts under both cache formats and scores them two ways (shared harness:
``qwen3_tts_tpu.quality`` — ``tools/decode_quality.py`` generalizes this
to the fps/depth-group decode extensions):

- **ASR round-trip WER** against the input text (any registered
  transcription provider — the JAX Whisper by default): catches audible
  degradation, robust to benign token divergence;
- **waveform divergence point**: the first sample where the two outputs
  stop being bit-identical, as a fraction of the utterance (int8 noise
  accumulates through the AR loop, so earlier divergence = louder effect).

Usage:
    python tools/kv_quality_check.py --model <checkpoint> \
        [--texts f.txt] [--asr whisper-jax] [--max-wer-delta 0.02]

Exit code 0 iff median WER(int8) - WER(dense) <= --max-wer-delta.
Offline CI exercises the harness mechanics with a synthetic model and a
registered fake provider (tests/test_kv_int8.py).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

from qwen3_tts_tpu.quality import (  # noqa: E402  (re-exported: tests use them)
    compare_decode_configs,
    divergence_frac,
    wer,
    DEFAULT_TEXTS as _DEFAULT_TEXTS,
)


def run_gate(model, texts, transcribe, voice="ryan", max_frames=None) -> dict:
    """Synthesize each text dense and int8, ASR both, return the score
    table (kv_quality_check's round-2 report shape, backed by the shared
    harness). ``transcribe(wav_path) -> str | None``."""
    report = compare_decode_configs(
        model,
        {"int8": {"kv": "int8"}},
        texts,
        transcribe,
        voice=voice,
        max_frames=max_frames,
        # dense baseline at the model's OWN decode shape: the kv gate
        # isolates the cache format, not the fps/dg protocol
        baseline={"fps": model.cfg.talker.frames_per_step,
                  "dg": model.cfg.code_predictor.depth_group,
                  "kv": "dense"},
    )
    v = report["variants"]["int8"]
    rows = [
        {
            "text": r["text"],
            "wer_dense": r["wer_baseline"],
            "wer_int8": r["wer_variant"],
            "identical_frac": r["identical_frac"],
        }
        for r in v["rows"]
    ]
    return {"rows": rows, "median_wer_delta": v["median_wer_delta"]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    help="checkpoint path or synthetic:tiny/flagship spec")
    ap.add_argument("--texts", help="file with one text per line")
    ap.add_argument("--asr", default=None,
                    help="transcription provider name (default: first "
                         "available)")
    ap.add_argument("--voice", default="ryan")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--max-wer-delta", type=float, default=0.02)
    args = ap.parse_args()
    from qwen3_tts_tpu.device_lock import require_device_lock

    require_device_lock('kv_quality_check.py')

    from qwen3_tts_tpu import transcription
    from qwen3_tts_tpu.engine.api import load_model

    if args.asr:
        os.environ["QWEN3_TTS_ASR_BACKEND"] = args.asr
    if not transcription.asr_available():
        print("no ASR provider available (need a local Whisper checkpoint "
              "or a registered provider) — cannot score WER", file=sys.stderr)
        sys.exit(2)

    texts = _DEFAULT_TEXTS
    if args.texts:
        with open(args.texts) as f:
            texts = [ln.strip() for ln in f if ln.strip()]

    model = load_model(args.model)
    report = run_gate(
        model, texts, transcription.transcribe_wav,
        voice=args.voice, max_frames=args.max_frames,
    )
    for r in report["rows"]:
        print(f"dense {r['wer_dense']:.3f} | int8 {r['wer_int8']:.3f} | "
              f"identical {r['identical_frac']:.2%} | {r['text'][:48]!r}")
    print(f"median WER delta (int8 - dense): "
          f"{report['median_wer_delta']:+.4f} "
          f"(gate: <= {args.max_wer_delta})")
    sys.exit(0 if report["median_wer_delta"] <= args.max_wer_delta else 1)


if __name__ == "__main__":
    main()
