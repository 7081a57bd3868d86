"""Quality gate for the int8 KV cache: dense-vs-int8 on REAL weights.

QWEN3_TTS_KV=int8 perturbs K/V rows by ~0.4% relative; greedy token
streams can diverge late in an utterance, so the flag stays off by default
until this gate passes on a real checkpoint. The gate synthesizes the same
texts under both cache formats and scores them two ways:

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
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import numpy as np

_DEFAULT_TEXTS = [
    "The quick brown fox jumps over the lazy dog.",
    "TPU inference keeps every decode shape static and bucketed.",
    "She sells sea shells by the sea shore on a bright summer morning.",
    "Quantized caches halve the attention window bandwidth.",
]


def wer(ref: str, hyp: str) -> float:
    """Word error rate via Levenshtein distance over whitespace tokens."""
    r = ref.lower().split()
    h = hyp.lower().split()
    if not r:
        return 0.0 if not h else 1.0
    d = np.arange(len(h) + 1, dtype=np.int32)
    for i, rw in enumerate(r, 1):
        prev_diag = d[0]
        d[0] = i
        for j, hw in enumerate(h, 1):
            cur = min(
                d[j] + 1,                       # deletion
                d[j - 1] + 1,                   # insertion
                prev_diag + (rw != hw),         # substitution
            )
            prev_diag = d[j]
            d[j] = cur
    return float(d[-1]) / len(r)


def divergence_frac(a: np.ndarray, b: np.ndarray) -> float:
    """Fraction of the shorter waveform that is bit-identical before the
    first mismatch (1.0 = fully identical over the overlap)."""
    n = min(len(a), len(b))
    if n == 0:
        return 1.0
    neq = np.nonzero(a[:n] != b[:n])[0]
    return 1.0 if neq.size == 0 else float(neq[0]) / n


def run_gate(model, texts, transcribe, voice="ryan", max_frames=None) -> dict:
    """Synthesize each text dense and int8, ASR both, return the score
    table. ``transcribe(wav_path) -> str | None``."""
    from qwen3_tts_tpu.engine.api import generate_audio

    rows = []
    for text in texts:
        out = {}
        for fmt in ("dense", "int8"):
            os.environ["QWEN3_TTS_KV"] = fmt
            d = tempfile.mkdtemp(prefix=f"kvq_{fmt}_")
            generate_audio(
                model=model, text=text, voice=voice, output_path=d,
                max_frames=max_frames,
            )
            path = os.path.join(d, "audio_000.wav")
            import wave

            with wave.open(path) as w:
                pcm = np.frombuffer(
                    w.readframes(w.getnframes()), np.int16
                )
            hyp = transcribe(path) or ""
            out[fmt] = {"wav": pcm, "wer": wer(text, hyp), "hyp": hyp}
        rows.append({
            "text": text,
            "wer_dense": out["dense"]["wer"],
            "wer_int8": out["int8"]["wer"],
            "identical_frac": divergence_frac(
                out["dense"]["wav"], out["int8"]["wav"]
            ),
        })
    os.environ.pop("QWEN3_TTS_KV", None)
    deltas = [r["wer_int8"] - r["wer_dense"] for r in rows]
    return {"rows": rows, "median_wer_delta": float(np.median(deltas))}


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
