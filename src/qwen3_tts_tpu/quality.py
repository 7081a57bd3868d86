"""Decode-configuration quality harness.

The decode-recovery extensions (multi-token prediction ``frames_per_step``,
grouped depth prediction ``depth_group`` — PERF.md's measured ladder on the
published protocol) and the int8 KV cache trade fidelity for speed; PERF.md
flags ``depth_group=15`` as "the riskiest point on the fidelity/speed
curve". This module is the measurement that gates those trades: synthesize
the same texts under a baseline decode and each variant, ASR both (the
in-repo JAX Whisper or any registered provider — transcription.py), and
score

- **ASR round-trip WER delta** (variant - baseline) against the input
  text: catches audible degradation, robust to benign token divergence;
- **waveform identical-prefix fraction** for variants that SHOULD be
  bit-identical under greedy decode (kv=int8 vs dense); protocol-changing
  variants (fps/dg) produce different token streams by construction, so
  the fraction is reported but not gated there.

Consumers:
- ``tools/decode_quality.py`` — the CLI gate (real weights, real ASR);
- ``tools/kv_quality_check.py`` — the kv-only wrapper (round 2);
- ``finetune.py --eval-quality`` — post-train eval before native export;
- ``tests/test_decode_quality.py`` — offline mechanics on tiny models.
"""

from __future__ import annotations

import dataclasses
import os
import tempfile
import wave
from typing import Any, Callable

import numpy as np

Transcribe = Callable[[str], "str | None"]

DEFAULT_TEXTS = [
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


def parse_variant(spec: str) -> dict[str, Any]:
    """``"fps=2+dg=5"`` / ``"kv=int8"`` / ``"fps=3"`` -> option dict.
    Keys: fps (int), dg (int), kv ("int8"|"dense")."""
    out: dict[str, Any] = {}
    for part in spec.split("+"):
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise ValueError(f"variant part {part!r}: expected key=value")
        k, v = part.split("=", 1)
        k = k.strip().lower()
        if k in ("fps", "frames_per_step"):
            out["fps"] = int(v)
        elif k in ("dg", "depth_group"):
            out["dg"] = int(v)
        elif k == "kv":
            if v not in ("int8", "dense"):
                raise ValueError(f"kv={v!r}: expected int8 or dense")
            out["kv"] = v
        else:
            raise ValueError(f"unknown variant key {k!r} in {spec!r}")
    if not out:
        raise ValueError(f"empty variant spec {spec!r}")
    return out


def variant_model(model, opts: dict[str, Any]):
    """A model VIEW decoding ``model``'s weights under a different decode
    configuration (fps/dg). Parameter trees are shared, not copied; only
    the config (and therefore the compiled decode stages) changes. A model
    trained at fps=N / dg=K carries the extension parameters, so any
    smaller fps/dg decodes from the same tree (fps=1/dg=1 simply leaves
    the MTP chain / group re-indexing unused)."""
    from .engine.api import Qwen3TTSModel

    cfg = model.cfg
    if "fps" in opts:
        cfg = dataclasses.replace(
            cfg, talker=dataclasses.replace(
                cfg.talker, frames_per_step=opts["fps"]
            )
        )
    if "dg" in opts:
        cfg = dataclasses.replace(
            cfg, code_predictor=dataclasses.replace(
                cfg.code_predictor, depth_group=opts["dg"]
            )
        )
    return Qwen3TTSModel(
        cfg=cfg,
        params=model.params,
        cp_params=model.cp_params,
        codec_params=model.codec_params,
        tokenizer=model.tokenizer,
        template=model.template,
        name=f"{model.name}@{opts}",
        sampling=model.sampling,
        st_params=model.st_params,
        st_cfg=model.st_cfg,
    )


def _synthesize(model, text: str, voice, max_frames, kv: str | None):
    """One utterance -> (pcm int16 array, wav path). The kv format is an
    engine-construction env knob, applied around the call."""
    from .engine.api import generate_audio

    prev = os.environ.get("QWEN3_TTS_KV")
    if kv is not None:
        os.environ["QWEN3_TTS_KV"] = kv
    try:
        d = tempfile.mkdtemp(prefix="q3tts_quality_")
        generate_audio(model=model, text=text, voice=voice,
                       output_path=d, max_frames=max_frames)
        path = os.path.join(d, "audio_000.wav")
        with wave.open(path) as w:
            pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
        return pcm, path
    finally:
        if kv is not None:
            if prev is None:
                os.environ.pop("QWEN3_TTS_KV", None)
            else:
                os.environ["QWEN3_TTS_KV"] = prev


def compare_decode_configs(
    model,
    variants: dict[str, dict[str, Any]],
    texts: list[str],
    transcribe: Transcribe | None,
    *,
    voice: str | None = "ryan",
    max_frames: int | None = None,
    baseline: dict[str, Any] | None = None,
) -> dict:
    """Score each named variant against the baseline decode of the SAME
    weights. Returns::

        {"baseline": {...opts},
         "variants": {name: {"rows": [...], "median_wer_delta": f|None,
                             "median_identical_frac": f,
                             "protocol_changing": bool}}}

    ``median_wer_delta`` is None when no transcriber is available (the
    waveform metric is still reported). ``protocol_changing`` marks
    variants whose token stream legitimately differs from the baseline's
    (fps/dg) — identical_frac is informational there, a gate only for
    pure-numerics variants (kv)."""
    base_opts = dict(baseline or {"fps": 1, "dg": 1})
    base_model = variant_model(model, base_opts)
    base_rows = []
    for text in texts:
        pcm, path = _synthesize(model=base_model, text=text, voice=voice,
                                max_frames=max_frames,
                                kv=base_opts.get("kv"))
        hyp = (transcribe(path) or "") if transcribe else None
        base_rows.append({
            "pcm": pcm,
            "wer": wer(text, hyp) if hyp is not None else None,
        })

    report: dict = {"baseline": base_opts, "texts": texts, "variants": {}}
    for name, opts in variants.items():
        vm = variant_model(model, opts)
        rows = []
        for text, base in zip(texts, base_rows):
            pcm, path = _synthesize(model=vm, text=text, voice=voice,
                                    max_frames=max_frames,
                                    kv=opts.get("kv"))
            hyp = (transcribe(path) or "") if transcribe else None
            rows.append({
                "text": text,
                "wer_baseline": base["wer"],
                "wer_variant": (
                    wer(text, hyp) if hyp is not None else None
                ),
                "identical_frac": divergence_frac(base["pcm"], pcm),
            })
        deltas = [
            r["wer_variant"] - r["wer_baseline"] for r in rows
            if r["wer_variant"] is not None
        ]
        report["variants"][name] = {
            "opts": opts,
            "rows": rows,
            "median_wer_delta": (
                float(np.median(deltas)) if deltas else None
            ),
            "median_identical_frac": float(np.median(
                [r["identical_frac"] for r in rows]
            )),
            "protocol_changing": bool(
                opts.get("fps", base_opts.get("fps", 1))
                != base_opts.get("fps", 1)
                or opts.get("dg", base_opts.get("dg", 1))
                != base_opts.get("dg", 1)
            ),
        }
    return report


def gate_passes(report: dict, max_wer_delta: float) -> bool:
    """True iff every variant with a measured WER delta stays within the
    budget (variants without ASR coverage do not pass silently — they are
    simply not gated; callers decide whether unmeasured = blocked)."""
    return all(
        v["median_wer_delta"] <= max_wer_delta
        for v in report["variants"].values()
        if v["median_wer_delta"] is not None
    )
