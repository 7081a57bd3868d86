"""Real-weights dress rehearsal: first contact as a checklist, not a debug
session (VERDICT r2 #6).

Given a checkpoint snapshot directory, run the whole first-contact
sequence and print a PASS/WARN/FAIL checklist plus one JSON line:

1. **import** — load_checkpoint; per-component assigned counts, synthetic
   fallbacks, unmapped tensors, the speech-tokenizer audit
   (mapped/preserved), cache status;
2. **protocol & template detection** — decode protocol (residual_sum vs
   cb0), codec architecture, speaker conditioning source, adopted
   sampling, template source + a sample render per mode;
3. **synthesis per call shape** — the reference's three generate_audio
   shapes (custom voice/instruct/speed; design instruct; clone
   ref_audio/ref_text — `/root/reference/src/qwen3_tts/sessions/
   {custom,design,clone}.py`), each writing a WAV and reporting RTF/TTFA;
4. **ASR round-trip** — transcribe each output and score WER against the
   input text (needs a provider — transcription.py; skipped otherwise).

Usage:
    python tools/dress_rehearsal.py --snapshot <dir> [--mode auto]
        [--text "..."] [--max-frames N] [--no-synthesis]

Exit 0 = no FAIL lines. Offline CI runs the full sequence against a
fabricated 3-component checkpoint (tests/test_dress_rehearsal.py).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time
import wave

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

_TEXT = "The dress rehearsal checks every call shape before opening night."


def _status(ok: bool | None) -> str:
    return "PASS" if ok else ("WARN" if ok is None else "FAIL")


def _make_ref_wav(path: str, sr: int, seconds: float = 1.0) -> str:
    t = np.arange(int(seconds * sr))
    pcm = (np.sin(2 * np.pi * 220 * t / sr) * 11000).astype(np.int16)
    ref = os.path.join(path, "rehearsal_ref.wav")
    with wave.open(ref, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return ref


def rehearse(snapshot: str, *, mode: str = "auto", text: str = _TEXT,
             max_frames: int | None = None, synthesis: bool = True,
             transcribe=None) -> dict:
    """Run the checklist; returns the report dict. ``transcribe`` is an
    optional wav_path -> str callable (ASR round-trip)."""
    import warnings

    from qwen3_tts_tpu.engine.api import generate_audio
    from qwen3_tts_tpu.engine.weights import (
        CheckpointImportError,
        load_checkpoint,
    )
    from qwen3_tts_tpu.quality import wer

    report: dict = {"snapshot": snapshot, "checks": []}

    def check(name, ok, detail=""):
        report["checks"].append(
            {"name": name, "status": _status(ok), "detail": detail}
        )

    # 1. import ------------------------------------------------------------
    t0 = time.perf_counter()
    caught: list[str] = []
    try:
        with warnings.catch_warnings(record=True) as ws:
            warnings.simplefilter("always")
            model = load_checkpoint(
                snapshot,
                mode=mode if mode != "auto" else "custom",
                allow_partial=True,
            )
        caught = [str(w.message) for w in ws]
    except CheckpointImportError as e:
        check("import", False, str(e))
        report["fatal"] = str(e)
        return report
    load_s = time.perf_counter() - t0
    report["load_s"] = round(load_s, 1)
    report["warnings"] = caught

    rep = getattr(model, "import_report", None)
    if rep is None:
        check("import", True,
              f"native cache hit ({load_s:.0f}s) — conversion was audited "
              "on a previous run")
        report["import"] = {"source": "native-cache"}
    else:
        report["import"] = {
            "assigned": rep.assigned,
            "synthetic": list(rep.synthetic),
            "unmapped": len(rep.unmapped),
            "unmapped_first": rep.unmapped[:8],
            "speech_tokenizer": rep.speech_tokenizer,
        }
        check("import", not rep.synthetic,
              f"assigned={rep.assigned} synthetic={list(rep.synthetic)} "
              f"unmapped={len(rep.unmapped)}")
        check("unmapped-tensors", None if rep.unmapped else True,
              f"{len(rep.unmapped)} unconsumed names"
              + (f", first: {rep.unmapped[:4]}" if rep.unmapped else ""))
        st = rep.speech_tokenizer
        if st is None:
            check("speech-tokenizer", None,
                  "checkpoint ships no speech_tokenizer tensors — cloning "
                  "uses the synthetic feature encoder")
        else:
            check("speech-tokenizer",
                  True if (st["mapped"] and not st["preserved"]) else None,
                  f"family={st['family']} mapped={st['mapped']}/"
                  f"{st['tensors']} preserved={st['preserved']}")

    # 2. protocol & template -----------------------------------------------
    cfg = model.cfg
    proto = {
        "feedback": cfg.talker.feedback,
        "frames_per_step": cfg.talker.frames_per_step,
        "depth_group": cfg.code_predictor.depth_group,
        "codec_arch": cfg.codec_arch,
        "speaker_source": (
            "codec-token" if cfg.talker.speaker_tokens else "spk_emb"
        ),
        "sampling_adopted": model.sampling is not None,
        "native_speed": cfg.native_speed,
        "template_source": getattr(model.template, "source", "synthetic"),
    }
    report["protocol"] = proto
    check("decode-protocol", True,
          f"{proto['feedback'] or 'cb0'} fps={proto['frames_per_step']} "
          f"dg={proto['depth_group']} codec={proto['codec_arch']}")
    check("prompt-template",
          True if proto["template_source"] != "synthetic" else None,
          f"source={proto['template_source']}"
          + ("" if proto["template_source"] != "synthetic" else
             " — no template files found; the engine will condition on "
             "PLACEHOLDER tags (mis-conditioning risk on real weights)"))
    if rep is not None and rep.prompt_template:
        report["template_samples"] = rep.prompt_template["samples"]

    if not synthesis:
        return report

    # 3. one synthesis per call shape ---------------------------------------
    outdir = tempfile.mkdtemp(prefix="q3tts_rehearsal_")
    report["outputs"] = outdir
    sr = cfg.codec.sample_rate
    speakers = [s for s, _ in cfg.talker.speaker_tokens or ()] or list(
        cfg.speakers
    )
    shapes = {
        "custom": dict(voice=speakers[0] if speakers else None,
                       instruct="Speak warmly and clearly.", speed=1.0),
        "design": dict(instruct="A calm, deep narrator voice."),
        "clone": dict(ref_audio=_make_ref_wav(outdir, sr),
                      ref_text="A short reference sample."),
    }
    if mode != "auto":
        keep = {"custom": "custom", "design": "design", "base": "clone"}
        shapes = {keep[mode]: shapes[keep[mode]]}
    report["synthesis"] = {}
    for shape, kwargs in shapes.items():
        try:
            m = generate_audio(
                model=model, text=text, output_path=outdir,
                file_name=f"{shape}.wav", max_frames=max_frames, **kwargs,
            )
        except Exception as e:
            check(f"synthesis-{shape}", False, f"{type(e).__name__}: {e}")
            continue
        row = {
            "rtf": round(m["rtf"], 2),
            "ttfa_s": round(m["ttfa_s"], 3),
            "audio_s": round(m["audio_s"], 2),
            "wav": os.path.join(outdir, f"{shape}.wav"),
        }
        # 4. ASR round-trip --------------------------------------------------
        if transcribe is not None:
            hyp = transcribe(row["wav"]) or ""
            row["asr_hyp"] = hyp
            row["wer"] = round(wer(text, hyp), 3)
        report["synthesis"][shape] = row
        ok = m["audio_s"] > 0
        detail = (f"RTF {row['rtf']}x TTFA {row['ttfa_s']}s "
                  f"audio {row['audio_s']}s")
        if "wer" in row:
            detail += f" WER {row['wer']}"
            ok = ok and row["wer"] <= 0.5
        check(f"synthesis-{shape}", ok, detail)
    if transcribe is None:
        check("asr-round-trip", None,
              "no ASR provider available — outputs written but unscored; "
              "LISTEN to them before serving")
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshot", default=None,
                    help="checkpoint snapshot directory (omit with "
                    "--fabricate)")
    ap.add_argument("--fabricate", action="store_true",
                    help="rehearse against a fabricated full tiny snapshot "
                    "(engine/fabricate.py) — the offline per-round checklist "
                    "bench.py runs; catches import/template/protocol "
                    "regressions without real weights")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend and skip the device lock "
                    "(the fabricated tiny snapshot needs no TPU; lets the "
                    "checklist run while a measurement process holds the "
                    "device)")
    ap.add_argument("--mode", default="auto",
                    choices=["auto", "custom", "design", "base"],
                    help="auto = run all three call shapes")
    ap.add_argument("--text", default=_TEXT)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--no-synthesis", action="store_true",
                    help="import + detection audit only (no device decode)")
    ap.add_argument("--asr", default=None,
                    help="transcription provider name")
    args = ap.parse_args()
    if args.snapshot is None and not args.fabricate:
        ap.error("--snapshot or --fabricate required")

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from qwen3_tts_tpu.engine import enable_compilation_cache

    enable_compilation_cache()
    if args.fabricate:
        from qwen3_tts_tpu.engine.fabricate import fabricate_full_checkpoint

        args.snapshot = fabricate_full_checkpoint(
            args.snapshot or tempfile.mkdtemp(prefix="q3tts_fab_")
        )

    from qwen3_tts_tpu.device_lock import require_device_lock

    if not args.no_synthesis and not args.cpu:
        require_device_lock("dress_rehearsal.py")

    from qwen3_tts_tpu import transcription

    if args.asr:
        os.environ["QWEN3_TTS_ASR_BACKEND"] = args.asr
    transcribe = (
        transcription.transcribe_wav if transcription.asr_available()
        else None
    )

    report = rehearse(
        args.snapshot, mode=args.mode, text=args.text,
        max_frames=args.max_frames, synthesis=not args.no_synthesis,
        transcribe=transcribe,
    )
    width = max(len(c["name"]) for c in report["checks"])
    for c in report["checks"]:
        print(f"[{c['status']:>4}] {c['name']:<{width}}  {c['detail']}")
    print(json.dumps({k: v for k, v in report.items() if k != "checks"}))
    sys.exit(1 if any(c["status"] == "FAIL" for c in report["checks"]) else 0)


if __name__ == "__main__":
    main()
