"""Optional automatic transcription of reference audio (ASR providers).

TPU-native replacement for the reference's macOS Speech bridge
(/root/reference/src/qwen3_tts/transcription.py). The reference exposes an
availability flag plus one transcribe function backed by SFSpeechRecognizer
(transcription.py:7,22-24,27-84) and a y/n UX wrapper
(transcription.py:87-105). Here the same contract is kept but backed by a
pluggable provider registry; the default provider is a local Whisper-class
model run through ``transformers`` when its weights are already on disk.
Absent-by-default is preserved: with no provider available,
``ASR_AVAILABLE`` is False and every call degrades gracefully.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

# A provider takes a path to a mono 16-bit WAV and returns text or None.
Provider = Callable[[str], Optional[str]]

_providers: dict[str, Provider] = {}


def register_provider(name: str, fn: Provider) -> None:
    """Register an ASR provider (e.g. an app embedding this framework can
    plug in its own on-TPU ASR model)."""
    _providers[name] = fn


_jax_asr_cache: dict[str, object] = {}


def _whisper_jax_provider(wav_path: str) -> str | None:
    """Transcribe with the TPU-native JAX Whisper (models/whisper.py) —
    the on-TPU ASR provider SURVEY.md §2 maps the reference's macOS Speech
    dependency to. The loaded model is cached per checkpoint directory so
    repeated enrollments pay one load + one compile."""
    model_dir = _whisper_model_dir()
    if model_dir is None:
        return None
    try:
        asr = _jax_asr_cache.get(model_dir)
        if asr is None:
            from .models.whisper import WhisperASR

            asr = _jax_asr_cache[model_dir] = WhisperASR(model_dir)
        return asr.transcribe_wav(wav_path) or None
    except Exception:
        return None


def _whisper_local_provider(wav_path: str) -> str | None:
    """Transcribe with a locally-cached Whisper checkpoint via transformers.

    Only usable when the checkpoint is already on disk (this environment has
    no network); gated by :func:`_whisper_model_dir`.
    """
    model_dir = _whisper_model_dir()
    if model_dir is None:
        return None
    try:
        import numpy as np
        from transformers import pipeline

        from .audio import read_wav, resample, to_mono

        data, rate = read_wav(wav_path)
        mono = to_mono(data)
        audio16k = resample(mono, rate, 16_000).astype(np.float32)
        asr = pipeline(
            "automatic-speech-recognition", model=model_dir, device="cpu"
        )
        out = asr({"array": audio16k, "sampling_rate": 16_000})
        text = (out or {}).get("text", "").strip()
        return text or None
    except Exception:
        return None


def _whisper_model_dir() -> str | None:
    """A local ASR checkpoint directory, if the user provided one via
    QWEN3_TTS_ASR_MODEL or dropped one into models/asr/."""
    env = os.environ.get("QWEN3_TTS_ASR_MODEL")
    if env and os.path.isdir(env):
        return env
    from . import config

    local = os.path.join(config.MODELS_DIR, "asr")
    if os.path.isdir(local) and os.listdir(local):
        return local
    return None


def available_providers() -> list[str]:
    names = list(_providers)
    if _whisper_model_dir() is not None:
        names.append("whisper-local")
    return names


# Availability flag — same role as the reference's APPLE_SPEECH_AVAILABLE
# (transcription.py:7,22). Evaluated lazily because providers can be
# registered after import.
def asr_available() -> bool:
    return bool(available_providers())


ASR_AVAILABLE = asr_available()  # import-time snapshot for parity


def transcribe_wav(wav_path: str) -> str | None:
    """Transcribe ``wav_path`` with the first working provider, or None
    (contract parity with transcribe_wav_with_apple_speech,
    reference transcription.py:27-84)."""
    if not os.path.exists(wav_path):
        return None
    for fn in _providers.values():
        text = fn(wav_path)
        if text:
            return text
    if _whisper_model_dir() is not None:
        # the JAX (TPU-native) path is preferred; the transformers torch
        # pipeline remains as an explicit opt-in or silent fallback
        backend = os.environ.get("QWEN3_TTS_ASR_BACKEND", "jax")
        if backend != "torch":
            text = _whisper_jax_provider(wav_path)
            if text:
                return text
        return _whisper_local_provider(wav_path)
    return None


def offer_transcribe(wav_path: str) -> str | None:
    """Ask the user whether to auto-transcribe; returns the transcript or
    None (UX parity with _offer_apple_transcribe, reference
    transcription.py:87-105). UI import is lazy so this module stays
    dependency-light."""
    if not asr_available():
        return None
    from .ui import console, safe_line_input

    console.print(
        "[accent]Auto-transcribe this audio with the local ASR model? "
        "(y/n)[/accent]"
    )
    try:
        if safe_line_input("> ").strip().lower() not in ("y", "yes"):
            return None
    except (EOFError, KeyboardInterrupt):
        return None
    with console.status("[accent]Transcribing…[/accent]"):
        text = transcribe_wav(wav_path)
    if text:
        console.print(f"[ok]Transcript:[/ok] {text}")
    else:
        console.print("[warn]Transcription produced no text.[/warn]")
    return text
