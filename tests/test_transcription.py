"""ASR provider registry: availability gating, dispatch, fallback order
(contract parity with the reference's availability-flag pattern,
reference transcription.py:7,22-24)."""

import os
import wave

import numpy as np
import pytest

from qwen3_tts_tpu import transcription


@pytest.fixture(autouse=True)
def _clean_registry():
    saved = dict(transcription._providers)
    transcription._providers.clear()
    try:
        yield
    finally:
        transcription._providers.clear()
        transcription._providers.update(saved)


@pytest.fixture
def tiny_wav(temp_dir):
    path = os.path.join(temp_dir, "ref.wav")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(24_000)
        w.writeframes(np.zeros(2400, np.int16).tobytes())
    return path


def test_unavailable_by_default(monkeypatch):
    monkeypatch.delenv("QWEN3_TTS_ASR_MODEL", raising=False)
    monkeypatch.setattr(transcription, "_whisper_model_dir", lambda: None)
    assert not transcription.asr_available()
    assert transcription.available_providers() == []


def test_registered_provider_is_used(tiny_wav, monkeypatch):
    monkeypatch.setattr(transcription, "_whisper_model_dir", lambda: None)
    transcription.register_provider("stub", lambda p: "hello world")
    assert transcription.asr_available()
    assert transcription.transcribe_wav(tiny_wav) == "hello world"


def test_provider_fallback_order(tiny_wav, monkeypatch):
    monkeypatch.setattr(transcription, "_whisper_model_dir", lambda: None)
    transcription.register_provider("bad", lambda p: None)
    transcription.register_provider("good", lambda p: "from good")
    assert transcription.transcribe_wav(tiny_wav) == "from good"


def test_missing_file_returns_none():
    transcription.register_provider("stub", lambda p: "x")
    assert transcription.transcribe_wav("/nonexistent.wav") is None


def test_whisper_dir_from_env(monkeypatch, temp_dir):
    monkeypatch.setenv("QWEN3_TTS_ASR_MODEL", temp_dir)
    assert transcription._whisper_model_dir() == temp_dir
    assert "whisper-local" in transcription.available_providers()
