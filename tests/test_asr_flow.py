"""End-to-end ASR-assisted voice enrollment (VERDICT.md next #10).

Drives the full flow the reference offers on macOS (voices.py:109-129 +
transcription.py:87-105 there): enroll a voice, leave the transcript empty,
accept the auto-transcription offer, and end with a saved wav/txt pair whose
transcript came from the ASR provider — all offline, via a registered fake
provider (the provider registry is the extension point a real on-TPU ASR
model plugs into)."""

import os

import numpy as np
import pytest

import qwen3_tts_tpu.transcription as transcription
import qwen3_tts_tpu.ui as ui_module
import qwen3_tts_tpu.voices as voices_module


class ScriptedInput:
    def __init__(self, lines):
        self.lines = list(lines)

    def __call__(self, prompt=""):
        if not self.lines:
            raise EOFError
        return self.lines.pop(0)


@pytest.fixture
def ref_wav(temp_dir):
    from qwen3_tts_tpu.audio import write_wav

    path = os.path.join(temp_dir, "sample.wav")
    t = np.arange(12_000) / 24_000.0
    write_wav(path, (0.25 * np.sin(2 * np.pi * 330 * t)).astype(np.float32),
              24_000)
    return path


def test_enroll_with_asr_transcription(monkeypatch, temp_dir, ref_wav):
    seen = {}

    def fake_provider(wav_path):
        seen["path"] = wav_path
        return "hello spoken words"

    monkeypatch.setattr(transcription, "_providers", {"fake": fake_provider})
    voices_dir = os.path.join(temp_dir, "voices")
    os.makedirs(voices_dir)
    monkeypatch.setattr(voices_module, "VOICES_DIR", voices_dir)
    # scripted UX: name -> audio path -> empty transcript (triggers the ASR
    # offer) ... then "y" to the offer prompt (asked via ui.safe_line_input)
    monkeypatch.setattr(
        voices_module, "safe_line_input",
        ScriptedInput(["myvoice", ref_wav, ""]),
    )
    monkeypatch.setattr(ui_module, "safe_line_input", ScriptedInput(["y"]))

    name = voices_module.enroll_new_voice()
    assert name == "myvoice"
    assert os.path.exists(os.path.join(voices_dir, "myvoice.wav"))
    with open(os.path.join(voices_dir, "myvoice.txt")) as f:
        assert f.read().strip() == "hello spoken words"
    assert seen["path"].endswith(".wav")  # provider got the converted audio
    assert voices_module.get_saved_voices() == ["myvoice"]


def test_enroll_declining_asr_keeps_no_transcript_sentinel(
    monkeypatch, temp_dir, ref_wav
):
    monkeypatch.setattr(
        transcription, "_providers", {"fake": lambda p: "unused"}
    )
    voices_dir = os.path.join(temp_dir, "voices")
    os.makedirs(voices_dir)
    monkeypatch.setattr(voices_module, "VOICES_DIR", voices_dir)
    monkeypatch.setattr(
        voices_module, "safe_line_input",
        ScriptedInput(["novoice", ref_wav, ""]),
    )
    monkeypatch.setattr(ui_module, "safe_line_input", ScriptedInput(["n"]))

    name = voices_module.enroll_new_voice()
    assert name == "novoice"
    assert os.path.exists(os.path.join(voices_dir, "novoice.wav"))
