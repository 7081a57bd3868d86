"""Voice-library tests (parity with reference tests/test_voices.py)."""

import os

from qwen3_tts_tpu import voices as voices_module


def test_get_saved_voices_empty(voices_dir):
    old = voices_module.VOICES_DIR
    voices_module.VOICES_DIR = os.path.join(voices_dir, "none")
    try:
        assert voices_module.get_saved_voices() == []
    finally:
        voices_module.VOICES_DIR = old


def test_get_saved_voices_sorted_and_filtered(voices_dir):
    old = voices_module.VOICES_DIR
    voices_module.VOICES_DIR = voices_dir
    try:
        for fname in ("zeta.wav", "alpha.wav", "notes.txt", "ignore.mp3", ".h.wav"):
            with open(os.path.join(voices_dir, fname), "wb") as fh:
                fh.write(b"\x00")
        assert voices_module.get_saved_voices() == ["alpha", "zeta"]
    finally:
        voices_module.VOICES_DIR = old


def test_sanitize_voice_name():
    f = voices_module.sanitize_voice_name
    assert f("My Voice!") == "My_Voice"
    assert f("  a  b  ") == "a_b"
    assert f("ok-name_1") == "ok-name_1"
    assert f("///") == ""


def test_voice_paths_and_transcript(voices_dir):
    old = voices_module.VOICES_DIR
    voices_module.VOICES_DIR = voices_dir
    try:
        wav, txt = voices_module.voice_paths("sam")
        assert wav.endswith("sam.wav") and txt.endswith("sam.txt")
        assert voices_module.load_voice_transcript("sam") is None
        with open(txt, "w") as fh:
            fh.write("  hello there \n")
        assert voices_module.load_voice_transcript("sam") == "hello there"
    finally:
        voices_module.VOICES_DIR = old
