"""io-layer tests (parity with reference tests/test_io.py: path sanitizing,
HF snapshot resolution), plus save_audio_file collision behaviour."""

import os

import numpy as np

from qwen3_tts_tpu import io as io_module
from qwen3_tts_tpu.audio import write_wav


def test_clean_path_strips_quotes_and_escapes():
    assert io_module.clean_path("  '/tmp/a b.wav'  ") == "/tmp/a b.wav"
    assert io_module.clean_path('"/tmp/x.wav"') == "/tmp/x.wav"
    assert io_module.clean_path("/tmp/a\\ b.wav") == "/tmp/a b.wav"


def test_get_smart_path_flat_layout(temp_dir):
    old = io_module.MODELS_DIR
    io_module.MODELS_DIR = temp_dir
    try:
        flat = os.path.join(temp_dir, "m1")
        os.makedirs(flat)
        assert io_module.get_smart_path("m1") == flat
        assert io_module.get_smart_path("missing") is None
    finally:
        io_module.MODELS_DIR = old


def test_get_smart_path_snapshot_layout(temp_dir):
    old = io_module.MODELS_DIR
    io_module.MODELS_DIR = temp_dir
    try:
        snap = os.path.join(temp_dir, "m2", "snapshots", "abc123")
        os.makedirs(snap)
        os.makedirs(os.path.join(temp_dir, "m2", "snapshots", ".hidden"))
        assert io_module.get_smart_path("m2") == snap
    finally:
        io_module.MODELS_DIR = old


def test_get_smart_path_empty_snapshots(temp_dir):
    old = io_module.MODELS_DIR
    io_module.MODELS_DIR = temp_dir
    try:
        os.makedirs(os.path.join(temp_dir, "m3", "snapshots"))
        assert io_module.get_smart_path("m3") is None
    finally:
        io_module.MODELS_DIR = old


def test_sanitize_snippet():
    s = io_module._sanitize_snippet("Hello, world! This is a long sentence.")
    assert len(s) <= io_module.FILENAME_MAX_LEN
    assert " " not in s and "," not in s
    assert io_module._sanitize_snippet("!!!") == "audio"


def test_save_audio_file_moves_and_collides(temp_dir, monkeypatch):
    monkeypatch.setattr(io_module, "BASE_OUTPUT_DIR", os.path.join(temp_dir, "out"))
    monkeypatch.setattr(io_module, "AUTO_PLAY", False)
    monkeypatch.setattr(io_module.time, "sleep", lambda s: None)
    monkeypatch.setattr(io_module, "clear_screen", lambda: None)

    # freeze the timestamp so the second save collides; capture the real
    # class before patching (io_module._dt IS the stdlib datetime module)
    import datetime as real_datetime

    frozen = real_datetime.datetime(2026, 1, 1, 12, 0, 0)

    class _FakeDT:
        @staticmethod
        def now():
            return frozen

    monkeypatch.setattr(io_module._dt, "datetime", _FakeDT)

    saved = []
    for _ in range(2):
        gen_dir = os.path.join(temp_dir, f"gen{len(saved)}")
        os.makedirs(gen_dir)
        write_wav(
            os.path.join(gen_dir, io_module.ENGINE_AUDIO_NAME),
            np.zeros(240, dtype=np.float32),
            24_000,
        )
        saved.append(io_module.save_audio_file(gen_dir, "Sub", "hello"))

    assert saved[0] is not None and saved[1] is not None
    assert saved[0] != saved[1]
    assert saved[1].endswith("_1.wav")
    assert os.path.exists(saved[0]) and os.path.exists(saved[1])


def test_save_audio_file_missing_audio(temp_dir, monkeypatch):
    monkeypatch.setattr(io_module, "BASE_OUTPUT_DIR", os.path.join(temp_dir, "out"))
    gen_dir = os.path.join(temp_dir, "empty_gen")
    os.makedirs(gen_dir)
    assert io_module.save_audio_file(gen_dir, "Sub", "hello") is None
