"""Audio substrate tests: WAV round-trips, resampling, conversion dispatch
(replaces the platform-gated reference tests/test_apple_audio.py with
portable equivalents)."""

import os

import numpy as np
import pytest

from qwen3_tts_tpu.audio import (
    convert_to_wav,
    read_wav,
    resample,
    wav_info,
    write_wav,
)
from qwen3_tts_tpu.audio.wavio import to_mono


def _sine(rate, seconds=0.25, freq=440.0):
    t = np.arange(int(rate * seconds)) / rate
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_wav_roundtrip(temp_dir):
    path = os.path.join(temp_dir, "a.wav")
    x = _sine(24_000)
    write_wav(path, x, 24_000)
    y, rate = read_wav(path)
    assert rate == 24_000
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1.0 / 32000)


def test_wav_info(temp_dir):
    path = os.path.join(temp_dir, "b.wav")
    write_wav(path, _sine(24_000, 0.5), 24_000)
    info = wav_info(path)
    assert info.sample_rate == 24_000
    assert info.channels == 1
    assert info.sampwidth == 2
    assert abs(info.duration_s - 0.5) < 1e-6


def test_stereo_to_mono(temp_dir):
    path = os.path.join(temp_dir, "st.wav")
    left = _sine(24_000)
    stereo = np.stack([left, -left], axis=1)
    write_wav(path, stereo, 24_000)
    data, _ = read_wav(path)
    assert data.ndim == 2 and data.shape[1] == 2
    mono = to_mono(data)
    assert np.abs(mono).max() < 1e-3  # L and R cancel


def test_resample_preserves_tone():
    x = _sine(48_000, 0.5)
    y = resample(x, 48_000, 24_000)
    assert abs(len(y) - 12_000) <= 2
    # a 440 Hz tone survives 2:1 decimation with ~unchanged RMS
    rms_in = float(np.sqrt(np.mean(x**2)))
    rms_out = float(np.sqrt(np.mean(y**2)))
    assert abs(rms_in - rms_out) / rms_in < 0.05


def test_resample_identity():
    x = _sine(24_000)
    y = resample(x, 24_000, 24_000)
    np.testing.assert_array_equal(x, y)


def test_convert_passthrough(temp_dir):
    path = os.path.join(temp_dir, "ok.wav")
    write_wav(path, _sine(24_000), 24_000)
    out = convert_to_wav(path, 24_000)
    assert out == path  # compliant file passes through untouched


def test_convert_resamples(temp_dir):
    path = os.path.join(temp_dir, "hi.wav")
    write_wav(path, _sine(48_000), 48_000)
    out = convert_to_wav(path, 24_000)
    assert out is not None and out != path
    try:
        info = wav_info(out)
        assert info.sample_rate == 24_000
        assert info.channels == 1
    finally:
        os.remove(out)


def test_convert_stereo_to_mono(temp_dir):
    path = os.path.join(temp_dir, "st2.wav")
    x = _sine(44_100)
    write_wav(path, np.stack([x, x], axis=1), 44_100)
    out = convert_to_wav(path, 24_000)
    assert out is not None and out != path
    try:
        info = wav_info(out)
        assert info.channels == 1 and info.sample_rate == 24_000
    finally:
        os.remove(out)


def test_convert_missing_file():
    assert convert_to_wav("/nonexistent/file.wav") is None
