"""Native C++ audio kernels: build, numerical quality, and fallback parity.

Skipped wholesale when no C++ compiler is available (the same
availability-gating the library itself uses)."""

import numpy as np
import pytest

from qwen3_tts_tpu import native


requires_native = pytest.mark.skipif(
    not native.native_available(), reason="no C++ compiler / native lib"
)


def _sine(freq, rate, seconds=0.5):
    t = np.arange(int(rate * seconds)) / rate
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


@requires_native
def test_resample_length_and_tone_preservation():
    for src, dst in ((48_000, 24_000), (16_000, 24_000), (44_100, 24_000)):
        x = _sine(1000.0, src)
        y = native.resample_native(x, src, dst)
        expected_len = int(np.ceil(len(x) * dst / src))
        assert abs(len(y) - expected_len) <= 1
        # the resampled signal must still be a 1 kHz tone: project onto the
        # ideal quadrature pair and check captured energy (skip filter edges)
        n = len(y)
        t = np.arange(n) / dst
        body = slice(n // 8, -n // 8)
        c = np.sin(2 * np.pi * 1000.0 * t)[body]
        s = np.cos(2 * np.pi * 1000.0 * t)[body]
        yb = y[body].astype(np.float64)
        energy = np.sum(yb * yb)
        proj = (np.dot(yb, c) ** 2 / np.dot(c, c)
                + np.dot(yb, s) ** 2 / np.dot(s, s))
        assert proj / energy > 0.99, (src, dst, proj / energy)


@requires_native
def test_resample_antialiasing_on_downsample():
    # 20 kHz tone at 48 kHz is above the 12 kHz Nyquist of 24 kHz output:
    # a correct resampler must strongly attenuate it, not alias it.
    src, dst = 48_000, 24_000
    x = _sine(20_000.0, src)
    y = native.resample_native(x, src, dst)
    body = y[len(y) // 8: -len(y) // 8]
    in_rms = np.sqrt(np.mean(x.astype(np.float64) ** 2))
    out_rms = np.sqrt(np.mean(body.astype(np.float64) ** 2))
    assert out_rms < 0.02 * in_rms  # > 34 dB attenuation


@requires_native
def test_resample_identity():
    x = _sine(440.0, 24_000)
    y = native.resample_native(x, 24_000, 24_000)
    np.testing.assert_array_equal(x, y)


def test_pcm_roundtrip_matches_python():
    x = (np.random.default_rng(0).random(1000).astype(np.float32) - 0.5) * 2.2
    i16 = native.f32_to_i16(x)
    ref = np.clip(np.round(np.clip(x, -1, 1) * 32767.0), -32768, 32767)
    np.testing.assert_allclose(i16, ref.astype(np.int16), atol=1)
    back = native.i16_to_f32(i16)
    clipped = np.clip(x, -1, 1)
    # encode scales by 32767, decode by 1/32768 -> inherent 1-LSB asymmetry
    np.testing.assert_allclose(back, clipped, atol=2.5 / 32768)


def test_downmix_and_peak():
    stereo = np.stack(
        [_sine(440, 8000, 0.1), -_sine(440, 8000, 0.1)], axis=1
    )
    mono = native.downmix_mono(stereo)
    assert mono.shape == (stereo.shape[0],)
    np.testing.assert_allclose(mono, 0.0, atol=1e-6)
    assert native.peak(np.array([0.1, -0.7, 0.3], np.float32)) == pytest.approx(0.7)


def test_audio_resample_uses_chain():
    # the public resample() must produce a sane result whichever backend ran
    from qwen3_tts_tpu.audio.resample import resample

    x = _sine(1000.0, 48_000)
    y = resample(x, 48_000, 24_000)
    assert abs(len(y) - len(x) // 2) <= 1
    assert np.max(np.abs(y)) == pytest.approx(1.0, abs=0.15)


@requires_native
def test_f32_to_i16_fallback_bit_identical_to_native(monkeypatch):
    """wavio.py promises bit-identical WAV bytes with or without the native
    lib (ADVICE.md native/__init__.py:108): the pure-python fallback must
    match the C++ kernel on every value, including exact .5 rounding points
    and out-of-range clipping."""
    rng = np.random.default_rng(3)
    edges = np.array(
        [0.0, 1.0, -1.0, 2.0, -2.0,
         0.5 / 32767, -0.5 / 32767, 1.5 / 32767, -1.5 / 32767,
         2.5 / 32767, -2.5 / 32767],
        np.float32,
    )
    x = np.concatenate([edges, (rng.random(5000, np.float32) - 0.5) * 2.4])
    got_native = native.f32_to_i16(x)
    monkeypatch.setattr(native, "_load", lambda: None)
    got_fallback = native.f32_to_i16(x)
    np.testing.assert_array_equal(got_native, got_fallback)


def test_native_never_disables_all_kernels(monkeypatch):
    """QWEN3_TTS_NATIVE=never must make every wrapper take its numpy
    fallback (the knob governs the whole native data plane)."""
    import importlib

    import numpy as np

    import qwen3_tts_tpu.native as native

    monkeypatch.setenv("QWEN3_TTS_NATIVE", "never")
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", False)
    assert native._load() is None
    # fallbacks still give correct results
    x = np.array([0.0, 0.5, -0.5, 1.0], np.float32)
    assert native.f32_to_i16(x).tolist() == [0, 16384, -16384, 32767]
    stereo = np.array([[1.0, -1.0], [0.5, 0.5]], np.float32)
    np.testing.assert_allclose(native.downmix_mono(stereo), [0.0, 0.5])
