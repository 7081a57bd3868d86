"""WSOLA time-stretch: length contract, pitch preservation, engine wiring."""

import numpy as np
import pytest

from qwen3_tts_tpu.audio.stretch import time_stretch


def _tone(freq, sr, seconds):
    t = np.arange(int(sr * seconds)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


@pytest.mark.parametrize("rate", [0.8, 1.3, 1.5])
def test_stretch_length(rate):
    sr = 24_000
    x = _tone(220.0, sr, 1.0)
    y = time_stretch(x, rate, sr)
    assert abs(len(y) - len(x) / rate) < 0.1 * len(x)


def test_stretch_preserves_pitch():
    sr = 24_000
    freq = 440.0
    x = _tone(freq, sr, 1.0)
    y = time_stretch(x, 1.5, sr)
    # dominant frequency must stay at 440 Hz (speed, not pitch, changes)
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak = np.argmax(spec) * sr / len(y)
    assert abs(peak - freq) < 15.0


def test_identity_rate_passthrough():
    x = _tone(100.0, 8000, 0.2)
    np.testing.assert_array_equal(time_stretch(x, 1.0, 8000), x)


def test_generate_audio_applies_speed(temp_dir):
    jax = pytest.importorskip("jax")
    from qwen3_tts_tpu.engine import generate_audio, load_model

    model = load_model("synthetic:tiny:custom")
    m1 = generate_audio(
        model=model, text="Same text for both runs.", voice="ryan",
        speed=1.0, output_path=temp_dir, file_name="normal.wav",
        max_frames=12, seed=7,
    )
    m2 = generate_audio(
        model=model, text="Same text for both runs.", voice="ryan",
        speed=1.5, output_path=temp_dir, file_name="fast.wav",
        max_frames=12, seed=7,
    )
    # same frames generated, but the fast file is ~1/1.5 the duration
    ratio = m2["audio_s"] / m1["audio_s"]
    assert 0.55 < ratio < 0.8


def test_short_input_stretches_without_crashing():
    import numpy as np

    from qwen3_tts_tpu.audio.stretch import time_stretch

    x = np.sin(np.linspace(0, 20, 500)).astype(np.float32)  # < one frame
    out = time_stretch(x, 1.3, 24000)
    assert len(out) > 0
    out2 = time_stretch(x, 0.8, 24000)
    assert len(out2) > 0


def test_absurd_rate_raises():
    import numpy as np
    import pytest

    from qwen3_tts_tpu.audio.stretch import time_stretch

    x = np.zeros(24000, np.float32)
    with pytest.raises(ValueError, match="speed rate"):
        time_stretch(x, 0.0, 24000)
