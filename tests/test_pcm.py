"""Device-side PCM16 quantization (ops/pcm.py) vs the host quantizer
(native.f32_to_i16 and its numpy fallback) — must be bit-identical, since
the decode hot loop now ships int16 from the device straight into the WAV
writer (audio/wavio.py int16 passthrough)."""

import numpy as np

from qwen3_tts_tpu.native import f32_to_i16
from qwen3_tts_tpu.ops.pcm import pcm16_to_f32, wav_to_pcm16


def _cases() -> np.ndarray:
    rng = np.random.default_rng(0)
    smooth = rng.uniform(-1.2, 1.2, 4096).astype(np.float32)  # incl. clipping
    # exact rounding edges: k + 0.5 LSB on both sides of zero
    k = np.arange(-32768, 32768, 257, dtype=np.float32)
    edges = (k + 0.5) / np.float32(32767.0)
    tiny = np.array([0.0, -0.0, 1.0, -1.0, 0.5 / 32767, -0.5 / 32767],
                    np.float32)
    return np.concatenate([smooth, edges, tiny])


def test_device_pcm_matches_host_quantizer():
    x = _cases()
    dev = np.asarray(wav_to_pcm16(x))
    host = f32_to_i16(x)
    np.testing.assert_array_equal(dev, host)


def test_pcm_roundtrip_through_float_is_stable():
    """i16 -> f32 -> i16 must reproduce the ORIGINAL ints exactly: the write
    path may convert PCM to float (e.g. WSOLA input) and re-quantize."""
    i = np.arange(-32767, 32768, 13, dtype=np.int16)
    f = pcm16_to_f32(i)
    np.testing.assert_array_equal(f32_to_i16(f), i)


def test_decode_emits_int16():
    from qwen3_tts_tpu.engine import configs
    from qwen3_tts_tpu.engine.api import Qwen3TTSModel
    from qwen3_tts_tpu.runtime.prompts import PromptSpec

    model = Qwen3TTSModel.synthetic(configs.tiny("custom"), seed=0)
    res = model.generator.synthesize(
        PromptSpec(text_tokens=np.arange(8, dtype=np.int32)),
        max_frames=4, seed=0,
    )
    assert res.wav.dtype == np.int16
    assert len(res.wav) == res.frames * model.cfg.codec.hop
