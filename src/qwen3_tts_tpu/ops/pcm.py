"""Device-side 16-bit PCM quantization.

The decode hot loop's host fetch is dominated by waveform bytes: one serving
chunk hauls ``[B, chunk*hop]`` float32 samples through the host<->device
link, and on a tunneled TPU that link (~10 MB/s + 20-100 ms latency,
CLAUDE.md) is the serving throughput floor. The final artifact is 16-bit PCM
WAV anyway (reference io.py:156 contract), so the fused decode steps convert
on device and the host fetches HALF the bytes.

``wav_to_pcm16`` is bit-identical to the host-side quantizer
(``native.f32_to_i16`` / its numpy fallback, native/audio_kernels.cpp):
clamp to [-1, 1], scale by 32767, round half away from zero, truncate-cast.
All arithmetic is float32 on both sides, so device and host agree exactly;
tests/test_pcm.py sweeps the rounding edges.
"""

from __future__ import annotations

import jax.numpy as jnp


def wav_to_pcm16(x: jnp.ndarray) -> jnp.ndarray:
    """Float waveform in [-1, 1] -> int16 PCM, matching native.f32_to_i16."""
    scaled = jnp.clip(x.astype(jnp.float32), -1.0, 1.0) * jnp.float32(32767.0)
    adj = jnp.where(
        scaled >= 0, scaled + jnp.float32(0.5), scaled - jnp.float32(0.5)
    )
    return adj.astype(jnp.int16)  # float->int converts toward zero (as C)


def pcm16_to_f32(x) -> "np.ndarray":  # noqa: F821 - host-side numpy helper
    """Host-side int16 PCM -> float32 in [-1, 1], exact wav_to_pcm16 inverse.

    Divides by 32767 (NOT the audio-input path's /32768, native.i16_to_f32)
    so that re-quantizing an unmodified signal reproduces the original ints
    bit-exactly: |i/32767*32767 - i| <= 32767*2^-23 << 0.5, so the
    round-half-away-from-zero always lands back on i (tests/test_pcm.py).
    """
    import numpy as np

    return np.asarray(x, np.float32) / np.float32(32767.0)
