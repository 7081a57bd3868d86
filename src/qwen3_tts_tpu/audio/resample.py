"""Sample-rate conversion and audio-format normalisation.

TPU-native replacement for the reference's conversion chain (ffmpeg ->
AVFoundation/afconvert, /root/reference/src/qwen3_tts/io.py:231-286 and
apple_audio.py:32-204). Here the built-in converter is a windowed-sinc
polyphase resampler (scipy.signal.resample_poly); ffmpeg, when present on the
host, is still preferred for non-WAV container formats — the same
"external tool first, built-in fallback" dispatch the reference uses.
"""

from __future__ import annotations

import math
import os
import shutil
import subprocess
import tempfile

import numpy as np
from scipy.signal import resample_poly

from .wavio import read_wav, to_mono, wav_info, write_wav

#: extensions the built-in WAV path can read directly
_WAV_EXTS = {".wav", ".wave"}


def resample(samples: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Polyphase resample float32 mono audio from src_rate to dst_rate.

    Prefers the native C++ windowed-sinc kernel (native/audio_kernels.cpp);
    falls back to scipy's resample_poly when no compiler is available.
    Disable the native path with QWEN3_TTS_NATIVE=never.
    """
    if src_rate == dst_rate:
        return np.asarray(samples, dtype=np.float32)
    if os.environ.get("QWEN3_TTS_NATIVE", "auto") != "never":
        from ..native import resample_native

        out = resample_native(samples, int(src_rate), int(dst_rate))
        if out is not None:
            return out
    g = math.gcd(int(src_rate), int(dst_rate))
    up, down = dst_rate // g, src_rate // g
    out = resample_poly(np.asarray(samples, dtype=np.float64), up, down)
    return out.astype(np.float32)


def _ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def _convert_with_ffmpeg(input_path: str, out_path: str, sample_rate: int) -> bool:
    """ffmpeg -> mono 16-bit PCM WAV at sample_rate. Returns success.

    Mirrors the reference's ffmpeg invocation semantics (io.py:253-275)."""
    try:
        proc = subprocess.run(
            [
                "ffmpeg", "-y", "-v", "error",
                "-i", input_path,
                "-ar", str(sample_rate),
                "-ac", "1",
                "-c:a", "pcm_s16le",
                out_path,
            ],
            capture_output=True,
            timeout=120,
        )
        return proc.returncode == 0 and os.path.exists(out_path)
    except (OSError, subprocess.SubprocessError):
        return False


def convert_to_wav(input_path: str, sample_rate: int = 24_000) -> str | None:
    """Normalise any supported audio file to mono 16-bit PCM WAV at
    ``sample_rate``.

    Contract parity with the reference's convert_to_wav
    (apple_audio.py:32-90) and convert_audio_if_needed (io.py:231-286):

    - already-compliant WAVs are passed through unchanged (the original path
      is returned and the caller must NOT delete it);
    - otherwise a new temp file is produced and its path returned (the caller
      owns and eventually deletes it);
    - ``None`` on failure.
    """
    if not os.path.exists(input_path):
        return None

    ext = os.path.splitext(input_path)[1].lower()

    if ext in _WAV_EXTS:
        try:
            info = wav_info(input_path)
        except Exception:  # malformed header — fall through to converters
            info = None
        if (
            info is not None
            and info.sample_rate == sample_rate
            and info.channels == 1
            and info.sampwidth == 2
        ):
            return input_path  # pass-through (reference io.py:243-249)

    fd, out_path = tempfile.mkstemp(prefix="q3tts_conv_", suffix=".wav")
    os.close(fd)

    # 1) external converter first for container formats / as generic path
    if _ffmpeg_available() and _convert_with_ffmpeg(input_path, out_path, sample_rate):
        return out_path

    # 2) built-in: stdlib WAV decode + polyphase resample
    if ext in _WAV_EXTS:
        try:
            data, rate = read_wav(input_path)
            mono = to_mono(data)
            out = resample(mono, rate, sample_rate)
            write_wav(out_path, out, sample_rate)
            return out_path
        except Exception:
            pass

    # cleanup the temp file on failure
    try:
        os.remove(out_path)
    except OSError:
        pass
    return None
