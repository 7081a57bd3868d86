"""ctypes bindings for the native C++ audio data plane.

Availability-gated exactly like the reference gates its PyObjC bridges
(/root/reference/src/qwen3_tts/apple_audio.py:24-29, transcription.py:7-24):
``native_available()`` is False when no compiler exists and every consumer
falls back to the pure-Python path. The library is compiled once on first
use (g++ -O3 -shared) and cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_TRIED = False

ABI_VERSION = 1


def _load() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        # QWEN3_TTS_NATIVE=never disables EVERY native kernel (resampler,
        # PCM, downmix) — all wrappers fall back to numpy together
        if os.environ.get("QWEN3_TTS_NATIVE", "auto") == "never":
            _TRIED = True
            return None
        _TRIED = True
        try:
            from .build import ensure_built

            path = ensure_built()
            if path is None:
                return None
            lib = ctypes.CDLL(path)
            lib.q3tts_abi_version.restype = ctypes.c_int
            if lib.q3tts_abi_version() != ABI_VERSION:
                return None
            lib.q3tts_resample_out_len.restype = ctypes.c_longlong
            lib.q3tts_resample_out_len.argtypes = [
                ctypes.c_longlong, ctypes.c_int, ctypes.c_int,
            ]
            lib.q3tts_resample.restype = ctypes.c_longlong
            lib.q3tts_resample.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
            ]
            lib.q3tts_f32_to_i16.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
                ctypes.POINTER(ctypes.c_int16),
            ]
            lib.q3tts_i16_to_f32.argtypes = [
                ctypes.POINTER(ctypes.c_int16), ctypes.c_longlong,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.q3tts_downmix_mono.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ]
            lib.q3tts_peak.restype = ctypes.c_float
            lib.q3tts_peak.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def native_available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i16ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))


def resample_native(
    samples: np.ndarray, src_rate: int, dst_rate: int
) -> np.ndarray | None:
    """Windowed-sinc polyphase resample (float32 mono). None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(samples, dtype=np.float32)
    n_out = lib.q3tts_resample_out_len(len(x), src_rate, dst_rate)
    out = np.empty(int(n_out), dtype=np.float32)
    written = lib.q3tts_resample(
        _fptr(x), len(x), src_rate, dst_rate, _fptr(out), len(out)
    )
    if written < 0:
        return None
    return out[: int(written)]


def f32_to_i16(samples: np.ndarray) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(samples, dtype=np.float32)
    if lib is None:  # pure-python fallback, bit-identical to the C++ kernel:
        # clamp to [-1, 1], scale, round half AWAY FROM ZERO, truncate-cast
        scaled = np.clip(x, -1.0, 1.0) * np.float32(32767.0)
        adj = np.where(
            scaled >= 0, scaled + np.float32(0.5), scaled - np.float32(0.5)
        )
        return adj.astype(np.int16)
    out = np.empty(len(x), dtype=np.int16)
    lib.q3tts_f32_to_i16(_fptr(x), len(x), _i16ptr(out))
    return out


def i16_to_f32(samples: np.ndarray) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(samples, dtype=np.int16)
    if lib is None:
        return (x.astype(np.float32)) / 32768.0
    out = np.empty(len(x), dtype=np.float32)
    lib.q3tts_i16_to_f32(_i16ptr(x), len(x), _fptr(out))
    return out


def downmix_mono(samples: np.ndarray) -> np.ndarray:
    """Interleaved [frames, channels] (or [n]) float32 -> mono [frames]."""
    x = np.ascontiguousarray(samples, dtype=np.float32)
    if x.ndim == 1:
        return x
    frames, channels = x.shape
    lib = _load()
    if lib is None:
        return x.mean(axis=1).astype(np.float32)
    out = np.empty(frames, dtype=np.float32)
    lib.q3tts_downmix_mono(_fptr(x), frames, channels, _fptr(out))
    return out


def peak(samples: np.ndarray) -> float:
    x = np.ascontiguousarray(samples, dtype=np.float32)
    lib = _load()
    if lib is None:
        return float(np.max(np.abs(x))) if len(x) else 0.0
    return float(lib.q3tts_peak(_fptr(x), len(x)))
