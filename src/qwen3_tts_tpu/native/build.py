"""Build the native audio library on first use.

A deliberate one-file g++ invocation instead of a packaging system: the
library is a single translation unit with no dependencies, and TPU hosts in
CI may lack network access for build backends. The compiled .so is cached
under ``~/.cache/qwen3_tts_tpu`` keyed by a source hash, so rebuilds happen
only when the source changes.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import subprocess

_SRC = os.path.join(os.path.dirname(__file__), "audio_kernels.cpp")


def _cache_dir() -> str:
    root = os.environ.get(
        "QWEN3_TTS_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "qwen3_tts_tpu"),
    )
    os.makedirs(root, exist_ok=True)
    return root


def _src_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


def ensure_built() -> str | None:
    """Compile (if needed) and return the .so path, or None when no
    compiler is available."""
    if not os.path.exists(_SRC):
        return None
    out = os.path.join(_cache_dir(), f"libq3tts_audio_{_src_hash()}.so")
    if os.path.exists(out):
        return out
    cxx = os.environ.get("CXX") or shutil.which("g++") or shutil.which("clang++")
    if cxx is None:
        return None
    # pid-unique temp name: two cold-starting processes must never compile
    # into the SAME path (interleaved g++ output would cache a corrupt .so
    # under the hash key forever)
    tmp = os.path.join(
        _cache_dir(), f".build_{os.getpid()}_{_src_hash()}.so"
    )
    cmd = [
        cxx, "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", tmp, _SRC,
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, timeout=120)
        if proc.returncode != 0:
            return None
        os.replace(tmp, out)  # atomic: concurrent builders converge
        return out
    except (OSError, subprocess.SubprocessError):
        return None
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass
