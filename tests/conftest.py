"""Shared fixtures and environment setup for the test suite.

The suite follows the reference's strategy (SURVEY.md §4): pure-Python unit
tests that need no accelerator or weights — plus, unlike the reference, numeric
engine tests on tiny model configs. All JAX work runs on a virtual 8-device
CPU mesh so sharding code is exercised without TPU hardware; the env vars must
be set before JAX initialises its backends, hence at conftest import time.
"""

import os
import shutil
import sys
import tempfile

# Force CPU with 8 virtual devices. NOTE: this image preloads a TPU plugin
# via sitecustomize before any user code runs, so env vars set here are too
# late — the jax.config API is the reliable lever (backends aren't
# initialised until first use, which happens after conftest import).
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # fall back to XLA_FLAGS if this jax version lacks the option

# Persistent compilation cache: the suite is compile-bound (hundreds of
# tiny-config jits, many identical across files and across runs). Sharing
# one on-disk cache across xdist workers AND across pytest invocations cuts
# the wall-clock dramatically after the first run. The cache key includes
# XLA flags/backend, so the 8-device-CPU entries never collide with TPU
# runs. Opt out with QWEN3_TTS_TEST_JAX_CACHE=0 (e.g. to measure cold
# compiles).
_cache_dir = os.environ.get(
    "QWEN3_TTS_TEST_JAX_CACHE",
    os.path.join(os.path.dirname(__file__), ".jax_cache"),
)
if _cache_dir != "0":
    os.makedirs(_cache_dir, exist_ok=True)
    # XLA:CPU AOT cache loads LOG(ERROR) a benign machine-feature complaint
    # (the compile side records pseudo-features like +prefer-no-scatter that
    # the host probe never reports) — one paragraph PER LOAD. Same machine,
    # same binary: silence C++ logging for test runs.
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # default min-compile-time is 1s: most tiny-config compiles here
        # are 0.1-1s but there are hundreds of them — cache everything.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without the persistent cache — run uncached
    # Subprocesses spawned by tests (bench.py tiny children, serve.py,
    # dress_rehearsal.py, the dryrun CLI) call
    # engine.enable_compilation_cache(): point them at THIS cache with a
    # zero min-compile-time so their sub-second tiny-config compiles hit
    # disk across tests and invocations instead of recompiling cold.
    os.environ.setdefault("QWEN3_TTS_JAX_CACHE", _cache_dir)
    os.environ.setdefault("QWEN3_TTS_JAX_CACHE_MIN_S", "0")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import pytest  # noqa: E402


@pytest.fixture
def temp_dir():
    path = tempfile.mkdtemp(prefix="q3tts_test_")
    try:
        yield path
    finally:
        shutil.rmtree(path, ignore_errors=True)


@pytest.fixture
def voices_dir(temp_dir):
    yield temp_dir
