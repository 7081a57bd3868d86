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
