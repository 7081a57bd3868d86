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

# Force CPU with 8 virtual devices BEFORE any jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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
