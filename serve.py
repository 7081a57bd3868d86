"""Launcher for the HTTP serving daemon (src/qwen3_tts_tpu/server.py).

Mirrors app.py's sys.path bootstrap so it runs from a checkout without
installing the package:  python serve.py --model synthetic --port 8080
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "src"))

import jax  # noqa: E402

# QWEN3_TTS_CPU forces the CPU backend via jax.config (the TPU plugin
# preloads through sitecustomize, so a plain JAX_PLATFORMS env var is too
# late) — same escape hatch as the examples.
if os.environ.get("QWEN3_TTS_CPU", "0") not in ("", "0") or os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from qwen3_tts_tpu.server import main  # noqa: E402

if __name__ == "__main__":
    main()
