#!/usr/bin/env python3
"""Engine API walkthrough: the three generation modes.

Runs with the weightless synthetic model so it works anywhere; point
``load_model`` at a real checkpoint directory (HF/MLX snapshot or native
format) for actual speech.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

if os.environ.get("QWEN3_TTS_CPU", "0") not in ("", "0"):  # force CPU (the TPU plugin preloads
    import jax                        # via sitecustomize, so plain
                                      # JAX_PLATFORMS env is too late)
    jax.config.update("jax_platforms", "cpu")

from qwen3_tts_tpu.engine import generate_audio, load_model  # noqa: E402

out = tempfile.mkdtemp(prefix="q3tts_demo_")
model = load_model("synthetic:tiny:custom")

# 1. Custom Voice: preset speaker + emotion + speed
m = generate_audio(
    model=model,
    text="Hello! This is the custom voice mode.",
    voice="serena",
    instruct="Excited and happy, speaking very fast",
    speed=1.2,
    output_path=out,
    file_name="custom.wav",
)
print("custom  :", {k: round(v, 3) if isinstance(v, float) else v for k, v in m.items()})

# 2. Voice Design: voice from a description
design = load_model("synthetic:tiny:design")
m = generate_audio(
    model=design,
    text="A voice built from words alone.",
    instruct="An elderly storyteller with a warm, gravelly voice",
    output_path=out,
    file_name="design.wav",
)
print("design  :", round(m["rtf"], 3), "x realtime")

# 3. Voice Cloning: clone from the audio we just generated
base = load_model("synthetic:tiny:base")
m = generate_audio(
    model=base,
    text="And this is a cloned voice speaking.",
    ref_audio=os.path.join(out, "custom.wav"),
    ref_text="Hello! This is the custom voice mode.",
    output_path=out,
    file_name="clone.wav",
)
print("clone   :", round(m["rtf"], 3), "x realtime")
print("outputs :", sorted(os.listdir(out)))
