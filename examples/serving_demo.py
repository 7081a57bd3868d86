#!/usr/bin/env python3
"""Multi-stream serving demo: N concurrent voices through one engine."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

if os.environ.get("QWEN3_TTS_CPU", "0") not in ("", "0"):  # force CPU (the TPU plugin preloads
    import jax                        # via sitecustomize, so plain
                                      # JAX_PLATFORMS env is too late)
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from qwen3_tts_tpu.engine import load_model  # noqa: E402
from qwen3_tts_tpu.runtime.prompts import build_prompt  # noqa: E402
from qwen3_tts_tpu.runtime.serving import ServingEngine  # noqa: E402

model = load_model("synthetic:tiny:custom")
engine = ServingEngine(model, max_streams=4)

texts = [
    "Stream one reporting in.",
    "Stream two, right behind.",
    "Three makes a crowd.",
    "Four voices, one chip.",
    "And a fifth, recycled into a freed slot.",
]
prompts = [
    build_prompt(
        model.tokenizer, "custom", t,
        voice=model.cfg.speakers[i % len(model.cfg.speakers)],
        speakers=model.cfg.speakers,
    )
    for i, t in enumerate(texts)
]

t0 = time.perf_counter()
results = engine.run(prompts, max_frames=24)
wall = time.perf_counter() - t0
total = sum(len(w) for w, _ in results) / model.cfg.codec.sample_rate
print(f"{len(results)} streams, {total:.1f}s audio in {wall:.1f}s "
      f"({total / wall:.1f}x realtime aggregate)")
for i, (wav, stream) in enumerate(results):
    ttfa = f"{stream.ttfa_s:.3f}s" if stream.ttfa_s is not None else "n/a"
    wf = wav.astype(np.float32) / 32767.0  # int16 PCM from the engine
    rms = float(np.sqrt(np.mean(wf**2))) if len(wf) else 0.0
    print(f"  stream {i}: slot={stream.slot} frames={stream.frames} "
          f"ttfa={ttfa} rms={rms:.3f}")
