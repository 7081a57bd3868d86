"""The TPU inference engine — public API.

This package is what the reference outsourced to ``mlx_audio`` (SURVEY.md §1
EXT): its observable contract is exactly two functions,

- ``load_model(model_path) -> model``          (reference io.py:111-112)
- ``generate_audio(model=, text=, ...)``        (reference custom.py:163-170,
  design.py:76-81, clone.py:218-224) which writes ``audio_000.wav`` into
  ``output_path`` (reference io.py:156).

Everything underneath is new, TPU-native JAX: a quantized Qwen3-style talker
transformer, a residual-codebook predictor, a 12 Hz neural codec, Pallas
kernels and a jitted decode runtime.
"""

from .api import Qwen3TTSModel, generate_audio, load_model  # noqa: F401
