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


def enable_compilation_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache so the flagship graphs
    (tens of minutes of XLA time through a remote-compile service) compile
    once per machine instead of once per process. Safe to call repeatedly."""
    import os

    import jax

    if path is None:
        path = os.environ.get(
            "QWEN3_TTS_JAX_CACHE",
            os.path.join(
                os.path.expanduser("~"), ".cache", "qwen3_tts_tpu", "jax_cache"
            ),
        )
    os.makedirs(path, exist_ok=True)
    # QWEN3_TTS_JAX_CACHE_MIN_S: tiny-config runs (tests, CPU smoke
    # subprocesses) set 0 so their sub-second compiles cache too; the
    # default 5 s keeps flagship-only caching for production processes.
    min_s = float(os.environ.get("QWEN3_TTS_JAX_CACHE_MIN_S", 5.0))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", min_s)
        if min_s <= 0:
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without the persistent cache — silently skip
