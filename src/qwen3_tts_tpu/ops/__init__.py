"""Compute ops with backend dispatch: Pallas TPU kernels when running on TPU,
XLA reference implementations elsewhere (CPU tests, interpret mode).

The reference delegates every op to MLX's Metal kernels; here the hot ops —
int8 weight-only dequant matmul and KV-cache decode attention — are
first-class TPU kernels with numerically-equivalent XLA fallbacks used for
parity testing (SURVEY.md §4 "Pallas-vs-XLA-reference kernel parity").
"""

from __future__ import annotations

import os
from functools import lru_cache

from .quant import dequantize, quantize_weights  # noqa: F401
from .linear import linear, quantized_matmul  # noqa: F401


@lru_cache(maxsize=1)
def default_backend() -> str:
    import jax

    return jax.default_backend()


def use_pallas() -> bool:
    """Whether to lower hot ops through Pallas. Controlled by
    QWEN3_TTS_PALLAS = auto|always|never (default auto: TPU only)."""
    mode = os.environ.get("QWEN3_TTS_PALLAS", "auto")
    if mode == "always":
        return True
    if mode == "never":
        return False
    return default_backend() == "tpu"
