"""Linear/matmul ops with quantized-weight support and backend dispatch.

``linear`` is the single entry point the model layers use; it routes to
- a Pallas fused dequant-matmul on TPU (ops/pallas_matmul.py), or
- the XLA reference path (dequantize + dot) elsewhere.

Weights follow the ``[out, in]`` convention; activations are ``[..., in]``;
the contraction is x @ W^T with float32 accumulation on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quant import dequantize, is_quantized


def _dense_matmul(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """x [..., in] @ w[out, in]^T -> [..., out], f32 accumulation."""
    return jax.lax.dot_general(
        x,
        w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def quantized_matmul_xla(
    x: jnp.ndarray,
    q: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
) -> jnp.ndarray:
    """Reference implementation: dequantize to the activation dtype, then a
    dense matmul. Numerically defines what the Pallas kernel must match."""
    w = dequantize({"q": q, "scale": scale, "bias": bias}, dtype=x.dtype)
    return _dense_matmul(x, w)


def quantized_matmul(
    x: jnp.ndarray,
    q: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
) -> jnp.ndarray:
    """Fused weight-dequant matmul: x [..., in] × affine-quantized W[out, in].

    On TPU this lowers to a Pallas kernel that streams uint8 weights from HBM
    and dequantizes in VMEM (the decode hot path is HBM-bandwidth-bound, so
    keeping weights int8 end-to-end is the single biggest perf lever —
    SURVEY.md §7 "hard parts" #3/#4).
    """
    from . import use_pallas

    if use_pallas():
        from .pallas_matmul import quantized_matmul_pallas

        return quantized_matmul_pallas(x, q, scale, bias)
    return quantized_matmul_xla(x, q, scale, bias)


def linear(x: jnp.ndarray, params: dict) -> jnp.ndarray:
    """Apply a (possibly quantized) linear layer parameter dict to x.

    When the dict carries LoRA adapters (``lora_a`` [r, in], ``lora_b``
    [out, r], ``lora_scale`` scalar — see training/lora.py) the low-rank
    delta ``scale * (x A^T) B^T`` is added: two skinny matmuls, negligible
    next to the base weight streaming. Inference deployments merge the
    delta into the base weight instead (training.lora.merge_lora), so this
    branch is trace-time only — absent adapters cost nothing."""
    from .grouped_qmv import is_grouped

    if is_grouped(params):
        from . import use_pallas
        from .grouped_qmv import (
            quantized_matmul_grouped,
            quantized_matmul_grouped_xla,
        )

        fn = (quantized_matmul_grouped if use_pallas()
              else quantized_matmul_grouped_xla)
        out = fn(x, params["qg"], params["sg"], params["bg"])
    elif is_quantized(params):
        out = quantized_matmul(x, params["q"], params["scale"], params["bias"])
    else:
        out = _dense_matmul(x, jnp.asarray(params["w"], dtype=x.dtype))
    if "lora_a" in params:
        a = jnp.asarray(params["lora_a"], dtype=x.dtype)
        b = jnp.asarray(params["lora_b"], dtype=x.dtype)
        delta = _dense_matmul(_dense_matmul(x, a), b)
        out = out + params["lora_scale"].astype(x.dtype) * delta
    if "b" in params:  # additive bias (distinct from the quant affine
        # "bias"); only a few checkpoint-side MLPs carry one (e.g. the
        # published talker's text_projection ResizeMLP)
        out = out + jnp.asarray(params["b"], dtype=out.dtype)
    return out
