"""On-device token sampling (greedy / temperature / top-k / top-p).

Sampling runs inside the jitted decode step — never on the host — so the
autoregressive loop makes zero host round-trips per token (SURVEY.md §7
"hard parts" #4).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SamplingConfig:
    temperature: float = 0.9
    top_k: int = 50          # 0 disables
    top_p: float = 1.0       # 1.0 disables
    greedy: bool = False


def filtered_logits(logits: jnp.ndarray, cfg: SamplingConfig) -> jnp.ndarray:
    """Temperature/top-k/top-p filtered logits over the LAST axis (kept
    entries scaled by 1/temperature, dropped entries -inf): the exact
    categorical distribution ``sample_token`` draws from. Exposed so the
    speculative sampled depth decode can reason about draft/target
    distributions (softmax of this) rather than just draw from them.

    Greedy/temperature<=0 configs have no filtered distribution (argmax
    is the sampler); dividing by a 0/negative temperature would produce
    NaN/inf logits, so every caller is guarded here rather than at each
    call site (sample_token routes greedy to argmax itself, but this is
    a public function)."""
    if cfg.greedy or cfg.temperature <= 0.0:
        raise ValueError(
            "filtered_logits is undefined for greedy/temperature<=0 "
            "configs (argmax has no filtered distribution)"
        )
    logits = logits / cfg.temperature

    if cfg.top_k and cfg.top_k > 0 and cfg.top_k < logits.shape[-1]:
        kth = jax.lax.top_k(logits, cfg.top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)

    if cfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix with cumulative prob >= top_p
        cutoff_idx = jnp.sum((cum < cfg.top_p).astype(jnp.int32), axis=-1,
                             keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)

    return logits


def sample_token(
    logits: jnp.ndarray,          # [B, V] float32
    key: jax.Array,
    cfg: SamplingConfig,
) -> jnp.ndarray:
    """Sample one token id per row. All branches resolve at trace time
    (cfg is static), so each config compiles to a lean kernel."""
    if cfg.greedy or cfg.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    return jax.random.categorical(
        key, filtered_logits(logits, cfg), axis=-1
    ).astype(jnp.int32)
