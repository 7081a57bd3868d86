"""LoRA fine-tuning: low-rank adapters for parameter-efficient voice
adaptation.

Full fine-tuning of the 1.7B talker costs 3× the weights in optimizer
moments + full-size gradients; adapting a voice rarely needs that. LoRA
trains rank-``r`` deltas ``scale * B @ A`` per linear (Hu et al. 2021,
arXiv:2106.09685) — here as a purely FUNCTIONAL transformation of the
parameter pytree, the JAX-idiomatic shape of the technique:

- :func:`add_lora` returns a new params tree where each targeted linear
  dict gains ``lora_a`` / ``lora_b`` / ``lora_scale`` leaves.
  ``ops.linear`` applies the delta whenever those keys are present, so no
  model code changes — stacked ``lax.scan`` layers included (adapters
  stack along the same leading layer axis).
- :func:`split_lora` / :func:`merge_trees` partition the tree into
  (adapters, frozen base): the train step differentiates ONLY the adapter
  subtree, so gradients + Adam moments are adapter-sized (~MBs, not GBs).
- :func:`merge_lora` folds trained deltas into the base weights and strips
  the adapter leaves — zero inference overhead, the deployed tree is
  indistinguishable from a fully fine-tuned one.

The reference app has no training at all (SURVEY.md §2); this extends the
framework's training subsystem (training/train.py) the same way mlx-lm's
LoRA extends MLX models — but as pytree transforms rather than module
surgery.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..engine.configs import ModelConfig
from .loss import joint_loss

# default adaptation surface: attention + MLP projections (every linear in
# the decoder blocks). Top-level linears (embeddings, heads) stay frozen.
DEFAULT_TARGETS = ("q", "k", "v", "o", "gate", "up", "down")


def _is_linear_dict(node: Any) -> bool:
    """A linear param dict: dense ({"w": array}) or int8-quantized
    ({"q", "scale", "bias"}). NOT an attention block dict — its "q" key is
    the q-projection SUBDICT, which is why the quantized test requires the
    full key triple (ops.quant.is_quantized)."""
    from ..ops.quant import is_quantized

    if not isinstance(node, dict):
        return False
    if "w" in node and not isinstance(node["w"], dict):
        return True
    return is_quantized(node)


def add_lora(
    params: Any,
    *,
    rank: int = 8,
    alpha: float = 16.0,
    targets: tuple[str, ...] = DEFAULT_TARGETS,
    seed: int = 0,
) -> Any:
    """Return a copy of ``params`` with LoRA adapters on targeted linears.

    ``lora_a`` is Gaussian(0, 1/r), ``lora_b`` zeros — the standard init
    that makes the adapted model EXACTLY equal the base model at step 0.
    Stacked layer leaves (leading layer axis, models/talker._stack) get one
    adapter per layer along the same axis. Quantized linears are rejected:
    dequantize to the dense compute format first (training is dense —
    ops/quant.dequantize_tree, engine.api.apply_compute_format).
    """
    rng = np.random.default_rng(seed)

    def walk(node: Any, name: str) -> Any:
        if _is_linear_dict(node):
            if name not in targets:
                return node
            if "w" not in node:
                raise ValueError(
                    f"LoRA target {name!r} is int8-quantized; dequantize the "
                    "tree to dense weights before add_lora (training runs "
                    "dense — see ops.quant.dequantize_tree)"
                )
            w = node["w"]              # device or host array: only the
            dtype = np.dtype(w.dtype)  # shape/dtype are read — no fetch
            if w.ndim == 2:            # [out, in]
                out_d, in_d = w.shape
                a = rng.normal(0.0, 1.0 / rank, (rank, in_d))
                b = np.zeros((out_d, rank))
                scale = np.asarray(alpha / rank)
            elif w.ndim == 3:          # stacked: [L, out, in]
                L, out_d, in_d = w.shape
                a = rng.normal(0.0, 1.0 / rank, (L, rank, in_d))
                b = np.zeros((L, out_d, rank))
                scale = np.full((L,), alpha / rank)
            else:
                raise ValueError(f"unexpected weight ndim for {name!r}: {w.shape}")
            return {
                **node,
                "lora_a": a.astype(dtype),
                "lora_b": b.astype(dtype),
                "lora_scale": scale.astype(dtype),
            }
        if isinstance(node, dict):
            return {k: walk(v, k) for k, v in node.items()}
        return node

    return walk(params, "")


def merge_lora(params: Any) -> Any:
    """Fold every adapter's delta into its base weight and strip the
    adapter leaves: W' = W + scale * (B @ A). The result runs at exactly
    the base model's inference cost."""

    def walk(node: Any) -> Any:
        if _is_linear_dict(node) and "lora_a" in node:
            w = jnp.asarray(node["w"])
            a = jnp.asarray(node["lora_a"], jnp.float32)
            b = jnp.asarray(node["lora_b"], jnp.float32)
            s = jnp.asarray(node["lora_scale"], jnp.float32)
            if w.ndim == 2:
                delta = s * (b @ a)
            else:  # stacked [L, out, in]
                delta = s[:, None, None] * jnp.einsum("lor,lri->loi", b, a)
            rest = {
                k: v for k, v in node.items()
                if k not in ("lora_a", "lora_b", "lora_scale")
            }
            return {**rest, "w": (w.astype(jnp.float32) + delta).astype(w.dtype)}
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


def split_lora(tree: Any) -> tuple[Any, Any]:
    """Partition a params tree into (adapters, base): two valid pytrees of
    nested dicts whose union of leaves is the input's. The adapter tree
    holds the TRAINABLE ``lora_a``/``lora_b`` leaves only — it is what the
    optimizer sees. ``lora_scale`` stays in the (frozen) base: it is a
    constant of the parameterization, and leaving it trainable would let
    AdamW's weight decay silently shrink it."""
    lora: dict = {}
    base: dict = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            sub_l, sub_b = split_lora(v)
            if sub_l:
                lora[k] = sub_l
            base[k] = sub_b
        elif k in ("lora_a", "lora_b"):
            lora[k] = v
        else:
            base[k] = v
    return lora, base


def split_subtree(params: Any, key: str) -> tuple[Any, Any]:
    """Partition by a top-level key: the named subtree becomes the
    trainable tree, everything else the frozen base. Reuses the adapter
    state machinery (init_lora_train_state / make_lora_train_step) for
    grafted-module training — e.g. MTP heads added to an imported
    checkpoint (models.talker.add_mtp_params) train against the frozen
    1.7B base with head-sized optimizer state."""
    if key not in params:
        raise KeyError(f"params have no {key!r} subtree")
    return {key: params[key]}, {k: v for k, v in params.items() if k != key}


def merge_trees(base: Any, lora: Any) -> Any:
    """Inverse of :func:`split_lora`: recombine adapters with the base."""
    out = dict(base)
    for k, v in lora.items():
        if isinstance(v, dict):
            out[k] = merge_trees(base.get(k, {}), v)
        else:
            out[k] = v
    return out


@jax.tree_util.register_dataclass
@dataclass
class LoraTrainState:
    """Adapter-only optimizer state: gradients and Adam moments are sized
    by the adapters (rank * dims), not the 1.7B base."""

    lora: Any              # talker adapter subtree (split_lora output)
    opt_state: Any
    step: jnp.ndarray


def init_lora_train_state(
    lora: Any, optimizer: optax.GradientTransformation
) -> LoraTrainState:
    return LoraTrainState(
        lora=lora,
        opt_state=optimizer.init(lora),
        step=jnp.zeros((), jnp.int32),
    )


def make_lora_train_step(
    cfg: ModelConfig,
    optimizer: optax.GradientTransformation,
    *,
    cp_weight: float = 1.0,
    remat: bool = True,
) -> Callable:
    """Jitted ``step(state, base_params, cp_params, batch)``.

    Differentiates the SAME joint loss as the full train step
    (training/train.py) but only through the adapter subtree; the frozen
    base (and the whole code predictor) ride along as non-differentiated
    arguments, so XLA never materializes base-sized gradients. Base params
    and state are donated-free: the step returns only the new adapter
    state."""

    def raw_loss(lora, base_params, cp_params, batch):
        params = merge_trees(base_params, lora)
        return joint_loss(params, cp_params, cfg, batch, cp_weight=cp_weight)

    loss_fn = jax.checkpoint(raw_loss) if remat else raw_loss

    @partial(jax.jit, donate_argnums=(0,))
    def step(
        state: LoraTrainState, base_params: Any, cp_params: Any, batch: dict
    ) -> tuple[LoraTrainState, dict]:
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.lora, base_params, cp_params, batch
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.lora)
        new_state = LoraTrainState(
            lora=optax.apply_updates(state.lora, updates),
            opt_state=opt_state,
            step=state.step + 1,
        )
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return step
