"""The jitted, mesh-sharded train step.

One function, compiled once, zero host work per step: loss + grads (talker
and code predictor jointly), global-norm clipping, optax update, donated
state. Sharding is inherited from the placement of the TrainState leaves
(``parallel.sharding``): dp over the batch, tp over heads/ffn — XLA inserts
the grad all-reduces over ICI. ``jax.checkpoint`` on the loss bounds
activation memory for long batches (HBM is the scaling limit, not FLOPs).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..engine.configs import ModelConfig
from .loss import joint_loss


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    params: Any            # talker
    cp_params: Any         # code predictor
    opt_state: Any
    step: jnp.ndarray


def default_optimizer(lr: float = 1e-4, clip: float = 1.0) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(lr, b1=0.9, b2=0.95, weight_decay=0.01),
    )


def init_train_state(
    params: Any, cp_params: Any, optimizer: optax.GradientTransformation
) -> TrainState:
    """Build a TrainState. Optimizer-state leaves are created with
    ``zeros_like`` so they inherit the params' shardings automatically."""
    opt_state = optimizer.init((params, cp_params))
    return TrainState(
        params=params,
        cp_params=cp_params,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    cfg: ModelConfig,
    optimizer: optax.GradientTransformation,
    *,
    cp_weight: float = 1.0,
    remat: bool = True,
) -> Callable[[TrainState, dict], tuple[TrainState, dict]]:
    """Returns jitted ``step(state, batch) -> (state, metrics)``.

    ``batch``: text_tokens [B,Tt] i32, codes [B,Q,Tf] i32,
    frame_mask [B,Tf] bool. The state is donated — caches and optimizer
    moments update in place in HBM.
    """

    def raw_loss(params, cp_params, batch):
        return joint_loss(params, cp_params, cfg, batch, cp_weight=cp_weight)

    loss_fn = jax.checkpoint(raw_loss) if remat else raw_loss

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch: dict) -> tuple[TrainState, dict]:
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params, state.cp_params, batch)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, (state.params, state.cp_params)
        )
        p_up, cp_up = updates
        new_state = TrainState(
            params=optax.apply_updates(state.params, p_up),
            cp_params=optax.apply_updates(state.cp_params, cp_up),
            opt_state=opt_state,
            step=state.step + 1,
        )
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return step


def synthetic_batch(
    cfg: ModelConfig, batch_size: int, t_text: int, t_frames: int, seed: int = 0
) -> dict:
    """Random teacher-forcing batch with the training layout (tests/dryrun)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    t = cfg.talker
    cc = cfg.codec
    codes = np.stack(
        [rng.integers(0, cc.codebook_size, (batch_size, t_frames))]
        + [
            rng.integers(0, cc.residual_codebook_size, (batch_size, t_frames))
            for _ in range(cc.num_codebooks - 1)
        ],
        axis=1,
    ).astype(np.int32)
    return {
        "text_tokens": rng.integers(
            0, t.vocab_size, (batch_size, t_text)
        ).astype(np.int32),
        "text_mask": np.ones((batch_size, t_text), dtype=bool),
        "codes": codes,
        "frame_mask": np.ones((batch_size, t_frames), dtype=bool),
        # alternate conditioned / unconditioned rows so the speaker-aware
        # training layout (training/loss.py) is always exercised
        "speaker_id": _alternating_speakers(batch_size, t.n_speakers),
    }


def _alternating_speakers(batch_size: int, n_speakers: int):
    import numpy as np

    sid = np.arange(batch_size, dtype=np.int32) % n_speakers
    sid[1::2] = -1  # odd rows train unconditioned
    return sid
