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
import numpy as np
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


def anchor_penalty(tree, ref, skip: tuple = ("mtp",)):
    """Mean squared distance to the anchor weights, skipping leaves whose
    path contains any ``skip`` substring (freshly-grafted recovery params
    — the MTP chain — must move freely from their random init)."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    rflat = jax.tree_util.tree_flatten_with_path(ref)[0]
    total = jnp.float32(0.0)
    n = 0
    for (path, x), (_, r) in zip(flat, rflat):
        p = str(path).lower()
        if any(s in p for s in skip):
            continue
        d = (x - jax.lax.stop_gradient(jnp.asarray(r))).astype(jnp.float32)
        total = total + jnp.sum(d * d)
        n += int(np.prod(np.shape(x)))
    return total / max(n, 1)


def make_train_step(
    cfg: ModelConfig,
    optimizer: optax.GradientTransformation,
    *,
    cp_weight: float = 1.0,
    remat: bool = True,
    mesh=None,
    microbatches: int = 0,
    sequence_parallel: bool = False,
    anchor: tuple | None = None,
    anchor_weight: float = 0.0,
    distill: tuple | None = None,
    distill_weight: float = 0.0,
) -> Callable[[TrainState, dict], tuple[TrainState, dict]]:
    """Returns jitted ``step(state, batch) -> (state, metrics)``.

    ``batch``: text_tokens [B,Tt] i32, codes [B,Q,Tf] i32,
    frame_mask [B,Tf] bool. The state is donated — caches and optimizer
    moments update in place in HBM.

    Pass a ``mesh`` whose ``pp`` axis is > 1 to run the talker block stack
    as a pipeline (``parallel.pipeline``): layers are staged over pp,
    microbatches rotate via collective permute, and dp/tp still apply
    inside every stage. ``microbatches`` defaults to ``4 * pp`` (bubble
    fraction (pp-1)/(microbatches+pp-1)); the batch must divide by it.

    ``sequence_parallel`` (needs ``mesh`` with tp > 1): shard the residual
    stream [B, T, D] along T over the tp axis between talker blocks —
    Megatron-style SP, expressed as a sharding constraint so XLA places the
    norm/elementwise segments sequence-sharded and inserts the
    gather/scatter collectives around attention and matmuls. Long-batch
    activation memory per chip drops by ~tp in those segments.
    """
    stack_fn = None
    act_constraint = None
    if mesh is not None:
        from ..parallel.mesh import DP_AXIS, PP_AXIS, TP_AXIS
        from ..parallel.pipeline import talker_stack_fn

        pp = PP_AXIS in mesh.axis_names and mesh.shape[PP_AXIS] > 1
        if sequence_parallel:
            if mesh.shape[TP_AXIS] <= 1:
                raise ValueError("sequence_parallel needs a tp > 1 mesh")
            from jax.sharding import NamedSharding, PartitionSpec

            spec = PartitionSpec(DP_AXIS, TP_AXIS, None)
            # inside the pipeline's manual-pp region a full-mesh
            # NamedSharding is rejected (pp is manual there); a bare
            # PartitionSpec resolves against the ambient mesh in both worlds
            sp_sharding = spec if pp else NamedSharding(mesh, spec)

            def act_constraint(x):
                return jax.lax.with_sharding_constraint(x, sp_sharding)
        if pp:
            mb = microbatches or 4 * mesh.shape[PP_AXIS]
            stack_fn = talker_stack_fn(
                cfg, mesh=mesh, microbatches=mb, remat=remat,
                act_constraint=act_constraint,
            )
    elif sequence_parallel:
        raise ValueError("sequence_parallel needs a mesh")

    def raw_loss(params, cp_params, batch):
        return joint_loss(
            params, cp_params, cfg, batch, cp_weight=cp_weight,
            stack_fn=stack_fn, act_constraint=act_constraint,
        )

    # the pipeline already remats per stage-tick (parallel.pipeline), so the
    # outer whole-loss checkpoint would double the recompute for nothing
    loss_fn = jax.checkpoint(raw_loss) if remat and stack_fn is None else raw_loss

    if distill is not None and distill_weight > 0.0:
        # function-space anchor (VERDICT r4 #5): KL to the frozen base
        # model on the sequential (fps=1, dg=1) path — see
        # loss.sequential_distill_loss for why weight-space anchoring
        # alone cannot hold AR greedy parity
        import dataclasses as _dc

        from .loss import sequential_distill_loss

        cfg_base = _dc.replace(
            cfg,
            talker=_dc.replace(cfg.talker, frames_per_step=1,
                               mtp_cp_batch=False),
            code_predictor=_dc.replace(cfg.code_predictor, depth_group=1,
                                       spec_decode=False),
        )
        ce_loss_fn = loss_fn

        def loss_fn(params, cp_params, batch):  # noqa: F811
            loss, metrics = ce_loss_fn(params, cp_params, batch)
            kl = sequential_distill_loss(params, cp_params, distill,
                                         cfg_base, batch)
            metrics = dict(metrics)
            metrics["distill_kl"] = kl
            return loss + distill_weight * kl, metrics

    if anchor is not None and anchor_weight > 0.0:
        # L2-SP anchored recovery (VERDICT r4 #5): penalise distance to
        # the pre-fine-tune weights so a decode-recovery fine-tune adapts
        # the extension (MTP chain free via the skip list, grouped heads
        # lightly) WITHOUT drifting the base behaviour — the offline
        # quality gate then measures the extension's cost, not weight
        # drift (tools/calibrate_quality_gate.py).
        a_params, a_cp = anchor
        inner_loss_fn = loss_fn

        def loss_fn(params, cp_params, batch):  # noqa: F811
            loss, metrics = inner_loss_fn(params, cp_params, batch)
            pen = anchor_penalty(params, a_params) + anchor_penalty(
                cp_params, a_cp, skip=()
            )
            metrics = dict(metrics)
            metrics["anchor_pen"] = pen
            return loss + anchor_weight * pen, metrics

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
