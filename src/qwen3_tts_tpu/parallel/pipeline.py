"""Pipeline parallelism for the talker's stacked-layer block scan.

The TPU-native pipeline is *collective-permute pipelining* (the pattern the
scaling playbook recommends over hand-rolled send/recv): the 28 stacked
talker layers are sharded over a ``pp`` mesh axis, each pipeline stage runs
its ``L/pp`` layers as a local ``lax.scan``, and microbatch activations
rotate stage-to-stage with ``lax.ppermute`` inside one ``jax.shard_map``
that is *manual over pp only* — data (``dp``) and tensor (``tp``)
parallelism remain GSPMD-automatic inside every stage, so the three axes
compose without any manual collectives beyond the pipeline shifts.

Schedule: GPipe over ``M`` microbatches. With ``S = pp`` stages the loop
runs ``M + S - 1`` ticks; at tick ``t`` stage ``r`` processes microbatch
``t - r`` (bubble ticks compute masked garbage that never reaches the
output or the gradients — outputs are written only on the last stage for
valid ticks, so reverse-mode cotangents through the bubbles are zero).
Bubble fraction is ``(S-1)/(M+S-1)``: pick ``microbatches >= 4*pp`` for
real runs; correctness holds for any ``M`` with ``B % M == 0``.

Why grad-through-the-pipeline just works: the whole schedule is one
differentiable function — ``ppermute`` transposes to the reverse
permutation, so ``jax.grad`` AUTOMATICALLY yields the reverse pipeline
(backward flows last-stage -> first-stage) with the same bubble structure.
No custom VJP, no manual stashing: ``jax.checkpoint`` around the stage body
gives the classic per-stage rematerialization memory profile.

The reference has no distributed anything (SURVEY.md §2 "Parallelism
strategies": none); this is a new first-class subsystem of the TPU build.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from .mesh import DP_AXIS, PP_AXIS, TP_AXIS

Params = dict[str, Any]


def pipeline_stack(
    mesh,
    body: Callable[[Params, jnp.ndarray, Any], jnp.ndarray],
    blocks: Params,
    x: jnp.ndarray,            # [B, T, D] activations for the full batch
    mb_args: Any,              # pytree of [B, ...] per-example side inputs
    *,
    microbatches: int,
    remat: bool = True,
    out_constraint: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """Run ``blocks`` ([L, ...] stacked pytree) over ``x`` as a ``pp``-staged
    pipeline; returns the stack output [B, T, D] (replicated over pp).

    ``body(blocks_local, x_mb, args_mb) -> y_mb`` runs one stage's layers on
    one microbatch: ``blocks_local`` leaves carry the LOCAL [L/pp, ...]
    layer slice, ``x_mb`` is [B/M, T, D] and ``args_mb`` the matching
    microbatch slice of ``mb_args``. It must be shape-preserving in ``x``.
    """
    S = mesh.shape[PP_AXIS]
    B = x.shape[0]
    M = microbatches
    if B % M:
        raise ValueError(f"batch {B} not divisible by microbatches {M}")
    L = jax.tree.leaves(blocks)[0].shape[0]
    if L % S:
        raise ValueError(f"{L} stacked layers not divisible by pp={S}")
    if S == 1:  # no pipeline — run the stack directly (same code path shape)
        return body(blocks, x, mb_args)

    mb = B // M
    dtype = x.dtype
    # On CPU, activations cross the manual-pp boundary in f32 (bf16 -> f32
    # is lossless): the boundary input is pp-invariant, so its reverse-mode
    # cotangent is a psum over pp, and XLA-CPU's AllReducePromotion pass
    # crashes on bf16 all-reduces under partial-manual shard_map. On real
    # TPU meshes the upcast would double boundary HBM/ICI bytes for
    # nothing, so the boundary stays in the compute dtype there
    # (QWEN3_TTS_PP_F32_BOUNDARY=1 forces the f32 path anywhere).
    import os

    f32_boundary = (
        jax.default_backend() == "cpu"
        or os.environ.get("QWEN3_TTS_PP_F32_BOUNDARY", "0") not in ("", "0")
    )
    bdt = jnp.float32 if f32_boundary else dtype
    xm = x.reshape(M, mb, *x.shape[1:]).astype(bdt)
    am = jax.tree.map(lambda v: v.reshape(M, mb, *v.shape[1:]), mb_args)
    stage = jax.checkpoint(body) if remat else body

    def per_stage(blk_local: Params, xm, am) -> jnp.ndarray:
        r = jax.lax.axis_index(PP_AXIS)
        shifts = [(i, i + 1) for i in range(S - 1)]

        def tick(carry, t):
            state, outputs = carry
            # stage 0 injects microbatch t from the queue; later stages
            # consume the activation received from stage r-1 last tick.
            # The pp-invariant injection is pcast to varying WHILE STILL f32
            # (transpose of pcast = psum over pp; it must not be bf16 —
            # see the boundary-dtype note above), then cast to compute dtype
            inj = jax.lax.pcast(
                xm[jnp.clip(t, 0, M - 1)], (PP_AXIS,), to="varying"
            ).astype(dtype)
            x_in = jnp.where(r == 0, inj, state)
            a = jax.tree.map(
                lambda v: v[jnp.clip(t - r, 0, M - 1)], am
            )
            y = stage(blk_local, x_in, a)
            # the last stage finishes microbatch t-(S-1) at tick t
            out_idx = t - (S - 1)
            valid = (r == S - 1) & (out_idx >= 0) & (out_idx < M)
            ci = jnp.clip(out_idx, 0, M - 1)
            cur = jax.lax.dynamic_index_in_dim(outputs, ci, 0, keepdims=False)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(valid, y, cur), ci, 0
            )
            return (jax.lax.ppermute(y, PP_AXIS, shifts), outputs), None

        # zeros start as pp-varying for the scan carry. pcast in f32 and
        # downcast AFTER: pcast's transpose is a psum over pp, and it must
        # not be a bf16 all-reduce (same XLA-CPU crash as the output psum).
        init = jax.tree.map(
            lambda z: z.astype(dtype),
            jax.lax.pcast(
                (
                    jnp.zeros((mb, *x.shape[1:]), bdt),
                    jnp.zeros((M, mb, *x.shape[1:]), bdt),
                ),
                (PP_AXIS,),
                to="varying",
            ),
        )
        (_, outputs), _ = jax.lax.scan(tick, init, jnp.arange(M + S - 1))
        # only the last stage holds real outputs (zeros elsewhere): psum is
        # the broadcast back to every stage. The loss/head then runs
        # pp-replicated — simple and correct; a last-stage-only loss would
        # save this one activation broadcast per step. The f32 round-trip
        # sidesteps an XLA-CPU AllReducePromotion crash on bf16 all-reduce
        # under partial-manual shard_map (exact: one stage is nonzero, so
        # the sum adds zeros and the downcast returns the original values).
        out = jax.lax.psum(outputs.astype(bdt), PP_AXIS).astype(
            outputs.dtype
        )
        # align the auto-axes (dp/tp) sharding of the manual-region output
        # with what the consumer wants (e.g. the SP sequence sharding):
        # without this, GSPMD may pick a mismatched boundary layout and
        # fall back to "[SPMD] Involuntary full rematerialization" —
        # replicate-then-repartition — at the shard_map exit
        return out if out_constraint is None else out_constraint(out)

    y = jax.shard_map(
        per_stage,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: jax.P(PP_AXIS), blocks),
            jax.P(),
            jax.tree.map(lambda _: jax.P(), am),
        ),
        out_specs=jax.P(),
        axis_names=frozenset({PP_AXIS}),
    )(blocks, xm, am)
    return y.reshape(B, *x.shape[1:])


def talker_stack_fn(
    cfg, *, mesh, microbatches: int, remat: bool = True,
    act_constraint: Callable | None = None,
) -> Callable:
    """Build a pipelined drop-in for the talker's full-sequence block scan.

    Returns ``stack(params_blocks, x_emb, pad_len) -> pre-ln_f activations``
    with the same semantics as the ``lax.scan`` inside
    ``models.talker.talker_forward`` at ``pos=0`` (training's full-sequence
    forward). RoPE tables are closed over per sequence length (static under
    jit). Plug into ``training.loss.joint_loss(..., stack_fn=...)``.
    """
    from ..models.layers import rope_tables, transformer_block

    t = cfg.talker

    def stack(blocks: Params, x_emb: jnp.ndarray, pad_len) -> jnp.ndarray:
        T = x_emb.shape[1]
        cos_t, sin_t = rope_tables(T, t.head_dim, t.rope_theta)

        def body(blk_local: Params, x_mb: jnp.ndarray, pad_mb) -> jnp.ndarray:
            mb = x_mb.shape[0]
            cache_shape = (
                jax.tree.leaves(blk_local)[0].shape[0],
                mb, T, t.n_kv_heads, t.head_dim,
            )
            cache_k = jnp.zeros(cache_shape, x_mb.dtype)
            cache_v = jnp.zeros(cache_shape, x_mb.dtype)

            def layer(xc, layer_kv):
                bp, ck, cv = layer_kv
                out = transformer_block(
                    bp, xc,
                    cos=cos_t, sin=sin_t,
                    cache_k=ck, cache_v=cv, pos=jnp.int32(0),
                    n_heads=t.n_heads, n_kv_heads=t.n_kv_heads,
                    head_dim=t.head_dim, rms_eps=t.rms_eps, qk_norm=True,
                    pad_len=pad_mb,
                )
                y = out.x if act_constraint is None else act_constraint(out.x)
                return y, None

            y, _ = jax.lax.scan(layer, x_mb, (blk_local, cache_k, cache_v))
            return y

        out_constraint = None
        if act_constraint is not None:
            # the SP run's consumers read the stack output sequence-sharded
            # over tp; name that layout on the 4-D [M, mb, T, D] boundary
            # tensor (batch -> dp rides the leading microbatch dim) so the
            # shard_map exit reshards cheaply instead of replicating
            def out_constraint(y4):
                return jax.lax.with_sharding_constraint(
                    y4, jax.P(DP_AXIS, None, TP_AXIS, None)
                )

        return pipeline_stack(
            mesh, body, blocks, x_emb, pad_len,
            microbatches=microbatches, remat=remat,
            out_constraint=out_constraint,
        )

    return stack
