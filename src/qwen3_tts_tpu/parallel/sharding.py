"""NamedSharding rules for the model pytrees.

Megatron-style tensor parallelism expressed declaratively (the TPU way —
annotate placements, let XLA insert the collectives):

- q/k/v and gate/up projections: output dimension over ``tp`` (each chip owns
  a head/ffn slice; no communication needed);
- o and down projections: input dimension over ``tp`` (the contraction
  produces partial sums; XLA inserts one psum per block over ICI);
- per-head norms, layer norms, embeddings, lm head: replicated (small);
- KV cache: batch over ``dp``, kv heads over ``tp``;
- quantized linears shard codes and per-group scale/bias along the same
  logical dimension, so dequantization stays chip-local.

The code predictor and codec are orders of magnitude smaller than the talker
(SURVEY.md §6: 1.7B talker vs ~10M-class codec) — they replicate and shard
only the batch.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DP_AXIS, PP_AXIS, TP_AXIS

# leaf-path suffixes -> (quantized-aware) partition axis of the *out/in* dim.
# Paths are "/"-joined dict keys, e.g. "blocks/attn/q/scale".
_OUT_SHARDED = ("attn/q", "attn/k", "attn/v", "mlp/gate", "mlp/up")
_IN_SHARDED = ("attn/o", "mlp/down")


def _linear_spec(path: str, leaf_name: str, stacked: bool, pp: bool) -> P:
    """Spec for one tensor of a linear param dict at ``path``.

    Tensor layouts ([L] = stacked layer axis when ``stacked``):
      w / q   [L?, out, in]
      scale   [L?, out, groups]   (groups track the *in* dimension)
      bias    [L?, out, groups]

    With ``pp`` the stacked layer axis is sharded over the pipeline axis
    (each stage owns L/pp layers — parallel.pipeline).
    """
    lead = ((PP_AXIS if pp else None),) if stacked else ()
    out_tp = any(path.endswith(s) for s in _OUT_SHARDED)
    in_tp = any(path.endswith(s) for s in _IN_SHARDED)
    if out_tp:
        return P(*lead, TP_AXIS, None)
    if in_tp:
        # codes split the in axis; scale/bias split the group axis — both are
        # the second (last) dim in our layouts
        return P(*lead, None, TP_AXIS)
    return P(*lead)  # tp-replicated (head, in_proj, ...)


def talker_param_spec(params: Any, *, pp: bool = False) -> Any:
    """PartitionSpec pytree matching the talker param pytree.

    ``pp=True`` additionally shards every stacked-block leaf's leading layer
    axis over the pipeline axis (norms included — the pipeline's shard_map
    consumes the whole block subtree stage-locally)."""

    def spec_for(path_keys, leaf) -> P:
        parts = [str(getattr(k, "key", k)) for k in path_keys]
        path = "/".join(parts)
        # "blocks" anywhere in the path: the cp's draft adapter nests its
        # stacked block copy at draft/blocks (freeze-base recovery)
        stacked = "blocks" in parts
        if parts and parts[-1] in ("w", "q", "scale", "bias"):
            parent = "/".join(parts[:-1])
            return _linear_spec(parent, parts[-1], stacked, pp)
        if stacked and pp:
            return P(PP_AXIS)  # [L, ...] norms: stage-local slices
        return P()  # embeddings / norms replicated

    return jax.tree_util.tree_map_with_path(spec_for, params)


def replicated_spec(params: Any) -> Any:
    return jax.tree.map(lambda _: P(), params)


def cache_sharding(mesh: Mesh) -> NamedSharding:
    """KV cache [L, B, S, H_kv, hd]: batch over dp, kv heads over tp."""
    return NamedSharding(mesh, P(None, DP_AXIS, None, TP_AXIS, None))


def activation_sharding(mesh: Mesh) -> NamedSharding:
    """Activations [B, T, D]: batch over dp."""
    return NamedSharding(mesh, P(DP_AXIS, None, None))


def shard_params(params: Any, mesh: Mesh, spec_tree: Any = None) -> Any:
    """Place a param pytree onto ``mesh`` with the given (or talker) specs.

    A mesh with a pp axis > 1 gets the pipeline-sharded talker spec (block
    layers split over stages); inference meshes (pp == 1) are unaffected."""
    if spec_tree is None:
        pp = PP_AXIS in mesh.axis_names and mesh.shape[PP_AXIS] > 1
        spec_tree = talker_param_spec(params, pp=pp)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        spec_tree,
    )


def shard_model(model, mesh: Mesh):
    """Re-place a loaded Qwen3TTSModel's pytrees onto ``mesh`` in-place-ish:
    talker tensor-parallel; code predictor tensor-parallel too when its
    depth-transformer geometry divides (same block layout as the talker →
    same declarative rules; VERDICT r4 #6), else replicated; codec
    replicated (~10M-class — SURVEY.md §6). Returns the same model object
    with device buffers replaced."""
    from .mesh import cp_tp_shardable, validate_tp

    tp = mesh.shape[TP_AXIS]
    validate_tp(model.cfg, tp)
    model.params = shard_params(model.params, mesh)
    model.cp_params = shard_params(
        model.cp_params, mesh,
        talker_param_spec(model.cp_params)
        if cp_tp_shardable(model.cfg, tp)
        else replicated_spec(model.cp_params),
    )
    model.codec_params = shard_params(
        model.codec_params, mesh, replicated_spec(model.codec_params)
    )
    model._generator = None  # jitted stages must re-trace with new shardings
    return model
