"""Training checkpoint/resume (orbax-backed).

The reference needs none of this (inference-only, SURVEY.md §5
checkpoint/resume); the training subsystem does: a crashed or preempted
fine-tune resumes from the last saved TrainState — params, optimizer
moments and step counter — with shardings restored from the live state
template, so a resume onto a different mesh re-shards automatically.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_train_state(state: Any, directory: str, step: int | None = None) -> str:
    """Save ``state`` under ``directory`` (one subdir per step). Returns the
    checkpoint path."""
    if step is None:
        step = int(state.step)
    path = os.path.abspath(os.path.join(directory, f"step_{step:08d}"))
    ckptr = _checkpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()  # orbax saves asynchronously
    return path


def latest_checkpoint(directory: str) -> str | None:
    if not os.path.isdir(directory):
        return None
    steps = sorted(
        d for d in os.listdir(directory)
        if d.startswith("step_")
        and "-tmp" not in d  # in-flight orbax saves ("-tmp" or "-tmp-<ts>")
        and os.path.isdir(os.path.join(directory, d))
    )
    return os.path.join(directory, steps[-1]) if steps else None


def restore_train_state(path: str, template: Any) -> Any:
    """Restore a TrainState. ``template`` is a live state with the target
    structure/shardings (e.g. a freshly-initialised one) — restored arrays
    take its placement, so resuming onto a new mesh re-shards on load.

    Leaves whose template sharding is NOT a NamedSharding (freshly-inited
    optimizer scalars live on one device) are restored replicated over the
    template's mesh instead: restore COMMITS arrays to their sharding's
    devices, and a jitted step refuses mixed committed device sets
    (mesh-sharded params + device-0 scalars)."""
    from jax.sharding import NamedSharding, PartitionSpec

    mesh = None
    for leaf in jax.tree.leaves(template):
        s = getattr(leaf, "sharding", None)
        if isinstance(s, NamedSharding):
            mesh = s.mesh
            break
    replicated = (
        NamedSharding(mesh, PartitionSpec()) if mesh is not None else None
    )

    def spec(x):
        if not hasattr(x, "shape"):
            return x
        s = getattr(x, "sharding", None)
        if replicated is not None and not isinstance(s, NamedSharding):
            s = replicated
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s)

    return _checkpointer().restore(path, jax.tree.map(spec, template))
