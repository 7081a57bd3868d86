"""Mesh construction: pick a (pp, dp, tp) shape for the available devices.

A ``MeshPlan`` is the engine-level config object (SURVEY.md §5 "config/flag
system": mesh shape as dataclass config, not constants). ``build_mesh``
validates the plan against the model dimensions that constrain tensor
parallelism (kv heads, ffn width, quant groups must divide by ``tp``).

Axis order is (pp, dp, tp) with tp innermost: tensor parallelism moves
activations every layer (psum per block), so it gets the fastest ICI
neighbours; pipeline parallelism moves one microbatch activation per stage
per tick and tolerates the outermost (slowest) links.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh

DP_AXIS = "dp"
TP_AXIS = "tp"
PP_AXIS = "pp"


@dataclass(frozen=True)
class MeshPlan:
    """Logical mesh shape. ``dp * tp * pp`` must equal the device count."""

    dp: int = 1
    tp: int = 1
    pp: int = 1

    @property
    def n_devices(self) -> int:
        return self.dp * self.tp * self.pp


def build_mesh(plan: MeshPlan, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if plan.n_devices != len(devices):
        raise ValueError(
            f"mesh plan {plan} needs {plan.n_devices} devices, have {len(devices)}"
        )
    arr = np.asarray(devices).reshape(plan.pp, plan.dp, plan.tp)
    return Mesh(arr, (PP_AXIS, DP_AXIS, TP_AXIS))


def local_mesh() -> Mesh:
    """Single-device mesh (the v5e default target, BASELINE.md)."""
    return build_mesh(MeshPlan(1, 1), jax.devices()[:1])


def auto_plan(n_devices: int, *, max_tp: int = 8, tp_divisors: int = 8) -> MeshPlan:
    """Pick (dp, tp) for ``n_devices``: the largest tp <= max_tp that divides
    both ``n_devices`` and ``tp_divisors`` (the model's kv-head count —
    tensor parallelism cannot exceed it without head replication)."""
    tp = 1
    for cand in range(1, min(max_tp, n_devices, tp_divisors) + 1):
        if n_devices % cand == 0 and tp_divisors % cand == 0:
            tp = cand
    return MeshPlan(dp=n_devices // tp, tp=tp)


def validate_tp(cfg, tp: int) -> None:
    """Raise if the model dimensions can't be tensor-sharded ``tp`` ways."""
    t = cfg.talker
    problems = []
    if t.n_kv_heads % tp:
        problems.append(f"n_kv_heads={t.n_kv_heads} % tp={tp}")
    if t.n_heads % tp:
        problems.append(f"n_heads={t.n_heads} % tp={tp}")
    if t.ffn % tp:
        problems.append(f"ffn={t.ffn} % tp={tp}")
    if cfg.quant.enabled:
        # in-dim sharded quantized linears split the group axis
        for name, in_dim in (("o", t.q_dim), ("down", t.ffn)):
            groups = in_dim // cfg.quant.group_size
            if groups % tp:
                problems.append(
                    f"{name}-proj quant groups={groups} % tp={tp}"
                )
    if problems:
        raise ValueError("model not tp-shardable: " + "; ".join(problems))


def cp_tp_shardable(cfg, tp: int) -> bool:
    """Whether the code predictor's depth transformer can be tensor-sharded
    ``tp`` ways (VERDICT r4 #6). The cp is MHA (k/v rows == q rows), so the
    head count is the kv constraint; quantized in-dim-sharded linears (o,
    down) additionally need their group axis divisible."""
    cp = cfg.code_predictor
    if tp <= 1:
        return False
    if cp.n_heads % tp or cp.ffn % tp:
        return False
    if cfg.quant.enabled:
        gs = min(cfg.quant.group_size, cp.hidden)
        for in_dim in (cp.n_heads * cp.head_dim, cp.ffn):
            if (in_dim // gs) % tp:
                return False
    return True
