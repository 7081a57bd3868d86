"""Tracing, profiling and structured metrics.

The reference has no observability at all — it actively suppresses library
logging and the only timing code is cosmetic sleeps (SURVEY.md §5
tracing/metrics). The TPU build needs real numbers because its north-star
targets are numbers (BASELINE.md: RTF, TTFA): this module provides

- ``trace(label)``: annotate a host-side region so it shows up in TPU
  profiler timelines (``jax.profiler.TraceAnnotation``);
- ``profile_to(dir)``: capture a full device trace viewable in TensorBoard
  / Perfetto;
- ``StageTimer``: wall-clock per stage with device sync at the boundary;
- ``emit_metrics``: one structured JSON line per generation on stderr,
  opt-in via QWEN3_TTS_METRICS=1 — quiet-by-default UX preserved.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time
from dataclasses import dataclass, field
from typing import Any, Iterator


def metrics_enabled() -> bool:
    return os.environ.get("QWEN3_TTS_METRICS", "0") not in ("", "0", "false")


@contextlib.contextmanager
def trace(label: str) -> Iterator[None]:
    """Annotate a region in the device profiler timeline (no-op overhead
    when no trace is being captured)."""
    try:
        import jax.profiler

        with jax.profiler.TraceAnnotation(label):
            yield
    except Exception:
        yield


@contextlib.contextmanager
def profile_to(log_dir: str) -> Iterator[None]:
    """Capture a TPU/JAX device trace into ``log_dir``."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StageTimer:
    """Accumulates wall time per named stage.

    ``sync=True`` blocks on the device before/after so stage boundaries are
    true device boundaries, not dispatch boundaries (JAX is async)."""

    sync: bool = False
    stages: dict[str, float] = field(default_factory=dict)
    counts: dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        if self.sync:
            self._block()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                self._block()
            dt = time.perf_counter() - t0
            self.stages[name] = self.stages.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    @staticmethod
    def _block() -> None:
        try:
            import jax

            (jax.device_put(0.0) + 0).block_until_ready()
        except Exception:
            pass

    def summary(self) -> dict[str, Any]:
        return {
            name: {"total_s": round(t, 4), "calls": self.counts[name]}
            for name, t in sorted(self.stages.items())
        }


def emit_metrics(event: str, payload: dict[str, Any]) -> None:
    """One JSON line on stderr when QWEN3_TTS_METRICS is set."""
    if not metrics_enabled():
        return
    line = {"event": event, "ts": round(time.time(), 3), **payload}
    print(json.dumps(line), file=sys.stderr, flush=True)
