"""Advisory cross-process lock for the (single) TPU device service.

Why this exists: the remote TPU service wedges PERMANENTLY (calls block
forever, no OOM error, hours to recover — CLAUDE.md) when HBM is
over-subscribed, and the documented discipline is ONE big-cache engine per
process. That discipline breaks when two *processes* each allocate an
engine concurrently — e.g. the driver's ``bench.py`` firing while a queued
measurement step (``tools/measure_queue2.sh``) holds a 16-slot serving
engine. Every entry point that allocates real engine state on the device
therefore takes this flock-based lock first and holds it for the duration
of the process (flock releases automatically on exit, including crashes).

CPU-only runs skip the lock: the virtual mesh has no shared service to
protect, and test parallelism would serialize for nothing.
"""

from __future__ import annotations

import os
import sys
import time

LOCK_PATH = "/tmp/qwen3_tts_device.lock"
_HELD = []  # keep fd objects alive for the process lifetime


def device_lock(
    *, wait_s: float | None = None, label: str = "", path: str = LOCK_PATH
) -> bool:
    """Acquire the device lock, waiting up to ``wait_s`` seconds.

    Returns True once held (kept until process exit), False on timeout.
    Default wait is QWEN3_TTS_DEVICE_LOCK_WAIT_S (3600 s — queued
    measurement steps are bounded at 2400 s each, so one in-flight step
    plus slack). Set QWEN3_TTS_DEVICE_LOCK=0 to disable entirely.
    """
    if os.environ.get("QWEN3_TTS_DEVICE_LOCK", "1") in ("0", ""):
        return True
    # CPU-forced runs (tests, local dev) touch no shared device service —
    # holding the host-wide lock would only stall real measurements. Only
    # QWEN3_TTS_CPU counts: every entry point that honors it translates it
    # into jax.config.update("jax_platforms", "cpu") before device work, so
    # the skip is sound. JAX_PLATFORMS deliberately does NOT skip — this
    # image's sitecustomize preloads the TPU plugin, so the env var alone
    # does not actually force CPU (CLAUDE.md) and skipping on it would
    # leave a real-TPU engine unlocked.
    if os.environ.get("QWEN3_TTS_CPU", "0") not in ("", "0"):
        return True
    try:
        import fcntl
    except ImportError:  # non-posix: nothing to do
        return True
    if wait_s is None:
        wait_s = float(os.environ.get("QWEN3_TTS_DEVICE_LOCK_WAIT_S", 3600))
    fh = open(path, "a+")
    deadline = time.time() + wait_s
    warned = False
    while True:
        try:
            fcntl.flock(fh.fileno(), fcntl.LOCK_EX | fcntl.LOCK_NB)
            _HELD.append(fh)
            if warned:
                print(f"[device lock acquired{' for ' + label if label else ''}]",
                      file=sys.stderr, flush=True)
            return True
        except OSError:
            if time.time() >= deadline:
                fh.close()
                return False
            if not warned:
                print(
                    f"[device busy (another measurement holds {path}); "
                    f"waiting up to {wait_s:.0f}s"
                    f"{' for ' + label if label else ''}]",
                    file=sys.stderr, flush=True,
                )
                warned = True
            time.sleep(max(0.1, min(10.0, deadline - time.time())))


def require_device_lock(label: str, *, wait_s: float | None = None) -> None:
    """Acquire the device lock or exit(3) — the standard gate for
    measurement harnesses. Call AFTER argument parsing and AFTER any
    CPU-forcing decision, so ``--help``/CPU smoke modes never contend."""
    if not device_lock(wait_s=wait_s, label=label):
        print(f"{label}: device lock never freed; aborting",
              file=sys.stderr)
        raise SystemExit(3)
