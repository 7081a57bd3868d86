"""Bisect the fps=2+depth_group=5 8-slot serving kernel fault (VERDICT r4
#1 / PERF.md round 4).

Round 4 established: the documented recovery shape (published protocol,
fps=2, dg=5) serves cleanly at 4 slots (29.5x aggregate) but kernel-faults
the remote TPU worker at 8 slots, reproducibly across service moods, while
every other audited shape serves fine at 8 — i.e. the fault is
capacity-shaped. This tool walks the slot counts between the known-good
and known-crashing points, then tries the int8 KV cache (halved cache
footprint) at the first crashing count — each arm in its OWN subprocess so
a worker crash costs one arm, with a recovery-probe loop between arms
(a crash wedges the service 15-25 min; CLAUDE.md third failure mode).

Usage: python tools/bisect_serving_slots.py [--slots 5 6 7] [--kv-at 8]
       [--fps 2] [--dg 5] [--frames 120] [--tiny]

Prints one JSON line per arm plus a final summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _probe_until_up(deadline_s: float = 2400.0,
                    probe_timeout_s: float = 180.0) -> float:
    """Block until a trivial-op subprocess probe succeeds (service
    recovered); returns seconds waited. Mirrors bench.preflight."""
    start = time.time()
    attempt = 0
    while time.time() - start < deadline_s:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "print(float(jnp.arange(8.0).sum()))"],
                timeout=probe_timeout_s, capture_output=True,
            )
            if r.returncode == 0:
                return time.time() - start
        except subprocess.TimeoutExpired:
            pass
        print(f"[service unresponsive (probe {attempt}); retrying]",
              file=sys.stderr, flush=True)
        time.sleep(30)
    raise RuntimeError(f"service never recovered in {deadline_s:.0f}s")


def child(slots: int, fps: int, dg: int, frames: int, kv: str,
          tiny: bool) -> None:
    if tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from qwen3_tts_tpu.engine import configs, enable_compilation_cache
    from qwen3_tts_tpu.engine.api import Qwen3TTSModel

    enable_compilation_cache()
    if tiny:
        cfg = configs.tiny_feedback("custom", frames_per_step=fps,
                                    depth_group=min(dg, 3))
    else:
        cfg = configs.flagship_feedback_code2wav(
            "custom", frames_per_step=fps, depth_group=dg
        )
    t0 = time.perf_counter()
    model = Qwen3TTSModel.synthetic(cfg, seed=0, fast=True)
    load_s = time.perf_counter() - t0

    sys.path.insert(0, REPO)
    import bench

    m = bench._serving_metrics(model, slots, frames_target=frames)
    m["frames_target"] = frames
    print(json.dumps({"slots": slots, "kv": kv, "load_s": round(load_s, 1),
                      **m}), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, nargs="+", default=[5, 6, 7])
    ap.add_argument("--kv-at", type=int, default=8,
                    help="additionally try int8 KV at this slot count "
                    "(0 = skip)")
    ap.add_argument("--fps", type=int, default=2)
    ap.add_argument("--dg", type=int, default=5)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--timeout", type=float, default=1500.0,
                    help="per-arm subprocess timeout seconds")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny CPU smoke of the harness itself")
    ap.add_argument("--child", nargs=2, default=None,
                    metavar=("SLOTS", "KV"), help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child is not None:
        child(int(args.child[0]), args.fps, args.dg, args.frames,
              args.child[1], args.tiny)
        return

    if not args.tiny:
        from qwen3_tts_tpu.device_lock import require_device_lock

        require_device_lock("bisect_serving_slots.py")

    arms = [(s, "bf16") for s in args.slots]
    if args.kv_at:
        arms.append((args.kv_at, "int8"))
    results = []
    for slots, kv in arms:
        env = {**os.environ, "QWEN3_TTS_DEVICE_LOCK": "0"}
        if kv == "int8":
            env["QWEN3_TTS_KV"] = "int8"
        cmd = [sys.executable, os.path.abspath(__file__),
               "--child", str(slots), kv,
               "--fps", str(args.fps), "--dg", str(args.dg),
               "--frames", str(args.frames)]
        if args.tiny:
            cmd.append("--tiny")
        t0 = time.time()
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=args.timeout, env=env)
        except subprocess.TimeoutExpired:
            row = {"slots": slots, "kv": kv,
                   "error": f"arm timed out after {args.timeout:.0f}s "
                   "(hung service?)"}
            results.append(row)
            print(json.dumps(row), flush=True)
            if not args.tiny:
                waited = _probe_until_up()
                print(f"[service recovered after {waited:.0f}s]",
                      file=sys.stderr, flush=True)
            continue
        row = None
        for line in reversed(r.stdout.splitlines()):
            if line.lstrip().startswith("{"):
                try:
                    row = json.loads(line)
                except json.JSONDecodeError:
                    pass
                break
        if row is None:
            row = {"slots": slots, "kv": kv,
                   "error": f"arm died rc={r.returncode} (crashed TPU "
                   f"worker?): {r.stderr.strip()[-300:]}"}
        row["arm_wall_s"] = round(time.time() - t0, 1)
        results.append(row)
        print(json.dumps(row), flush=True)
        if "error" in row and not args.tiny:
            waited = _probe_until_up()
            print(f"[service recovered after {waited:.0f}s]",
                  file=sys.stderr, flush=True)
    ok = [r for r in results if "error" not in r]
    bad = [r for r in results if "error" in r]
    print(json.dumps({
        "summary": True,
        "fps": args.fps, "dg": args.dg,
        # per-KV-format ceilings: the int8 mitigation arm must not be
        # reported as the bf16 clean bound the bisect exists to find
        "max_clean_slots_bf16": max(
            (r["slots"] for r in ok if r.get("kv") == "bf16"), default=0
        ),
        "max_clean_slots_int8": max(
            (r["slots"] for r in ok if r.get("kv") == "int8"), default=0
        ),
        "clean": [{k: r.get(k) for k in ("slots", "kv", "agg_rtf",
                                         "ttfa_s_p50")} for r in ok],
        "failed": [{k: r.get(k) for k in ("slots", "kv", "error")}
                   for r in bad],
    }), flush=True)


if __name__ == "__main__":
    main()
