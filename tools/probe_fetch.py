"""Probe: how much of the serving gap is the per-chunk host fetch?

Drives ServingEngine.dispatch_step manually and compares three collect
policies over identical workloads:
  A. full per-chunk fetch (production collect_step: n_valid+codes+wav)
  B. tiny fetch only (n_valid per chunk; codes+wav left on device)
  C. no fetch until the end (pure dispatch throughput; EOS ignored)

If B ~= C >> A, the wav bytes are the bottleneck -> defer wav fetches off
the critical path. If A ~= B, the per-chunk round trip itself (not bytes)
dominates -> deepen pipelining instead.

Usage: python tools/probe_fetch.py [--reps 3] [--frames 120] [--streams 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=8)
    args = ap.parse_args()
    from qwen3_tts_tpu.device_lock import require_device_lock

    require_device_lock('probe_fetch.py')

    import jax

    from qwen3_tts_tpu.engine import configs, enable_compilation_cache
    from qwen3_tts_tpu.engine.api import Qwen3TTSModel
    from qwen3_tts_tpu.runtime.prompts import PromptSpec
    from qwen3_tts_tpu.runtime.serving import ServingEngine

    enable_compilation_cache()
    t0 = time.perf_counter()
    cfg = configs.flagship("custom", frames_per_step=2)
    model = Qwen3TTSModel.synthetic(cfg, seed=0, fast=True)
    print(f"[load {time.perf_counter() - t0:.0f}s]", flush=True)

    eng = ServingEngine(model, max_streams=args.streams, chunk=args.chunk)
    seq = [0]

    def prompts(n, toks=40):
        seq[0] += 1
        base = 3 + seq[0]
        return [
            PromptSpec(
                text_tokens=(np.arange(toks) * (i + base) % cfg.talker.vocab_size)
                .astype(np.int32),
                speaker_id=i % 9,
            )
            for i in range(n)
        ]

    eng.run(prompts(1), max_frames=eng.chunk)
    eng.run(prompts(args.streams), max_frames=eng.chunk)  # warm compiles

    n_chunks = args.frames // args.chunk

    def run_policy(policy: str) -> float:
        """Fixed-length workload: submit N streams, run exactly n_chunks
        steps with a depth-3 pipeline under the given fetch policy."""
        ids = [eng.submit(p, max_frames=args.frames)
               for p in prompts(args.streams)]
        t1 = time.perf_counter()
        inflight = []
        fetched_frames = 0
        for step in range(n_chunks):
            payload = eng.dispatch_step()
            if payload is not None:
                inflight.append(payload)
            while len(inflight) > (3 if step < n_chunks - 1 else 0):
                snapshot, n_valid, codes, wav = inflight.pop(0)
                if policy == "full":
                    v, c, w = jax.device_get((n_valid, codes, wav))
                    fetched_frames += int(np.sum(v))
                elif policy == "tiny":
                    v = jax.device_get(n_valid)
                    fetched_frames += int(np.sum(v))
                # "none": drop the payload, fetch nothing yet
        if policy == "none":  # force completion with one tiny final fetch
            v = jax.device_get(inflight[-1][1]) if inflight else None
        wall = time.perf_counter() - t1
        # drain engine state for the next policy run
        for sid in ids:
            eng.streams[sid].done = True
        for slot in range(eng.B):
            if eng._slots[slot] is not None:
                eng._slots[slot] = None
        import jax.numpy as jnp
        eng.active_mask = jnp.zeros((eng.B,), jnp.bool_)
        eng._pending.clear()
        audio = args.streams * args.frames / cfg.codec.frame_rate
        return audio / wall

    policies = ["full", "tiny", "none"]
    scores = {p: [] for p in policies}
    for rep in range(args.reps):
        for p in policies:
            rtf = run_policy(p)
            scores[p].append(rtf)
            print(f"rep{rep} {p:5s}: {rtf:6.1f}x", flush=True)
    print("\ndispatch-throughput RTF by fetch policy (median):")
    for p in policies:
        print(f"  {p:5s}: {np.median(scores[p]):6.1f}x   (runs: "
              + ", ".join(f"{v:.1f}" for v in scores[p]) + ")")


if __name__ == "__main__":
    main()
