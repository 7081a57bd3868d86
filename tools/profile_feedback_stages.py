"""Per-stage serial floor of the published fps=1 decode (VERDICT r4 #3).

The raw-import chunk measures ~11.8 ms/frame at its best schedule
(tools/profile_feedback_decode.py) against the ~7.7 ms/frame bytes/frame
HBM bound (PERF.md speed-of-light arithmetic). The protocol forces the
three stages to run SERIALLY per frame (talker -> cp-in-loop -> feedback
-> next frame), so the achievable floor is the SUM of the isolated stage
times, not the max. This harness times each stage as a self-feeding
chain (service caches by value -> inputs must evolve; dispatch ITERS
chained steps, fetch once):

  talker  one single-frame talker pass against a 512-bucket KV cache
  cp      one full sequential depth column (Q-1 passes, dg=1)
  codec   code2wav streaming decode, amortised per frame at chunk 32

Prints per-stage ms/frame, their serial sum, and the measured fused-chunk
ms/frame for comparison — the gap between SUM and CHUNK is fusion win /
loop overhead; the gap between the bytes bound and SUM is small-op
latency the shape pays inherently.

Usage: python tools/profile_feedback_stages.py [--iters 48] [--tiny]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=48)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--attn", type=int, default=512)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()
    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from qwen3_tts_tpu.device_lock import require_device_lock

        require_device_lock("profile_feedback_stages.py")

    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.engine import configs, enable_compilation_cache
    from qwen3_tts_tpu.engine.api import Qwen3TTSModel
    from qwen3_tts_tpu.models.code_predictor import predict_residuals
    from qwen3_tts_tpu.models.codec import (
        decode_codes_streaming,
        init_codec_stream_state,
    )
    from qwen3_tts_tpu.models.layers import rope_tables
    from qwen3_tts_tpu.models.talker import talker_forward

    enable_compilation_cache()
    cfg = (configs.tiny_feedback("custom") if args.tiny
           else configs.flagship_feedback_code2wav("custom"))
    t = cfg.talker
    cc = cfg.codec
    t0 = time.perf_counter()
    model = Qwen3TTSModel.synthetic(cfg, seed=0, fast=True)
    gen = model.generator  # fused/grouped decode layouts
    params, cp_params, codec_params = (
        gen.params, gen.cp_params, gen.codec_params
    )
    print(f"[load {time.perf_counter() - t0:.0f}s]", flush=True)

    S = args.attn
    B = 1
    n_res = cc.num_codebooks - 1
    iters = args.iters

    # -- talker chain: one frame per iteration against a KV cache ----------
    @jax.jit
    def talker_chain(params, emb0, ck, cv, salt):
        emb0 = emb0 + salt * 1e-4
        cos_t, sin_t = rope_tables(S, t.head_dim, t.rope_theta)

        def step(carry, _):
            emb, ck, cv, pos = carry
            hidden, logits, ck, cv = talker_forward(
                params, t, emb, ck, cv, pos, cos_t, sin_t
            )
            # feed the hidden back as the next input embedding (evolves
            # every iteration; value-cache-proof)
            nxt = hidden[:, -1:, :] * 1e-3 + emb * 0.5
            return (nxt, ck, cv, pos + 1), logits[:, -1, 0]

        (emb, ck, cv, pos), ls = jax.lax.scan(
            step, (emb0, ck, cv, jnp.int32(64)), None, length=iters
        )
        return ls.sum() + emb.sum()

    # -- cp chain: one full sequential depth column per iteration ----------
    @jax.jit
    def cp_chain(cp_params, h0, salt):
        h0 = h0 + salt * 1e-4
        def step(carry, i):
            h = carry
            codes = predict_residuals(
                cp_params, cfg, h, jnp.zeros((B,), jnp.int32) + (i % 8)
            )
            h = h * 0.999 + codes.sum().astype(h.dtype) * 1e-6
            return h, codes[:, 0]

        h, cs = jax.lax.scan(step, h0, jnp.arange(iters))
        return h.sum() + cs.sum()

    # -- codec chain: one chunk per iteration, amortised per frame ---------
    @jax.jit
    def codec_chain(codec_params, codes0, cstate0, salt):
        codes0 = (codes0 + salt) % cc.codebook_size

        def step(carry, i):
            codes, cstate, nf = carry
            wav, cstate = decode_codes_streaming(
                codec_params, cfg, codes, cstate, nf
            )
            codes = (codes + i) % cc.codebook_size
            return (codes, cstate, nf + args.chunk), wav.sum()

        (codes, cstate, nf), ws = jax.lax.scan(
            step, (codes0, cstate0, jnp.int32(0)), jnp.arange(iters)
        )
        return ws.sum()

    rng = np.random.default_rng(0)
    emb0 = jnp.asarray(rng.normal(0, 0.02, (B, 1, t.hidden)),
                       jnp.bfloat16 if cfg.dtype == "bfloat16"
                       else jnp.float32)
    cache = jnp.zeros((t.n_layers, B, S, t.n_kv_heads, t.head_dim),
                      emb0.dtype)
    cp_h0 = jnp.asarray(rng.normal(0, 0.02, (B, t.hidden)), emb0.dtype)
    codes0 = jnp.asarray(
        rng.integers(0, min(cc.codebook_size, cc.residual_codebook_size),
                     (B, cc.num_codebooks, args.chunk)), jnp.int32)
    cstate0 = init_codec_stream_state(cfg, B, dtype=emb0.dtype)

    # the service caches executions by input VALUE: a per-call salt keeps
    # every timed execution distinct (CLAUDE.md)
    salt = [0]

    def salted(fn):
        def run():
            salt[0] += 1
            return fn(jnp.int32(salt[0]))
        return run

    # fused-talker arm: qkv + gate_up relayout (the cp already runs
    # fused; the talker historically didn't — tp-sharding rationale).
    # Measures the op-count lever on the single-chip decode floor.
    from qwen3_tts_tpu.models.layers import fuse_block_projections

    fused_params = dict(params)
    fused_params["blocks"] = fuse_block_projections(params["blocks"])

    chains = {
        "talker": (salted(lambda s_: talker_chain(params, emb0, cache,
                                                  cache, s_)),
                   iters),
        "talker_fused": (salted(
            lambda s_: talker_chain(fused_params, emb0, cache, cache, s_)),
            iters),
        "cp": (salted(lambda s_: cp_chain(cp_params, cp_h0, s_)), iters),
        "codec": (salted(lambda s_: codec_chain(codec_params, codes0,
                                                cstate0, s_)),
                  iters * args.chunk),
    }
    out = {}
    for name, (fn, frames) in chains.items():
        t0 = time.perf_counter()
        jax.device_get(fn())
        print(f"[{name}: compile+first {time.perf_counter() - t0:.0f}s]",
              flush=True)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.device_get(fn())
            times.append(time.perf_counter() - t0)
        ms = 1e3 * min(times) / frames
        out[name] = round(ms, 3)
        print(f"{name}: {ms:.3f} ms/frame (min of {args.reps})", flush=True)

    out["serial_sum"] = round(out["talker"] + out["cp"] + out["codec"], 3)
    if "talker_fused" in out:
        out["serial_sum_fused"] = round(
            out["talker_fused"] + out["cp"] + out["codec"], 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
