"""Stage-budget profiler for the fused decode chunk on the real TPU.

Times each stage of runtime.generate's fused chunk — talker AR scan (+MTP
heads), code-predictor depth transformer, streaming codec — in isolation,
plus the full fused chunk, at the flagship MTP-2 configuration. Directs
optimization effort: PERF.md's "next levers" ranking comes from here.

Measurement rules (CLAUDE.md hardware gotchas):
- the axon service caches executions by input VALUE, so every iteration's
  inputs must evolve — each stage is written as a self-feeding chain
  (iteration k's outputs perturb iteration k+1's inputs);
- host<->device round trips cost ~20-100 ms, so we dispatch ITERS chained
  steps and block once on the final output; per-iter time = total / ITERS;
- one compile per (function x static shape): each stage compiles once.

Usage: python tools/profile_stages.py [--chunk 32] [--iters 12] [--b 1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--b", type=int, default=1, help="batch (serving slots)")
    ap.add_argument("--attn", type=int, default=512, help="attention bucket")
    ap.add_argument("--tiny", action="store_true", help="CPU smoke run")
    args = ap.parse_args()
    from qwen3_tts_tpu.device_lock import require_device_lock

    require_device_lock('profile_stages.py')

    from qwen3_tts_tpu.engine import configs, enable_compilation_cache
    from qwen3_tts_tpu.engine.api import Qwen3TTSModel
    from qwen3_tts_tpu.models.codec import (
        decode_codes_streaming,
        init_codec_stream_state,
    )
    from qwen3_tts_tpu.models.code_predictor import predict_residuals
    from qwen3_tts_tpu.models.layers import rope_tables
    from qwen3_tts_tpu.models.talker import (
        merge_step_tokens,
        mtp_logits,
        talker_forward,
    )
    from qwen3_tts_tpu.runtime.sampling import SamplingConfig, sample_token

    enable_compilation_cache()
    t0 = time.perf_counter()
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        cfg = configs.with_frames_per_step(configs.tiny("custom"), 2)
        model = Qwen3TTSModel.synthetic(cfg, seed=0)
    else:
        cfg = configs.flagship("custom", frames_per_step=2)
        model = Qwen3TTSModel.synthetic(cfg, seed=0, fast=True)
    print(f"[load {time.perf_counter() - t0:.0f}s]", flush=True)

    t = cfg.talker
    cc = cfg.codec
    B, chunk, A = args.b, args.chunk, args.attn
    fps = t.frames_per_step
    n_steps = chunk // fps
    sampling = SamplingConfig()
    dtype = jnp.bfloat16

    def timed(name, fn, carry, probe, iters=args.iters):
        # compile + warm. block_until_ready is NOT enough on the tunneled
        # device (execution is deferred until a value is actually fetched),
        # so each measurement ends with a small device_get of a probe value
        # that data-depends on EVERY iteration's full compute; the stage
        # functions thread their heavy outputs into the carried state so no
        # iteration can be elided. Error: one fetch RTT / iters.
        carry1 = fn(carry)
        jax.device_get(probe(carry1))
        start = time.perf_counter()
        c = carry1
        for _ in range(iters):
            c = fn(c)
        jax.device_get(probe(c))
        per = (time.perf_counter() - start) / iters
        per_frame = per / (chunk * B)
        print(
            f"{name:28s} {per * 1e3:8.2f} ms/chunk   "
            f"{per_frame * 1e6:8.1f} us/frame-stream",
            flush=True,
        )
        return per

    # ---- talker AR scan (+ MTP heads + sampling), attention over A ------
    cache_k = jnp.zeros((t.n_layers, B, A, t.n_kv_heads, t.head_dim), dtype)
    cache_v = jnp.zeros_like(cache_k)

    @jax.jit
    def talker_chunk(params, carry):
        ck, cv, pos, tok, key = carry
        cos_t, sin_t = rope_tables(cfg.max_seq_len, t.head_dim, t.rope_theta)

        def step(c, _):
            ck, cv, p, tk, k = c
            emb = merge_step_tokens(params, t, tk)[:, None, :]
            hidden, logits, ck, cv = talker_forward(
                params, t, emb, ck, cv, p, cos_t, sin_t, pad_len=0
            )
            h = hidden[:, -1, :]
            k, sub = jax.random.split(k)
            toks = [sample_token(logits[:, -1, :], sub, sampling)]
            hj = h
            for _j in range(1, fps):
                lg, hj = mtp_logits(params, t, hj, toks[-1])
                k, sub = jax.random.split(k)
                toks.append(sample_token(lg, sub, sampling))
            nxt = jnp.stack(toks, axis=1)
            return (ck, cv, p + 1, nxt, k), (nxt, h)

        (ck, cv, pos, tok, key), (tokens, hiddens) = jax.lax.scan(
            step, (ck, cv, pos, tok, key), None, length=n_steps
        )
        pos = jnp.where(pos + n_steps < A - n_steps, pos, 16)  # stay in window
        return (ck, cv, pos, tok, key)

    carry = (
        cache_k, cache_v, jnp.full((), 16, jnp.int32),
        jnp.zeros((B, fps), jnp.int32), jax.random.PRNGKey(0),
    )
    talker_s = timed(f"talker scan (A={A})",
                     partial(talker_chunk, model.params), carry,
                     probe=lambda c: c[3])

    # ---- code predictor (batched over B*chunk frames) --------------------
    @jax.jit
    def cp_stage(cp_params, carry):
        h, cb0 = carry
        res = predict_residuals(cp_params, cfg, h, cb0)
        # feed outputs back so inputs evolve every iteration
        h = h + (res[:, :1] - 512).astype(h.dtype) * 1e-3
        cb0 = (cb0 + res[:, 0] + 1) % cc.codebook_size
        return (h, cb0)

    h0 = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (B * chunk, t.hidden)), dtype
    )
    cb0 = jnp.arange(B * chunk, dtype=jnp.int32) % cc.codebook_size
    cp_s = timed(f"code predictor (B*T={B * chunk})",
                 partial(cp_stage, model.cp_params), (h0, cb0),
                 probe=lambda c: c[1])

    # ---- streaming codec --------------------------------------------------
    cstate0 = init_codec_stream_state(cfg, B, dtype=dtype)

    @jax.jit
    def codec_stage(codec_params, carry):
        codes, cstate, pos = carry
        wav, cstate = decode_codes_streaming(
            codec_params, cfg, codes, cstate, pos
        )
        codes = (codes + 1) % cc.residual_codebook_size
        # data-dependency on the conv-stack output (value is always 0, but
        # the compiler cannot prove it without computing wav)
        wav_dep = (jnp.sum(wav.astype(jnp.float32)) * 1e-30).astype(jnp.int32)
        pos = jnp.where(pos + chunk < 3000, pos + chunk, 0) + wav_dep
        return (codes, cstate, pos)

    codes0 = jnp.zeros((B, cc.num_codebooks, chunk), jnp.int32)
    codec_s = timed(
        "codec streaming decode", partial(codec_stage, model.codec_params),
        (codes0, cstate0, jnp.zeros((B,), jnp.int32)),
        probe=lambda c: c[2],
    )

    # ---- full fused chunk (the production path) ---------------------------
    from qwen3_tts_tpu.runtime.generate import make_decode_chunk_fn

    fused = make_decode_chunk_fn(cfg, chunk, sampling, attn_len=A)

    def fused_step(carry):
        ck, cv, cstate, pos, tok, key, nf = carry
        ck, cv, cstate, pos, tok, key, nf, n_valid, codes, wav = fused(
            model.params, model.cp_params, model.codec_params,
            ck, cv, cstate, pos, 0, nf, tok, key,
        )
        pos = jnp.where(pos + n_steps < A - n_steps, pos, 16)
        wav_dep = (jnp.sum(wav.astype(jnp.float32)) * 1e-30).astype(jnp.int32)
        nf = jnp.where(nf + chunk < 3000, nf, 0) + wav_dep + jnp.sum(n_valid) * 0
        return (ck, cv, cstate, pos, tok, key, nf)

    S = cfg.max_seq_len
    full_k = jnp.zeros((t.n_layers, B, S, t.n_kv_heads, t.head_dim), dtype)
    carry = (
        full_k, jnp.zeros_like(full_k),
        init_codec_stream_state(cfg, B, dtype=dtype),
        jnp.full((), 16, jnp.int32), jnp.zeros((B, fps), jnp.int32),
        jax.random.PRNGKey(1), jnp.zeros((), jnp.int32),
    )
    fused_s = timed("FULL fused chunk", fused_step, carry,
                    probe=lambda c: (c[4], c[6]))

    other = fused_s - talker_s - cp_s - codec_s
    tot = fused_s
    print("\nshare of fused chunk:")
    for name, v in [
        ("talker", talker_s), ("code predictor", cp_s),
        ("codec", codec_s), ("other/fusion delta", other),
    ]:
        print(f"  {name:20s} {v * 1e3:7.2f} ms  {100 * v / tot:5.1f}%")


if __name__ == "__main__":
    main()
