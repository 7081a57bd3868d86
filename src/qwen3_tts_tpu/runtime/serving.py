"""Continuous batched multi-stream serving: N concurrent voices on one chip.

The reference serves exactly one blocking request at a time
(reference custom.py:154-176); MLX on a laptop has no reason to batch. A TPU
does: the decode step is HBM-bandwidth-bound streaming 1.7 GB of weights per
token, so stepping 8 streams costs nearly the same as stepping 1 — batching
is almost-free throughput (BASELINE.md: "8 concurrent voices, continuous
decode on one v5e chip").

Design (continuous batching, slot model):

- fixed ``max_streams`` decode slots share batched KV caches
  [L, B, S, H_kv, hd] that live in HBM across the engine's lifetime and are
  donated through every step (zero realloc);
- per-slot position/pad vectors: ``models.layers.attention`` masks each
  stream independently, so streams join/leave at any time without touching
  other slots (a new prompt simply overwrites the slot's cache range);
- CHUNKED prefill, interleaved with decode: a joining prompt's prefill runs
  ``prefill_chunk`` tokens at a time into a bucket-sized scratch cache, one
  slice per decode step while other streams are live (so a join never
  stalls them for a full-prompt prefill), then scatters into the slot; with
  no live streams the slices run back-to-back;
- one jitted chunk-decode advances ALL slots ``chunk`` tokens with on-device
  sampling; inactive slots hold position and re-write the same cache row
  (bounded, no overflow);
- the codec decodes all slots' new frames in one batched call with
  per-slot per-conv left contexts and absolute positions.

EOS detection is the only host sync per chunk, same as the single-stream
path (runtime.generate).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.configs import ModelConfig
from ..models.code_predictor import predict_residuals
from ..models.layers import kv_cache_init, kv_env_format, rope_tables
from ..models.talker import talker_forward
from .generate import cp_samples, fuse_decode_params, group_quantized
from .prompts import PromptSpec
from .sampling import SamplingConfig, sample_token


def _async_fetch() -> bool:
    """Start device->host copies at dispatch time (QWEN3_TTS_ASYNC_FETCH).

    Helps when transfers and compute genuinely overlap; on single-connection
    tunneled devices an early copy can instead DELAY the next dispatch, so
    this stays measurable per deployment (tools/ab_serving.py)."""
    import os

    return os.environ.get("QWEN3_TTS_ASYNC_FETCH", "1") != "0"


def _defer_wav() -> bool:
    """Leave waveform bytes AND code slabs on device during steady-state
    serving (QWEN3_TTS_DEFER_WAV): each chunk fetches only the [B] n_valid
    vector (a few bytes); wav rows and codes are gathered in one batched,
    buffer-deduplicated fetch at collect() time. A stream's FIRST audible
    chunk is still fetched synchronously so TTFA stays an audio-on-host
    measurement, and streams with an on_chunk callback keep per-chunk wav
    fetches. Off by default until measured (tools/probe_fetch.py
    quantifies the win per deployment)."""
    import os

    return os.environ.get("QWEN3_TTS_DEFER_WAV", "0") != "0"


@dataclass
class Stream:
    """Host-side state of one serving slot."""

    slot: int
    stream_id: int
    active: bool = False      # prefill finished, decoding
    done: bool = False
    frames: int = 0
    max_frames: int = 0
    expected_end: int = 0     # predicted final cache position (grouping)
    codes: list[np.ndarray] = field(default_factory=list)   # [Q, n] slabs
    # int16 host arrays, or _DeferredWav device views (QWEN3_TTS_DEFER_WAV)
    # until collect() resolves them
    wav_chunks: list = field(default_factory=list)
    submitted_at: float = 0.0
    ttfa_s: float | None = None
    on_chunk: Callable[[np.ndarray], None] | None = None


@dataclass
class _DeferredWav:
    """A wav chunk left on device (QWEN3_TTS_DEFER_WAV): a view into one
    decode step's [B, chunk*hop] output. Resolved host-side in one batched
    fetch by ServingEngine.collect."""

    dev: Any                  # the step's full wav array (device)
    slot: int
    n: int                    # valid samples for this stream


@dataclass
class _DeferredCodes:
    """A code slab left on device (QWEN3_TTS_DEFER_WAV): a view into one
    decode step's [B, Q, chunk] codes. Same batched dedup resolution as
    _DeferredWav — steady-state chunks then fetch only n_valid."""

    dev: Any                  # the step's full codes array (device)
    slot: int
    n: int                    # valid frames for this stream


@dataclass
class _AccumRow:
    """A finished stream's accumulated audio, still on device (accum mode):
    gathered out of the shared buffer at finish time (safe against slot
    reuse), fetched in ONE resolve at collect()."""

    dev: Any                  # [cap] int16 device row (async copy started)
    startup: int              # code2wav run-in samples to drop
    n: int                    # frames * hop valid samples


@dataclass
class _PendingPrefill:
    """A submitted stream whose prompt is still being prefilled, slice by
    slice, into a scratch cache."""

    stream: Stream
    emb: Any                  # [1, Lb, D] left-padded prompt embeddings
    pad: int
    Lb: int
    # scratch caches [L, 1, Lb, H_kv, hd] — allocated LAZILY by the
    # slice-prefill path; the batched cold-start path builds its own
    # batch-sized scratch, so allocating these at submit() would put two
    # dead device ops per stream on the cold-start TTFA path
    sk: Any = None
    sv: Any = None
    pos: int = 0              # tokens prefilled so far
    last_logits: Any = None   # [V] logits at the final prompt position
    last_hidden: Any = None   # [D] hidden at the final prompt position
    trailing: Any = None      # [1, Tb, D] trailing-text buffer (feedback
    #                           protocol only — runtime.generate)
    # deferred assembly (VERDICT r4 #7): fast-path prompts submit with
    # emb=None and an AssemblyPlan; the cold-start batch materialises all
    # of them in ONE dispatch (generate.assemble_plans_batched), the
    # slice path on first touch (assemble_from_plan)
    plan: Any = None


class ServingEngine:
    """Continuous batched decoding over ``max_streams`` slots."""

    def __init__(
        self,
        model,
        *,
        max_streams: int = 8,
        chunk: int | None = None,
        chunk_schedule: tuple[int, ...] | None = None,
        prefill_chunk: int = 128,
        sampling: SamplingConfig | None = None,
        n_groups: int | None = None,
        accumulate_wav: bool = False,
        accum_cap_frames: int = 600,
    ):
        self.model = model
        self.cfg: ModelConfig = model.cfg
        # decode-layout relayout (qkv/gate_up fusion, runtime.generate);
        # model.* keeps the canonical split trees for training/export
        self.cp_params, self.codec_params = fuse_decode_params(
            model.cp_params, model.codec_params
        )
        self.params, self.cp_params, self.codec_params = group_quantized(
            model.params, self.cp_params, self.codec_params
        )
        self.B = max_streams
        # adaptive chunk schedule (mirrors runtime.generate): dispatches use
        # small chunks while the YOUNGEST active stream is early (protecting
        # its TTFA) and grow to the last entry in steady state, amortizing
        # the per-chunk host round trip + fetch. An explicit ``chunk`` pins
        # a fixed single-size schedule (tests, fixed-latency deployments).
        t = self.cfg.talker
        if chunk_schedule is not None:
            self.chunk_schedule = tuple(chunk_schedule)
        elif chunk is not None:
            self.chunk_schedule = (chunk,)
        else:
            # protocol-aware default: the raw-import feedback shape leads
            # with a 4-frame chunk (cold-start TTFA — see
            # generate.default_chunk_schedule)
            from .generate import default_chunk_schedule

            self.chunk_schedule = default_chunk_schedule(t)
        self.sampling = sampling or SamplingConfig()
        S = self.cfg.max_seq_len
        dtype = jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32
        shape = (t.n_layers, self.B, S, t.n_kv_heads, t.head_dim)
        # dense bf16 by default; QWEN3_TTS_KV=int8 stores the caches as
        # KVQuant pairs (halved attention-read bytes — models/layers.py).
        # The format is pinned at construction: prefill scratch caches must
        # match the main caches even if the env var changes mid-run.
        self._cache_dtype = dtype
        self._kv_fmt = kv_env_format()
        self.cache_k = kv_cache_init(shape, dtype, kv_format=self._kv_fmt)
        self.cache_v = kv_cache_init(shape, dtype, kv_format=self._kv_fmt)
        from ..models.codec import init_codec_stream_state

        self.cstate = init_codec_stream_state(self.cfg, self.B, dtype=dtype)
        self.pos = jnp.zeros((self.B,), jnp.int32)
        self.pad = jnp.zeros((self.B,), jnp.int32)
        self.frames_dev = jnp.zeros((self.B,), jnp.int32)
        self.fps = t.frames_per_step
        # round chunk sizes up to whole MTP steps (mirrors Generator)
        from .generate import align_chunk_schedule

        self.chunk_schedule = align_chunk_schedule(
            self.chunk_schedule, self.fps
        )
        self.tok = jnp.full((self.B, self.fps), t.codec_pad, jnp.int32)
        self.active_mask = jnp.zeros((self.B,), jnp.bool_)
        # wav accumulation (batch / non-streaming jobs): chunk audio writes
        # into a persistent per-slot device buffer instead of being fetched
        # per chunk — the steady-state fetch shrinks to the [B] n_valid
        # vector (tools/probe_fetch.py measured that ceiling ~2x the
        # full-fetch throughput on this tunnel), and each stream's audio
        # crosses the link ONCE when it finishes. Trades streaming/TTFA
        # away: on_chunk consumers and audio-on-host TTFA need the
        # default per-chunk path.
        self.accum = bool(accumulate_wav)
        if self.accum:
            self.accum_cap_frames = int(accum_cap_frames)
            cap = self.accum_cap_frames * self.cfg.codec.hop
            self.wav_accum = jnp.zeros((self.B, cap), jnp.int16)
            self._row_gather = jax.jit(
                lambda buf, i: jax.lax.dynamic_index_in_dim(
                    buf, i, axis=0, keepdims=False
                )
            )
            hop = self.cfg.codec.hop
            cap_frames = self.accum_cap_frames

            # scatter one step's [B, chunk*hop] PCM into the buffer at each
            # slot's frame offset (one compile per chunk size in the
            # schedule); the buffer is donated through every step. Rows
            # whose write would overflow the buffer are dropped: the
            # device-side frame counter keeps advancing on speculative
            # steps dispatched past EOS/budget (active only flips at
            # collect), and a clamped dynamic_update_slice would otherwise
            # overwrite a finished stream's TAIL audio — this guard makes
            # ANY pipeline depth safe, not just ones inside the submit
            # margin.
            def _write(buf, wav, frames_before):
                def row_write(row, w, o):
                    upd = jax.lax.dynamic_update_slice(row, w, (o * hop,))
                    ok = o + w.shape[0] // hop <= cap_frames
                    return jnp.where(ok, upd, row)

                return jax.vmap(row_write)(buf, wav, frames_before)

            self._accum_write = jax.jit(_write, donate_argnums=(0,))
        # published feedback protocol (TalkerConfig.feedback="residual_sum",
        # runtime.generate): per-slot residual-embedding sums, trailing-text
        # buffers and consumed-row counters, all device-resident
        self.feedback = t.feedback == "residual_sum"
        if self.feedback:
            # per-frame residual feedback sums of each slot's previous step
            # ([B, fps, D] — fps == 1 for real 1-frame checkpoints)
            self.res_sum = jnp.zeros((self.B, self.fps, t.hidden), dtype)
            self.trail = jnp.zeros(
                (self.B, t.trailing_bucket, t.hidden), dtype
            )
            self.trail_g = jnp.zeros((self.B,), jnp.int32)
        self.key = jax.random.PRNGKey(0)
        self.streams: dict[int, Stream] = {}
        self._slots: list[Stream | None] = [None] * self.B
        self._next_id = 0
        self.prefill_chunk = prefill_chunk
        # per-slot-group attention windows: slots split into contiguous
        # groups; each group's decode reads only ITS max-needed cache
        # prefix, so one long-running stream doesn't tax every short
        # stream's KV bandwidth (weight reads stay shared — the split is
        # inside attention only, models/layers.py window_split)
        if n_groups is not None:
            assert max_streams % n_groups == 0, (max_streams, n_groups)
            self.n_groups = n_groups
        else:
            self.n_groups = (
                2 if (max_streams >= 4 and max_streams % 2 == 0) else 1
            )
        self._pending: list[_PendingPrefill] = []
        self._prefill_fns: dict[tuple[int, int], Callable] = {}
        self._prefill_batch_fns: dict[tuple[int, int], Callable] = {}
        self._scatter_fns: dict[int, Callable] = {}
        self._decode_fns: dict[tuple[int, tuple[int, ...]], Callable] = {}
        self._host_pos = [0] * self.B  # host mirror for attn bucketing
        self._host_frames = [0] * self.B  # dispatched frames (chunk picking)

    @property
    def chunk(self) -> int:
        """First-chunk size (TTFA granularity). Assigning pins a fixed
        single-size schedule — the pre-adaptive behavior."""
        return self.chunk_schedule[0]

    @chunk.setter
    def chunk(self, value: int) -> None:
        assert value % self.fps == 0, (value, self.fps)
        self.chunk_schedule = (value,)

    def _pick_chunk(self, active) -> int:
        """Schedule position from the YOUNGEST active stream: a stream that
        has not yet emitted its first-chunk frames keeps dispatches small
        (its TTFA is one chunk away); once every active stream is past the
        ramp, steady-state chunks amortize the per-dispatch host costs."""
        sched = self.chunk_schedule
        if len(sched) == 1:
            return sched[0]
        youngest = min(self._host_frames[slot] for slot, _ in active)
        edge = 0
        for c in sched[:-1]:
            edge += c
            if youngest < edge:
                return c
        return sched[-1]

    # -- jitted stages ------------------------------------------------------

    def _prefill_slice_fn(self, C: int, Lb: int) -> Callable:
        """Jitted prefill of ONE ``C``-token slice into an ``Lb``-long
        scratch cache (chunked prefill: a joining stream never stalls live
        streams for more than one slice's compute)."""
        key = (C, Lb)
        if key in self._prefill_fns:
            return self._prefill_fns[key]
        cfg = self.cfg
        t = cfg.talker

        @partial(jax.jit, donate_argnums=(3, 4))
        def prefill_slice(params, emb_slice, pad_len, sk, sv, pos):
            cos_t, sin_t = rope_tables(cfg.max_seq_len, t.head_dim, t.rope_theta)
            hidden, logits, sk, sv = talker_forward(
                params, t, emb_slice, sk, sv, pos, cos_t, sin_t,
                pad_len=pad_len, head_last_only=True,
            )
            return sk, sv, logits[0, -1, :], hidden[0, -1, :]

        self._prefill_fns[key] = prefill_slice
        return prefill_slice

    def _prefill_batch_fn(self, Lb: int, nb: int) -> Callable:
        """Jitted fused cold-start prefill: ``nb`` whole single-slice prompts
        (same bucket ``Lb``) prefilled, seed tokens sampled (incl. MTP seed
        frames), caches scattered into their slots, and every per-slot state
        vector updated — all in ONE dispatch. Without this, N simultaneous
        submissions cost N prefill dispatches + N scatters + ~10 tiny eager
        device ops each before the first decode step.

        Padded batch rows replicate entry 0 (same emb/pad/slot) and sample
        with slot-folded per-row keys, so their duplicate scatter writes
        are bit-identical to entry 0's under BOTH greedy and stochastic
        sampling — order-independent, harmless.
        """
        key = (Lb, nb)
        if key in self._prefill_batch_fns:
            return self._prefill_batch_fns[key]
        cfg = self.cfg
        t = cfg.talker
        fps = self.fps
        sampling = self.sampling
        from ..models.talker import mtp_logits

        @partial(jax.jit, donate_argnums=(5, 6))
        def prefill_activate(params, emb, pads, sk, sv, cache_k, cache_v,
                             slots, pos_v, pad_v, tok_v, frames_v, active_v,
                             conv, key):
            # emb [nb, Lb, D]; pads/slots [nb]; sk/sv [L, nb, Lb, H_kv, hd]
            cos_t, sin_t = rope_tables(cfg.max_seq_len, t.head_dim, t.rope_theta)
            hidden, logits, sk, sv = talker_forward(
                params, t, emb, sk, sv, jnp.int32(0), cos_t, sin_t,
                pad_len=pads, head_last_only=True,
            )
            h = hidden[:, -1, :]

            def row_sample(lg, sub):
                # per-row keys folded from the SLOT id: padding rows
                # replicate entry 0's slot AND logits, so they sample the
                # IDENTICAL token — the duplicate-index scatter below stays
                # order-independent under stochastic sampling too
                keys = jax.vmap(lambda s: jax.random.fold_in(sub, s))(slots)
                return jax.vmap(
                    lambda l, k: sample_token(l[None, :], k, sampling)[0]
                )(lg, keys)

            key, sub = jax.random.split(key)
            toks = [row_sample(logits[:, -1, :], sub)]
            for _ in range(1, fps):  # MTP seed frames
                lg, h = mtp_logits(params, t, h, toks[-1])
                key, sub = jax.random.split(key)
                toks.append(row_sample(lg, sub))
            first = jnp.stack(toks, axis=1)                  # [nb, fps]

            cache_k = jax.tree.map(
                lambda c, u: c.at[:, slots, :Lb].set(u), cache_k, sk
            )
            cache_v = jax.tree.map(
                lambda c, u: c.at[:, slots, :Lb].set(u), cache_v, sv
            )
            pos_v = pos_v.at[slots].set(Lb)
            pad_v = pad_v.at[slots].set(pads)
            tok_v = tok_v.at[slots].set(first)
            frames_v = frames_v.at[slots].set(0)
            active_v = active_v.at[slots].set(True)
            # reset the codec's per-conv left contexts for the joining slots
            conv = jax.tree.map(lambda a: a.at[slots].set(0.0), conv)
            return (cache_k, cache_v, pos_v, pad_v, tok_v, frames_v,
                    active_v, conv, key)

        self._prefill_batch_fns[key] = prefill_activate
        return prefill_activate

    def _decode_fn(self, chunk: int, wins: tuple[int, ...]) -> Callable:
        """Fused serve step compiled for one (chunk, per-group attention
        window tuple); one window entry per slot group (a single entry =
        no split). Each (chunk, windows) pair compiles its own variant."""
        fn_key = (chunk, wins)
        if fn_key in self._decode_fns:
            return self._decode_fns[fn_key]
        from ..models.codec import decode_codes_streaming
        from ..models.talker import merge_step_tokens, mtp_logits
        from ..ops.pcm import wav_to_pcm16

        cfg = self.cfg
        t = cfg.talker
        sampling = self.sampling
        cb_size = cfg.codec.codebook_size
        S = cfg.max_seq_len
        A = max(wins)
        group_size = self.B // len(wins)
        split = (
            tuple((group_size, w) for w in wins) if len(wins) > 1 else None
        )
        fps = self.fps
        n_steps = chunk // fps
        cp_stoch = cp_samples(cfg, sampling)

        @partial(jax.jit, donate_argnums=(3, 4, 5))
        def decode_chunk(params, cp_params, codec_params, cache_k, cache_v,
                         cstate, pos, pad, frames, tok, active, key):
            """Fused serve step: AR decode + residuals + streaming codec for
            all slots in one dispatch (one host round trip per chunk).
            tok: [B, fps] — each slot's previous step tokens."""
            cos_t, sin_t = rope_tables(cfg.max_seq_len, t.head_dim, t.rope_theta)

            # attend over a bucketed cache prefix (see runtime.generate);
            # inactive slots with stale positions past A just clamp their
            # (ignored) cache writes into the prefix
            full_k, full_v = cache_k, cache_v
            if A < S:
                cache_k = jax.tree.map(lambda c: c[:, :, :A], cache_k)
                cache_v = jax.tree.map(lambda c: c[:, :, :A], cache_v)

            def step(carry, _):
                ck, cv, p, tk, k = carry
                emb = merge_step_tokens(params, t, tk)[:, None, :]
                hidden, logits, ck, cv = talker_forward(
                    params, t, emb, ck, cv, p, cos_t, sin_t, pad_len=pad,
                    window_split=split,
                )
                h = hidden[:, -1, :]
                k, sub = jax.random.split(k)
                toks = [sample_token(logits[:, -1, :], sub, sampling)]
                hj = h
                for _j in range(1, fps):  # MTP frames, same weight pass
                    lg, hj = mtp_logits(params, t, hj, toks[-1])
                    k, sub = jax.random.split(k)
                    toks.append(sample_token(lg, sub, sampling))
                nxt = jnp.stack(toks, axis=1)                 # [B, fps]
                # inactive slots: hold position, emit PAD, re-write same row
                nxt = jnp.where(active[:, None], nxt, t.codec_pad)
                p = jnp.where(active, p + 1, p)
                return (ck, cv, p, nxt, k), (nxt, h)

            (ck, cv, p, tk, key), (tokens, hiddens) = jax.lax.scan(
                step, (cache_k, cache_v, pos, tok, key), None, length=n_steps
            )
            tokens_bc = jnp.transpose(tokens, (1, 0, 2)).reshape(-1, chunk)
            B = tokens_bc.shape[0]
            D = hiddens.shape[-1]
            flat_h = jnp.repeat(
                jnp.transpose(hiddens, (1, 0, 2)), fps, axis=1
            ).reshape(B * chunk, D)
            flat_cb0 = jnp.clip(tokens_bc.reshape(B * chunk), 0, cb_size - 1)
            if cp_stoch:
                key, cpk = jax.random.split(key)
            residuals = predict_residuals(cp_params, cfg, flat_h, flat_cb0,
                                          key=cpk if cp_stoch else None)
            n_res = residuals.shape[-1]
            codes = jnp.concatenate(
                [
                    flat_cb0.reshape(B, chunk, 1),
                    residuals.reshape(B, chunk, n_res),
                ],
                axis=-1,
            ).transpose(0, 2, 1)                                  # [B, Q, chunk]

            # incremental full-context codec decode across all slots
            # (per-slot positions: frames is a [B] vector)
            wav_chunk, cstate = decode_codes_streaming(
                codec_params, cfg, codes, cstate, frames
            )                                                     # [B, chunk*hop]
            frames = jnp.where(active, frames + chunk, frames)
            # per-slot EOS position on device (one small host fetch per step)
            is_eos = tokens_bc == t.codec_eos
            eos_hit = jnp.any(is_eos, axis=1)
            n_valid = jnp.where(
                eos_hit, jnp.argmax(is_eos, axis=1), chunk
            ).astype(jnp.int32)
            if A < S:  # write the prefix back into the donated buffers
                upd = lambda f, c: jax.lax.dynamic_update_slice(  # noqa: E731
                    f, c, (0, 0, 0, 0, 0)
                )
                ck = jax.tree.map(upd, full_k, ck)
                cv = jax.tree.map(upd, full_v, cv)
            # device-side 16-bit PCM: halves the per-chunk host fetch, the
            # serving throughput floor on a tunneled TPU (ops/pcm.py)
            return (ck, cv, cstate, p, tk, key, frames,
                    n_valid, codes, wav_to_pcm16(wav_chunk))

        self._decode_fns[fn_key] = decode_chunk
        return decode_chunk

    def _decode_fn_fb(self, chunk: int, wins: tuple[int, ...]) -> Callable:
        """Feedback-protocol fused serve step (TalkerConfig.feedback =
        "residual_sum"): the SAME builder as the single-stream path
        (runtime.generate.make_decode_chunk_fn_feedback — the serving ==
        single-stream parity invariant lives in one function), instantiated
        with this engine's per-group attention windows; the engine passes
        its slot activity mask per call."""
        fn_key = ("fb", chunk, wins)
        if fn_key in self._decode_fns:
            return self._decode_fns[fn_key]
        from .generate import make_decode_chunk_fn_feedback

        A = max(wins)
        group_size = self.B // len(wins)
        split = (
            tuple((group_size, w) for w in wins) if len(wins) > 1 else None
        )
        fn = make_decode_chunk_fn_feedback(
            self.cfg, chunk, self.sampling, attn_len=A, window_split=split,
        )
        self._decode_fns[fn_key] = fn
        return fn

    # -- stream lifecycle ---------------------------------------------------

    def free_slots(self) -> int:
        return sum(1 for s in self._slots if s is None)

    def submit(
        self,
        prompt: PromptSpec,
        *,
        max_frames: int,
        on_chunk: Callable[[np.ndarray], None] | None = None,
    ) -> int:
        """Reserve a free slot for ``prompt`` and queue its chunked prefill
        (advanced by subsequent steps); returns the stream id."""
        if all(s is not None for s in self._slots):
            raise RuntimeError("no free slots; call step() until one frees")
        if self.accum:
            if on_chunk is not None:
                raise ValueError(
                    "accumulate_wav keeps audio on device until a stream "
                    "finishes; per-chunk on_chunk consumers need the "
                    "default streaming engine"
                )
            # speculative steps overshoot EOS by ~pipeline-depth chunks of
            # device-side frame-counter advance; the buffer should cover
            # the budget plus that margin so overshoot frames still land
            # (overflowing writes are DROPPED by the scatter guard — safe
            # at any depth, but a too-small margin wastes the headroom)
            margin = 4 * max(self.chunk_schedule)
            if max_frames + margin > self.accum_cap_frames:
                raise ValueError(
                    f"max_frames={max_frames} exceeds the accumulation "
                    f"buffer ({self.accum_cap_frames} frames incl. a "
                    f"{margin}-frame speculative margin); raise "
                    "accum_cap_frames or lower the budget"
                )

        gen = self.model.generator  # reuse its prompt assembly
        # fast-path prompts DEFER the assembly dispatch (shape/pad are
        # host-computable): N simultaneous cold submissions then assemble
        # in one batched dispatch instead of paying ~20-40 ms of tunneled
        # dispatch overhead each (VERDICT r4 #7, tools/profile_cold_ttfa)
        plan = gen.fast_assembly_plan(prompt)
        if plan is not None:
            emb, pad, trailing = None, plan.pad, None
            Lb = plan.Lb
        else:
            emb, pad, trailing = gen.assemble_prompt_full(prompt)
            Lb = emb.shape[1]
        from ..models.codec import max_stream_frames

        # cap against BOTH the talker cache (positions) and the codec's
        # position tables (frames): with frames_per_step>1 the talker
        # budget alone can exceed the codec's frame capacity, and overflow
        # there clamps writes silently (garbage audio). The 2*chunk margin
        # covers speculative whole-chunk overshoot.
        budget = min(
            (self.cfg.max_seq_len - Lb) * self.fps,
            max_stream_frames(self.cfg) - 2 * max(self.chunk_schedule),
        )
        max_frames = max(1, min(max_frames, budget))

        # final cache position this stream can reach (prompt bucket is
        # left-padded, so it occupies positions 0..Lb regardless of pad)
        expected_end = Lb + -(-max_frames // self.fps)
        slot = self._pick_slot(expected_end)

        stream = Stream(
            slot=slot,
            stream_id=self._next_id,
            active=False,
            max_frames=max_frames,
            expected_end=expected_end,
            submitted_at=time.perf_counter(),
            on_chunk=on_chunk,
        )
        self._next_id += 1
        self._slots[slot] = stream
        self.streams[stream.stream_id] = stream

        self._pending.append(_PendingPrefill(
            stream=stream, emb=emb, pad=pad, Lb=Lb, trailing=trailing,
            plan=plan,
        ))
        return stream.stream_id

    def _pick_slot(self, expected_end: int) -> int:
        """Choose a free slot: with slot groups, place the stream in the
        group where it inflates the group's attention-window bucket the
        least (short streams cluster away from long ones, so their decode
        keeps reading a small cache prefix)."""
        from .generate import attn_bucket

        free = [i for i, s in enumerate(self._slots) if s is None]
        if self.n_groups == 1:
            return free[0]
        S = self.cfg.max_seq_len
        group_size = self.B // self.n_groups
        my_bucket = attn_bucket(expected_end, S)
        best = None
        best_cost = None
        for g in range(self.n_groups):
            gfree = [i for i in free if i // group_size == g]
            if not gfree:
                continue
            members = [
                self._slots[i]
                for i in range(g * group_size, (g + 1) * group_size)
                if self._slots[i] is not None
            ]
            cur = attn_bucket(
                max((m.expected_end for m in members), default=0), S
            )
            joined = max(cur, my_bucket)
            # lexicographic: my window if I join here, then how much I
            # inflate the group's existing members
            cost = (joined, joined - cur)
            if best_cost is None or cost < best_cost:
                best, best_cost = gfree[0], cost
        return best

    # -- chunked prefill -----------------------------------------------------

    def _advance_prefills(self) -> None:
        """Dispatch prefill slices: ONE slice per step while live streams
        are decoding (bounding their stall), otherwise keep slicing until
        the FIRST stream activates — decode starts as early as possible and
        the remaining pending streams trickle in one slice per step (TTFA
        under cold start and under load both stay bounded)."""

        def live() -> bool:
            return any(
                s is not None and s.active and not s.done for s in self._slots
            )

        if not live() and len(self._pending) > 1:
            self._batch_cold_prefills()

        stalled_once = False
        while self._pending and not (live() and stalled_once):
            pp = self._pending[0]
            if pp.emb is None:  # deferred fast-path assembly (see submit)
                pp.emb, _, pp.trailing = (
                    self.model.generator.assemble_from_plan(pp.plan)
                )
            if pp.sk is None:
                t = self.cfg.talker
                scratch = (t.n_layers, 1, pp.Lb, t.n_kv_heads, t.head_dim)
                pp.sk = kv_cache_init(scratch, self._cache_dtype,
                                      kv_format=self._kv_fmt)
                pp.sv = kv_cache_init(scratch, self._cache_dtype,
                                      kv_format=self._kv_fmt)
            C = min(self.prefill_chunk, pp.Lb - pp.pos)
            fn = self._prefill_slice_fn(C, pp.Lb)
            emb_slice = jax.lax.dynamic_slice_in_dim(pp.emb, pp.pos, C, axis=1)
            pp.sk, pp.sv, pp.last_logits, pp.last_hidden = fn(
                self.params, emb_slice, jnp.int32(pp.pad),
                pp.sk, pp.sv, jnp.int32(pp.pos),
            )
            pp.pos += C
            stalled_once = True
            if pp.pos >= pp.Lb:
                self._finish_prefill(pp)
                self._pending.pop(0)

    # Whole-prompt cold-batch bound, in scratch-cache ROWS (nb x Lb). Per
    # row the batched prefill allocates n_layers x H_kv x hd x 2 (k+v)
    # cache entries (~114 KB bf16 at flagship), so 8192 rows ~= 0.9 GB of
    # transient scratch — safely inside HBM next to resident weights, and
    # it also bounds the (Lb, nb) jit-variant set (2048-token prompts
    # batch at nb <= 4; longer groups fall back to the slice path). The
    # remote service HANGS silently on HBM over-subscription (CLAUDE.md),
    # so the cap errs low; QWEN3_TTS_COLD_BATCH_ROWS overrides.
    _COLD_BATCH_MAX_ROWS = 8192

    def _batch_cold_prefills(self) -> None:
        """Cold start (no live streams): prefill all pending prompts of
        the same bucket length in one batched whole-prompt dispatch
        instead of one dispatch (or one slice-per-step trickle) each, then
        activate them together — N simultaneous submissions reach their
        first decode step after ~1 prefill's latency, not N. Batch sizes
        are padded to power-of-two buckets to bound compile variants.

        ANY bucket length batches here since round 5: with no live
        streams there is nothing for a whole-prompt prefill to stall, and
        the old slice-per-step trickle (which only single-slice prompts
        escaped) serialized long-prompt groups so badly that longform's 5
        concurrent ~256-token segments ran at ~2-stream effective
        concurrency. Two bounds remain: the chunked slice path still
        serves JOINS under load (where the stall bound matters), and
        groups whose scratch would exceed ``_COLD_BATCH_MAX_ROWS`` rows
        fall back to the slice path (HBM + compile-variant bound — see
        the constant's comment)."""
        t = self.cfg.talker
        max_rows = int(os.environ.get("QWEN3_TTS_COLD_BATCH_ROWS",
                                      self._COLD_BATCH_MAX_ROWS))
        by_len: dict[int, list[_PendingPrefill]] = {}
        for pp in self._pending:
            # pos > 0 (a join that already started slicing) stays sliced
            if pp.pos == 0:
                by_len.setdefault(pp.Lb, []).append(pp)
        for Lb, group in by_len.items():
            group = [
                pp for pp in group
                if self._slots[pp.stream.slot] is pp.stream
                and not pp.stream.done
            ]
            if len(group) < 2:
                continue
            nb = 2
            while nb < len(group):
                nb *= 2
            if nb * Lb > max_rows:
                continue  # scratch too large for one dispatch: slice path
            # pad the batch by replicating one entry (duplicate slot writes
            # carry identical values — see _prefill_batch_fn)
            fill = nb - len(group)
            # deferred fast-path plans (emb None — see submit) assemble in
            # ONE batched dispatch per (proto, spk_kind) subgroup; eager
            # embs (clone conditioning etc.) ride alongside as their own
            # rows. Rows are reordered eager-first; the slots/pads vectors
            # follow row order, so ordering is free. The common cold start
            # (N same-shape prompts) is exactly 1 assembly dispatch +
            # 1 batched prefill dispatch.
            eager = [pp for pp in group if pp.emb is not None]
            deferred = [pp for pp in group if pp.emb is None]
            deferred.sort(
                key=lambda pp: (pp.plan.proto, pp.plan.spk_kind)
            )
            gen = self.model.generator
            emb_pieces = [pp.emb for pp in eager]
            trail_pieces = [pp.trailing for pp in eager]
            rows = [(pp.stream.slot, pp.pad) for pp in eager]
            i = 0
            first_sub = True
            while i < len(deferred):
                j = i
                skey = (deferred[i].plan.proto, deferred[i].plan.spk_kind)
                while (j < len(deferred)
                       and (deferred[j].plan.proto,
                            deferred[j].plan.spk_kind) == skey):
                    j += 1
                sub = deferred[i:j]
                plans = [pp.plan for pp in sub]
                rows += [(pp.stream.slot, pp.pad) for pp in sub]
                if first_sub and fill:  # batch fill rides this dispatch
                    plans = plans + [plans[0]] * fill
                    rows += [(sub[0].stream.slot, sub[0].pad)] * fill
                first_sub = False
                bemb, btrail = gen.assemble_plans_batched(plans)
                emb_pieces.append(bemb)
                trail_pieces.append(btrail)
                i = j
            if not deferred and fill:
                emb_pieces += [group[0].emb] * fill
                trail_pieces += [group[0].trailing] * fill
                rows += [(group[0].stream.slot, group[0].pad)] * fill
            emb = (
                emb_pieces[0] if len(emb_pieces) == 1
                else jnp.concatenate(emb_pieces, axis=0)
            )                                               # [nb, Lb, D]
            pads = jnp.asarray([p for _, p in rows], jnp.int32)
            slots = jnp.asarray([s for s, _ in rows], jnp.int32)
            scratch = (t.n_layers, nb, Lb, t.n_kv_heads, t.head_dim)
            sk = kv_cache_init(scratch, self._cache_dtype,
                               kv_format=self._kv_fmt)
            sv = kv_cache_init(scratch, self._cache_dtype,
                               kv_format=self._kv_fmt)
            if self.feedback:
                trail_bufs = (
                    trail_pieces[0] if len(trail_pieces) == 1
                    else jnp.concatenate(trail_pieces, axis=0)
                )                                       # [nb, Tb, D]
                (self.cache_k, self.cache_v, self.pos, self.pad, self.tok,
                 self.frames_dev, self.active_mask, conv, self.res_sum,
                 self.trail, self.trail_g, self.key) = (
                    self._prefill_batch_fn_fb(Lb, nb)(
                        self.params, self.cp_params, emb, pads, sk, sv,
                        self.cache_k, self.cache_v, trail_bufs, slots,
                        self.pos, self.pad, self.tok, self.frames_dev,
                        self.active_mask, self.cstate["conv"],
                        self.res_sum, self.trail, self.trail_g, self.key,
                    )
                )
            else:
                (self.cache_k, self.cache_v, self.pos, self.pad, self.tok,
                 self.frames_dev, self.active_mask, conv, self.key) = (
                    self._prefill_batch_fn(Lb, nb)(
                        self.params, emb, pads, sk, sv,
                        self.cache_k, self.cache_v, slots,
                        self.pos, self.pad, self.tok, self.frames_dev,
                        self.active_mask, self.cstate["conv"], self.key,
                    )
                )
            self.cstate = dict(self.cstate, conv=conv)
            for pp in group:
                self._host_pos[pp.stream.slot] = Lb
                self._host_frames[pp.stream.slot] = 0
                pp.stream.active = True
                self._pending.remove(pp)

    def _activate_fn(self, Lb: int) -> Callable:
        """Jitted single-stream activation for the sliced (under-load) join
        path: scatter the finished scratch cache into the slot, sample the
        seed (+MTP) tokens, and update every per-slot state vector — ONE
        dispatch instead of a dozen eager ops stalling the decode pipeline
        at every join. The slot's codec per-conv left contexts reset here;
        its codec transformer cache is overwritten progressively (positions
        restart at 0 and are always written before being attended)."""
        key = ("activate", Lb)
        if key in self._scatter_fns:
            return self._scatter_fns[key]
        cfg = self.cfg
        t = cfg.talker
        fps = self.fps
        sampling = self.sampling
        from ..models.talker import mtp_logits

        @partial(jax.jit, donate_argnums=(3, 4))
        def activate(params, sk, sv, cache_k, cache_v, slot, pad,
                     last_logits, last_hidden, pos_v, pad_v, tok_v,
                     frames_v, active_v, conv, key):
            key, sub = jax.random.split(key)
            toks = [sample_token(last_logits[None], sub, sampling)]
            h = last_hidden[None]
            for _ in range(1, fps):  # MTP seed frames
                lg, h = mtp_logits(params, t, h, toks[-1])
                key, sub = jax.random.split(key)
                toks.append(sample_token(lg, sub, sampling))
            first = jnp.stack(toks, axis=1)[0]                # [fps]

            cache_k = jax.tree.map(
                lambda c, u: jax.lax.dynamic_update_slice(
                    c, u, (0, slot, 0, 0, 0)
                ),
                cache_k, sk,
            )
            cache_v = jax.tree.map(
                lambda c, u: jax.lax.dynamic_update_slice(
                    c, u, (0, slot, 0, 0, 0)
                ),
                cache_v, sv,
            )
            onehot = jnp.arange(tok_v.shape[0]) == slot
            pos_v = jnp.where(onehot, Lb, pos_v)
            pad_v = jnp.where(onehot, pad, pad_v)
            tok_v = jnp.where(onehot[:, None], first[None, :], tok_v)
            frames_v = jnp.where(onehot, 0, frames_v)
            active_v = jnp.where(onehot, True, active_v)
            conv = jax.tree.map(
                lambda a: jnp.where(onehot[:, None, None], 0.0, a), conv
            )
            return (cache_k, cache_v, pos_v, pad_v, tok_v, frames_v,
                    active_v, conv, key)

        self._scatter_fns[key] = activate
        return activate

    def _activate_fn_fb(self, Lb: int) -> Callable:
        """Feedback-protocol single-stream activation: like _activate_fn,
        plus the published seed — the code predictor runs on the seed
        token's (prefill hidden, cb0) to produce the slot's first residual
        feedback sum, the slot's trailing-text buffer scatters in, and its
        consumed-row counter resets."""
        key = ("activate_fb", Lb)
        if key in self._scatter_fns:
            return self._scatter_fns[key]
        cfg = self.cfg
        t = cfg.talker
        sampling = self.sampling
        from .generate import seed_feedback_frames

        @partial(jax.jit, donate_argnums=(4, 5))
        def activate(params, cp_params, sk, sv, cache_k, cache_v, slot, pad,
                     last_logits, last_hidden, trailing, pos_v, pad_v,
                     tok_v, frames_v, active_v, conv, res_v, trail_v, g_v,
                     key):
            key, sub = jax.random.split(key)
            # published seed: fps frames + their per-frame residual
            # feedback sums (runtime.generate.seed_feedback_frames)
            first, rs, _, _ = seed_feedback_frames(
                params, cp_params, cfg, sampling,
                last_hidden[None], last_logits[None], sub,
            )                                    # [1, fps], [1, fps, D]
            cache_k = jax.tree.map(
                lambda c, u: jax.lax.dynamic_update_slice(
                    c, u, (0, slot, 0, 0, 0)
                ),
                cache_k, sk,
            )
            cache_v = jax.tree.map(
                lambda c, u: jax.lax.dynamic_update_slice(
                    c, u, (0, slot, 0, 0, 0)
                ),
                cache_v, sv,
            )
            onehot = jnp.arange(tok_v.shape[0]) == slot
            pos_v = jnp.where(onehot, Lb, pos_v)
            pad_v = jnp.where(onehot, pad, pad_v)
            tok_v = jnp.where(onehot[:, None], first, tok_v)
            frames_v = jnp.where(onehot, 0, frames_v)
            active_v = jnp.where(onehot, True, active_v)
            conv = jax.tree.map(
                lambda a: jnp.where(onehot[:, None, None], 0.0, a), conv
            )
            res_v = jnp.where(
                onehot[:, None, None], rs.astype(res_v.dtype), res_v
            )
            trail_v = jax.lax.dynamic_update_slice(
                trail_v, trailing.astype(trail_v.dtype), (slot, 0, 0)
            )
            g_v = jnp.where(onehot, 0, g_v)
            return (cache_k, cache_v, pos_v, pad_v, tok_v, frames_v,
                    active_v, conv, res_v, trail_v, g_v, key)

        self._scatter_fns[key] = activate
        return activate

    def _prefill_batch_fn_fb(self, Lb: int, nb: int) -> Callable:
        """Feedback-protocol batched cold-start prefill: _prefill_batch_fn
        plus the seed code-predictor pass and the trailing/res_sum/counter
        scatters. Padded rows replicate entry 0, so their duplicate scatter
        writes stay bit-identical (the predictor is deterministic given the
        replicated hidden/seed)."""
        key = ("fb", Lb, nb)
        if key in self._prefill_batch_fns:
            return self._prefill_batch_fns[key]
        cfg = self.cfg
        t = cfg.talker
        sampling = self.sampling
        from .generate import seed_feedback_frames

        @partial(jax.jit, donate_argnums=(6, 7))
        def prefill_activate(params, cp_params, emb, pads, sk, sv,
                             cache_k, cache_v, trail_bufs, slots, pos_v,
                             pad_v, tok_v, frames_v, active_v, conv,
                             res_v, trail_v, g_v, key):
            cos_t, sin_t = rope_tables(cfg.max_seq_len, t.head_dim,
                                       t.rope_theta)
            hidden, logits, sk, sv = talker_forward(
                params, t, emb, sk, sv, jnp.int32(0), cos_t, sin_t,
                pad_len=pads, head_last_only=True,
            )
            key, sub = jax.random.split(key)
            # per-SLOT folded keys (row_keys_from): padding rows replicate
            # entry 0's slot and must sample identical frames/residuals, or
            # the duplicate-index scatters below would write conflicting
            # values
            first, rs, _, _ = seed_feedback_frames(
                params, cp_params, cfg, sampling,
                hidden[:, -1, :], logits[:, -1, :], sub,
                row_keys_from=slots,
            )                                  # [nb, fps], [nb, fps, D]
            cache_k = jax.tree.map(
                lambda c, u: c.at[:, slots, :Lb].set(u), cache_k, sk
            )
            cache_v = jax.tree.map(
                lambda c, u: c.at[:, slots, :Lb].set(u), cache_v, sv
            )
            pos_v = pos_v.at[slots].set(Lb)
            pad_v = pad_v.at[slots].set(pads)
            tok_v = tok_v.at[slots].set(first)
            frames_v = frames_v.at[slots].set(0)
            active_v = active_v.at[slots].set(True)
            conv = jax.tree.map(lambda a: a.at[slots].set(0.0), conv)
            res_v = res_v.at[slots].set(rs.astype(res_v.dtype))
            trail_v = trail_v.at[slots].set(
                trail_bufs.astype(trail_v.dtype)
            )
            g_v = g_v.at[slots].set(0)
            return (cache_k, cache_v, pos_v, pad_v, tok_v, frames_v,
                    active_v, conv, res_v, trail_v, g_v, key)

        self._prefill_batch_fns[key] = prefill_activate
        return prefill_activate

    def _finish_prefill(self, pp: _PendingPrefill) -> None:
        """Scatter the scratch cache into the slot and activate the stream
        (one fused dispatch — see _activate_fn)."""
        stream = pp.stream
        slot = stream.slot
        if self._slots[slot] is not stream or stream.done:
            return  # stream was cancelled/recycled while pending
        if self.feedback:
            (self.cache_k, self.cache_v, self.pos, self.pad, self.tok,
             self.frames_dev, self.active_mask, conv, self.res_sum,
             self.trail, self.trail_g, self.key) = (
                self._activate_fn_fb(pp.Lb)(
                    self.params, self.cp_params, pp.sk, pp.sv,
                    self.cache_k, self.cache_v,
                    jnp.int32(slot), jnp.int32(pp.pad),
                    pp.last_logits, pp.last_hidden, pp.trailing,
                    self.pos, self.pad, self.tok, self.frames_dev,
                    self.active_mask, self.cstate["conv"],
                    self.res_sum, self.trail, self.trail_g, self.key,
                )
            )
        else:
            (self.cache_k, self.cache_v, self.pos, self.pad, self.tok,
             self.frames_dev, self.active_mask, conv, self.key) = (
                self._activate_fn(pp.Lb)(
                    self.params, pp.sk, pp.sv, self.cache_k,
                    self.cache_v, jnp.int32(slot), jnp.int32(pp.pad),
                    pp.last_logits, pp.last_hidden,
                    self.pos, self.pad, self.tok, self.frames_dev,
                    self.active_mask, self.cstate["conv"], self.key,
                )
            )
        self._host_pos[slot] = pp.Lb
        self._host_frames[slot] = 0
        self.cstate = dict(self.cstate, conv=conv)
        stream.active = True

    def dispatch_step(self):
        """Enqueue one decode step for all slots; returns an opaque payload
        for :meth:`collect_step`. Does NOT block — the driver can dispatch
        step k+1 before collecting step k (the host round trip then hides
        under device compute). The payload snapshots slot->stream identity
        at dispatch time, so a step dispatched speculatively past a
        stream's EOS can never credit frames to a slot's next occupant.
        Returns None when nothing is decodable yet (only pending prefills
        were advanced)."""
        from .generate import attn_bucket

        self._advance_prefills()
        active = [
            (slot, s) for slot, s in enumerate(self._slots)
            if s is not None and s.active and not s.done
        ]
        if not active:
            return None
        chunk = self._pick_chunk(active)
        steps = chunk // self.fps       # positions advanced per dispatch
        S = self.cfg.max_seq_len
        group_size = self.B // self.n_groups
        wins = []
        for g in range(self.n_groups):
            gpos = [
                self._host_pos[slot] for slot, _ in active
                if slot // group_size == g
            ]
            wins.append(attn_bucket((max(gpos) if gpos else 0) + steps, S))
        frames_before = self.frames_dev  # accum-mode scatter offsets
        if self.feedback:
            (self.cache_k, self.cache_v, self.cstate, self.pos, self.tok,
             self.key, self.frames_dev, self.res_sum, self.trail_g,
             n_valid, codes, wav) = self._decode_fn_fb(chunk, tuple(wins))(
                self.params, self.cp_params, self.codec_params,
                self.cache_k, self.cache_v, self.cstate, self.trail,
                self.pos, self.pad, self.frames_dev, self.tok,
                self.res_sum, self.trail_g, self.active_mask, self.key,
            )
        else:
            (self.cache_k, self.cache_v, self.cstate, self.pos, self.tok,
             self.key, self.frames_dev, n_valid, codes, wav) = self._decode_fn(
                chunk, tuple(wins)
            )(
                self.params, self.cp_params, self.codec_params,
                self.cache_k, self.cache_v, self.cstate, self.pos, self.pad,
                self.frames_dev, self.tok, self.active_mask, self.key,
            )
        if self.accum:
            # audio stays on device: scatter this step's PCM into the
            # per-slot buffer; the per-chunk host fetch shrinks to the
            # [B] n_valid vector (codes are not collected in this mode).
            # Protocol-agnostic: both decode fns return [B, chunk*hop] PCM.
            self.wav_accum = self._accum_write(
                self.wav_accum, wav, frames_before
            )
            codes = wav = None
        for slot, _ in active:
            self._host_pos[slot] += steps
            self._host_frames[slot] += chunk
        snapshot = [(slot, s.stream_id, chunk) for slot, s in active]
        # start the device->host copies as soon as the step finishes on
        # device: with a multi-chunk pipeline the transfer of chunk k then
        # overlaps the compute of chunks k+1.. instead of serializing one
        # ~30 ms tunnel round trip per chunk at collect time
        if _async_fetch():
            arrs = (n_valid,) if _defer_wav() else (n_valid, codes, wav)
            for arr in arrs:
                if hasattr(arr, "copy_to_host_async"):
                    arr.copy_to_host_async()
        return (snapshot, n_valid, codes, wav)

    def collect_step(self, payload) -> list[int]:
        """Fetch one dispatched step's results and account them; returns
        stream ids that finished."""
        if payload is None:
            return []
        snapshot, n_valid, codes, wav = payload
        hop = self.cfg.codec.hop
        defer = _defer_wav()
        if self.accum:
            valid_host = jax.device_get(n_valid)
            codes_host = None
            wav_host = None
        elif defer:
            # fetch ONLY the per-slot valid counts (a few bytes); wav rows
            # AND code slabs stay on device as views until collect() — no
            # production consumer reads codes per chunk (they serve
            # debugging/tests/cloning analysis), so the steady-state fetch
            # is one [B] int vector per chunk
            valid_host = jax.device_get(n_valid)
            codes_host = None
            wav_host = None
        else:
            valid_host, codes_host, wav_host = jax.device_get(
                (n_valid, codes, wav)
            )
        wav_fetched = wav_host

        def fetch_wav_host():
            # deferred mode, but THIS step needs host audio (a stream's
            # first audible chunk, or an on_chunk consumer): fetch the
            # step's whole [B, chunk*hop] buffer once and slice host-side.
            # Never slice on device — a (slot, valid*hop)-shaped slice op
            # would compile a fresh executable per distinct pair, and
            # remote compiles cost minutes (CLAUDE.md).
            nonlocal wav_fetched
            if wav_fetched is None:
                wav_fetched = jax.device_get(wav)
            return wav_fetched

        for slot, stream_id, chunk in snapshot:
            stream = self.streams.get(stream_id)
            if stream is None or stream.done or self._slots[slot] is not stream:
                continue  # slot was recycled since dispatch
            valid = int(valid_host[slot])
            remaining = stream.max_frames - stream.frames
            done = valid < chunk or valid >= remaining
            valid = min(valid, remaining)
            if self.accum:
                # audio lives in the device buffer; account frames only and
                # fetch the slot's row ONCE when the stream finishes
                if valid > 0:
                    stream.frames += valid
                    if stream.ttfa_s is None:
                        # device-side semantic: first audio EXISTS (not yet
                        # on host) — batch jobs care about completion, not
                        # streaming latency
                        stream.ttfa_s = (
                            time.perf_counter() - stream.submitted_at
                        )
                if done:
                    # gather the slot's row NOW (a later occupant will
                    # overwrite the buffer row) but fetch it LAZILY: the
                    # copy starts async and resolves at collect(), so a
                    # burst of finishing streams doesn't serialize one
                    # blocking tunnel round trip each inside the step loop
                    row = self._row_gather(self.wav_accum, jnp.int32(slot))
                    if hasattr(row, "copy_to_host_async"):
                        row.copy_to_host_async()
                    startup = (
                        self.cfg.code2wav.startup_samples
                        if self.cfg.codec_arch == "code2wav" else 0
                    )
                    stream.wav_chunks = [
                        _AccumRow(row, startup, stream.frames * hop)
                    ]
                    stream.done = True
                    stream.active = False
                continue
            if valid > 0:
                stream.codes.append(
                    codes_host[slot][:, :valid] if codes_host is not None
                    else _DeferredCodes(codes, slot, valid)
                )
                # code2wav: the stream's first chunk leads with a fixed
                # edge run-in the one-shot decode trims (< one frame of
                # samples, so it always fits the first chunk; the first
                # chunk is always fetched eagerly for TTFA honesty)
                startup = (
                    self.cfg.code2wav.startup_samples
                    if self.cfg.codec_arch == "code2wav"
                    and stream.frames == 0
                    else 0
                )
                if wav_host is not None:
                    chunk_wav = stream_wav = (
                        wav_host[slot, startup : valid * hop]
                    )
                elif stream.ttfa_s is None or stream.on_chunk is not None:
                    # first audible chunk (TTFA honesty) or a streaming
                    # consumer: host audio now (one whole-step fetch,
                    # shared by every such stream in this step)
                    chunk_wav = stream_wav = (
                        fetch_wav_host()[slot, startup : valid * hop]
                    )
                else:
                    # steady state: keep the row on device; one batched
                    # fetch at collect() resolves every deferred chunk
                    stream_wav = _DeferredWav(wav, slot, valid * hop)
                    chunk_wav = None
                stream.wav_chunks.append(stream_wav)
                stream.frames += valid
                if stream.ttfa_s is None:
                    # timestamp AFTER any lazy first-chunk wav fetch above,
                    # so deferred-mode TTFA still measures audio-on-host
                    stream.ttfa_s = time.perf_counter() - stream.submitted_at
                if stream.on_chunk is not None:
                    stream.on_chunk(chunk_wav)
            if done:
                stream.done = True
                stream.active = False

        finished = []
        for slot, stream in enumerate(self._slots):
            if stream is not None and stream.done:
                finished.append(stream.stream_id)
                self._slots[slot] = None
                self.active_mask = jnp.where(
                    jnp.arange(self.B) == slot, False, self.active_mask
                )
        return finished

    def cancel(self, stream_id: int) -> None:
        """Abort a stream: free its slot, deactivate its decode lane and
        drop any queued prefill. Safe against in-flight speculative steps —
        their payload snapshots fail the ``_slots[slot] is stream`` identity
        check in :meth:`collect_step` once the slot is freed. The Stream
        record is removed from :attr:`streams` (a cancelled stream has no
        collectable result)."""
        stream = self.streams.pop(stream_id, None)
        if stream is None:
            return
        stream.done = True
        stream.active = False
        self._pending = [p for p in self._pending if p.stream is not stream]
        slot = stream.slot
        if self._slots[slot] is stream:
            self._slots[slot] = None
            self.active_mask = jnp.where(
                jnp.arange(self.B) == slot, False, self.active_mask
            )

    def step(self) -> list[int]:
        """Advance every active slot one chunk (and pending prefills one
        slice); returns stream ids finished in this step (synchronous
        dispatch + collect)."""
        if not any(s is not None for s in self._slots):
            return []
        return self.collect_step(self.dispatch_step())

    def _resolve_deferred(self) -> None:
        """Resolve every stream's _DeferredWav/_DeferredCodes views in ONE
        batched fetch, deduplicated by step buffer: streams decoded in the
        same steps share those steps' [B, chunk*hop] / [B, Q, chunk]
        arrays, so each buffer crosses the link exactly once (and its HBM
        is released once no view references it)."""
        pending: dict[int, Any] = {}
        for st in self.streams.values():
            for c in st.wav_chunks:
                if isinstance(c, (_DeferredWav, _AccumRow)):
                    pending.setdefault(id(c.dev), c.dev)
            for c in st.codes:
                if isinstance(c, _DeferredCodes):
                    pending.setdefault(id(c.dev), c.dev)
        if not pending:
            return
        keys = list(pending)
        host = dict(zip(keys, jax.device_get([pending[k] for k in keys])))

        def resolve_wav(c):
            if isinstance(c, _DeferredWav):
                return host[id(c.dev)][c.slot, : c.n]
            if isinstance(c, _AccumRow):
                return host[id(c.dev)][c.startup: c.n]
            return c

        for st in self.streams.values():
            st.wav_chunks = [resolve_wav(c) for c in st.wav_chunks]
            st.codes = [
                host[id(c.dev)][c.slot][:, : c.n]
                if isinstance(c, _DeferredCodes) else c
                for c in st.codes
            ]

    def collect(self, stream_id: int) -> tuple[np.ndarray, Stream]:
        """Concatenated waveform + state for a (finished) stream. Deferred
        device rows (QWEN3_TTS_DEFER_WAV) resolve for ALL streams here —
        one batched, buffer-deduplicated fetch instead of one per chunk."""
        stream = self.streams[stream_id]
        self._resolve_deferred()
        wav = (
            np.concatenate(stream.wav_chunks)
            if stream.wav_chunks
            else np.zeros(0, np.int16)
        )
        return wav, stream

    # -- convenience driver -------------------------------------------------

    def run(
        self,
        prompts: list[PromptSpec],
        *,
        max_frames: int | list[int],
        pipeline_depth: int = 2,
    ) -> list[tuple[np.ndarray, Stream]]:
        """Serve all prompts to completion (continuous batching: new prompts
        enter as slots free up); returns [(wav, stream), ...] in order.
        ``max_frames`` is one shared budget or one per prompt.

        The loop keeps ``pipeline_depth`` decode steps speculatively in
        flight (with async host copies started at dispatch), so the ~30 ms
        per-chunk tunnel round trip hides under the compute of the chunks
        behind it. Steps dispatched past a stream's EOS/budget are clipped
        by the snapshot accounting in :meth:`collect_step` — deeper
        pipelines waste at most ``depth * chunk`` frames of compute per
        finishing stream, never correctness."""
        budgets = (
            list(max_frames)
            if isinstance(max_frames, (list, tuple))
            else [max_frames] * len(prompts)
        )
        # drop bookkeeping for streams finished in earlier runs (the engine
        # is long-lived and reused across generate_audio calls)
        for sid in [s for s, st in self.streams.items() if st.done]:
            del self.streams[sid]
        pending = list(enumerate(prompts))
        ids: dict[int, int] = {}

        def fill_slots():
            while pending and self.free_slots():
                i, p = pending.pop(0)
                ids[i] = self.submit(p, max_frames=budgets[i])

        def unfinished() -> bool:
            return len(ids) < len(prompts) or any(
                not self.streams[sid].done for sid in ids.values()
            )

        def depth_now() -> int:
            # Cold-start ramp: while NO live stream has first audio, keep
            # exactly ONE step in flight. Device executions are SERIALIZED
            # on this service, so a speculative second chunk dispatched
            # ahead of the first chunk's eager wav fetch queues a whole
            # extra chunk of execution into every stream's TTFA (measured
            # ~300 ms of the 8-stream cold TTFA on the raw-import shape —
            # tools/profile_cold_ttfa.py). The moment any stream is
            # audible, ramp to pipeline_depth; a stream JOINING a loaded
            # engine therefore keeps the deep pipeline (its join-TTFA
            # rides chunked prefill, which doesn't stall live streams).
            live = [st for st in self.streams.values() if not st.done]
            if live and all(st.ttfa_s is None for st in live):
                return 1
            return max(1, pipeline_depth)

        fill_slots()
        inflight: list = []
        while unfinished() or inflight:
            while unfinished() and len(inflight) < depth_now():
                payload = self.dispatch_step()
                if payload is None:
                    break
                inflight.append(payload)
            if self.collect_step(inflight.pop(0) if inflight else None):
                fill_slots()
        return [self.collect(ids[i]) for i in range(len(prompts))]
