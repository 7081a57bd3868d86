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
- prefill computes the prompt's K/V into a small bucket-sized scratch cache
  and scatters it into the slot (bounded data movement, no full-cache copy);
- one jitted chunk-decode advances ALL slots ``chunk`` tokens with on-device
  sampling; inactive slots hold position and re-write the same cache row
  (bounded, no overflow);
- the codec decodes all slots' new frames in one batched call with
  per-slot streaming lookback windows and absolute positions.

EOS detection is the only host sync per chunk, same as the single-stream
path (runtime.generate).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.configs import ModelConfig
from ..models.code_predictor import predict_residuals
from ..models.layers import rope_tables
from ..models.talker import talker_forward
from .prompts import PromptSpec
from .sampling import SamplingConfig, sample_token


@dataclass
class Stream:
    """Host-side state of one serving slot."""

    slot: int
    stream_id: int
    active: bool = False
    done: bool = False
    frames: int = 0
    max_frames: int = 0
    codes: list[np.ndarray] = field(default_factory=list)   # [Q, n] slabs
    wav_chunks: list[np.ndarray] = field(default_factory=list)
    submitted_at: float = 0.0
    ttfa_s: float | None = None
    on_chunk: Callable[[np.ndarray], None] | None = None


class ServingEngine:
    """Continuous batched decoding over ``max_streams`` slots."""

    def __init__(
        self,
        model,
        *,
        max_streams: int = 8,
        chunk: int = 8,
        lookback: int = 8,
        sampling: SamplingConfig | None = None,
    ):
        self.model = model
        self.cfg: ModelConfig = model.cfg
        self.B = max_streams
        self.chunk = chunk
        self.lookback = lookback
        self.sampling = sampling or SamplingConfig()
        t = self.cfg.talker
        S = self.cfg.max_seq_len
        dtype = jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32
        shape = (t.n_layers, self.B, S, t.n_kv_heads, t.head_dim)
        self.cache_k = jnp.zeros(shape, dtype)
        self.cache_v = jnp.zeros(shape, dtype)
        from ..models.codec import (
            conv_receptive_latent_frames,
            init_codec_stream_state,
        )

        tail = max(8, conv_receptive_latent_frames(self.cfg.codec))
        self.cstate = init_codec_stream_state(
            self.cfg, self.B, tail=tail, dtype=dtype
        )
        self.pos = jnp.zeros((self.B,), jnp.int32)
        self.pad = jnp.zeros((self.B,), jnp.int32)
        self.frames_dev = jnp.zeros((self.B,), jnp.int32)
        self.tok = jnp.full((self.B,), t.codec_pad, jnp.int32)
        self.active_mask = jnp.zeros((self.B,), jnp.bool_)
        self.key = jax.random.PRNGKey(0)
        self.streams: dict[int, Stream] = {}
        self._slots: list[Stream | None] = [None] * self.B
        self._next_id = 0
        self._prefill_fns: dict[int, Callable] = {}
        self._decode_fns: dict[int | None, Callable] = {}
        self._host_pos = [0] * self.B  # host mirror for attn bucketing

    # -- jitted stages ------------------------------------------------------

    def _prefill_fn(self, Lb: int) -> Callable:
        if Lb in self._prefill_fns:
            return self._prefill_fns[Lb]
        cfg = self.cfg
        t = cfg.talker

        @partial(jax.jit, donate_argnums=(3, 4))
        def prefill_slot(params, emb, pad_len, cache_k, cache_v, slot):
            """emb [1, Lb, D] -> K/V written into big caches at (slot, 0);
            returns (caches, last logits [V])."""
            dtype = cache_k.dtype
            scratch_k = jnp.zeros(
                (t.n_layers, 1, Lb, t.n_kv_heads, t.head_dim), dtype
            )
            scratch_v = jnp.zeros_like(scratch_k)
            cos_t, sin_t = rope_tables(cfg.max_seq_len, t.head_dim, t.rope_theta)
            _, logits, sk, sv = talker_forward(
                params, t, emb, scratch_k, scratch_v, jnp.int32(0),
                cos_t, sin_t, pad_len=pad_len,
            )
            cache_k = jax.lax.dynamic_update_slice(
                cache_k, sk, (0, slot, 0, 0, 0)
            )
            cache_v = jax.lax.dynamic_update_slice(
                cache_v, sv, (0, slot, 0, 0, 0)
            )
            return cache_k, cache_v, logits[0, -1, :]

        self._prefill_fns[Lb] = prefill_slot
        return prefill_slot

    def _decode_fn(self, attn_len: int | None = None) -> Callable:
        if attn_len in self._decode_fns:
            return self._decode_fns[attn_len]
        from ..models.codec import decode_codes_streaming

        cfg = self.cfg
        t = cfg.talker
        chunk = self.chunk
        sampling = self.sampling
        cb_size = cfg.codec.codebook_size
        S = cfg.max_seq_len
        A = attn_len or S

        @partial(jax.jit, donate_argnums=(3, 4, 5))
        def decode_chunk(params, cp_params, codec_params, cache_k, cache_v,
                         cstate, pos, pad, frames, tok, active, key):
            """Fused serve step: AR decode + residuals + streaming codec for
            all slots in one dispatch (one host round trip per chunk)."""
            cos_t, sin_t = rope_tables(cfg.max_seq_len, t.head_dim, t.rope_theta)

            # attend over a bucketed cache prefix (see runtime.generate);
            # inactive slots with stale positions past A just clamp their
            # (ignored) cache writes into the prefix
            full_k, full_v = cache_k, cache_v
            cache_k = cache_k[:, :, :A] if A < S else cache_k
            cache_v = cache_v[:, :, :A] if A < S else cache_v

            def step(carry, _):
                ck, cv, p, tk, k = carry
                emb = jnp.take(params["codec_emb"], tk, axis=0)[:, None, :]
                hidden, logits, ck, cv = talker_forward(
                    params, t, emb, ck, cv, p, cos_t, sin_t, pad_len=pad
                )
                k, sub = jax.random.split(k)
                nxt = sample_token(logits[:, -1, :], sub, sampling)
                # inactive slots: hold position, emit PAD, re-write same row
                nxt = jnp.where(active, nxt, t.codec_pad)
                p = jnp.where(active, p + 1, p)
                return (ck, cv, p, nxt, k), (nxt, hidden[:, -1, :])

            (ck, cv, p, tk, key), (tokens, hiddens) = jax.lax.scan(
                step, (cache_k, cache_v, pos, tok, key), None, length=chunk
            )
            tokens_bc = jnp.transpose(tokens, (1, 0))            # [B, chunk]
            B = tokens_bc.shape[0]
            D = hiddens.shape[-1]
            flat_h = jnp.transpose(hiddens, (1, 0, 2)).reshape(B * chunk, D)
            flat_cb0 = jnp.clip(tokens_bc.reshape(B * chunk), 0, cb_size - 1)
            residuals = predict_residuals(cp_params, cfg, flat_h, flat_cb0)
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
                ck = jax.lax.dynamic_update_slice(full_k, ck, (0, 0, 0, 0, 0))
                cv = jax.lax.dynamic_update_slice(full_v, cv, (0, 0, 0, 0, 0))
            return (ck, cv, cstate, p, tk, key, frames,
                    n_valid, codes, wav_chunk)

        self._decode_fns[attn_len] = decode_chunk
        return decode_chunk

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
        """Prefill a free slot with ``prompt``; returns the stream id."""
        slot = next(
            (i for i, s in enumerate(self._slots) if s is None), None
        )
        if slot is None:
            raise RuntimeError("no free slots; call step() until one frees")

        gen = self.model.generator  # reuse its prompt assembly
        emb, pad = gen.assemble_prompt(prompt)
        Lb = emb.shape[1]
        budget = self.cfg.max_seq_len - Lb
        max_frames = max(1, min(max_frames, budget))

        self.cache_k, self.cache_v, last_logits = self._prefill_fn(Lb)(
            self.model.params, emb, jnp.int32(pad),
            self.cache_k, self.cache_v, jnp.int32(slot),
        )
        self.key, sub = jax.random.split(self.key)
        first = sample_token(last_logits[None], sub, self.sampling)[0]

        onehot = jnp.arange(self.B) == slot
        self._host_pos[slot] = Lb
        self.pos = jnp.where(onehot, Lb, self.pos)
        self.pad = jnp.where(onehot, pad, self.pad)
        self.tok = jnp.where(onehot, first, self.tok)
        self.frames_dev = jnp.where(onehot, 0, self.frames_dev)
        # reset the slot's codec conv tail; its transformer cache is
        # overwritten progressively (positions restart at 0 and are
        # always written before being attended)
        self.cstate = dict(
            self.cstate,
            tail=jnp.where(onehot[:, None, None], 0, self.cstate["tail"]),
        )
        self.active_mask = jnp.where(onehot, True, self.active_mask)

        stream = Stream(
            slot=slot,
            stream_id=self._next_id,
            active=True,
            max_frames=max_frames,
            submitted_at=time.perf_counter(),
            on_chunk=on_chunk,
        )
        self._next_id += 1
        self._slots[slot] = stream
        self.streams[stream.stream_id] = stream
        return stream.stream_id

    def dispatch_step(self):
        """Enqueue one decode step for all slots; returns an opaque payload
        for :meth:`collect_step`. Does NOT block — the driver can dispatch
        step k+1 before collecting step k (the host round trip then hides
        under device compute). The payload snapshots slot->stream identity
        at dispatch time, so a step dispatched speculatively past a
        stream's EOS can never credit frames to a slot's next occupant."""
        from .generate import attn_bucket

        active_pos = [
            self._host_pos[slot]
            for slot, s in enumerate(self._slots)
            if s is not None and not s.done
        ]
        A = attn_bucket(
            (max(active_pos) if active_pos else 0) + self.chunk,
            self.cfg.max_seq_len,
        )
        (self.cache_k, self.cache_v, self.cstate, self.pos, self.tok,
         self.key, self.frames_dev, n_valid, codes, wav) = self._decode_fn(A)(
            self.model.params, self.model.cp_params, self.model.codec_params,
            self.cache_k, self.cache_v, self.cstate, self.pos, self.pad,
            self.frames_dev, self.tok, self.active_mask, self.key,
        )
        for slot, s in enumerate(self._slots):
            if s is not None and not s.done:
                self._host_pos[slot] += self.chunk
        snapshot = [
            (slot, s.stream_id) for slot, s in enumerate(self._slots)
            if s is not None and not s.done
        ]
        return (snapshot, n_valid, codes, wav)

    def collect_step(self, payload) -> list[int]:
        """Fetch one dispatched step's results and account them; returns
        stream ids that finished."""
        snapshot, n_valid, codes, wav = payload
        hop = self.cfg.codec.hop
        valid_host, codes_host, wav_host = jax.device_get(
            (n_valid, codes, wav)
        )
        now = time.perf_counter()

        for slot, stream_id in snapshot:
            stream = self.streams.get(stream_id)
            if stream is None or stream.done or self._slots[slot] is not stream:
                continue  # slot was recycled since dispatch
            valid = int(valid_host[slot])
            remaining = stream.max_frames - stream.frames
            done = valid < self.chunk or valid >= remaining
            valid = min(valid, remaining)
            if valid > 0:
                stream.codes.append(codes_host[slot][:, :valid])
                chunk_wav = wav_host[slot, : valid * hop]
                stream.wav_chunks.append(chunk_wav)
                stream.frames += valid
                if stream.ttfa_s is None:
                    stream.ttfa_s = now - stream.submitted_at
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

    def step(self) -> list[int]:
        """Advance every active slot one chunk; returns stream ids finished
        in this step (synchronous dispatch + collect)."""
        if not any(s is not None for s in self._slots):
            return []
        return self.collect_step(self.dispatch_step())

    def collect(self, stream_id: int) -> tuple[np.ndarray, Stream]:
        """Concatenated waveform + state for a (finished) stream."""
        stream = self.streams[stream_id]
        wav = (
            np.concatenate(stream.wav_chunks)
            if stream.wav_chunks
            else np.zeros(0, np.float32)
        )
        return wav, stream

    # -- convenience driver -------------------------------------------------

    def run(
        self, prompts: list[PromptSpec], *, max_frames: int | list[int]
    ) -> list[tuple[np.ndarray, Stream]]:
        """Serve all prompts to completion (continuous batching: new prompts
        enter as slots free up); returns [(wav, stream), ...] in order.
        ``max_frames`` is one shared budget or one per prompt.

        The loop keeps one decode step speculatively in flight so the
        per-step host round trip overlaps device compute (same pattern as
        runtime.generate's single-stream driver)."""
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

        fill_slots()
        inflight = self.dispatch_step() if unfinished() else None
        while inflight is not None:
            # speculative next step: EOS'd slots waste one chunk, but the
            # fetch of `inflight` happens while the device runs `nxt`
            nxt = self.dispatch_step()
            if self.collect_step(inflight):
                fill_slots()
            inflight = nxt if unfinished() else None
        return [self.collect(ids[i]) for i in range(len(prompts))]
