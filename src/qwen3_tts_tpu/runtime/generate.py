"""Jitted synthesis pipeline: prompt embedding -> prefill -> chunked
autoregressive decode -> residual-codebook prediction -> codec decode.

TPU-first structure (SURVEY.md §7 "hard parts" #4/#5):

- the whole decode loop is ``lax.scan`` chunks inside one jitted function:
  zero host round-trips per token, KV caches donated in-place;
- sampling happens on device (runtime.sampling);
- residual codebooks are predicted once per chunk, batched over the chunk's
  frames (models.code_predictor);
- audio streams out chunk-by-chunk (time-to-first-audio = prefill + one
  chunk), at final quality: the codec decodes incrementally with full left
  context (KV-cached latent transformer + conv-tail window), so the file is
  simply the concatenation of the streamed chunks;
- prompts are LEFT-padded to a small set of length buckets so each bucket
  compiles exactly once. RoPE is relative, so left-padding (with padded keys
  masked out) is numerically exact.

The EOS check is the only per-chunk host sync, and it overlaps with the next
chunk's dispatch thanks to JAX async dispatch.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.configs import ModelConfig
from ..models.code_predictor import predict_residuals
from ..models.talker import talker_forward
from ..models.layers import rope_tables
from .prompts import PromptSpec
from .sampling import SamplingConfig, sample_token

PROMPT_BUCKETS = (64, 128, 256, 512, 1024, 2048)


def bucket_len(n: int) -> int:
    for b in PROMPT_BUCKETS:
        if n <= b:
            return b
    return PROMPT_BUCKETS[-1]


@dataclass(frozen=True)
class AssemblyPlan:
    """Host-computable description of a fast-path prompt assembly.

    Everything the one-dispatch assembly fns need, with shapes/pad resolved
    WITHOUT touching the device: submit paths defer the device work so N
    simultaneous cold submissions assemble in ONE batched dispatch
    (serving._batch_cold_prefills — VERDICT r4 #7; each eager submit's
    assembly dispatch costs ~20-40 ms of host/client overhead on the
    tunneled service, tools/profile_cold_ttfa.py)."""

    proto: str        # "pub" (published residual_sum) | "cb0"
    tb_tok: int       # text-token bucket (pow2 >= 8)
    Lb: int           # prompt bucket
    pad: int          # left pad inside the bucket
    spk_kind: str     # "codec" | "table" | "none"
    spk_idx: int
    toks: np.ndarray  # [tb_tok] int32, zero-padded past T
    T: int


# decode attention reads only a bucketed prefix of the KV cache: a short
# utterance shouldn't pay full-max_seq_len cache bandwidth on every token
ATTN_BUCKETS = (512, 1024, 2048, 4096)


def attn_bucket(needed: int, s_max: int) -> int:
    for b in ATTN_BUCKETS:
        if needed <= b <= s_max:
            return b
    return s_max


def _has_lora(tree: Any) -> bool:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return any("lora_a" in str(path) for path, _ in flat)


def _multi_device_tree(tree: Any) -> bool:
    for leaf in jax.tree.leaves(tree):
        s = getattr(leaf, "sharding", None)
        if s is not None and len(s.device_set) > 1:
            return True
    return False


def fuse_decode_params(cp_params: Any, codec_params: Any) -> tuple[Any, Any]:
    """Relayout the replicated small-model params for the decode hot path.

    The code predictor's depth loop and the codec's latent transformer run
    many small matmuls per chunk (tiny rows, sequential scan steps), so the
    decode wall there is launch/latency bound, not bytes bound: fusing
    q/k/v -> qkv and gate/up -> gate_up (models.layers.fuse_block_projections)
    cuts the sequential op count ~30% at identical numerics. The talker is
    NOT fused: its projections are tp-sharded along the output axis
    (parallel/sharding.py), and a concatenated qkv would need an interleaved
    layout to keep head-local shards — while the talker already streams at
    ~80%+ of HBM peak (PERF.md), so there's nothing to win.

    Returns (cp_params, codec_params) with fused decode layouts, sharing
    every untouched leaf with the input trees. Skipped (returned unchanged)
    when QWEN3_TTS_FUSE=0 or when unmerged LoRA adapters are present (the
    low-rank deltas target the split layout; merge first —
    training.lora.merge_lora).
    """
    import os

    from ..models.layers import fuse_block_projections

    if os.environ.get("QWEN3_TTS_FUSE", "") == "0":
        return cp_params, codec_params
    def _already_fused(blocks: dict) -> bool:  # idempotence guard
        return "qkv" in blocks.get("attn", {})

    if (
        "blocks" in cp_params
        and not _already_fused(cp_params["blocks"])
        and not _has_lora(cp_params)
        # a tp-sharded cp (parallel/sharding.py) keeps the split layout:
        # concatenating out-dim-sharded q/k/v would force a reshard
        and not _multi_device_tree(cp_params)
    ):
        cp_params = dict(cp_params)
        cp_params["blocks"] = fuse_block_projections(cp_params["blocks"])
        if (
            "draft" in cp_params
            and not _already_fused(cp_params["draft"]["blocks"])
        ):
            # freeze-base recovery's draft adapter runs the same decode
            # hot path — same relayout
            draft = dict(cp_params["draft"])
            draft["blocks"] = fuse_block_projections(draft["blocks"])
            cp_params["draft"] = draft
    if (
        "tf_blocks" in codec_params.get("dec", {})
        and not _already_fused(codec_params["dec"]["tf_blocks"])
        and not _has_lora(codec_params["dec"]["tf_blocks"])
    ):
        codec_params = dict(codec_params)
        dec = dict(codec_params["dec"])
        dec["tf_blocks"] = fuse_block_projections(dec["tf_blocks"])
        codec_params["dec"] = dec
    return cp_params, codec_params


def fuse_talker_params(params: Any) -> Any:
    """Opt-in (QWEN3_TTS_FUSE_TALKER=1) qkv/gate_up relayout for the
    TALKER on single-device decode. Measured on the published fps=1 shape
    (tools/profile_feedback_stages.py, round 5): 5.35 -> 5.04 ms/frame
    (~+3% single-stream) by halving the per-layer matvec count — the
    single-frame talker pass is launch/latency bound, not bytes bound.
    Default OFF: the fused copy doubles resident talker bytes next to the
    model's canonical split tree (~3.4 GB bf16 at flagship), and the
    remote service frees dropped buffers lazily — a risk beside
    capacity-edge serving engines (PERF.md round 5 fault bisect). Flip it
    for single-stream-only deployments. No-op for tp-sharded or LoRA
    trees; identical numerics (transformer_block dispatches on the fused
    keys — parity in tests/test_fuse.py)."""
    import os

    if os.environ.get("QWEN3_TTS_FUSE_TALKER", "0") in ("0", ""):
        return params
    if os.environ.get("QWEN3_TTS_FUSE", "") == "0":
        return params
    from ..models.layers import fuse_block_projections

    if (
        "blocks" not in params
        or "qkv" in params["blocks"].get("attn", {})
        or _has_lora(params)
        or _multi_device_tree(params)
    ):
        return params
    params = dict(params)
    params["blocks"] = fuse_block_projections(params["blocks"])
    return params


def group_quantized(*trees):
    """int8-resident decode: relayout every quantized linear into the
    grouped format for ops/grouped_qmv (policy: QWEN3_TTS_INT8_LAYOUT,
    default grouped on TPU). Runs AFTER fuse_decode_params so fused qkv /
    gate_up projections get grouped too. Identity on bf16-compute trees
    (no quantized dicts left after apply_compute_format) and under the
    row-major policy; the owning model keeps the canonical row-major trees
    for training/export/sharded plans."""
    from ..ops.grouped_qmv import grouped_layout, pack_grouped_tree

    if not grouped_layout() or any(_multi_device_tree(t) for t in trees):
        return trees if len(trees) > 1 else trees[0]
    out = tuple(pack_grouped_tree(t) for t in trees)
    return out if len(out) > 1 else out[0]


def default_chunk_schedule(t) -> tuple:
    """The adaptive decode-chunk ladder: a small first chunk for TTFA,
    then straight to the steady 32-frame chunk.

    The mid-ramp (the old (…, 8, 16, 32) ladders) was REMOVED in round 5:
    measured on-device with interleaved arms
    (tools/profile_feedback_decode.py), the ramp cost 5-11% of
    single-stream steady state — raw-import shape (4,8,16,32) 6.34x vs
    (4,32) 6.88x vs (32,)-only 7.03x; headline cb0 fps=2 shape (8,16,32)
    26.1x vs (8,32) 27.5x vs (32,)-only 28.6x — because early frames
    decode at small-chunk efficiency while the first-chunk TTFA benefit
    needs only ONE small chunk. (8,32)'s TTFA measured equal-or-better
    than the full ramp's on the headline shape (71-77 ms vs 73-109 ms).

    The raw-import shape (residual_sum feedback, one frame per talker
    pass) leads with 4 instead of 8: its cp-in-loop doubles per-frame
    serial cost, and the 8-frame first chunk alone blew the 8-stream
    cold-start TTFA budget (VERDICT r3 #4: p50 388 ms vs the 300 ms
    BASELINE target)."""
    if t.feedback == "residual_sum" and t.frames_per_step == 1:
        return (4, 32)
    return (8, 32)


def align_chunk_schedule(schedule, fps: int) -> tuple:
    """Round each chunk size UP to a multiple of ``frames_per_step`` (a
    chunk is a whole number of MTP weight passes). Divisible schedules —
    every fps=1/2/4 use of the (8, 16, 32) default — are returned
    unchanged; fps=3 maps the default to (9, 18, 33)."""
    out = tuple(-(-int(c) // fps) * fps for c in schedule)
    assert all(c > 0 for c in out), schedule
    return out


@dataclass
class GenerationResult:
    wav: np.ndarray                   # [n_samples] int16 PCM mono (24 kHz)
    frames: int
    sample_rate: int
    ttfa_s: float                     # time to first audio chunk
    wall_s: float
    audio_s: float
    codes: np.ndarray | None = None   # [Q, frames] when collect_codes=True

    @property
    def rtf(self) -> float:
        """Real-time factor: audio seconds produced per wall second."""
        return self.audio_s / self.wall_s if self.wall_s > 0 else 0.0


# --------------------------------------------------------------------------
# jitted stage factories (cached per (config, static-shape) on the model)
# --------------------------------------------------------------------------

def make_prefill_fn(cfg: ModelConfig) -> Callable:
    t = cfg.talker
    S = cfg.max_seq_len

    @partial(jax.jit, donate_argnums=(3, 4))
    def prefill(params, emb, pad_len, cache_k, cache_v):
        cos_t, sin_t = rope_tables(S, t.head_dim, t.rope_theta)
        hidden, logits, ck, cv = talker_forward(
            params, t, emb, cache_k, cache_v, jnp.int32(0), cos_t, sin_t,
            pad_len=pad_len, head_last_only=True,
        )
        return hidden[:, -1, :], logits[:, -1, :], ck, cv

    return prefill


def make_decode_chunk_fn(
    cfg: ModelConfig, chunk: int, sampling: SamplingConfig,
    attn_len: int | None = None,
) -> Callable:
    """One fused dispatch per chunk: AR talker steps + residual prediction +
    incremental codec decode with full left context.

    Fusing the codec into the same jit matters off-chip latency-wise: the
    host sees ONE dispatch and ONE fetch per chunk, and the driver loop can
    dispatch chunk k+1 before reading chunk k (speculative pipelining) so
    the host<->device round trip fully overlaps device compute.

    The codec decodes incrementally (models.codec.decode_codes_streaming):
    its latent transformer carries a KV cache and every decoder conv
    carries its own left input context, so each chunk decodes ONLY its new
    frames (zero conv recompute) and every streamed chunk IS the
    final-quality output — no end-of-utterance re-decode pass. The codec
    state shapes are chunk-size-independent, so the adaptive chunk
    schedule hands the same state between variants.
    """
    from ..models.codec import decode_codes_streaming
    from ..models.talker import merge_step_tokens, mtp_logits
    from ..ops.pcm import wav_to_pcm16

    t = cfg.talker
    S = cfg.max_seq_len
    A = attn_len or S  # static attention window (caller picks a bucket)
    cb_size = cfg.codec.codebook_size
    fps = t.frames_per_step
    assert chunk % fps == 0, (chunk, fps)
    n_steps = chunk // fps  # talker weight passes per chunk (MTP)
    cp_stoch = cp_samples(cfg, sampling)

    @partial(jax.jit, donate_argnums=(3, 4, 5))
    def decode_chunk(params, cp_params, codec_params, cache_k, cache_v,
                     cstate, pos, pad_len, n_frames, last_token, key):
        """cstate: codec stream state (models.codec.init_codec_stream_state).
        n_frames: frames emitted before this chunk (scalar or [B]).
        last_token: [B, fps] — the previous step's frame tokens."""
        cos_t, sin_t = rope_tables(S, t.head_dim, t.rope_theta)

        # attention reads/writes only the first A cache slots (the caller
        # guarantees pos + chunk <= A); the full buffers are donated and the
        # prefix is written back in place at the end. tree.map covers both
        # dense and KVQuant (int8) cache layouts.
        full_k, full_v = cache_k, cache_v
        if A < S:
            cache_k = jax.tree.map(lambda c: c[:, :, :A], cache_k)
            cache_v = jax.tree.map(lambda c: c[:, :, :A], cache_v)

        def step(carry, _):
            ck, cv, p, tok, k = carry
            emb = merge_step_tokens(params, t, tok)[:, None, :]
            hidden, logits, ck, cv = talker_forward(
                params, t, emb, ck, cv, p, cos_t, sin_t, pad_len=pad_len
            )
            h = hidden[:, -1, :]
            k, sub = jax.random.split(k)
            toks = [sample_token(logits[:, -1, :], sub, sampling)]
            hj = h
            for _j in range(1, fps):  # MTP frames from the same weight pass
                lg, hj = mtp_logits(params, t, hj, toks[-1])
                k, sub = jax.random.split(k)
                toks.append(sample_token(lg, sub, sampling))
            nxt = jnp.stack(toks, axis=1)                 # [B, fps]
            return (ck, cv, p + 1, nxt, k), (nxt, h)

        (ck, cv, p, tok, key), (tokens, hiddens) = jax.lax.scan(
            step, (cache_k, cache_v, pos, last_token, key), None,
            length=n_steps,
        )
        # tokens: [steps, B, fps] -> [B, chunk]; hiddens: [steps, B, D]
        tokens_bc = jnp.transpose(tokens, (1, 0, 2)).reshape(-1, chunk)
        B = tokens_bc.shape[0]
        D = hiddens.shape[-1]
        # each step's hidden conditions all fps of its frames' residuals
        flat_h = jnp.repeat(
            jnp.transpose(hiddens, (1, 0, 2)), fps, axis=1
        ).reshape(B * chunk, D)
        # control tokens (BOS/EOS/PAD >= codebook_size) are clamped for the
        # predictor; the host masks frames at/after EOS anyway.
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
        ).transpose(0, 2, 1)                      # [B, Q, chunk]

        # incremental full-context codec decode of the new frames
        wav_chunk, cstate = decode_codes_streaming(
            codec_params, cfg, codes, cstate, n_frames
        )                                                 # [B, chunk*hop]
        # the frame counter stays in device state: a fresh host scalar per
        # dispatch would cost a host->device upload round trip per chunk
        n_frames = jnp.asarray(n_frames) + chunk

        # EOS detection on device: the host fetches one small tuple per
        # chunk instead of scanning raw tokens (device->host round trips
        # are the latency budget on tunneled TPUs)
        is_eos = tokens_bc == t.codec_eos                 # [B, chunk]
        eos_hit = jnp.any(is_eos, axis=1)                 # [B]
        eos_idx = jnp.argmax(is_eos, axis=1)              # first EOS position
        n_valid = jnp.where(eos_hit, eos_idx, chunk).astype(jnp.int32)

        if A < S:  # write the updated prefix back into the donated buffers
            upd = lambda f, c: jax.lax.dynamic_update_slice(  # noqa: E731
                f, c, (0, 0, 0, 0, 0)
            )
            ck = jax.tree.map(upd, full_k, ck)
            cv = jax.tree.map(upd, full_v, cv)
        # quantize to 16-bit PCM on device: halves the per-chunk host fetch
        # (the final WAV is 16-bit PCM anyway; bit-identical to host quant)
        wav_pcm = wav_to_pcm16(wav_chunk)
        return ck, cv, cstate, p, tok, key, n_frames, n_valid, codes, wav_pcm

    return decode_chunk


def cp_samples(cfg: ModelConfig, sampling: SamplingConfig) -> bool:
    """Whether the code predictor SAMPLES residual codes (the published
    cp.generate: do_sample, top_k=50, top_p=0.8). Trace-time: requires the
    config to ask for it AND the talker itself to be sampling — greedy
    talker decode keeps greedy residuals, so the serving==single-stream
    greedy-parity invariant stays bit-exact."""
    cp = cfg.code_predictor
    wants = cp.top_k > 0 or cp.top_p < 1.0 or cp.temperature != 1.0
    return wants and not (sampling.greedy or sampling.temperature <= 0.0)


def seed_feedback_frames(
    params, cp_params, cfg: ModelConfig, sampling: SamplingConfig,
    hidden, logits, key, *, row_keys_from=None,
):
    """Sample the seed step's ``frames_per_step`` frames under the published
    protocol (feedback="residual_sum"): frame 0 from the prefill logits,
    frames 1..n-1 through the embedding-conditioned MTP chain
    (models.talker.mtp_logits_emb — each conditioned on the previous
    frame's cb0-plus-residual-sum feedback embedding), with the code
    predictor run per frame so its feedback sum conditions the next frame
    and the first decode step. hidden [B, D], logits [B, V] ->
    (tok [B, n], rs [B, n, D], res [B, n, Q-1], key). n == 1 reduces to
    the published single-frame seed (one sample + one predictor pass).

    ``row_keys_from``: optional [B] slot-id array — per-row folded sampling
    keys so replicated padding rows draw identical samples (the batched
    cold-start prefill requirement, serving._prefill_batch_fn_fb).
    """
    from ..models.talker import mtp_logits_emb

    t = cfg.talker
    cb = cfg.codec.codebook_size
    fps = t.frames_per_step
    cp_stoch = cp_samples(cfg, sampling)

    def draw(lg, k):
        if row_keys_from is None:
            return sample_token(lg, k, sampling)
        keys = jax.vmap(lambda s: jax.random.fold_in(k, s))(row_keys_from)
        return jax.vmap(
            lambda l, kk: sample_token(l[None, :], kk, sampling)[0]
        )(lg, keys)

    def cp_kwargs(k):
        if not cp_stoch:
            return {}
        if row_keys_from is None:
            return {"key": k}
        return {"row_keys": jax.vmap(
            lambda s: jax.random.fold_in(k, s)
        )(row_keys_from)}

    if t.mtp_cp_batch and fps > 1:
        # batched-cp MTP variant (TalkerConfig.mtp_cp_batch): cb0-only
        # chain conditioning, then one cp pass over all fps frames as
        # batch rows. row_keys expand per frame (fold by frame index) so
        # replicated padding rows still draw identical residuals.
        toks, hs = [], []
        h = hidden
        key, sub = jax.random.split(key)
        cb0 = draw(logits, sub)
        for j in range(fps):
            toks.append(cb0)
            hs.append(h)
            if j + 1 < fps:
                cond = jnp.take(
                    params["codec_emb"], cb0, axis=0
                ).astype(hidden.dtype)
                lg, h = mtp_logits_emb(params, t, h, cond)
                key, sub = jax.random.split(key)
                cb0 = draw(lg, sub)
        B = hidden.shape[0]
        tok = jnp.stack(toks, axis=1)                         # [B, fps]
        flat_h = jnp.stack(hs, axis=1).reshape(B * fps, -1)
        key, cpk = jax.random.split(key)
        kw = cp_kwargs(cpk)
        if "row_keys" in kw:
            rk = jax.vmap(lambda kk: jax.vmap(
                lambda j: jax.random.fold_in(kk, j)
            )(jnp.arange(fps)))(kw["row_keys"])               # [B, fps]
            kw = {"row_keys": rk.reshape((B * fps,) + rk.shape[2:])}
        res_f, rs_f = predict_residuals(
            cp_params, cfg, flat_h, jnp.clip(tok.reshape(-1), 0, cb - 1),
            return_feedback=True, **kw,
        )
        return (tok, rs_f.reshape(B, fps, -1).astype(hidden.dtype),
                res_f.reshape(B, fps, -1), key)

    toks, rss, ress = [], [], []
    h = hidden
    key, sub = jax.random.split(key)
    cb0 = draw(logits, sub)
    for j in range(fps):
        key, cpk = jax.random.split(key)
        res, rs = predict_residuals(
            cp_params, cfg, h, jnp.clip(cb0, 0, cb - 1),
            return_feedback=True, **cp_kwargs(cpk),
        )
        toks.append(cb0)
        rss.append(rs.astype(hidden.dtype))
        ress.append(res)
        if j + 1 < fps:
            cond = (
                jnp.take(params["codec_emb"], cb0, axis=0).astype(hidden.dtype)
                + rss[-1]
            )
            lg, h = mtp_logits_emb(params, t, h, cond)
            key, sub = jax.random.split(key)
            cb0 = draw(lg, sub)
    return (jnp.stack(toks, axis=1), jnp.stack(rss, axis=1),
            jnp.stack(ress, axis=1), key)


def trailing_lookup(trailing: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Row ``g`` of each stream's trailing-text buffer ([B, Tb, D], [B] ->
    [B, D]). The buffer's tail rows are tts_pad embeddings (see
    Generator.assemble_prompt_full), so clamping the index reproduces the
    published "tts_pad forever after the text" behavior for any utterance
    length."""
    Tb = trailing.shape[1]
    idx = jnp.clip(g, 0, Tb - 1)[:, None, None]
    return jnp.take_along_axis(trailing, idx, axis=1)[:, 0, :]


def make_decode_chunk_fn_feedback(
    cfg: ModelConfig, chunk: int, sampling: SamplingConfig,
    attn_len: int | None = None,
    window_split: tuple | None = None,
) -> Callable:
    """Published-protocol chunk decode (TalkerConfig.feedback =
    "residual_sum", PARITY.md item 3): each talker step consumes the SUM of
    ALL codebook embeddings of the previous frame (cb0 via the talker's
    codec_emb, residual d via the code predictor's depth-d input table)
    plus one trailing-text row (the talker re-reads the text one token per
    frame; tts_pad rows after it ends) — transformers
    Qwen3OmniMoeTalkerForConditionalGeneration.prepare_inputs_for_generation.

    The code predictor therefore runs per frame INSIDE the talker scan (its
    codes feed the next input) instead of batched per chunk; the serial
    depth scan adds ~cp-share latency per frame — the price of the
    published protocol's exact conditioning. Residual codes come out of the
    scan directly; everything downstream (streaming codec, EOS, PCM)
    matches the cb0 path.

    ``frames_per_step > 1`` (the MTP fine-tune path, PERF.md): each talker
    weight pass emits fps frames — frame 0 from the main head, frames
    1..fps-1 through the embedding-conditioned MTP chain
    (models.talker.mtp_logits_emb, conditioned on the previous frame's
    full feedback embedding) — each frame keeping its own per-frame code
    predictor pass, residual feedback sum and trailing-text row. The next
    pass consumes a learned MERGE of the fps frames' feedback embeddings
    and advances ONE cache position, so talker weight/KV bytes per frame
    shrink by fps while the protocol's per-frame conditioning is intact.

    ONE builder serves both engines (the serving==single-stream parity
    invariant then lives in one place): single-stream passes an all-true
    ``active`` vector; the serving engine passes its slot mask (inactive
    slots hold position/counters and emit PAD) plus its per-group
    ``window_split``. pos/n_frames/g/active are [B] vectors in both."""
    from ..models.codec import decode_codes_streaming
    from ..models.talker import merge_step_embs, mtp_logits_emb
    from ..ops.pcm import wav_to_pcm16

    t = cfg.talker
    fps = t.frames_per_step
    assert chunk % fps == 0, (chunk, fps)
    n_steps = chunk // fps
    S = cfg.max_seq_len
    A = attn_len or S
    cb_size = cfg.codec.codebook_size
    cp_stoch = cp_samples(cfg, sampling)

    @partial(jax.jit, donate_argnums=(3, 4, 5))
    def decode_chunk(params, cp_params, codec_params, cache_k, cache_v,
                     cstate, trailing, pos, pad_len, n_frames, last_token,
                     res_sum, g, active, key):
        """trailing: [B, Tb, D]; last_token: [B, fps]; res_sum: [B, fps, D]
        per-frame feedback sums of the previous step's residual codes;
        g: [B] trailing rows consumed."""
        cos_t, sin_t = rope_tables(S, t.head_dim, t.rope_theta)
        full_k, full_v = cache_k, cache_v
        if A < S:
            cache_k = jax.tree.map(lambda c: c[:, :, :A], cache_k)
            cache_v = jax.tree.map(lambda c: c[:, :, :A], cache_v)

        def step(carry, _):
            ck, cv, p, tok, rs, gg, k = carry
            # previous step's fps frames: full published feedback embedding
            # per frame (cb0 + residual sum + its own trailing-text row),
            # merged into ONE talker input (identity at fps == 1)
            prev = jnp.take(params["codec_emb"], tok, axis=0).astype(
                rs.dtype
            ) + rs                                            # [B, fps, D]
            trail_rows = jnp.stack(
                [trailing_lookup(trailing, gg + j) for j in range(fps)],
                axis=1,
            )                                                 # [B, fps, D]
            emb = merge_step_embs(params, t, prev + trail_rows)[:, None, :]
            hidden, logits, ck, cv = talker_forward(
                params, t, emb, ck, cv, p, cos_t, sin_t, pad_len=pad_len,
                window_split=window_split,
            )
            h = hidden[:, -1, :]
            k, sub = jax.random.split(k)
            cb0 = sample_token(logits[:, -1, :], sub, sampling)   # [B]
            if t.mtp_cp_batch and fps > 1:
                # batched-cp MTP variant (TalkerConfig.mtp_cp_batch): the
                # chain conditions on cb0 embeddings alone, so the whole
                # chain runs cp-free and ONE cp pass covers all fps
                # frames as extra batch rows — cp weight bytes per step
                # divide by fps (training/loss.py mirrors the chain)
                cb0s, hs = [], []
                for j in range(fps):
                    cb0s.append(cb0)
                    hs.append(h)
                    if j + 1 < fps:
                        cond = jnp.take(
                            params["codec_emb"], cb0, axis=0
                        ).astype(rs.dtype)
                        lg, h = mtp_logits_emb(params, t, h, cond)
                        k, sub = jax.random.split(k)
                        cb0 = sample_token(lg, sub, sampling)
                if cp_stoch:
                    k, cpk = jax.random.split(k)
                Bq = h.shape[0]
                flat_h = jnp.stack(hs, axis=1).reshape(Bq * fps, -1)
                frame_toks = jnp.stack(cb0s, axis=1)          # [B, fps]
                res_f, rs_f = predict_residuals(
                    cp_params, cfg, flat_h,
                    jnp.clip(frame_toks.reshape(-1), 0, cb_size - 1),
                    return_feedback=True, key=cpk if cp_stoch else None,
                )
                frame_res = res_f.reshape(Bq, fps, -1)        # [B, fps, Q-1]
                rs_stack = rs_f.reshape(Bq, fps, -1).astype(rs.dtype)
            else:
                cb0s, res_list, rs_list = [], [], []
                for j in range(fps):
                    if cp_stoch:
                        k, cpk = jax.random.split(k)
                    res_codes, rs_new = predict_residuals(
                        cp_params, cfg, h, jnp.clip(cb0, 0, cb_size - 1),
                        return_feedback=True, key=cpk if cp_stoch else None,
                    )
                    cb0s.append(cb0)
                    res_list.append(res_codes)
                    rs_list.append(rs_new.astype(rs.dtype))
                    if j + 1 < fps:  # MTP chain: next frame, same pass
                        cond = jnp.take(
                            params["codec_emb"], cb0, axis=0
                        ).astype(rs.dtype) + rs_list[-1]
                        lg, h = mtp_logits_emb(params, t, h, cond)
                        k, sub = jax.random.split(k)
                        cb0 = sample_token(lg, sub, sampling)
                frame_toks = jnp.stack(cb0s, axis=1)          # [B, fps]
                frame_res = jnp.stack(res_list, axis=1)       # [B, fps, Q-1]
                rs_stack = jnp.stack(rs_list, axis=1)         # [B, fps, D]
            # inactive slots hold position/counters and emit PAD; the cast
            # keeps the CARRY's dtype (imported fp32 tables would otherwise
            # widen it mid-scan)
            frame_toks = jnp.where(active[:, None], frame_toks, t.codec_pad)
            rs = jnp.where(active[:, None, None], rs_stack, rs)
            carry = (ck, cv, jnp.where(active, p + 1, p), frame_toks,
                     rs, jnp.where(active, gg + fps, gg), k)
            return carry, (frame_toks, frame_res)

        (ck, cv, p, tok, res_sum, g, key), (tokens, residuals) = jax.lax.scan(
            step,
            (cache_k, cache_v, pos, last_token, res_sum, g, key),
            None, length=n_steps,
        )
        # tokens: [steps, B, fps] -> [B, chunk]; residuals likewise
        tokens_bc = jnp.transpose(tokens, (1, 0, 2)).reshape(-1, chunk)
        flat_cb0 = jnp.clip(tokens_bc, 0, cb_size - 1)
        codes = jnp.concatenate(
            [
                flat_cb0[:, :, None],
                jnp.transpose(residuals, (1, 0, 2, 3)).reshape(
                    tokens_bc.shape[0], chunk, -1
                ),                                          # [B, chunk, Q-1]
            ],
            axis=-1,
        ).transpose(0, 2, 1)                                # [B, Q, chunk]

        wav_chunk, cstate = decode_codes_streaming(
            codec_params, cfg, codes, cstate, n_frames
        )
        n_frames = jnp.where(active, n_frames + chunk, n_frames)
        is_eos = tokens_bc == t.codec_eos
        eos_hit = jnp.any(is_eos, axis=1)
        eos_idx = jnp.argmax(is_eos, axis=1)
        n_valid = jnp.where(eos_hit, eos_idx, chunk).astype(jnp.int32)
        if A < S:
            upd = lambda f, c: jax.lax.dynamic_update_slice(  # noqa: E731
                f, c, (0, 0, 0, 0, 0)
            )
            ck = jax.tree.map(upd, full_k, ck)
            cv = jax.tree.map(upd, full_v, cv)
        return (ck, cv, cstate, p, tok, key, n_frames, res_sum, g,
                n_valid, codes, wav_to_pcm16(wav_chunk))

    return decode_chunk


# --------------------------------------------------------------------------
# the synthesis driver
# --------------------------------------------------------------------------

@dataclass
class Generator:
    """Owns the jitted stages + cache buffers for one model instance."""

    cfg: ModelConfig
    params: Any                       # talker params (device)
    cp_params: Any                    # code-predictor params
    codec_params: Any
    sampling: SamplingConfig = field(default_factory=SamplingConfig)
    # adaptive chunk schedule: small first chunk protects TTFA, growing
    # steady-state chunks amortize per-dispatch fixed costs (depth-
    # transformer scan, host round trip); the last entry repeats for the
    # rest of the utterance. None = protocol-aware default
    # (default_chunk_schedule: the raw-import feedback shape leads with 4)
    chunk_schedule: tuple | None = None
    # chunks kept in flight ahead of the one being fetched (2 = the classic
    # one-speculative-chunk pattern; serving measured depth 2->3 nearly
    # flat, tools/ab_serving.py)
    pipeline_depth: int = 2
    _fns: dict = field(default_factory=dict)

    def __post_init__(self):
        # decode-layout relayout (qkv/gate_up fusion); the canonical split
        # trees stay on the owning model for training/export
        self.cp_params, self.codec_params = fuse_decode_params(
            self.cp_params, self.codec_params
        )
        self.params = fuse_talker_params(self.params)  # opt-in, see doc
        self.params, self.cp_params, self.codec_params = group_quantized(
            self.params, self.cp_params, self.codec_params
        )
        # chunk sizes must be whole MTP steps; round up so the default
        # (8, 16, 32) works for ANY frames_per_step (fps=3 -> 9, 18, 33)
        # instead of crashing on indivisible sizes. fps-divisible schedules
        # pass through unchanged.
        if self.chunk_schedule is None:
            self.chunk_schedule = default_chunk_schedule(self.cfg.talker)
        self.chunk_schedule = align_chunk_schedule(
            self.chunk_schedule, self.cfg.talker.frames_per_step
        )

    @property
    def chunk(self) -> int:
        """First-chunk size (TTFA granularity)."""
        return self.chunk_schedule[0]

    def _prefill_fn(self):
        key = "prefill"
        if key not in self._fns:
            self._fns[key] = make_prefill_fn(self.cfg)
        return self._fns[key]

    def _decode_fn(self, chunk: int, attn_len: int | None = None):
        key = ("decode", chunk, self.sampling, attn_len)
        if key not in self._fns:
            factory = (
                make_decode_chunk_fn_feedback
                if self.cfg.talker.feedback == "residual_sum"
                else make_decode_chunk_fn
            )
            self._fns[key] = factory(
                self.cfg, chunk, self.sampling, attn_len=attn_len,
            )
        return self._fns[key]

    def _seed_feedback_fn(self):
        """Jitted seed pass for the published protocol: sample the seed
        step's fps frames AND their residual feedback sums in ONE dispatch
        (the eager alternative runs the whole depth scan op-by-op — dozens
        of remote round trips per utterance on a tunneled device). Returns
        (tok [B, fps], rs [B, fps, D])."""
        key = ("seed_fb", self.sampling)
        if key not in self._fns:
            cfg = self.cfg
            sampling = self.sampling

            @jax.jit
            def seed_fb(params, cp_params, hidden, logits, rng):
                tok, rs, _, _ = seed_feedback_frames(
                    params, cp_params, cfg, sampling, hidden, logits, rng
                )
                return tok, rs

            self._fns[key] = seed_fb
        return self._fns[key]

    def _alloc_cache(self, batch: int = 1):
        from ..models.layers import kv_cache_init

        t = self.cfg.talker
        shape = (t.n_layers, batch, self.cfg.max_seq_len, t.n_kv_heads, t.head_dim)
        dtype = jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32
        return kv_cache_init(shape, dtype), kv_cache_init(shape, dtype)

    def _seed_tokens(self, hidden_last, logits, key) -> jnp.ndarray:
        """Sample the seed step's ``frames_per_step`` tokens from the
        prefill outputs (frame 0 from the main head, the rest through the
        MTP block); returns [B, fps]. These seed the first decode chunk's
        input merge — they are conditioning, not rendered frames. ONE
        jitted dispatch: the eager chain ran full-weight MTP head matmuls
        per utterance (~2 eager weight-streaming ops per extra frame) on
        the prefill critical path — pure TTFA."""
        fkey = ("seed_cb0", self.sampling)
        if fkey not in self._fns:
            from ..models.talker import mtp_logits

            t = self.cfg.talker
            sampling = self.sampling

            @jax.jit
            def seed(params, hidden, logits, rng):
                rng, sub = jax.random.split(rng)
                toks = [sample_token(logits, sub, sampling)]
                h = hidden
                for _ in range(1, t.frames_per_step):
                    lg, h = mtp_logits(params, t, h, toks[-1])
                    rng, sub = jax.random.split(rng)
                    toks.append(sample_token(lg, sub, sampling))
                return jnp.stack(toks, axis=1)

            self._fns[fkey] = seed
        return self._fns[fkey](self.params, hidden_last, logits, key)

    # -- prompt embedding (eager; once per utterance) ----------------------

    def assemble_prompt(self, prompt: PromptSpec) -> tuple[jnp.ndarray, int]:
        """Compose the prompt embedding sequence and left-pad it to a bucket.

        Returns (emb [1, L_bucket, D], pad_len).
        """
        emb, pad, _ = self.assemble_prompt_full(prompt)
        return emb, pad

    def assemble_prompt_full(
        self, prompt: PromptSpec
    ) -> tuple[jnp.ndarray, int, jnp.ndarray | None]:
        """(emb [1, L_bucket, D], pad_len, trailing [1, Tb, D] | None).

        ``trailing`` is the per-frame trailing-text buffer of the published
        decode protocol (None unless feedback="residual_sum")."""
        if self.cfg.talker.feedback == "residual_sum":
            return self._assemble_published(prompt)
        emb, pad = self._assemble_cb0(prompt)
        return emb, pad, None

    def _prompt_cap(self) -> int:
        max_prompt = max(
            16, self.cfg.max_seq_len - 2 * max(self.chunk_schedule)
        )
        allowed = [b for b in PROMPT_BUCKETS if b <= max_prompt]
        return allowed[-1] if allowed else max_prompt

    def _pub_head_len(self, spk_kind: str) -> int:
        """Row count of the published prompt head — text-INDEPENDENT
        (text conditions through the trailing buffer). The single source
        shared by fast_assembly_plan and _assemble_published_fast_fn:
        their L/Lb/pad statics must never diverge (the serving engine
        sizes KV scratch from the plan, the fn emits the rows)."""
        t = self.cfg.talker
        return 3 + len(t.codec_prompt_head) + (
            1 if spk_kind != "none" else 0
        ) + 2

    def fast_assembly_plan(self, prompt: PromptSpec) -> AssemblyPlan | None:
        """AssemblyPlan for the common one-dispatch prompt shapes, or None
        (clone conditioning / degenerate / truncating prompts keep the
        eager chain). The single source of truth for fast-path
        eligibility: both the immediate assembly below and the serving
        engine's deferred cold-start batching go through it."""
        t = self.cfg.talker
        if not getattr(self, "_fast_assembly", True):  # test escape hatch
            return None
        if prompt.speaker_vector is not None:
            return None
        if prompt.acoustic_codes is not None and prompt.acoustic_codes.size:
            return None
        toks_np = np.asarray(prompt.text_tokens)
        cap = self._prompt_cap()
        if t.feedback == "residual_sum":
            # same eager-time check as _assemble_published: a deferred
            # plan must not postpone the tokenizer-mismatch raise
            if toks_np.size and (
                int(toks_np.max()) >= t.vocab_size or int(toks_np.min()) < 0
            ):
                raise ValueError(
                    f"token id {int(toks_np.max())} out of range for "
                    f"vocab_size {t.vocab_size}: tokenizer/config mismatch"
                )
            if toks_np.size < 4:
                return None
            if prompt.speaker_token is not None:
                spk_kind, spk_idx = "codec", int(prompt.speaker_token)
            elif prompt.speaker_id is not None:
                spk_kind, spk_idx = "table", int(prompt.speaker_id)
            else:
                spk_kind, spk_idx = "none", 0
            L = self._pub_head_len(spk_kind)
            proto = "pub"
        else:
            if toks_np.size < 1:
                return None
            if (prompt.speaker_id is not None
                    and prompt.speaker_token is not None):
                return None
            if toks_np.size and (
                int(toks_np.max()) >= t.vocab_size or int(toks_np.min()) < 0
            ):
                if t.vocab_size >= 512:
                    raise ValueError(
                        f"token id {int(toks_np.max())} out of range for "
                        f"vocab_size {t.vocab_size}: tokenizer/config "
                        f"mismatch (wrong tokenizer files for this model?)"
                    )
                toks_np = toks_np % t.vocab_size
            if prompt.speaker_id is not None:
                spk_kind, spk_idx = "table", int(prompt.speaker_id)
            elif prompt.speaker_token is not None:
                spk_kind, spk_idx = "codec", int(prompt.speaker_token)
            else:
                spk_kind, spk_idx = "none", 0
            s = 1 if spk_kind == "table" else 0
            n_tail = len(t.codec_prompt_head) + (
                1 if spk_kind == "codec" else 0
            ) + 1
            L = s + int(toks_np.size) + n_tail
            proto = "cb0"
        Lb = min(bucket_len(L), cap)
        if L > Lb:  # truncating prompts fall through to eager
            return None
        T = int(toks_np.size)
        tb_tok = 8
        while tb_tok < T:
            tb_tok *= 2
        toks_pad = np.zeros(tb_tok, np.int32)
        toks_pad[:T] = toks_np
        return AssemblyPlan(
            proto=proto, tb_tok=tb_tok, Lb=Lb, pad=Lb - L,
            spk_kind=spk_kind, spk_idx=spk_idx, toks=toks_pad, T=T,
        )

    def assemble_from_plan(
        self, plan: AssemblyPlan
    ) -> tuple[jnp.ndarray, int, jnp.ndarray | None]:
        """Run one plan as a single jitted dispatch: (emb [1, Lb, D], pad,
        trailing [1, Tb, D] | None)."""
        if plan.proto == "pub":
            fn, pad = self._assemble_published_fast_fn(
                plan.tb_tok, plan.spk_kind
            )
            emb, buf = fn(self.params, jnp.asarray(plan.toks),
                          jnp.int32(plan.T), jnp.int32(plan.spk_idx))
            return emb, pad, buf
        fn = self._assemble_cb0_fast_fn(plan.tb_tok, plan.Lb, plan.spk_kind)
        emb = fn(self.params, jnp.asarray(plan.toks), jnp.int32(plan.T),
                 jnp.int32(plan.pad), jnp.int32(plan.spk_idx))
        return emb, plan.pad, None

    def assemble_plans_batched(
        self, plans: list
    ) -> tuple[jnp.ndarray, jnp.ndarray | None]:
        """Assemble N plans in ONE jitted dispatch: (emb [N, Lb, D],
        trailing [N, Tb, D] | None). All plans must share (proto, Lb,
        spk_kind); tb_tok is lifted to the group max (the fast fns read
        token rows only below T, so extra zero padding is value-invariant
        — same property the per-prompt bucketing relies on). The batch
        dimension is padded to a power of two INTERNALLY (plan 0
        replicated, outputs sliced back) so arbitrary subgroup sizes —
        mixed speaker kinds, an eager clone prompt in the cold batch —
        can't mint unbounded compile variants on a service whose compiles
        cost minutes (CLAUDE.md)."""
        p0 = plans[0]
        assert all(
            (p.proto, p.Lb, p.spk_kind) == (p0.proto, p0.Lb, p0.spk_kind)
            for p in plans
        ), "assemble_plans_batched: mixed group"
        n = len(plans)
        nb = 1
        while nb < n:
            nb *= 2
        padded_plans = list(plans) + [p0] * (nb - n)
        tb = max(p.tb_tok for p in padded_plans)
        toks = np.zeros((nb, tb), np.int32)
        for i, p in enumerate(padded_plans):
            toks[i, : p.tb_tok] = p.toks
        T = jnp.asarray([p.T for p in padded_plans], jnp.int32)
        spk = jnp.asarray([p.spk_idx for p in padded_plans], jnp.int32)
        if p0.proto == "pub":
            bfn = self._assemble_published_fast_batch_fn(nb, tb,
                                                         p0.spk_kind)
            emb, buf = bfn(self.params, jnp.asarray(toks), T, spk)
            return (emb, buf) if n == nb else (emb[:n], buf[:n])
        pads = jnp.asarray([p.pad for p in padded_plans], jnp.int32)
        bfn = self._assemble_cb0_fast_batch_fn(nb, tb, p0.Lb, p0.spk_kind)
        emb = bfn(self.params, jnp.asarray(toks), T, pads, spk)
        return (emb if n == nb else emb[:n]), None

    def _assemble_published_fast_batch_fn(self, n: int, tb_tok: int,
                                          spk_kind: str):
        key = ("asm_pub_b", n, tb_tok, spk_kind)
        if key in self._fns:
            return self._fns[key]
        fn, _ = self._assemble_published_fast_fn(tb_tok, spk_kind)

        @jax.jit
        def bfn(params, toks, T, spk):
            # toks [n, tb], T [n], spk [n]
            emb, buf = jax.vmap(fn, in_axes=(None, 0, 0, 0))(
                params, toks, T, spk
            )
            return emb[:, 0], buf[:, 0]

        self._fns[key] = bfn
        return bfn

    def _assemble_cb0_fast_batch_fn(self, n: int, tb_tok: int, Lb: int,
                                    spk_kind: str):
        key = ("asm_cb0_b", n, tb_tok, Lb, spk_kind)
        if key in self._fns:
            return self._fns[key]
        fn = self._assemble_cb0_fast_fn(tb_tok, Lb, spk_kind)

        @jax.jit
        def bfn(params, toks, T, pads, spk):
            emb = jax.vmap(fn, in_axes=(None, 0, 0, 0, 0))(
                params, toks, T, pads, spk
            )
            return emb[:, 0]

        self._fns[key] = bfn
        return bfn

    def _assemble_published_fast_fn(self, tb_tok: int, spk_kind: str):
        """ONE jitted dispatch for the common published-protocol prompt
        (no clone conditioning, T >= 4 text tokens): the eager assembly
        chain is ~20 tiny device ops, which costs 20–40 ms of host/client
        overhead PER SUBMIT on the tunneled device — measured as ~200 ms
        of the 8-stream cold-start TTFA (tools/profile_cold_ttfa.py).
        Static keys: text-token bucket ``tb_tok`` and the speaker-row kind
        ("codec" = checkpoint speaker id in the codec table, "table" =
        synthetic spk_emb row, "none"). The prompt's row count is
        text-INDEPENDENT under this protocol (text beyond the chatml head
        conditions through the trailing buffer), so emb length, bucket,
        and pad are all static."""
        key = ("asm_pub", tb_tok, spk_kind)
        if key in self._fns:
            return self._fns[key]
        from ..models.talker import text_projection

        t = self.cfg.talker
        head_toks = tuple(t.codec_prompt_head)
        L = self._pub_head_len(spk_kind)
        Lb = min(bucket_len(L), self._prompt_cap())
        assert L <= Lb, (L, Lb)  # callers gate via fast_assembly_plan
        pad = Lb - L
        Tb = t.trailing_bucket

        @jax.jit
        def fn(params, toks, T, spk_idx):
            # toks [tb_tok] int32 (0-padded past T), T scalar, spk_idx scalar
            ctl = jnp.asarray(
                [t.tts_pad_id, t.tts_bos_id, t.tts_eos_id], jnp.int32
            )
            ctl_e = text_projection(
                params, jnp.take(params["text_emb"], ctl, axis=0)
            )
            pad_e, bos_e, eos_e = ctl_e[0], ctl_e[1], ctl_e[2]
            txt = text_projection(
                params, jnp.take(params["text_emb"], toks, axis=0)
            )                                           # [tb_tok, D]
            codec_emb = params["codec_emb"]
            rows = [txt[:3]]
            for tok in head_toks:
                rows.append((pad_e + codec_emb[tok])[None, :])
            if spk_kind == "codec":
                rows.append(
                    (pad_e + jnp.take(codec_emb, spk_idx, axis=0))[None, :]
                )
            elif spk_kind == "table":
                rows.append(
                    (pad_e + jnp.take(params["spk_emb"], spk_idx, axis=0))[
                        None, :
                    ]
                )
            rows.append((bos_e + codec_emb[t.codec_pad])[None, :])
            rows.append((txt[3] + codec_emb[t.codec_bos])[None, :])
            emb = jnp.concatenate(rows, axis=0)         # [L, D]
            padded = jnp.zeros((Lb, emb.shape[-1]), emb.dtype)
            padded = jax.lax.dynamic_update_slice(padded, emb, (pad, 0))

            # trailing buffer, mask-built (mirrors the eager rules: text
            # rows txt[4:T] capped at Tb-2, then eos unless truncated,
            # then tts_pad fill — last row always pad)
            idx = jnp.arange(Tb)
            pos = 4 + idx
            n_trail = jnp.minimum(T - 4, Tb - 2)
            truncated = (T - 4) > (Tb - 2)
            src = jnp.take(
                txt, jnp.clip(pos, 0, tb_tok - 1), axis=0
            )                                           # [Tb, D]
            text_mask = (idx < n_trail)[:, None]
            eos_mask = ((idx == n_trail) & jnp.logical_not(truncated))[
                :, None
            ]
            buf = jnp.where(
                text_mask, src,
                jnp.where(eos_mask, eos_e[None, :], pad_e[None, :]),
            )
            return padded[None, :, :], buf[None, :, :]

        self._fns[key] = (fn, pad)
        return self._fns[key]

    def _assemble_published(
        self, prompt: PromptSpec
    ) -> tuple[jnp.ndarray, int, jnp.ndarray]:
        """The published dual-stream prompt (transformers
        Qwen3OmniMoeForConditionalGeneration._get_talker_assistant_parts):
        every position is text-hidden + codec-embedding summed —

            txt[0..2]                            (codec stream: zeros)
            tts_pad + [nothink, think_bos, think_eos]
            tts_pad + speaker codec token        (when defined)
            tts_pad + acoustic cb0 codes         (cloning; extrapolated —
                                                  Omni has no clone mode)
            tts_bos + codec_pad
            txt[3]  + codec_bos                  (FIRST text token only)

        The rest of the text conditions DURING decode, one projected row
        per frame, then tts_eos, then tts_pad forever — returned here as a
        [1, Tb, D] buffer whose tail rows are tts_pad (so a clamped lookup
        is exact; runtime trailing_lookup)."""
        t = self.cfg.talker
        params = self.params
        from ..models.talker import text_projection

        toks_np = np.asarray(prompt.text_tokens)
        if toks_np.size and (
            int(toks_np.max()) >= t.vocab_size or int(toks_np.min()) < 0
        ):
            raise ValueError(
                f"token id {int(toks_np.max())} out of range for "
                f"vocab_size {t.vocab_size}: tokenizer/config mismatch"
            )
        # common case → ONE jitted dispatch (see _assemble_published_fast_fn);
        # clone conditioning and degenerate short prompts keep the eager
        # chain below (bit-identical — pinned by test_feedback)
        plan = self.fast_assembly_plan(prompt)
        if plan is not None:
            return self.assemble_from_plan(plan)
        ctl = jnp.asarray(
            [t.tts_pad_id, t.tts_bos_id, t.tts_eos_id], jnp.int32
        )
        ctl_e = text_projection(
            params, jnp.take(params["text_emb"], ctl, axis=0)
        )
        pad_e, bos_e, eos_e = ctl_e[0], ctl_e[1], ctl_e[2]
        txt = text_projection(
            params, jnp.take(params["text_emb"], jnp.asarray(toks_np), axis=0)
        ) if toks_np.size else jnp.zeros((0, pad_e.shape[-1]), pad_e.dtype)
        T = int(txt.shape[0])
        # the published head is the 3 chatml rows <|im_start|>assistant\n;
        # shorter (synthetic) prompts keep at least the last token for the
        # codec_bos position
        n_head = min(3, max(T - 1, 0))

        parts = []
        if prompt.speaker_vector is not None:  # synthetic cloning vector
            vec = jnp.asarray(prompt.speaker_vector, dtype=pad_e.dtype)
            parts.append(vec[None, :])
        if n_head:
            parts.append(txt[:n_head])
        codec_emb = params["codec_emb"]
        for tok in t.codec_prompt_head:
            parts.append((pad_e + codec_emb[tok])[None, :])
        if prompt.speaker_token is not None:
            parts.append(
                (pad_e + codec_emb[int(prompt.speaker_token)])[None, :]
            )
        elif prompt.speaker_id is not None:
            # synthetic speaker table: its row rides the codec stream slot
            parts.append(
                (pad_e + params["spk_emb"][prompt.speaker_id])[None, :]
            )
        if prompt.acoustic_codes is not None and prompt.acoustic_codes.size:
            codes_np = np.asarray(prompt.acoustic_codes)    # [Q, T_ref]
            cb0_np = codes_np[0]
            cb_size = self.cfg.codec.codebook_size
            if int(cb0_np.max()) >= cb_size or int(cb0_np.min()) < 0:
                raise ValueError(
                    f"acoustic code {int(cb0_np.max())} out of range for "
                    f"codebook_size {cb_size}"
                )
            rows = pad_e[None, :] + jnp.take(
                codec_emb, jnp.asarray(cb0_np), axis=0
            )
            # FULL-bandwidth conditioning (VERDICT r3 #5): under the
            # residual_sum protocol every DECODED frame feeds back
            # codec_emb[cb0] + Σ_d res_emb[d][code_d] — reference frames
            # must look the same, or the residual codebooks carrying most
            # of the speaker timbre are computed by the tokenizer and then
            # discarded. The reference conditions on the complete ref
            # audio through the model's own tokenizer
            # (reference sessions/clone.py:218-224); here the same codes
            # ride the prompt's codec stream at full depth. Truncated
            # depth sets (e.g. a synthetic encoder with fewer books than
            # the cp tables) condition on what exists.
            n_have = codes_np.shape[0] - 1
            n_res = self.cfg.codec.num_codebooks - 1
            use = min(n_have, n_res)
            if use:
                res_np = codes_np[1:1 + use]
                r_size = self.cfg.codec.residual_codebook_size
                if int(res_np.max()) >= r_size or int(res_np.min()) < 0:
                    raise ValueError(
                        f"residual acoustic code {int(res_np.max())} out "
                        f"of range for residual_codebook_size {r_size}"
                    )
                per_depth = jax.vmap(
                    lambda tab, c: jnp.take(tab, c, axis=0)
                )(self.cp_params["res_emb"][:use], jnp.asarray(res_np))
                rows = rows + jnp.sum(per_depth, axis=0).astype(rows.dtype)
            parts.append(rows)
        parts.append((bos_e + codec_emb[t.codec_pad])[None, :])
        first_txt = txt[n_head] if T > n_head else pad_e
        parts.append((first_txt + codec_emb[t.codec_bos])[None, :])
        emb = jnp.concatenate(parts, axis=0)

        # left-pad to a bucket (RoPE is relative; pad keys are masked)
        L = int(emb.shape[0])
        Lb = min(bucket_len(L), self._prompt_cap())
        if L > Lb:  # over-long acoustic context: keep head + tail — the
            # head is the chatml text rows PLUS any speaker-vector row
            # prepended before them
            keep = n_head + (prompt.speaker_vector is not None)
            emb = jnp.concatenate([emb[:keep], emb[L - (Lb - keep):]],
                                  axis=0)
            L = Lb
        pad = Lb - L
        padded = jnp.zeros((Lb, emb.shape[1]), emb.dtype)
        padded = jax.lax.dynamic_update_slice(padded, emb, (pad, 0))

        # trailing buffer: text rows AFTER the first, then tts_eos, then
        # tts_pad fill to the static capacity (one compile variant). The
        # last row must ALWAYS be tts_pad: trailing_lookup clamps past the
        # bucket by repeating the final row, so text is truncated to Tb-2
        # rows (eos fits with a pad row after it). A text long enough to
        # truncate is mis-conditioned regardless (the engine segments long
        # texts upstream); truncated prompts drop the eos row too — pad
        # forever beats repeating eos every frame.
        Tb = t.trailing_bucket
        all_rows = txt[n_head + 1:]
        trail_rows = all_rows[: Tb - 2]
        n_trail = int(trail_rows.shape[0])
        truncated = int(all_rows.shape[0]) > n_trail
        buf = jnp.broadcast_to(pad_e[None, :], (Tb, pad_e.shape[-1]))
        if not truncated:
            buf = buf.at[n_trail].set(eos_e)
        if n_trail:
            buf = jax.lax.dynamic_update_slice(buf, trail_rows, (0, 0))
        return padded[None, :, :], pad, buf[None, :, :]

    def _assemble_cb0_fast_fn(self, tb_tok: int, Lb: int, spk_kind: str):
        """ONE jitted dispatch for the common cb0-protocol prompt (no
        clone conditioning): same motivation as the published-protocol
        fast path — the eager chain is ~15 tiny device ops of pure TTFA.
        Unlike the published layout the text rides IN the prompt, so the
        variant is keyed by (text bucket, prompt bucket, speaker kind)
        and T/pad are traced scalars; rows are gather+mask built."""
        key = ("asm_cb0", tb_tok, Lb, spk_kind)
        if key in self._fns:
            return self._fns[key]
        t = self.cfg.talker
        head_toks = tuple(t.codec_prompt_head)
        s = 1 if spk_kind == "table" else 0

        @jax.jit
        def fn(params, toks, T, pad, spk_idx):
            # toks [tb_tok] int32 (0-padded past T); T/pad/spk_idx scalars
            txt = jnp.take(params["text_emb"], toks, axis=0)  # [tb_tok, D]
            codec_emb = params["codec_emb"]
            tail_rows = [codec_emb[tok][None, :] for tok in head_toks]
            if spk_kind == "codec":
                tail_rows.append(jnp.take(codec_emb, spk_idx, axis=0)[None])
            tail_rows.append(codec_emb[t.codec_bos][None, :])
            tail = jnp.concatenate(tail_rows, axis=0)       # [n_tail, D]
            n_tail = tail.shape[0]

            i = jnp.arange(Lb)
            j = i - pad                                     # logical row
            txt_src = jnp.take(
                txt, jnp.clip(j - s, 0, tb_tok - 1), axis=0
            )
            tail_src = jnp.take(
                tail, jnp.clip(j - s - T, 0, n_tail - 1), axis=0
            )
            txt_mask = ((j >= s) & (j < s + T))[:, None]
            row = jnp.where(txt_mask, txt_src, tail_src)
            if s:
                spk_row = jnp.take(params["spk_emb"], spk_idx, axis=0)
                row = jnp.where((j == 0)[:, None], spk_row[None, :], row)
            row = jnp.where((j < 0)[:, None], jnp.zeros((), row.dtype), row)
            return row[None, :, :].astype(txt.dtype)

        self._fns[key] = fn
        return fn

    def _assemble_cb0(self, prompt: PromptSpec) -> tuple[jnp.ndarray, int]:
        t = self.cfg.talker
        # common case → one jitted dispatch; clone conditioning, textless
        # prompts, and over-long (truncating) prompts keep the eager chain
        plan = self.fast_assembly_plan(prompt)
        if plan is not None:
            emb, pad, _ = self.assemble_from_plan(plan)
            return emb, pad
        parts = []
        if prompt.speaker_id is not None:
            parts.append(self.params["spk_emb"][prompt.speaker_id][None, :])
        if prompt.speaker_vector is not None:
            vec = jnp.asarray(prompt.speaker_vector, dtype=self.params["spk_emb"].dtype)
            parts.append(vec[None, :])
        if prompt.text_tokens.size:
            toks_np = np.asarray(prompt.text_tokens)
            if int(toks_np.max()) >= t.vocab_size or int(toks_np.min()) < 0:
                # only tiny synthetic configs may alias ids (their embedding
                # tables are smaller than the byte-fallback tokenizer's 256
                # ids); a real config seeing out-of-range ids means the
                # tokenizer doesn't belong to this checkpoint — corrupting
                # it silently via modulo would produce garbage speech
                if t.vocab_size >= 512:
                    raise ValueError(
                        f"token id {int(toks_np.max())} out of range for "
                        f"vocab_size {t.vocab_size}: tokenizer/config "
                        f"mismatch (wrong tokenizer files for this model?)"
                    )
                toks_np = toks_np % t.vocab_size
            parts.append(
                jnp.take(self.params["text_emb"], jnp.asarray(toks_np), axis=0)
            )
        # codec prompt head (nothink/think markers) when the checkpoint
        # defines the ids: the published layout leads the CODEC stream with
        # them (PARITY.md), so they precede any acoustic-code conditioning.
        # (The published layout's speaker-as-codec-token and codec_pad rows
        # need the checkpoint's speaker-id table — see PARITY.md; ids are
        # range-validated at config construction.)
        for tok in t.codec_prompt_head:
            parts.append(self.params["codec_emb"][tok][None, :])
        if prompt.speaker_token is not None:
            # speaker as a codec control token, right after the think
            # markers (the published order [nothink, tb, te, speaker])
            parts.append(
                self.params["codec_emb"][int(prompt.speaker_token)][None, :]
            )
        if prompt.acoustic_codes is not None and prompt.acoustic_codes.size:
            cb0_np = np.asarray(prompt.acoustic_codes[0])
            cb_size = self.cfg.codec.codebook_size
            if int(cb0_np.max()) >= cb_size or int(cb0_np.min()) < 0:
                if cb_size >= 512:
                    raise ValueError(
                        f"acoustic code {int(cb0_np.max())} out of range for "
                        f"codebook_size {cb_size}"
                    )
                cb0_np = cb0_np % cb_size
            parts.append(
                jnp.take(self.params["codec_emb"], jnp.asarray(cb0_np), axis=0)
            )
        parts.append(self.params["codec_emb"][t.codec_bos][None, :])
        emb = jnp.concatenate(parts, axis=0)  # [L, D]

        # conditioning rows (speaker embedding/vector) sit at the head and
        # must survive truncation — only text/acoustic rows may be trimmed
        n_head = (prompt.speaker_id is not None) + (
            prompt.speaker_vector is not None
        )

        L = int(emb.shape[0])
        # clamp the bucket so decode keeps headroom inside max_seq_len
        Lb = min(bucket_len(L), self._prompt_cap())
        if L > Lb:  # over-long prompt: keep head conditioning + the tail
            # (BOS must survive; voice conditioning must survive)
            emb = jnp.concatenate(
                [emb[:n_head], emb[L - (Lb - n_head):]], axis=0
            )
            L = Lb
        pad = Lb - L
        padded = jnp.zeros((Lb, emb.shape[1]), emb.dtype)
        padded = jax.lax.dynamic_update_slice(padded, emb, (pad, 0))
        return padded[None, :, :], pad

    # -- streaming synthesis ----------------------------------------------

    def stream(
        self,
        prompt: PromptSpec,
        *,
        max_frames: int,
        seed: int = 0,
        collect_codes: bool = False,
    ) -> Iterator[tuple[np.ndarray, dict]]:
        """Yield (wav_chunk int16 PCM [n], info) as audio becomes available.

        The last yield carries info["final"] = True and the full-quality
        re-decoded waveform for the entire utterance. ``collect_codes``
        additionally accumulates the per-chunk codec codes (already on
        host — part of every chunk fetch) into the final info["codes"]
        [Q, frames]: exact-code parity checks (sharded-vs-single-device
        decode, __graft_entry__) compare token streams, not waveforms.
        """
        cfg = self.cfg
        t = cfg.talker
        fps = t.frames_per_step
        hop = cfg.codec.hop
        emb, pad, trailing = self.assemble_prompt_full(prompt)
        feedback = t.feedback == "residual_sum"
        Lb = emb.shape[1]
        from ..models.codec import max_stream_frames

        # cap against both the talker cache (positions) and the codec's
        # position tables (frames) — see ServingEngine.submit
        budget = min(
            (cfg.max_seq_len - Lb) * fps,
            max_stream_frames(cfg) - 2 * max(self.chunk_schedule),
        )
        max_frames = max(1, min(max_frames, budget))
        # code2wav streams lead with a fixed edge run-in that the one-shot
        # decode trims; drop it from the first emitted audio
        startup_skip = (
            cfg.code2wav.startup_samples if cfg.codec_arch == "code2wav"
            else 0
        )

        start = time.perf_counter()
        cache_k, cache_v = self._alloc_cache()
        pad_len = jnp.int32(pad)
        hidden_last, logits, cache_k, cache_v = self._prefill_fn()(
            self.params, emb, pad_len, cache_k, cache_v
        )
        key = jax.random.PRNGKey(seed)
        key, sub = jax.random.split(key)

        from ..models.codec import init_codec_stream_state

        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        cstate = init_codec_stream_state(cfg, 1, dtype=dtype)
        if feedback:
            # seed the published feedback loop: the prefill-sampled step's
            # fps frames (conditioning-only, like the cb0 seed) and their
            # per-frame residual-embedding sums, one fused dispatch
            first, res_sum = self._seed_feedback_fn()(
                self.params, self.cp_params, hidden_last, logits, sub
            )                                # [1, fps], [1, fps, D]
            # the unified feedback decode treats pos/frames/g as [B]
            # vectors (shared builder with the serving engine)
            state = (cache_k, cache_v, cstate,
                     jnp.full((1,), Lb, jnp.int32), first, key,
                     jnp.zeros((1,), jnp.int32), res_sum.astype(dtype),
                     jnp.zeros((1,), jnp.int32))
        else:
            first = self._seed_tokens(hidden_last, logits, sub)  # [1, fps]
            state = (cache_k, cache_v, cstate, jnp.int32(Lb), first, key,
                     jnp.int32(0))
        wav_pieces: list[np.ndarray] = []  # final-quality chunk outputs
        code_pieces: list[np.ndarray] = []  # [Q, valid] when collect_codes
        n_frames = 0
        dispatched = 0
        chunk_idx = 0
        inflight: list[tuple] = []
        done = False
        ttfa = None

        def next_chunk_size() -> int:
            i = min(chunk_idx, len(self.chunk_schedule) - 1)
            return self.chunk_schedule[i]

        def dispatch():
            nonlocal state, dispatched, chunk_idx
            chunk = next_chunk_size()
            # attention window bucket for this chunk's positions (the
            # talker advances one position per STEP = fps frames)
            A = attn_bucket(
                Lb + (dispatched + chunk) // fps, cfg.max_seq_len
            )
            decode = self._decode_fn(chunk, A)
            if feedback:
                ck, cv, rg, pos, tok, k, nf, rs, g = state
                (ck, cv, rg, pos, tok, k, nf, rs, g,
                 n_valid, codes, wav) = decode(
                    self.params, self.cp_params, self.codec_params,
                    ck, cv, rg, trailing, pos, pad_len, nf, tok, rs, g,
                    jnp.ones((1,), bool), k,
                )
                state = (ck, cv, rg, pos, tok, k, nf, rs, g)
            else:
                ck, cv, rg, pos, tok, k, nf = state
                ck, cv, rg, pos, tok, k, nf, n_valid, codes, wav = decode(
                    self.params, self.cp_params, self.codec_params,
                    ck, cv, rg, pos, pad_len, nf, tok, k,
                )
                state = (ck, cv, rg, pos, tok, k, nf)
            # start async host copies at dispatch: the transfer overlaps the
            # next chunk's compute instead of serializing at device_get
            # (gated: on a single-connection tunnel early copies can delay
            # the next dispatch instead — measured per deployment)
            from .serving import _async_fetch

            if _async_fetch():
                for arr in (n_valid, codes, wav):
                    if hasattr(arr, "copy_to_host_async"):
                        arr.copy_to_host_async()
            inflight.append((chunk, (n_valid, codes, wav)))
            dispatched += chunk
            chunk_idx += 1

        # speculative pipelining: keep up to pipeline_depth chunks in flight
        # ahead of the one being read, so the device never idles on host
        # round trips (chunks dispatched past EOS waste compute, never
        # correctness — n_valid clips them)
        depth = max(1, self.pipeline_depth)
        dispatch()
        while inflight:
            while (
                dispatched < max_frames and not done
                and len(inflight) < depth
            ):
                dispatch()
            # ONE host fetch per chunk (round trips are the latency budget)
            chunk, payload = inflight.pop(0)
            n_valid, codes, wav = jax.device_get(payload)
            valid = int(n_valid[0])
            done = valid < chunk
            remaining = max_frames - n_frames
            if valid >= remaining:
                valid = remaining
                done = True
            if valid > 0:
                wav_chunk = wav[0][: valid * hop]
                if collect_codes:
                    code_pieces.append(codes[0][:, :valid])
                if startup_skip:  # code2wav edge run-in (see models/codec.py
                    # decode_codes_streaming) — drop once per utterance
                    cut = min(startup_skip, len(wav_chunk))
                    wav_chunk = wav_chunk[cut:]
                    startup_skip -= cut
                wav_pieces.append(wav_chunk)
                n_frames += valid
                if ttfa is None:
                    ttfa = time.perf_counter() - start
                yield wav_chunk, {
                    "final": False, "frames": n_frames, "ttfa_s": ttfa,
                }
            if done:
                break

        # streamed chunks are already final quality (incremental codec
        # decode carries full left context) — the utterance is their concat
        wav_full = (
            np.concatenate(wav_pieces)
            if wav_pieces
            else np.zeros(0, dtype=np.int16)
        )
        wall = time.perf_counter() - start
        yield wav_full, {
            "final": True,
            "frames": n_frames,
            "ttfa_s": ttfa if ttfa is not None else wall,
            "wall_s": wall,
            "codes": (
                np.concatenate(code_pieces, axis=1)
                if code_pieces else None
            ) if collect_codes else None,
        }

    def synthesize(
        self,
        prompt: PromptSpec,
        *,
        max_frames: int,
        seed: int = 0,
        on_chunk: Callable[[np.ndarray], None] | None = None,
        collect_codes: bool = False,
    ) -> GenerationResult:
        """Run the full pipeline; returns the final full-quality waveform."""
        final_wav = np.zeros(0, dtype=np.int16)
        info: dict = {"frames": 0, "ttfa_s": 0.0, "wall_s": 0.0}
        for wav_chunk, meta in self.stream(
            prompt, max_frames=max_frames, seed=seed,
            collect_codes=collect_codes,
        ):
            if meta["final"]:
                final_wav = wav_chunk
                info = meta
            elif on_chunk is not None:
                on_chunk(wav_chunk)
        sr = self.cfg.codec.sample_rate
        return GenerationResult(
            wav=final_wav,
            frames=info["frames"],
            sample_rate=sr,
            ttfa_s=info["ttfa_s"],
            wall_s=info.get("wall_s", 0.0),
            audio_s=len(final_wav) / sr,
            codes=info.get("codes"),
        )
