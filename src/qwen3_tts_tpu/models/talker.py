"""The talker: a Qwen3-style autoregressive transformer emitting one semantic
codec token (codebook 0) per 12 Hz frame.

This is the TPU-native replacement for the 1.7B model inside ``mlx_audio``
(the black box behind the reference's generate_audio call,
reference sessions/custom.py:163-170). Layers are stacked along a leading
``L`` axis and driven with ``lax.scan`` so the 28-layer flagship compiles to
one rolled loop (fast compiles, identical performance).

Prompt embedding composition (text tokens + speaker embedding + codec BOS /
acoustic-context tokens) lives in ``runtime.prompts``; this module only maps
embeddings -> hidden states -> codebook-0 logits.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.configs import ModelConfig, TalkerConfig
from ..ops.linear import linear
from ..ops.quant import quantize_weights
from .layers import rmsnorm, rope_slice, transformer_block

Params = dict[str, Any]


def _scan_unroll() -> int:
    """Layer-scan unroll factor (experimental, QWEN3_TTS_SCAN_UNROLL).

    Default 1: unroll>1 changes results under tensor-parallel sharding
    (observed on the CPU mesh — see tests/test_parallel_training.py), so it
    must only be enabled for single-device experiments.
    """
    import os

    try:
        return max(1, int(os.environ.get("QWEN3_TTS_SCAN_UNROLL", "1")))
    except ValueError:
        return 1


# --------------------------------------------------------------------------
# initialisation (synthetic weights — real checkpoints come from
# engine.weights.load_checkpoint and share this exact pytree layout)
# --------------------------------------------------------------------------

def _init_linear(
    rng: np.random.Generator,
    out_dim: int,
    in_dim: int,
    *,
    quantize: bool,
    group_size: int,
    bits: int,
    dtype,
    std: float = 0.02,
    fast: bool = False,
) -> Params:
    if fast and quantize:
        # benchmark/compile-check path: skip the quantization solve, emit
        # uniform codes with a centred affine grid (same layouts and value
        # ranges as the real path, ~50x faster for the 1.7B flagship)
        g = in_dim // group_size
        levels = (1 << bits) - 1
        scale = 2.0 * std / levels
        return {
            "q": rng.integers(0, levels + 1, (out_dim, in_dim), dtype=np.uint8),
            "scale": np.full((out_dim, g), scale, np.float32),
            "bias": np.full((out_dim, g), -std, np.float32),
        }
    if fast:
        # match N(0, std) variance with U(-a, a): Var = a^2/3 => a = std*sqrt(3)
        w = (rng.random((out_dim, in_dim), dtype=np.float32) - 0.5) * (
            2.0 * std * 1.7320508
        )
        return {"w": w.astype(dtype)}
    w = rng.normal(0.0, std, size=(out_dim, in_dim)).astype(np.float32)
    if quantize:
        return quantize_weights(w, group_size=group_size, bits=bits)
    return {"w": w.astype(dtype)}


def _stack(trees: list[Params]) -> Params:
    """Stack a list of identical pytrees along a new leading axis."""
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *trees)


def init_talker(cfg: ModelConfig, seed: int = 0, fast: bool = False) -> Params:
    """Random-init talker parameters with the production pytree layout.

    ``fast=True`` swaps the quantization solve for direct uint8 sampling —
    identical layouts/dtypes, used for benchmarks and compile checks where
    weight *values* don't matter.
    """
    t = cfg.talker
    rng = np.random.default_rng(seed)
    dtype = np.dtype(jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32)
    qz = dict(
        quantize=cfg.quant.enabled,
        group_size=cfg.quant.group_size,
        bits=cfg.quant.bits,
        dtype=dtype,
        fast=fast,
    )

    def block() -> Params:
        return {
            "attn": {
                "q": _init_linear(rng, t.q_dim, t.hidden, **qz),
                "k": _init_linear(rng, t.kv_dim, t.hidden, **qz),
                "v": _init_linear(rng, t.kv_dim, t.hidden, **qz),
                "o": _init_linear(rng, t.hidden, t.q_dim, **qz),
                "q_norm": np.ones(t.head_dim, dtype=dtype),
                "k_norm": np.ones(t.head_dim, dtype=dtype),
            },
            "mlp": {
                "gate": _init_linear(rng, t.ffn, t.hidden, **qz),
                "up": _init_linear(rng, t.ffn, t.hidden, **qz),
                "down": _init_linear(rng, t.hidden, t.ffn, **qz),
            },
            "ln1": np.ones(t.hidden, dtype=dtype),
            "ln2": np.ones(t.hidden, dtype=dtype),
        }

    params: Params = {
        "text_emb": rng.normal(0, 0.02, (t.vocab_size, t.hidden)).astype(dtype),
        "codec_emb": rng.normal(0, 0.02, (t.codec_vocab, t.hidden)).astype(dtype),
        "spk_emb": rng.normal(0, 0.02, (t.n_speakers, t.hidden)).astype(dtype),
        "blocks": _stack([block() for _ in range(t.n_layers)]),
        "ln_f": np.ones(t.hidden, dtype=dtype),
        "head": _init_linear(rng, t.codec_vocab, t.hidden, **qz),
    }
    if t.frames_per_step > 1:
        params["mtp"] = _init_mtp(rng, t, qz, dtype)
    return params


def _init_mtp(rng, t, qz: dict, dtype) -> Params:
    """MTP block (TalkerConfig.frames_per_step): merge projects the step's
    n frame embeddings into one talker input; the SwiGLU block maps
    (hidden + prev-frame embedding) -> next-frame hidden, scored by the
    SHARED codec head. Tiny vs the 28-layer stack: it is read once per
    step, not once per frame."""
    return {
        "merge": _init_linear(
            rng, t.hidden, t.frames_per_step * t.hidden, **qz
        ),
        "mlp": {
            "gate": _init_linear(rng, t.ffn, t.hidden, **qz),
            "up": _init_linear(rng, t.ffn, t.hidden, **qz),
            "down": _init_linear(rng, t.hidden, t.ffn, **qz),
        },
        "ln": np.ones(t.hidden, dtype=dtype),
    }


def add_mtp_params(params: Params, cfg: ModelConfig, seed: int = 0) -> Params:
    """Graft freshly-initialised MTP heads onto an existing talker tree.

    Real Qwen3-TTS checkpoints carry no MTP heads, so imports run at
    ``frames_per_step=1``; to unlock the multi-token-prediction decode path
    (PERF.md: the single-stream bytes-per-frame lever) on such weights, add
    the heads here (random init — train them first: training/loss.py
    already teacher-forces through mtp_logits when fps > 1, and the
    adapter-style step in training/lora.py can train JUST the grafted
    subtree against the frozen base). ``cfg`` must already carry the target
    ``frames_per_step`` (configs.with_frames_per_step)."""
    t = cfg.talker
    if t.frames_per_step <= 1:
        raise ValueError(
            "add_mtp_params needs cfg.talker.frames_per_step > 1 "
            "(configs.with_frames_per_step)"
        )
    if "mtp" in params:
        raise ValueError("params already carry an 'mtp' subtree")
    rng = np.random.default_rng(seed)
    dtype = np.dtype(jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32)
    # ALWAYS dense, regardless of cfg.quant: the sole purpose of grafted
    # heads is to be trained (gradients need real-valued leaves; training
    # runs dense). Quantize after training if the deployment wants int8.
    qz = dict(quantize=False, group_size=cfg.quant.group_size,
              bits=cfg.quant.bits, dtype=dtype, fast=False)
    return {**params, "mtp": _init_mtp(rng, t, qz, dtype)}


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def talker_forward(
    params: Params,
    t: TalkerConfig,
    x_emb: jnp.ndarray,            # [B, T, D] input embeddings
    cache_k: jnp.ndarray,          # [L, B, S, H_kv, hd]
    cache_v: jnp.ndarray,
    pos: jnp.ndarray,              # scalar int32: write offset into the cache
    cos_table: jnp.ndarray,        # [S, hd/2] full-length RoPE tables
    sin_table: jnp.ndarray,
    pad_len: jnp.ndarray | int = 0,
    window_split: tuple | None = None,
    head_last_only: bool = False,
    act_constraint=None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run all layers; returns (hidden [B,T,D], logits, new_cache_k,
    new_cache_v). Works for prefill (T>1) and decode (T=1).

    ``pos``/``pad_len`` may be scalars or [B] vectors (per-stream offsets,
    continuous batched serving — see models.layers.attention).

    ``head_last_only``: apply the codec head to the LAST position only
    (logits [B, 1, V]) — prefill callers discard everything else, and the
    full-sequence head matmul + f32 logits buffer is pure HBM waste on a
    long prompt slice.

    ``act_constraint``: optional fn applied to the residual stream between
    layers — sequence parallelism hooks in here (training passes a
    with_sharding_constraint that shards [B, T, D] along T over the tp
    axis, so norms/elementwise segments run sequence-sharded and XLA
    inserts the gather/scatter collectives around attention/matmuls)."""
    T = x_emb.shape[1]
    pos = jnp.asarray(pos)
    cos, sin = rope_slice(cos_table, sin_table, pos, T)

    def body(x, layer):
        block_p, ck, cv = layer
        out = transformer_block(
            block_p,
            x,
            cos=cos,
            sin=sin,
            cache_k=ck,
            cache_v=cv,
            pos=pos,
            n_heads=t.n_heads,
            n_kv_heads=t.n_kv_heads,
            head_dim=t.head_dim,
            rms_eps=t.rms_eps,
            qk_norm=True,
            pad_len=pad_len,
            window_split=window_split,
        )
        y = out.x if act_constraint is None else act_constraint(out.x)
        return y, (out.cache_k, out.cache_v)

    # unroll>1 lets XLA software-pipeline the next layer's weight streaming
    # (HBM) under the current layer's compute — the decode hot loop is
    # bandwidth-bound, so overlap is throughput (QWEN3_TTS_SCAN_UNROLL).
    x, (new_k, new_v) = jax.lax.scan(
        body, x_emb, (params["blocks"], cache_k, cache_v),
        unroll=_scan_unroll(),
    )
    hidden = rmsnorm(x, params["ln_f"], t.rms_eps)
    head_in = hidden[:, -1:, :] if head_last_only else hidden
    logits = linear(head_in, params["head"]).astype(jnp.float32)
    return hidden, logits, new_k, new_v


def embed_codec_tokens(params: Params, tokens: jnp.ndarray) -> jnp.ndarray:
    """Codebook-0 token ids -> talker input embeddings."""
    return jnp.take(params["codec_emb"], tokens, axis=0)


def merge_step_embs(
    params: Params, t: TalkerConfig, embs: jnp.ndarray
) -> jnp.ndarray:
    """Merge one step's ``frames_per_step`` frame EMBEDDINGS [B, n, D] into
    the talker's next input embedding [B, D]. Under the residual_sum
    feedback protocol each frame embedding is the full published feedback
    vector (cb0 + residual sum + trailing-text row), so the merged input is
    the protocol-faithful MTP generalization. n == 1 passes the single
    embedding through (bit-identical to the single-frame path)."""
    if t.frames_per_step == 1:
        return embs[:, 0]
    B = embs.shape[0]
    flat = embs.reshape(B, t.frames_per_step * t.hidden)
    return linear(flat, params["mtp"]["merge"])


def merge_step_tokens(
    params: Params, t: TalkerConfig, tokens: jnp.ndarray
) -> jnp.ndarray:
    """Merge one step's ``frames_per_step`` token ids [B, n] into the
    talker's next input embedding [B, D]. n == 1 reduces to the plain
    codec-token embedding (bit-identical to the single-frame path)."""
    if t.frames_per_step == 1:
        return jnp.take(params["codec_emb"], tokens[:, 0], axis=0)
    return merge_step_embs(
        params, t, jnp.take(params["codec_emb"], tokens, axis=0)
    )


def mtp_hidden_emb(
    params: Params, t: TalkerConfig, hidden: jnp.ndarray, prev_emb: jnp.ndarray
) -> jnp.ndarray:
    """Next-frame hidden from (chain hidden [B, D], previous frame's INPUT
    embedding [B, D]) — the MTP block. The cb0 protocol conditions on the
    plain codec-token embedding (mtp_hidden); the residual_sum protocol
    passes the frame's full feedback embedding (cb0 + residual sum)."""
    mtp = params["mtp"]
    x = hidden + prev_emb.astype(hidden.dtype)
    h = rmsnorm(x, mtp["ln"], t.rms_eps)
    gate = linear(h, mtp["mlp"]["gate"])
    up = linear(h, mtp["mlp"]["up"])
    return x + linear(jax.nn.silu(gate) * up, mtp["mlp"]["down"])


def mtp_hidden(
    params: Params, t: TalkerConfig, hidden: jnp.ndarray, prev_tok: jnp.ndarray
) -> jnp.ndarray:
    """Next-frame hidden from (step hidden [B, D], previous frame's token
    [B]) — the MTP block, applied recurrently for frames 1..n-1 of a step."""
    return mtp_hidden_emb(
        params, t, hidden, jnp.take(params["codec_emb"], prev_tok, axis=0)
    )


def mtp_logits_emb(
    params: Params, t: TalkerConfig, hidden: jnp.ndarray, prev_emb: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(logits [B, codec_vocab], next hidden [B, D]) for one MTP frame
    conditioned on the previous frame's input EMBEDDING, scored by the
    shared codec head (the residual_sum-protocol MTP chain)."""
    h = mtp_hidden_emb(params, t, hidden, prev_emb)
    logits = linear(
        rmsnorm(h, params["ln_f"], t.rms_eps), params["head"]
    ).astype(jnp.float32)
    return logits, h


def mtp_logits(
    params: Params, t: TalkerConfig, hidden: jnp.ndarray, prev_tok: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(logits [B, codec_vocab], next hidden [B, D]) for one MTP frame,
    scored by the shared codec head."""
    return mtp_logits_emb(
        params, t, hidden, jnp.take(params["codec_emb"], prev_tok, axis=0)
    )


def embed_text_tokens(params: Params, tokens: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["text_emb"], tokens, axis=0)


def text_projection(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Apply the checkpoint's text-projection MLP when present (identity
    otherwise). The published talker family projects text hiddens into the
    talker width before they condition the prompt / trailing-text streams
    (transformers Qwen3OmniMoeTalkerResizeMLP: biased fc1 -> silu ->
    biased fc2); standalone checkpoints whose text_emb already lives in
    talker width simply ship no projection tensors."""
    tp = params.get("text_proj")
    if tp is None:
        return x
    return linear(jax.nn.silu(linear(x, tp["fc1"])), tp["fc2"])
