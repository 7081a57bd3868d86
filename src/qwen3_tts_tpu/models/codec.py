"""The 12 Hz residual-VQ neural codec: decoder (codes -> 24 kHz waveform) and
encoder (waveform -> codes, used for voice-cloning acoustic prompts).

This replaces the codec hidden inside ``mlx_audio`` (SURVEY.md §7 "hard
parts" #1). TPU-first choices:

- all convolutions are causal 1-D convs expressed as XLA
  ``conv_general_dilated`` over ``[B, T, C]`` (MXU-tiled by XLA);
- upsampling is nearest-repeat + causal conv (no transposed-conv
  checkerboard, identical FLOPs, better XLA lowering);
- the latent transformer is causal so the decoder can stream chunk-by-chunk
  during generation (TTFA streaming, BASELINE.md target <300 ms);
- everything is batched over frames — per-frame work is matmul-shaped, not
  scalar-loop-shaped.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.configs import CodecConfig, ModelConfig
from .layers import rmsnorm, rope_slice, rope_tables, transformer_block

Params = dict[str, Any]

_MAX_FRAMES = 4096  # RoPE table budget for the latent transformer


def max_stream_frames(cfg: ModelConfig) -> int:
    """Per-utterance frame budget imposed by the codec's position tables."""
    if cfg.codec_arch == "code2wav":
        return cfg.code2wav.max_positions
    return _MAX_FRAMES


# --------------------------------------------------------------------------
# conv primitives
# --------------------------------------------------------------------------

def causal_conv1d(
    x: jnp.ndarray,          # [B, T, C_in]
    w: jnp.ndarray,          # [k, C_in, C_out]
    b: jnp.ndarray | None,   # [C_out]
    *,
    stride: int = 1,
    dilation: int = 1,
    pre_padded: bool = False,
) -> jnp.ndarray:
    """Left-padded (causal) 1-D convolution.

    ``pre_padded``: the caller already prepended the ``dilation*(k-1)`` left
    rows (streaming per-conv carried context — see `_conv_stack`), so run a
    valid conv instead of zero-padding."""
    k = w.shape[0]
    pad_left = 0 if pre_padded else dilation * (k - 1)
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride,),
        padding=[(pad_left, 0)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def upsample_repeat(x: jnp.ndarray, rate: int) -> jnp.ndarray:
    """Nearest-neighbour upsample along T: [B, T, C] -> [B, T*rate, C]."""
    B, T, C = x.shape
    return jnp.broadcast_to(x[:, :, None, :], (B, T, rate, C)).reshape(
        B, T * rate, C
    )


# --------------------------------------------------------------------------
# initialisation
# --------------------------------------------------------------------------

def _conv_init(rng, k: int, c_in: int, c_out: int, dtype) -> Params:
    std = (2.0 / (k * c_in)) ** 0.5
    return {
        "w": rng.normal(0, std, (k, c_in, c_out)).astype(dtype),
        "b": np.zeros(c_out, dtype=dtype),
    }


def _resunit_init(rng, c: int, k: int, dtype) -> Params:
    return {
        "c1": _conv_init(rng, k, c, c, dtype),
        "c2": _conv_init(rng, k, c, c, dtype),
    }


def _tf_block_init(rng, d: int, heads: int, head_dim: int, ffn: int, dtype) -> Params:
    def lin(o, i):
        return {"w": rng.normal(0, 0.02, (o, i)).astype(dtype)}

    q_dim = heads * head_dim
    return {
        "attn": {
            "q": lin(q_dim, d), "k": lin(q_dim, d), "v": lin(q_dim, d),
            "o": lin(d, q_dim),
        },
        "mlp": {"gate": lin(ffn, d), "up": lin(ffn, d), "down": lin(d, ffn)},
        "ln1": np.ones(d, dtype=dtype),
        "ln2": np.ones(d, dtype=dtype),
    }


def _stack_trees(trees: list[Params]) -> Params:
    from .talker import _stack  # one shared pytree-stacking helper

    return _stack(trees)


def _init_encoder(cfg: ModelConfig, rng, dtype) -> Params:
    """Cloning-side waveform encoder: mirror of the RVQ decoder (strided
    causal convs, reversed rates). Shared by both codec architectures."""
    cc = cfg.codec
    enc_stages = []
    enc_channels = list(reversed(cc.decoder_channels))
    for i, rate in enumerate(reversed(cc.upsample_rates)):
        c_in, c_out = enc_channels[i], enc_channels[i + 1]
        enc_stages.append(
            {
                "down": _conv_init(rng, 2 * rate + 1, c_in, c_out, dtype),
                "res": _resunit_init(rng, c_out, cc.decoder_kernel, dtype),
            }
        )
    return {
        "in_conv": _conv_init(rng, 7, 1, enc_channels[0], dtype),
        "stages": enc_stages,
        "proj": _conv_init(rng, 1, enc_channels[-1], cc.latent_dim, dtype),
        "ln": np.ones(cc.latent_dim, dtype=dtype),
    }


def init_codec(cfg: ModelConfig, seed: int = 2) -> Params:
    cc = cfg.codec
    rng = np.random.default_rng(seed)
    dtype = np.dtype(jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32)
    if cfg.codec_arch == "code2wav":
        # the real decoder family (models/code2wav.py); the cloning-side
        # feature encoder keeps the synthetic architecture until the
        # checkpoints' speech tokenizer is recoverable offline
        from .code2wav import init_code2wav

        return {
            "c2w": init_code2wav(cfg.code2wav, seed=seed, dtype=dtype),
            "enc": _init_encoder(cfg, rng, dtype),
            "spk_proj": {
                "w": rng.normal(
                    0, 0.02, (cfg.talker.hidden, cc.latent_dim)
                ).astype(dtype)
            },
        }
    head_dim = cc.latent_dim // cc.transformer_heads
    ffn = 4 * cc.latent_dim
    n_res = cc.num_codebooks - 1

    # decoder upsample stages
    dec_stages = []
    for i, rate in enumerate(cc.upsample_rates):
        c_in, c_out = cc.decoder_channels[i], cc.decoder_channels[i + 1]
        dec_stages.append(
            {
                "up": _conv_init(rng, 2 * rate + 1, c_in, c_out, dtype),
                "res": _resunit_init(rng, c_out, cc.decoder_kernel, dtype),
            }
        )

    return {
        "dec": {
            "cb0_emb": rng.normal(0, 0.02, (cc.codebook_size, cc.latent_dim)).astype(dtype),
            "res_emb": rng.normal(
                0, 0.02, (n_res, cc.residual_codebook_size, cc.latent_dim)
            ).astype(dtype),
            "tf_blocks": _stack_trees(
                [
                    _tf_block_init(
                        rng, cc.latent_dim, cc.transformer_heads, head_dim, ffn, dtype
                    )
                    for _ in range(cc.n_transformer_layers)
                ]
            ),
            "ln": np.ones(cc.latent_dim, dtype=dtype),
            "in_proj": _conv_init(rng, 1, cc.latent_dim, cc.decoder_channels[0], dtype),
            "stages": dec_stages,
            "out_conv": _conv_init(rng, cc.decoder_kernel, cc.decoder_channels[-1], 1, dtype),
        },
        "enc": _init_encoder(cfg, rng, dtype),
        # latent -> talker-hidden projection for cloning conditioning
        "spk_proj": {
            "w": rng.normal(0, 0.02, (cfg.talker.hidden, cc.latent_dim)).astype(dtype)
        },
    }


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

def codes_to_latent(dec: Params, cc: CodecConfig, codes: jnp.ndarray) -> jnp.ndarray:
    """RVQ de-embedding: codes [B, Q, T] -> latent [B, T, D] (sum over books)."""
    latent = jnp.take(dec["cb0_emb"], codes[:, 0, :], axis=0)
    for qb in range(cc.num_codebooks - 1):
        latent = latent + jnp.take(dec["res_emb"][qb], codes[:, qb + 1, :], axis=0)
    return latent


def _latent_transformer(
    dec: Params, cc: CodecConfig, latent: jnp.ndarray, pos0: jnp.ndarray
) -> jnp.ndarray:
    """Causal self-attention over frames at absolute positions pos0..pos0+T.
    ``pos0`` is a scalar or a [B] vector (per-stream streaming decode)."""
    B, T, D = latent.shape
    head_dim = D // cc.transformer_heads
    cos_t, sin_t = rope_tables(_MAX_FRAMES, head_dim, 10_000.0)
    cos, sin = rope_slice(cos_t, sin_t, pos0, T)

    def body(x, layer_p):
        zeros = jnp.zeros((B, T, cc.transformer_heads, head_dim), dtype=x.dtype)
        out = transformer_block(
            layer_p, x,
            cos=cos, sin=sin,
            cache_k=zeros, cache_v=zeros, pos=0,
            n_heads=cc.transformer_heads, n_kv_heads=cc.transformer_heads,
            head_dim=head_dim, rms_eps=1e-6, qk_norm=False,
        )
        return out.x, None

    x, _ = jax.lax.scan(body, latent, dec["tf_blocks"])
    return rmsnorm(x, dec["ln"], 1e-6)


def _res_unit(p: Params, x: jnp.ndarray, kernel_dilations=(1, 3)) -> jnp.ndarray:
    h = causal_conv1d(jax.nn.gelu(x), p["c1"]["w"], p["c1"]["b"],
                      dilation=kernel_dilations[0])
    h = causal_conv1d(jax.nn.gelu(h), p["c2"]["w"], p["c2"]["b"],
                      dilation=kernel_dilations[1])
    return x + h


def _conv_stack(
    dec: Params,
    cc: CodecConfig,
    latent: jnp.ndarray,
    state: dict | None = None,
) -> jnp.ndarray | tuple[jnp.ndarray, dict]:
    """The decoder conv stack: latent [B, T, D] -> waveform [B, T*hop].

    Shared by decode_codes and decode_codes_streaming — the streaming
    invariant (streamed chunks EQUAL the one-shot decode) depends on both
    paths running the IDENTICAL stack.

    ``state`` (see init_conv_state) carries each conv's left input context
    at that conv's own temporal rate, so streaming decodes ONLY the new
    frames — zero recompute — and returns ``(wav, new_state)``. A
    zero-initialised state reproduces causal zero-padding exactly, so
    streamed chunks concatenate to the one-shot output bit-for-bit
    (tests/test_codec.py::test_streaming_decode_matches_full)."""
    streaming = state is not None
    new_state: dict = {}

    def conv(name: str, x: jnp.ndarray, p: Params, dilation: int = 1):
        if not streaming:
            return causal_conv1d(x, p["w"], p["b"], dilation=dilation)
        ctx = state[name].astype(x.dtype)
        xin = jnp.concatenate([ctx, x], axis=1)
        new_state[name] = xin[:, xin.shape[1] - ctx.shape[1]:]
        return causal_conv1d(xin, p["w"], p["b"], dilation=dilation,
                             pre_padded=True)

    x = causal_conv1d(latent, dec["in_proj"]["w"], dec["in_proj"]["b"])  # k=1
    for i, rate in enumerate(cc.upsample_rates):
        stage = dec["stages"][i]
        x = upsample_repeat(x, rate)
        x = conv(f"s{i}_up", x, stage["up"])
        # res unit (mirrors _res_unit; contexts carry post-gelu values)
        h = conv(f"s{i}_r1", jax.nn.gelu(x), stage["res"]["c1"], dilation=1)
        h = conv(f"s{i}_r2", jax.nn.gelu(h), stage["res"]["c2"], dilation=3)
        x = x + h
    wav = conv("out", jax.nn.gelu(x), dec["out_conv"])
    wav = jnp.tanh(wav[..., 0].astype(jnp.float32))
    return (wav, new_state) if streaming else wav


def decode_codes(
    params: Params,
    cfg: ModelConfig,
    codes: jnp.ndarray,            # [B, Q, T] int32
    pos0: jnp.ndarray | int = 0,   # absolute frame offset (for streaming)
) -> jnp.ndarray:
    """Full codec decode: codes -> waveform [B, T * hop] float32 in [-1, 1]."""
    cc = cfg.codec
    dec = params["dec"]
    pos0 = jnp.asarray(pos0, dtype=jnp.int32)

    latent = codes_to_latent(dec, cc, codes)
    latent = _latent_transformer(dec, cc, latent, pos0)
    return _conv_stack(dec, cc, latent)


# --------------------------------------------------------------------------
# incremental (streaming) decoder
# --------------------------------------------------------------------------
#
# The latent transformer is causal, so it takes a persistent KV cache and
# processes ONLY each new chunk of frames with full left context; every
# conv in the decoder stack carries its own left input context at its own
# temporal rate (state spec below), so the conv stack also processes ONLY
# the new frames — no receptive-field tail recompute per chunk. A
# zero-initialised context is identical to the causal zero left-padding at
# stream start, so streamed chunks EQUAL the one-shot decode_codes output —
# no final re-decode pass needed
# (tests/test_codec.py::test_streaming_decode_matches_full).

def conv_state_spec(cc: CodecConfig) -> dict[str, tuple[int, int]]:
    """Per-conv streaming context shapes: name -> (rows, channels), where
    ``rows`` = dilation*(k-1) input rows at that conv's own rate. Names
    match the conv() calls in _conv_stack."""
    spec: dict[str, tuple[int, int]] = {}
    kd = cc.decoder_kernel - 1
    for i, rate in enumerate(cc.upsample_rates):
        spec[f"s{i}_up"] = (2 * rate, cc.decoder_channels[i])
        spec[f"s{i}_r1"] = (kd, cc.decoder_channels[i + 1])
        spec[f"s{i}_r2"] = (3 * kd, cc.decoder_channels[i + 1])
    spec["out"] = (kd, cc.decoder_channels[-1])
    return spec


def init_conv_state(cc: CodecConfig, batch: int, dtype=jnp.bfloat16) -> dict:
    """Zeroed per-conv left contexts (== causal zero padding at start)."""
    return {
        name: jnp.zeros((batch, rows, ch), dtype)
        for name, (rows, ch) in conv_state_spec(cc).items()
    }


def init_codec_stream_state(
    cfg: ModelConfig, batch: int, *, dtype=jnp.bfloat16
) -> dict:
    """Device state for incremental codec decoding: latent-transformer KV
    caches (full-utterance length) + per-conv left contexts.

    Both codec architectures share the contract the runtimes rely on:
    ``state["conv"]`` holds every leaf that resets on slot recycling
    (batch axis 0), everything else is masked by stream position."""
    if cfg.codec_arch == "code2wav":
        from .code2wav import stream_state_init

        return stream_state_init(None, cfg.code2wav, batch, dtype=dtype)
    cc = cfg.codec
    head_dim = cc.latent_dim // cc.transformer_heads
    cache_shape = (
        cc.n_transformer_layers, batch, _MAX_FRAMES,
        cc.transformer_heads, head_dim,
    )
    return {
        "tf_k": jnp.zeros(cache_shape, dtype),
        "tf_v": jnp.zeros(cache_shape, dtype),
        "conv": init_conv_state(cc, batch, dtype),
    }


def decode_codes_streaming(
    params: Params,
    cfg: ModelConfig,
    codes_new: jnp.ndarray,        # [B, Q, chunk] codes for NEW frames only
    state: dict,
    pos: jnp.ndarray,              # scalar or [B]: frames decoded so far
) -> tuple[jnp.ndarray, dict]:
    """Decode ``chunk`` new frames with full left context; returns
    (wav_chunk [B, chunk*hop], new_state). Output matches decode_codes of
    the whole history, sliced to these frames.

    code2wav models route to the real decoder's streaming step
    (models/code2wav.py) in its uniform-shape variant: every chunk emits
    exactly chunk*hop samples, with the stream's FIRST
    ``sum_i((k_i - s_i) * prod(s_after_i))`` samples being the edge run-in
    the one-shot reference trims (the engine drops them host-side per
    utterance — engine/api.py c2w_startup_samples)."""
    if cfg.codec_arch == "code2wav":
        from .code2wav import code2wav_stream_step

        return code2wav_stream_step(
            params["c2w"], cfg.code2wav, state, codes_new, pos
        )
    cc = cfg.codec
    dec = params["dec"]
    B, _, T = codes_new.shape
    D = cc.latent_dim
    head_dim = D // cc.transformer_heads
    pos = jnp.asarray(pos, dtype=jnp.int32)

    latent = codes_to_latent(dec, cc, codes_new)          # [B, T, D]

    cos_t, sin_t = rope_tables(_MAX_FRAMES, head_dim, 10_000.0)
    cos, sin = rope_slice(cos_t, sin_t, pos, T)

    def body(x, layer):
        layer_p, ck, cv = layer
        out = transformer_block(
            layer_p, x,
            cos=cos, sin=sin,
            cache_k=ck, cache_v=cv, pos=pos,
            n_heads=cc.transformer_heads, n_kv_heads=cc.transformer_heads,
            head_dim=head_dim, rms_eps=1e-6, qk_norm=False,
        )
        return out.x, (out.cache_k, out.cache_v)

    x, (new_k, new_v) = jax.lax.scan(
        body, latent, (dec["tf_blocks"], state["tf_k"], state["tf_v"])
    )
    new_lat = rmsnorm(x, dec["ln"], 1e-6)                 # [B, T, D]

    wav, conv_state = _conv_stack(dec, cc, new_lat, state["conv"])
    return wav, {"tf_k": new_k, "tf_v": new_v, "conv": conv_state}


# --------------------------------------------------------------------------
# encoder + RVQ (voice-cloning acoustic prompt)
# --------------------------------------------------------------------------

def encode_waveform(
    params: Params, cfg: ModelConfig, wav: jnp.ndarray
) -> jnp.ndarray:
    """Waveform [B, N] -> latents [B, T, D] at the 12 Hz frame rate.

    N must be a multiple of ``cc.hop`` (callers pad with zeros).
    """
    cc = cfg.codec
    enc = params["enc"]
    x = wav[..., None].astype(params["dec"]["cb0_emb"].dtype)  # [B, N, 1]
    x = causal_conv1d(x, enc["in_conv"]["w"], enc["in_conv"]["b"])
    for stage, rate in zip(enc["stages"], reversed(cc.upsample_rates)):
        x = causal_conv1d(x, stage["down"]["w"], stage["down"]["b"],
                          stride=rate)
        x = _res_unit(stage["res"], x)
    latent = causal_conv1d(x, enc["proj"]["w"], enc["proj"]["b"])
    return rmsnorm(latent, enc["ln"], 1e-6)


def rvq_quantize(
    params: Params, cfg: ModelConfig, latent: jnp.ndarray
) -> jnp.ndarray:
    """Nearest-neighbour residual VQ: latent [B, T, D] -> codes [B, Q, T]."""
    cc = cfg.codec

    def nearest(resid: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
        rf = resid.astype(jnp.float32)
        tf = table.astype(jnp.float32)
        # argmin_v |r - e_v|^2 == argmin_v (|e_v|^2 - 2 r·e_v)
        dots = jnp.einsum("btd,vd->btv", rf, tf, preferred_element_type=jnp.float32)
        norms = jnp.sum(tf * tf, axis=-1)
        return jnp.argmin(norms[None, None, :] - 2.0 * dots, axis=-1).astype(jnp.int32)

    if cfg.codec_arch == "code2wav":
        # fit the code2wav embedding MEAN to the encoder latent: the
        # decoder embeds mean_q(e_q[code_q]), so residual-quantize the
        # target Q*latent against the per-quantizer table slices
        c2w = cfg.code2wav
        tables = params["c2w"]["code_emb"].reshape(
            c2w.num_quantizers, c2w.codebook_size, c2w.hidden
        )
        resid = latent.astype(jnp.float32) * c2w.num_quantizers
        codes = []
        for q in range(c2w.num_quantizers):
            idx = nearest(resid, tables[q])
            resid = resid - jnp.take(tables[q], idx, axis=0)
            codes.append(idx)
        return jnp.stack(codes, axis=1)

    dec = params["dec"]
    resid = latent
    idx0 = nearest(resid, dec["cb0_emb"])
    resid = resid - jnp.take(dec["cb0_emb"], idx0, axis=0)
    codes = [idx0]
    for qb in range(cc.num_codebooks - 1):
        table = dec["res_emb"][qb]
        idx = nearest(resid, table)
        resid = resid - jnp.take(table, idx, axis=0)
        codes.append(idx)
    return jnp.stack(codes, axis=1)  # [B, Q, T]


def speaker_embedding(
    params: Params, cfg: ModelConfig, latent: jnp.ndarray,
    n_frames: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mean-pooled encoder latent -> talker-hidden speaker vector [B, D_t].

    ``n_frames``: divide by the REAL frame count instead of the (possibly
    bucket-padded) latent length — callers zero the padding rows, this
    keeps the mean unbiased."""
    summed = jnp.sum(latent.astype(jnp.float32), axis=1)
    denom = (
        jnp.asarray(n_frames, jnp.float32)
        if n_frames is not None else jnp.float32(latent.shape[1])
    )
    pooled = summed / denom
    w = params["spk_proj"]["w"].astype(jnp.float32)
    return (pooled @ w.T).astype(latent.dtype)
