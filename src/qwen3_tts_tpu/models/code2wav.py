"""Code2Wav: the real Qwen3 codec-decoder architecture, in JAX.

Round 1 shipped an invented RVQ codec (models/codec.py) because the
reference hides the codec inside mlx_audio (SURVEY.md §7 hard-part #1).
The actual architecture family is published: Qwen3-Omni's ``code2wav``
(transformers ``models/qwen3_omni_moe/modeling_qwen3_omni_moe.py``, classes
``Qwen3OmniMoeCode2Wav*`` — Qwen3-TTS-12Hz uses the same decoder family at
different config values). This module is a faithful JAX port, parity-tested
against the installed torch implementation (tests/test_code2wav.py):

    codes [B, Q, T]
      -> per-quantizer offset embedding, MEAN over the Q codebooks  [B,T,H]
      -> pre-transformer: N layers of sliding-window (72) causal MHA
         (RoPE, no qk-norm) + SwiGLU, each residual scaled by a learned
         per-channel LayerScale; final RMSNorm
      -> ConvNeXt upsampling stages: x2 transposed conv + ConvNeXt block
         per ``upsampling_ratio``
      -> BigVGAN-style decoder: channel-halving blocks of SnakeBeta
         activation + causal transposed conv (kernel 2r, stride r) + three
         dilated (1, 3, 9) residual units; final SnakeBeta + conv to mono
      -> clamp to [-1, 1]

    samples per frame = prod(upsample_rates) * prod(upsampling_ratios)
    (Qwen3-TTS-12Hz: 2000 at 24 kHz; Omni: 1920 = 12.5 Hz)

Everything is config-driven (``Code2WavConfig``) so the true geometry comes
from the checkpoint's ``config.json`` at import time. The attention/MLP
projections go through ``ops.linear`` (int8-quantized checkpoints keep
their storage format); conv tensors stay dense in the torch layout
([out, in, k] / transposed [in, out, k]) so state-dict import is
mechanical.

TPU notes: the hot loop is the pre-transformer (matmuls on the MXU) and
the conv stack, which XLA lowers to MXU convolutions; the sliding window
bounds decode-time attention state to 72 positions per layer.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.linear import linear
from .layers import rmsnorm, rope_tables

Params = dict[str, Any]


@dataclass(frozen=True)
class Code2WavConfig:
    """Geometry of the code2wav decoder (mirrors the HF
    ``Qwen3OmniMoeCode2WavConfig`` field-for-field; defaults are the
    published Omni values — real values come from the checkpoint)."""

    codebook_size: int = 2048
    num_quantizers: int = 16
    hidden: int = 1024
    n_layers: int = 8
    n_heads: int = 16
    n_kv_heads: int = 16
    ffn: int = 3072
    rope_theta: float = 10_000.0
    rms_eps: float = 1e-5
    sliding_window: int = 72
    layer_scale_init: float = 0.01
    upsample_rates: tuple[int, ...] = (8, 5, 4, 3)
    upsampling_ratios: tuple[int, ...] = (2, 2)
    decoder_dim: int = 1536
    sample_rate: int = 24_000

    @property
    def head_dim(self) -> int:
        return self.hidden // self.n_heads

    @property
    def total_upsample(self) -> int:
        return int(np.prod(self.upsample_rates)) * int(
            np.prod(self.upsampling_ratios)
        )

    @property
    def frame_rate(self) -> float:
        return self.sample_rate / self.total_upsample

    @classmethod
    def from_hf_dict(cls, d: dict) -> "Code2WavConfig":
        """Build from a checkpoint's ``code2wav_config`` JSON section."""
        return cls(
            codebook_size=d.get("codebook_size", 2048),
            num_quantizers=d.get("num_quantizers", 16),
            hidden=d.get("hidden_size", 1024),
            n_layers=d.get("num_hidden_layers", 8),
            n_heads=d.get("num_attention_heads", 16),
            n_kv_heads=d.get("num_key_value_heads",
                             d.get("num_attention_heads", 16)),
            ffn=d.get("intermediate_size", 3072),
            rope_theta=d.get("rope_theta", 10_000.0),
            rms_eps=d.get("rms_norm_eps", 1e-5),
            sliding_window=d.get("sliding_window", 72),
            layer_scale_init=d.get("layer_scale_initial_scale", 0.01),
            upsample_rates=tuple(d.get("upsample_rates", (8, 5, 4, 3))),
            upsampling_ratios=tuple(d.get("upsampling_ratios", (2, 2))),
            decoder_dim=d.get("decoder_dim", 1536),
            sample_rate=d.get("sample_rate", 24_000),
        )


# --------------------------------------------------------------------------
# init (synthetic weights; real checkpoints import into the same layout)
# --------------------------------------------------------------------------

def _dense(rng, out_dim, in_dim, dtype, std=0.02) -> Params:
    return {"w": rng.normal(0.0, std, (out_dim, in_dim)).astype(dtype)}


def _conv(rng, out_ch, in_ch, k, dtype, std=0.05) -> Params:
    """Causal Conv1d params, torch layout w [out, in/groups, k], bias [out]."""
    return {
        "w": rng.normal(0.0, std, (out_ch, in_ch, k)).astype(dtype),
        "b": rng.normal(0.0, 0.01, (out_ch,)).astype(dtype),
    }


def _tconv(rng, in_ch, out_ch, k, dtype, std=0.05) -> Params:
    """ConvTranspose1d params, torch layout w [in, out, k], bias [out]."""
    return {
        "w": rng.normal(0.0, std, (in_ch, out_ch, k)).astype(dtype),
        "b": rng.normal(0.0, 0.01, (out_ch,)).astype(dtype),
    }


def _snake(dim, dtype) -> Params:
    # torch init: alpha = beta = zeros (exp(0) = 1 at init)
    return {"alpha": np.zeros(dim, dtype), "beta": np.zeros(dim, dtype)}


def init_code2wav(cfg: Code2WavConfig, seed: int = 3, dtype=np.float32) -> Params:
    rng = np.random.default_rng(seed)
    dtype = np.dtype(dtype)
    H, D = cfg.hidden, cfg.decoder_dim
    q_dim = cfg.n_heads * cfg.head_dim
    kv_dim = cfg.n_kv_heads * cfg.head_dim

    def block() -> Params:
        return {
            "attn": {
                "q": _dense(rng, q_dim, H, dtype),
                "k": _dense(rng, kv_dim, H, dtype),
                "v": _dense(rng, kv_dim, H, dtype),
                "o": _dense(rng, H, q_dim, dtype),
            },
            "mlp": {
                "gate": _dense(rng, cfg.ffn, H, dtype),
                "up": _dense(rng, cfg.ffn, H, dtype),
                "down": _dense(rng, H, cfg.ffn, dtype),
            },
            "ln1": np.ones(H, dtype),
            "ln2": np.ones(H, dtype),
            "ls_attn": np.full(H, cfg.layer_scale_init, dtype),
            "ls_mlp": np.full(H, cfg.layer_scale_init, dtype),
        }

    def stack(trees):
        return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *trees)

    def convnext(dim) -> Params:
        return {
            "dw": _conv(rng, dim, 1, 7, dtype),  # depthwise: groups == dim
            "ln_w": np.ones(dim, dtype),
            "ln_b": np.zeros(dim, dtype),
            "pw1": {
                "w": rng.normal(0, 0.02, (4 * dim, dim)).astype(dtype),
                "b": np.zeros(4 * dim, dtype),
            },
            "pw2": {
                "w": rng.normal(0, 0.02, (dim, 4 * dim)).astype(dtype),
                "b": np.zeros(dim, dtype),
            },
            "gamma": np.full(dim, 1e-6, dtype),
        }

    def res_unit(dim, dilation) -> Params:
        return {
            "a1": _snake(dim, dtype),
            "c1": _conv(rng, dim, dim, 7, dtype),
            "a2": _snake(dim, dtype),
            "c2": _conv(rng, dim, dim, 1, dtype),
        }

    dec_blocks = []
    for i, r in enumerate(cfg.upsample_rates):
        in_dim, out_dim = D // 2**i, D // 2 ** (i + 1)
        dec_blocks.append({
            "snake": _snake(in_dim, dtype),
            "tconv": _tconv(rng, in_dim, out_dim, 2 * r, dtype),
            "res": tuple(res_unit(out_dim, d) for d in (1, 3, 9)),
        })
    out_dim = D // 2 ** len(cfg.upsample_rates)

    return {
        "code_emb": rng.normal(
            0, 0.02, (cfg.codebook_size * cfg.num_quantizers, H)
        ).astype(dtype),
        "pre": {
            "blocks": stack([block() for _ in range(cfg.n_layers)]),
            "ln_f": np.ones(H, dtype),
        },
        "upsample": tuple(
            {"tconv": _tconv(rng, H, H, r, dtype), "cnx": convnext(H)}
            for r in cfg.upsampling_ratios
        ),
        "decoder": {
            "conv_in": _conv(rng, D, H, 7, dtype),
            "blocks": tuple(dec_blocks),
            "snake_out": _snake(out_dim, dtype),
            "conv_out": _conv(rng, 1, out_dim, 7, dtype),
        },
    }


# --------------------------------------------------------------------------
# primitives (numerically parity-tested against the torch reference)
# --------------------------------------------------------------------------

def causal_conv(
    x: jnp.ndarray,               # [B, C, T]
    p: Params,                    # w [out, in/groups, k], b [out]
    *,
    dilation: int = 1,
    stride: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """Left-padded causal Conv1d (Qwen3OmniMoeCausalConvNet semantics:
    pad left by (k_eff - stride) plus right by the partial-frame remainder)."""
    k = p["w"].shape[-1]
    k_eff = (k - 1) * dilation + 1
    padding = k_eff - stride
    length = x.shape[-1]
    n_frames = (length - k_eff + padding) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (k_eff - padding)
    extra = ideal - length
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(stride,),
        padding=[(padding, extra)], rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y + p["b"].astype(x.dtype)[None, :, None]


def causal_tconv(x: jnp.ndarray, p: Params, *, stride: int) -> jnp.ndarray:
    """ConvTranspose1d + symmetric (k - stride) trim
    (Qwen3OmniMoeCausalTransConvNet). Expressed as an lhs-dilated conv with
    the kernel time-flipped and in/out swapped (bit-exact vs torch)."""
    w = p["w"]                                 # [in, out, k] torch layout
    k = w.shape[-1]
    w_t = jnp.transpose(w, (1, 0, 2))[:, :, ::-1].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w_t, window_strides=(1,), padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,), dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    y = y + p["b"].astype(x.dtype)[None, :, None]
    pad = k - stride
    return y[..., pad : y.shape[-1] - pad] if pad else y


def snake_beta(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """SnakeBeta activation: x + (1/e^beta) * sin^2(x * e^alpha), per
    channel ([B, C, T] layout)."""
    xf = x.astype(jnp.float32)
    alpha = jnp.exp(p["alpha"].astype(jnp.float32))[None, :, None]
    beta = jnp.exp(p["beta"].astype(jnp.float32))[None, :, None]
    return (xf + (1.0 / (beta + 1e-9)) * jnp.sin(xf * alpha) ** 2).astype(
        x.dtype
    )


def _layer_norm(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                eps: float = 1e-6) -> jnp.ndarray:
    """Channels-last LayerNorm (torch nn.LayerNorm semantics, f32 inner)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def convnext_block(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """ConvNeXt block: depthwise causal conv k7 -> LN -> pw1 -> GELU(exact)
    -> pw2 -> gamma scale, residual. x is [B, C, T]."""
    C = x.shape[1]
    h = causal_conv(x, p["dw"], groups=C)
    h = jnp.transpose(h, (0, 2, 1))                     # [B, T, C]
    h = _layer_norm(h, p["ln_w"], p["ln_b"])
    h = linear(h, {"w": p["pw1"]["w"]}) + p["pw1"]["b"].astype(x.dtype)
    h = jax.nn.gelu(h, approximate=False)
    h = linear(h, {"w": p["pw2"]["w"]}) + p["pw2"]["b"].astype(x.dtype)
    h = h * p["gamma"].astype(x.dtype)
    return x + jnp.transpose(h, (0, 2, 1))


# --------------------------------------------------------------------------
# pre-transformer (sliding-window causal, LayerScale residuals)
# --------------------------------------------------------------------------

def _pre_attention(
    p: Params, x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
    cfg: Code2WavConfig,
) -> jnp.ndarray:
    """Full-sequence MHA/GQA with a causal sliding-window mask
    (q - window < k <= q), RoPE, no qk-norm. x [B, T, H]."""
    B, T, _ = x.shape
    hd = cfg.head_dim
    g = cfg.n_heads // cfg.n_kv_heads
    from .layers import apply_rope

    q = linear(x, p["q"]).reshape(B, T, cfg.n_heads, hd)
    k = linear(x, p["k"]).reshape(B, T, cfg.n_kv_heads, hd)
    v = linear(x, p["v"]).reshape(B, T, cfg.n_kv_heads, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    qg = q.reshape(B, T, cfg.n_kv_heads, g, hd)
    scores = jnp.einsum(
        "bthgd,bshd->bhgts", qg, k, preferred_element_type=jnp.float32
    ) * (hd ** -0.5)
    qi = jnp.arange(T)[:, None]
    ki = jnp.arange(T)[None, :]
    allowed = (ki <= qi) & (ki > qi - cfg.sliding_window)
    scores = jnp.where(allowed[None, None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    ctx = jnp.einsum(
        "bhgts,bshd->bthgd", probs, v, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return linear(ctx.reshape(B, T, cfg.n_heads * hd), p["o"])


def pre_transformer(params: Params, x: jnp.ndarray,
                    cfg: Code2WavConfig) -> jnp.ndarray:
    """The code2wav autoregressive transformer over frames. x [B, T, H]."""
    T = x.shape[1]
    cos_t, sin_t = rope_tables(T, cfg.head_dim, cfg.rope_theta)

    def body(h, bp):
        a = _pre_attention(
            bp["attn"], rmsnorm(h, bp["ln1"], cfg.rms_eps), cos_t, sin_t, cfg
        )
        h = h + a * bp["ls_attn"].astype(h.dtype)
        from .layers import swiglu_mlp

        m = swiglu_mlp(bp["mlp"], rmsnorm(h, bp["ln2"], cfg.rms_eps))
        h = h + m * bp["ls_mlp"].astype(h.dtype)
        return h, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return rmsnorm(x, params["ln_f"], cfg.rms_eps)


# --------------------------------------------------------------------------
# full decode
# --------------------------------------------------------------------------

def embed_codes(params: Params, cfg: Code2WavConfig,
                codes: jnp.ndarray) -> jnp.ndarray:
    """codes [B, Q, T] -> mean-of-quantizer-embeddings [B, T, H]."""
    offset = (
        jnp.arange(cfg.num_quantizers, dtype=codes.dtype) * cfg.codebook_size
    )[None, :, None]
    emb = jnp.take(params["code_emb"], codes + offset, axis=0)  # [B,Q,T,H]
    return jnp.mean(emb, axis=1)


def code2wav_decode(params: Params, cfg: Code2WavConfig,
                    codes: jnp.ndarray) -> jnp.ndarray:
    """codes [B, Q, T] int32 -> waveform [B, T * total_upsample] in [-1, 1].

    Mirrors Qwen3OmniMoeCode2Wav.forward exactly (parity-tested)."""
    h = embed_codes(params, cfg, codes)
    h = pre_transformer(params["pre"], h, cfg)
    h = jnp.transpose(h, (0, 2, 1))                      # [B, H, T]
    for i, stage in enumerate(params["upsample"]):
        h = causal_tconv(h, stage["tconv"], stride=cfg.upsampling_ratios[i])
        h = convnext_block(h, stage["cnx"])

    w = causal_conv(h, params["decoder"]["conv_in"])
    for i, blk in enumerate(params["decoder"]["blocks"]):
        w = snake_beta(w, blk["snake"])
        w = causal_tconv(w, blk["tconv"], stride=cfg.upsample_rates[i])
        for j, ru in enumerate(blk["res"]):
            r = w
            w = snake_beta(w, ru["a1"])
            w = causal_conv(w, ru["c1"], dilation=(1, 3, 9)[j])
            w = snake_beta(w, ru["a2"])
            w = causal_conv(w, ru["c2"])
            w = w + r
    w = snake_beta(w, params["decoder"]["snake_out"])
    w = causal_conv(w, params["decoder"]["conv_out"])
    return jnp.clip(w[:, 0, :], -1.0, 1.0)
