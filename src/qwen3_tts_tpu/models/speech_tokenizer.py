"""Speech tokenizer: reference-audio waveform -> codec codes, in JAX.

The reference's cloning mode feeds ``ref_audio`` straight into mlx_audio
(`/root/reference/src/qwen3_tts/sessions/clone.py:218-224`), whose Base
model runs a real speech tokenizer loaded as part of the checkpoint
(`/root/reference/src/qwen3_tts/io.py:111-112`). That encoder is the one
neural component whose exact architecture is not published in the installed
transformers (PARITY.md "Still unrecoverable offline").

What IS published is its architecture *family*: the Mimi codec
(transformers ``models/mimi/modeling_mimi.py``, the Kyutai 12.5 Hz codec) —
a SEANet conv encoder -> sliding-window causal transformer -> x2 strided
downsample -> split residual vector quantizer, the canonical
low-frame-rate speech-token stack. This module is a faithful JAX port of
that encode path, parity-tested against the installed torch ``MimiModel``
(tests/test_speech_tokenizer.py), with every geometry parameter derived
from the checkpoint's tensor *shapes* at import time (config values only
fill what shapes cannot express: head_dim, sliding window, rope theta).

    wav [B, n]  (sampling_rate, mono)
      -> SEANet: conv_in (K=7) -> per-ratio [num_res x ResnetBlock, ELU,
         strided causal conv (K=2r, stride r, channels x2)] -> ELU ->
         conv_out (K=3) to hidden                                [B, T', H]
      -> transformer: pre-LN (LayerNorm+bias) GQA attention (RoPE,
         causal sliding window) + LayerScale, gelu fc1/fc2 MLP   [B, T', H]
      -> optional x2 downsample conv (K=2*div, stride 2, replicate pad)
      -> split RVQ: semantic books then acoustic books, each family
         input-projected, euclidean-nearest encode               [B, Q, T]

All convs are causal (left pad = K_eff - stride, plus the torch "extra"
right pad making the last frame whole) so a zero-initialised stream state
matches batch encoding — the same property the code2wav decoder exploits.

Import: ``st_config_from_tensors`` + ``import_speech_tokenizer``
(engine/weights.py routes ``speech_tokenizer.*`` tensors here; unknown
layouts are preserved in the native cache instead of dropped).

TPU notes: the encoder runs once per enrollment (not in the decode hot
loop); everything lowers to MXU convs/matmuls under one jit per
clip-length bucket. Kept in float32 — fidelity over speed off the hot path.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


@dataclass(frozen=True)
class SpeechTokenizerConfig:
    """Geometry of the Mimi-family encoder. Field names mirror the HF
    ``MimiConfig`` where one exists; defaults are the published Mimi values
    at 24 kHz. Real values come from checkpoint tensor shapes
    (``st_config_from_tensors``) + the checkpoint's config section."""

    # SEANet conv encoder
    audio_channels: int = 1
    num_filters: int = 64
    kernel_size: int = 7
    last_kernel_size: int = 3
    residual_kernel_size: int = 3
    num_residual_layers: int = 1
    dilation_growth_rate: int = 2
    compress: int = 2
    # waveform-side order (largest first, as in MimiConfig); the encoder
    # applies them reversed (smallest ratio first)
    upsampling_ratios: tuple[int, ...] = (8, 6, 5, 4)
    # transformer
    hidden: int = 512
    n_layers: int = 8
    n_heads: int = 8
    n_kv_heads: int = 8
    head_dim: int = 64
    ffn: int = 2048
    norm_eps: float = 1e-5
    rope_theta: float = 10_000.0
    # None = full causal attention. The published Mimi config carries
    # sliding_window=250, but the installed transformers MimiModel builds a
    # plain causal mask on this path (create_causal_mask, not the sliding
    # variant) — parity follows the executable reference; checkpoints whose
    # config sets a window get it applied.
    sliding_window: int | None = None
    # frame-rate downsample (encodec_frame_rate / frame_rate); 1 = absent
    frame_div: int = 2
    # split residual vector quantizer
    codebook_size: int = 2048
    codebook_dim: int = 256
    num_quantizers: int = 16
    num_semantic_quantizers: int = 1
    quant_input_proj: bool = True
    sampling_rate: int = 24_000

    @property
    def hop(self) -> int:
        """Waveform samples per emitted code frame."""
        r = 1
        for x in self.upsampling_ratios:
            r *= x
        return r * (2 if self.frame_div > 1 else 1)

    @property
    def frame_rate(self) -> float:
        return self.sampling_rate / self.hop


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def _conv(rng, out_ch, in_ch, k, dtype, bias=True, std=0.05) -> Params:
    p = {"w": rng.normal(0, std, (out_ch, in_ch, k)).astype(dtype)}
    if bias:
        p["b"] = np.zeros(out_ch, dtype=dtype)
    return p


def _dense(rng, out_dim, in_dim, dtype, std=0.02) -> Params:
    return {"w": rng.normal(0, std, (in_dim, out_dim)).astype(dtype)}


def init_speech_tokenizer(
    cfg: SpeechTokenizerConfig, seed: int = 7, dtype=np.float32
) -> Params:
    rng = np.random.default_rng(seed)
    c = cfg

    stages = []
    ch = c.num_filters
    for ratio in reversed(c.upsampling_ratios):
        res = []
        for _ in range(c.num_residual_layers):
            hid = max(1, ch // c.compress)
            res.append({
                "c1": _conv(rng, hid, ch, c.residual_kernel_size, dtype),
                "c2": _conv(rng, ch, hid, 1, dtype),
            })
        stages.append({
            "res": res,
            "down": _conv(rng, ch * 2, ch, 2 * ratio, dtype),
        })
        ch *= 2

    def block() -> Params:
        H, hd = c.hidden, c.head_dim
        return {
            "q": _dense(rng, c.n_heads * hd, H, dtype),
            "k": _dense(rng, c.n_kv_heads * hd, H, dtype),
            "v": _dense(rng, c.n_kv_heads * hd, H, dtype),
            "o": _dense(rng, H, c.n_heads * hd, dtype),
            "fc1": _dense(rng, c.ffn, H, dtype),
            "fc2": _dense(rng, H, c.ffn, dtype),
            "ln1_w": np.ones(H, dtype=dtype),
            "ln1_b": np.zeros(H, dtype=dtype),
            "ln2_w": np.ones(H, dtype=dtype),
            "ln2_b": np.zeros(H, dtype=dtype),
            "scale_attn": np.full(H, 0.01, dtype=dtype),
            "scale_mlp": np.full(H, 0.01, dtype=dtype),
        }

    def rvq(n_books: int) -> Params:
        q: Params = {
            "codebooks": [
                rng.normal(0, 1.0, (c.codebook_size, c.codebook_dim))
                .astype(dtype)
                for _ in range(n_books)
            ],
        }
        if c.quant_input_proj:
            q["in_proj"] = _dense(rng, c.codebook_dim, c.hidden, dtype)
        return q

    params: Params = {
        "enc": {
            "conv_in": _conv(rng, c.num_filters, c.audio_channels,
                             c.kernel_size, dtype),
            "stages": stages,
            "conv_out": _conv(rng, c.hidden, ch, c.last_kernel_size, dtype),
        },
        "tf": [block() for _ in range(c.n_layers)],
        "quant": {
            "sem": rvq(c.num_semantic_quantizers),
            "ac": rvq(c.num_quantizers - c.num_semantic_quantizers),
        },
    }
    if c.frame_div > 1:
        params["down"] = _conv(rng, c.hidden, c.hidden, 2 * c.frame_div,
                               dtype, bias=False)
    return params


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _causal_pad(x: jnp.ndarray, k: int, stride: int,
                mode: str = "constant") -> jnp.ndarray:
    """Mimi/EnCodec causal padding on x [B, C, n]: ``padding_total`` =
    k - stride on the LEFT, plus the "extra" right pad that makes the final
    (partial) frame whole — torch MimiConv1d._get_extra_padding_for_conv1d
    with causal convs."""
    n = x.shape[-1]
    pad_total = k - stride
    n_frames = -(-(n - k + pad_total) // stride)  # ceil((n-k+pt)/s)+1-1
    ideal = n_frames * stride + k - pad_total
    extra = max(0, ideal - n)
    if mode == "replicate":
        left = jnp.repeat(x[..., :1], pad_total, axis=-1)
        right = jnp.repeat(x[..., -1:], extra, axis=-1) if extra else None
        parts = [left, x] + ([right] if right is not None else [])
        return jnp.concatenate(parts, axis=-1)
    return jnp.pad(x, ((0, 0), (0, 0), (pad_total, extra)))


def _conv1d(x: jnp.ndarray, p: Params, *, stride: int = 1,
            dilation: int = 1) -> jnp.ndarray:
    """x [B, C, n] (pre-padded), torch-layout weight [out, in, k]."""
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(p["w"], x.dtype), window_strides=(stride,),
        padding="VALID", rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if "b" in p:
        y = y + jnp.asarray(p["b"], x.dtype)[None, :, None]
    return y


def _causal_conv(x, p, *, stride=1, dilation=1, mode="constant"):
    k_eff = (p["w"].shape[-1] - 1) * dilation + 1
    return _conv1d(_causal_pad(x, k_eff, stride, mode), p,
                   stride=stride, dilation=dilation)


def seanet_encode(params: Params, cfg: SpeechTokenizerConfig,
                  wav: jnp.ndarray) -> jnp.ndarray:
    """wav [B, n] -> latents [B, T, hidden] at the pre-downsample rate."""
    enc = params["enc"]
    x = wav[:, None, :]
    x = _causal_conv(x, enc["conv_in"])
    for stage, ratio in zip(enc["stages"], reversed(cfg.upsampling_ratios)):
        for j, res in enumerate(stage["res"]):
            d = cfg.dilation_growth_rate ** j
            y = _causal_conv(jax.nn.elu(x), res["c1"], dilation=d)
            y = _causal_conv(jax.nn.elu(y), res["c2"])
            x = x + y
        x = _causal_conv(jax.nn.elu(x), stage["down"], stride=ratio)
    x = _causal_conv(jax.nn.elu(x), enc["conv_out"])
    return jnp.transpose(x, (0, 2, 1))


def _layer_norm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def st_transformer(params: Params, cfg: SpeechTokenizerConfig,
                   x: jnp.ndarray) -> jnp.ndarray:
    """Causal sliding-window transformer over latents [B, T, H]."""
    from .layers import apply_rope, rope_tables

    B, T, H = x.shape
    hd = cfg.head_dim
    cos_t, sin_t = rope_tables(T, hd, cfg.rope_theta)
    i = jnp.arange(T)[:, None]
    j = jnp.arange(T)[None, :]
    allowed = j <= i
    if cfg.sliding_window is not None:
        allowed &= i - j < cfg.sliding_window
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
    bias = jnp.where(allowed, 0.0, neg)[None, None]       # [1, 1, T, T]

    for blk in params["tf"]:
        h = _layer_norm(x, blk["ln1_w"], blk["ln1_b"], cfg.norm_eps)
        q = (h @ blk["q"]["w"]).reshape(B, T, cfg.n_heads, hd)
        k = (h @ blk["k"]["w"]).reshape(B, T, cfg.n_kv_heads, hd)
        v = (h @ blk["v"]["w"]).reshape(B, T, cfg.n_kv_heads, hd)
        q = apply_rope(q, cos_t, sin_t)
        k = apply_rope(k, cos_t, sin_t)
        if cfg.n_kv_heads != cfg.n_heads:
            rep = cfg.n_heads // cfg.n_kv_heads
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        scores = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(hd)
        probs = jax.nn.softmax(scores.astype(jnp.float32) + bias, axis=-1)
        ctx = jnp.einsum("bhts,bshd->bthd", probs.astype(x.dtype), v)
        attn = ctx.reshape(B, T, -1) @ blk["o"]["w"]
        x = x + attn * blk["scale_attn"]
        h = _layer_norm(x, blk["ln2_w"], blk["ln2_b"], cfg.norm_eps)
        mlp = jax.nn.gelu(h @ blk["fc1"]["w"], approximate=False)
        x = x + (mlp @ blk["fc2"]["w"]) * blk["scale_mlp"]
    return x


def _rvq_encode(q: Params, x: jnp.ndarray, n_books: int) -> jnp.ndarray:
    """Residual euclidean-nearest encode: x [B, T, D_in] -> [B, n, T]."""
    if "in_proj" in q:
        x = x @ q["in_proj"]["w"]
    residual = x.astype(jnp.float32)
    out = []
    for b in range(n_books):
        cb = jnp.asarray(q["codebooks"][b], jnp.float32)    # [S, D]
        # argmin ||r - c||^2 = argmin (|c|^2 - 2 r.c): the expanded form
        # rides the MXU and avoids a [B, T, S, D] difference tensor
        # (codebook 2048 x 256 over a 1000-frame clip would be GBs)
        d2 = jnp.sum(cb * cb, axis=-1)[None, None, :] - 2.0 * (
            residual @ cb.T
        )
        idx = jnp.argmin(d2, axis=-1)                        # [B, T]
        out.append(idx)
        residual = residual - jnp.take(cb, idx, axis=0)
    return jnp.stack(out, axis=1).astype(jnp.int32)          # [B, n, T]


def st_encode(params: Params, cfg: SpeechTokenizerConfig,
              wav: jnp.ndarray) -> jnp.ndarray:
    """Full encode: wav [B, n] -> codec codes [B, Q, T] (semantic books
    first, then acoustic — the order the codec decoder consumes)."""
    lat = seanet_encode(params, cfg, wav)                    # [B, T', H]
    lat = st_transformer(params, cfg, lat)
    if "down" in params:
        x = jnp.transpose(lat, (0, 2, 1))
        x = _causal_conv(x, params["down"], stride=2, mode="replicate")
        lat = jnp.transpose(x, (0, 2, 1))                    # [B, T, H]
    sem = _rvq_encode(params["quant"]["sem"], lat,
                      cfg.num_semantic_quantizers)
    n_ac = cfg.num_quantizers - cfg.num_semantic_quantizers
    if n_ac:
        ac = _rvq_encode(params["quant"]["ac"], lat, n_ac)
        return jnp.concatenate([sem, ac], axis=1)
    return sem


def st_frames(cfg: SpeechTokenizerConfig, n_samples: int) -> int:
    """Number of code frames ``st_encode`` emits for an n-sample clip
    (every conv pads to whole output frames, so it's pure ceil-division
    through the stride chain)."""
    t = n_samples
    t = -(-t // 1)                       # conv_in stride 1
    for ratio in reversed(cfg.upsampling_ratios):
        t = -(-t // ratio)
    if cfg.frame_div > 1:
        t = -(-t // 2)
    return max(1, t)


# --------------------------------------------------------------------------
# checkpoint import (Mimi tensor layout)
# --------------------------------------------------------------------------

_ENC_CONV = re.compile(r"^encoder\.layers\.(\d+)\.conv\.(weight|bias)$")
_ENC_RES = re.compile(
    r"^encoder\.layers\.(\d+)\.block\.(1|3)\.conv\.(weight|bias)$"
)
_TF = re.compile(r"^encoder_transformer\.layers\.(\d+)\.(.+)$")
_QUANT = re.compile(
    r"^quantizer\.(semantic|acoustic)_residual_vector_quantizer\.(.+)$"
)
_CB = re.compile(r"^layers\.(\d+)\.codebook\.(embed_sum|cluster_usage"
                 r"|embed|initialized)$")


def st_config_from_tensors(
    tensors: dict[str, np.ndarray], hf_cfg: dict | None = None,
) -> SpeechTokenizerConfig:
    """Derive the encoder geometry from checkpoint tensor shapes (Mimi
    layout). Raises ValueError when the layout is not recognisable —
    callers treat that as "preserve, don't map". ``hf_cfg`` (the
    checkpoint's ``speech_tokenizer_config`` section, when present) fills
    the fields shapes cannot express."""
    hf = hf_cfg or {}

    conv_w = {}
    for name, arr in tensors.items():
        m = _ENC_CONV.match(name)
        if m and m.group(2) == "weight":
            conv_w[int(m.group(1))] = arr
    if 0 not in conv_w or len(conv_w) < 2:
        raise ValueError(
            "speech_tokenizer layout not recognised: no Mimi-style "
            "encoder.layers.N.conv tensors"
        )
    idxs = sorted(conv_w)
    first = conv_w[idxs[0]]
    last = conv_w[idxs[-1]]
    num_filters, audio_channels, kernel_size = first.shape
    hidden, _, last_kernel = last.shape
    # interior convs are the strided downsamples: ratio = K // 2
    ratios_enc_order = [conv_w[i].shape[-1] // 2 for i in idxs[1:-1]]
    if not ratios_enc_order or any(r < 1 for r in ratios_enc_order):
        raise ValueError(
            "speech_tokenizer layout not recognised: no downsample convs"
        )

    res_by_stage: dict[int, int] = {}
    res_kernel, compress = 3, 2
    for name, arr in tensors.items():
        m = _ENC_RES.match(name)
        if m and m.group(2) == "1" and m.group(3) == "weight":
            li = int(m.group(1))
            stage = sum(1 for i in idxs[1:-1] if i < li)
            res_by_stage[stage] = res_by_stage.get(stage, 0) + 1
            hid, dim, res_kernel = arr.shape
            compress = max(1, dim // max(1, hid))
    num_res = res_by_stage.get(0, 1)

    tf_layers: set[int] = set()
    ffn = None
    q_rows = kv_rows = None
    for name, arr in tensors.items():
        m = _TF.match(name)
        if not m:
            continue
        tf_layers.add(int(m.group(1)))
        if m.group(2) == "mlp.fc1.weight":
            ffn = arr.shape[0]
        elif m.group(2) == "self_attn.q_proj.weight":
            q_rows = arr.shape[0]
        elif m.group(2) == "self_attn.k_proj.weight":
            kv_rows = arr.shape[0]
    if not tf_layers or ffn is None or q_rows is None:
        raise ValueError(
            "speech_tokenizer layout not recognised: no Mimi-style "
            "encoder_transformer tensors"
        )

    head_dim = int(hf.get("head_dim", 64))
    if q_rows % head_dim:
        head_dim = q_rows // int(hf.get("num_attention_heads", 8))
    n_heads = int(hf.get("num_attention_heads", q_rows // head_dim))
    n_kv = int(hf.get("num_key_value_heads",
                      (kv_rows or q_rows) // head_dim))

    sem_books = ac_books = 0
    cb_size = cb_dim = None
    has_in_proj = False
    for name, arr in tensors.items():
        m = _QUANT.match(name)
        if not m:
            continue
        fam, rest = m.groups()
        if rest == "input_proj.weight":
            has_in_proj = True
        cm = _CB.match(rest)
        if cm and cm.group(2) in ("embed_sum", "embed"):
            if fam == "semantic":
                sem_books += 1
            else:
                ac_books += 1
            cb_size, cb_dim = arr.shape
    if cb_size is None:
        raise ValueError(
            "speech_tokenizer layout not recognised: no quantizer codebooks"
        )

    down = tensors.get("downsample.conv.weight")
    frame_div = (down.shape[-1] // 2) if down is not None else 1

    return SpeechTokenizerConfig(
        audio_channels=audio_channels,
        num_filters=num_filters,
        kernel_size=kernel_size,
        last_kernel_size=last_kernel,
        residual_kernel_size=res_kernel,
        num_residual_layers=num_res,
        dilation_growth_rate=int(hf.get("dilation_growth_rate", 2)),
        compress=compress,
        # waveform-side order = reverse of the encoder's application order
        upsampling_ratios=tuple(reversed(ratios_enc_order)),
        hidden=hidden,
        n_layers=len(tf_layers),
        n_heads=n_heads,
        n_kv_heads=n_kv,
        head_dim=head_dim,
        ffn=ffn,
        norm_eps=float(hf.get("norm_eps", 1e-5)),
        rope_theta=float(hf.get("rope_theta", 10_000.0)),
        sliding_window=(
            int(hf["sliding_window"])
            if hf.get("sliding_window") is not None else None
        ),
        frame_div=frame_div,
        codebook_size=cb_size,
        codebook_dim=cb_dim,
        num_quantizers=sem_books + ac_books,
        num_semantic_quantizers=max(1, sem_books),
        quant_input_proj=has_in_proj,
        sampling_rate=int(hf.get("sampling_rate", 24_000)),
    )


def import_speech_tokenizer(
    tensors: dict[str, np.ndarray], cfg: SpeechTokenizerConfig,
    unmapped: list[str],
) -> tuple[Params, int]:
    """Map Mimi-layout ``speech_tokenizer.*`` tensors (prefix stripped)
    onto a fresh pytree. Returns (params, n_mapped); names that don't fit
    land in ``unmapped`` prefixed ``speech_tokenizer:``."""
    params = init_speech_tokenizer(cfg)
    count = 0
    eps = 1e-5

    # encoder conv index map: conv_in, per-stage [res..., down], conv_out
    n_stages = len(cfg.upsampling_ratios)
    per_stage = cfg.num_residual_layers + 2          # res..., ELU, down
    def enc_slot(li: int):
        if li == 0:
            return params["enc"]["conv_in"], None
        last_idx = 1 + n_stages * per_stage + 1
        if li == last_idx:
            return params["enc"]["conv_out"], None
        stage, off = divmod(li - 1, per_stage)
        if stage >= n_stages:
            return None, None
        if off < cfg.num_residual_layers:
            return None, (stage, off)                # a resnet block module
        if off == cfg.num_residual_layers + 1:
            return params["enc"]["stages"][stage]["down"], None
        return None, None                            # the ELU slot

    # group cluster_usage with embed_sum so codebooks normalise correctly
    usage: dict[tuple[str, int], np.ndarray] = {}
    for name, arr in tensors.items():
        m = _QUANT.match(name)
        if m:
            cm = _CB.match(m.group(2))
            if cm and cm.group(2) == "cluster_usage":
                usage[(m.group(1), int(cm.group(1)))] = np.asarray(arr)

    def put(slot: dict, key: str, arr: np.ndarray, name: str) -> None:
        nonlocal count
        if key in slot and np.shape(slot[key]) == np.shape(arr):
            slot[key] = np.asarray(arr, np.float32)
            count += 1
        else:
            unmapped.append(f"speech_tokenizer:{name} (shape mismatch)")

    tf_key = {
        "self_attn.q_proj.weight": "q", "self_attn.k_proj.weight": "k",
        "self_attn.v_proj.weight": "v", "self_attn.o_proj.weight": "o",
        "mlp.fc1.weight": "fc1", "mlp.fc2.weight": "fc2",
    }
    tf_vec = {
        "input_layernorm.weight": "ln1_w", "input_layernorm.bias": "ln1_b",
        "post_attention_layernorm.weight": "ln2_w",
        "post_attention_layernorm.bias": "ln2_b",
        "self_attn_layer_scale.scale": "scale_attn",
        "mlp_layer_scale.scale": "scale_mlp",
    }

    for name in sorted(tensors):
        arr = np.asarray(tensors[name])
        m = _ENC_CONV.match(name)
        if m:
            slot, _ = enc_slot(int(m.group(1)))
            if slot is None:
                unmapped.append(f"speech_tokenizer:{name} (no slot)")
            else:
                put(slot, "w" if m.group(2) == "weight" else "b", arr, name)
            continue
        m = _ENC_RES.match(name)
        if m:
            _, res_pos = enc_slot(int(m.group(1)))
            if res_pos is None:
                unmapped.append(f"speech_tokenizer:{name} (no slot)")
                continue
            stage, j = res_pos
            blk = params["enc"]["stages"][stage]["res"][j]
            sub = blk["c1"] if m.group(2) == "1" else blk["c2"]
            put(sub, "w" if m.group(3) == "weight" else "b", arr, name)
            continue
        m = _TF.match(name)
        if m:
            li, rest = int(m.group(1)), m.group(2)
            if li >= cfg.n_layers:
                unmapped.append(f"speech_tokenizer:{name} (layer oob)")
                continue
            blk = params["tf"][li]
            if rest in tf_key:
                # torch Linear [out, in] -> x @ w layout [in, out]
                put(blk[tf_key[rest]], "w", arr.T, name)
            elif rest in tf_vec:
                if np.shape(blk[tf_vec[rest]]) == np.shape(arr):
                    blk[tf_vec[rest]] = np.asarray(arr, np.float32)
                    count += 1
                else:
                    unmapped.append(
                        f"speech_tokenizer:{name} (shape mismatch)"
                    )
            elif "rotary_emb" in rest:
                count += 1                           # derived, not stored
            else:
                unmapped.append(f"speech_tokenizer:{name} (no mapping)")
            continue
        if name in ("downsample.conv.weight",):
            if "down" in params:
                put(params["down"], "w", arr, name)
            else:
                unmapped.append(f"speech_tokenizer:{name} (no downsample)")
            continue
        m = _QUANT.match(name)
        if m:
            fam = "sem" if m.group(1) == "semantic" else "ac"
            q = params["quant"][fam]
            rest = m.group(2)
            if rest == "input_proj.weight":          # conv1x1 [D, H, 1]
                put(q["in_proj"], "w", arr[..., 0].T, name)
                continue
            if rest == "output_proj.weight":
                count += 1                           # decode-side, unused
                continue
            cm = _CB.match(rest)
            if cm:
                bi, kind = int(cm.group(1)), cm.group(2)
                if bi >= len(q["codebooks"]):
                    unmapped.append(f"speech_tokenizer:{name} (book oob)")
                elif kind in ("embed_sum", "embed"):
                    cb = np.asarray(arr, np.float32)
                    if kind == "embed_sum":
                        u = usage.get((m.group(1), bi))
                        if u is not None:
                            cb = cb / np.clip(u, eps, None)[:, None]
                    if np.shape(q["codebooks"][bi]) == np.shape(cb):
                        q["codebooks"][bi] = cb
                        count += 1
                    else:
                        unmapped.append(
                            f"speech_tokenizer:{name} (shape mismatch)"
                        )
                else:
                    count += 1                       # usage/init markers
                continue
            unmapped.append(f"speech_tokenizer:{name} (no mapping)")
            continue
        if name.startswith(("decoder.", "decoder_transformer.", "upsample.")):
            count += 1  # decode-side half of a full-codec package: the
            # engine decodes through code2wav/rvq; consumed silently
            continue
        unmapped.append(f"speech_tokenizer:{name} (no mapping)")

    return params, count
