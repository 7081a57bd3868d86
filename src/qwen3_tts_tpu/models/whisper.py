"""TPU-native Whisper-class ASR: the on-TPU transcription provider.

The reference delegates transcription to the macOS Speech framework
(`/root/reference/src/qwen3_tts/transcription.py:27-84`). SURVEY.md §2 maps
that native dependency to "a JAX ASR model run through the same engine" —
this module is that model: a from-scratch JAX implementation of the Whisper
architecture (log-mel frontend, conv-subsampled encoder, KV-cached decoder,
greedy decode under ``lax.scan``) that imports standard HF Whisper
checkpoints (``openai/whisper-tiny`` ... ``large-v3``) and runs on TPU or
CPU. ``transcription.py`` wires it in as the preferred local provider; the
``transformers`` torch pipeline remains as a fallback
(``QWEN3_TTS_ASR_BACKEND=torch``).

TPU-first choices:

- **Static shapes end to end.** Audio pads to the fixed 30 s window
  (480 000 samples → 3 000 mel frames → 1 500 encoder positions), the
  decoder runs a fixed ``max_target_positions``-step ``lax.scan`` with a
  done-mask instead of a data-dependent loop, and every weight matrix is
  used in batched matmul form — one compile per checkpoint.
- **On-device decode loop.** The greedy loop carries token ids, the
  self-attention KV cache, and the done flag as device state; the host
  fetches one packed (tokens, length) tuple per 30 s chunk (the tunnel
  round-trip rule in PERF.md).
- **Layer-stacked scans.** Encoder/decoder layers are stacked pytrees
  scanned with ``lax.scan`` (same pattern as ``models/talker.py``), so
  compile time stays flat in depth.

Numerical parity with ``transformers``' torch implementation is asserted in
``tests/test_whisper.py`` (feature extractor, encoder, decoder logits, and
full greedy decode on a fabricated checkpoint).
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

SAMPLE_RATE = 16_000
N_FFT = 400
HOP = 160
CHUNK_SECONDS = 30
N_SAMPLES = CHUNK_SECONDS * SAMPLE_RATE  # 480_000


@dataclass(frozen=True)
class WhisperConfig:
    d_model: int = 384
    encoder_layers: int = 4
    decoder_layers: int = 4
    n_heads: int = 6
    ffn: int = 1536
    n_mels: int = 80
    max_source_positions: int = 1500
    max_target_positions: int = 448
    vocab_size: int = 51_865
    eos_token_id: int = 50_257
    decoder_start_token_id: int = 50_258

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @staticmethod
    def from_hf(d: dict) -> "WhisperConfig":
        return WhisperConfig(
            d_model=d["d_model"],
            encoder_layers=d["encoder_layers"],
            decoder_layers=d["decoder_layers"],
            n_heads=d["encoder_attention_heads"],
            ffn=d["encoder_ffn_dim"],
            n_mels=d["num_mel_bins"],
            max_source_positions=d["max_source_positions"],
            max_target_positions=d["max_target_positions"],
            vocab_size=d["vocab_size"],
            eos_token_id=d.get("eos_token_id", 50_257),
            decoder_start_token_id=d.get("decoder_start_token_id", 50_258),
        )


# --------------------------------------------------------------------------
# log-mel frontend (matches transformers' WhisperFeatureExtractor: hann
# window, center/reflect STFT, power 2, slaney mel bank, log10, max-8
# floor, (x+4)/4 — feature_extraction_whisper.py in the installed package)
# --------------------------------------------------------------------------

def _hz_to_mel_slaney(f: np.ndarray | float) -> np.ndarray | float:
    """Slaney mel scale: linear below 1 kHz, log above."""
    f = np.asarray(f, dtype=np.float64)
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / (200.0 / 3)
    logstep = math.log(6.4) / 27.0
    return np.where(
        f >= min_log_hz,
        min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
        f / (200.0 / 3),
    )


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / (200.0 / 3)
    logstep = math.log(6.4) / 27.0
    return np.where(
        m >= min_log_mel,
        min_log_hz * np.exp(logstep * (m - min_log_mel)),
        m * (200.0 / 3),
    )


def mel_filters(n_mels: int) -> np.ndarray:
    """[n_freq=201, n_mels] slaney-normalized triangular filter bank —
    the same matrix transformers' mel_filter_bank(norm='slaney',
    mel_scale='slaney') produces (parity-tested)."""
    n_freq = 1 + N_FFT // 2
    fft_freqs = np.linspace(0, SAMPLE_RATE / 2, n_freq)
    mel_pts = np.linspace(
        _hz_to_mel_slaney(0.0), _hz_to_mel_slaney(8000.0), n_mels + 2
    )
    hz_pts = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(hz_pts)
    slopes = hz_pts[None, :] - fft_freqs[:, None]  # [F, n_mels+2]
    down = -slopes[:, :-2] / fdiff[None, :-1]
    up = slopes[:, 2:] / fdiff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    return (fb * enorm[None, :]).astype(np.float32)


@partial(jax.jit, static_argnames=("n_mels",))
def log_mel_spectrogram(audio: jnp.ndarray, n_mels: int = 80) -> jnp.ndarray:
    """[N_SAMPLES] float32 mono 16 kHz → [3000, n_mels] log-mel features.

    Center-padded (reflect) hann STFT at hop 160, power spectrum, mel
    projection, Whisper's log10/floor/affine normalization. The final
    frame of the 3001-frame STFT is dropped (feature extractor parity).
    """
    pad = N_FFT // 2
    x = jnp.pad(audio.astype(jnp.float32), (pad, pad), mode="reflect")
    n_frames = N_SAMPLES // HOP  # 3000 (after dropping the last)
    idx = jnp.arange(n_frames)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    frames = x[idx]  # [T, 400]
    window = 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * jnp.arange(N_FFT) / N_FFT))
    spec = jnp.fft.rfft(frames * window, axis=-1)  # [T, 201]
    power = jnp.abs(spec) ** 2
    mel = power @ jnp.asarray(mel_filters(n_mels))  # [T, n_mels]
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - 8.0)
    return (log_spec + 4.0) / 4.0


def pad_or_trim(audio: np.ndarray) -> np.ndarray:
    """Zero-pad / trim a mono float waveform to the 30 s window."""
    if len(audio) >= N_SAMPLES:
        return audio[:N_SAMPLES]
    return np.pad(audio, (0, N_SAMPLES - len(audio)))


# --------------------------------------------------------------------------
# model blocks
# --------------------------------------------------------------------------

def _layer_norm(x: jnp.ndarray, p: Params, eps: float = 1e-5) -> jnp.ndarray:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["w"] + p["b"]


def _linear(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    y = x @ p["w"].T  # HF stores [out, in]
    if "b" in p:
        y = y + p["b"]
    return y


def _split_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    # [..., T, D] -> [..., n_heads, T, head_dim]
    *lead, T, D = x.shape
    x = x.reshape(*lead, T, n_heads, D // n_heads)
    return jnp.swapaxes(x, -3, -2)


def _attention(
    q: jnp.ndarray,  # [..., H, Tq, hd] (already scaled)
    k: jnp.ndarray,  # [..., H, Tk, hd]
    v: jnp.ndarray,
    mask: jnp.ndarray | None,
) -> jnp.ndarray:
    scores = jnp.einsum("...htd,...hsd->...hts", q, k)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(scores.dtype).min)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("...hts,...hsd->...htd", probs, v)
    return jnp.swapaxes(out, -3, -2)  # [..., Tq, H, hd]


def _mha(
    p: Params,
    x: jnp.ndarray,          # [T, D] query input
    kv: jnp.ndarray,         # [S, D] key/value input
    n_heads: int,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    hd = x.shape[-1] // n_heads
    q = _split_heads(_linear(x, p["q"]) * hd**-0.5, n_heads)
    k = _split_heads(_linear(kv, p["k"]), n_heads)
    v = _split_heads(_linear(kv, p["v"]), n_heads)
    out = _attention(q, k, v, mask)
    return _linear(out.reshape(*x.shape[:-1], -1), p["o"])


def _encoder_layer(p: Params, x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    h = _layer_norm(x, p["ln1"])
    x = x + _mha(p["attn"], h, h, n_heads)
    h = _layer_norm(x, p["ln2"])
    h = _linear(jax.nn.gelu(_linear(h, p["fc1"]), approximate=False),
                p["fc2"])
    return x + h


def encode(params: Params, cfg: WhisperConfig,
           features: jnp.ndarray) -> jnp.ndarray:
    """[3000, n_mels] log-mel → [T_enc, D] encoder states (T_enc=1500)."""
    x = features.T[None]  # [1, n_mels, T] for conv over time
    x = jax.nn.gelu(
        jax.lax.conv_general_dilated(
            x, params["conv1"]["w"], (1,), [(1, 1)],
            dimension_numbers=("NCT", "OIT", "NCT"),
        ) + params["conv1"]["b"][None, :, None],
        approximate=False,
    )
    x = jax.nn.gelu(
        jax.lax.conv_general_dilated(
            x, params["conv2"]["w"], (2,), [(1, 1)],
            dimension_numbers=("NCT", "OIT", "NCT"),
        ) + params["conv2"]["b"][None, :, None],
        approximate=False,
    )
    x = x[0].T  # [T_enc, D]
    x = x + params["enc_pos"][: x.shape[0]]

    def body(h, layer):
        return _encoder_layer(layer, h, cfg.n_heads), None

    x, _ = jax.lax.scan(body, x, params["enc_layers"])
    return _layer_norm(x, params["enc_ln"])


def _decoder_step(
    params: Params,
    cfg: WhisperConfig,
    tok: jnp.ndarray,            # [] int32 current token
    pos: jnp.ndarray,            # [] int32 position
    cache_k: jnp.ndarray,        # [L, T_max, H, hd]
    cache_v: jnp.ndarray,
    cross_k: jnp.ndarray,        # [L, H, T_enc, hd] precomputed
    cross_v: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One greedy decode step; returns (logits, cache_k, cache_v)."""
    x = params["tok_emb"][tok][None]  # [1, D]
    x = x + jax.lax.dynamic_slice(
        params["dec_pos"], (pos, 0), (1, cfg.d_model)
    )
    T_max = cache_k.shape[1]
    attend = (jnp.arange(T_max) <= pos)[None, None, :]  # [1(h), 1(t), S]

    def body(carry, layer):
        x = carry
        lp, ck, cv, xk, xv = layer
        h = _layer_norm(x, lp["ln1"])
        hd = cfg.head_dim
        q = _split_heads(_linear(h, lp["attn"]["q"]) * hd**-0.5,
                         cfg.n_heads)
        k_new = _linear(h, lp["attn"]["k"]).reshape(1, cfg.n_heads, hd)
        v_new = _linear(h, lp["attn"]["v"]).reshape(1, cfg.n_heads, hd)
        ck = jax.lax.dynamic_update_slice(
            ck, k_new.astype(ck.dtype), (pos, 0, 0)
        )
        cv = jax.lax.dynamic_update_slice(
            cv, v_new.astype(cv.dtype), (pos, 0, 0)
        )
        out = _attention(
            q, jnp.swapaxes(ck, 0, 1), jnp.swapaxes(cv, 0, 1), attend
        )
        x = x + _linear(out.reshape(1, -1), lp["attn"]["o"])
        # cross-attention over precomputed encoder K/V
        h = _layer_norm(x, lp["ln_x"])
        qx = _split_heads(_linear(h, lp["xattn"]["q"]) * hd**-0.5,
                          cfg.n_heads)
        out = _attention(qx, xk, xv, None)
        x = x + _linear(out.reshape(1, -1), lp["xattn"]["o"])
        h = _layer_norm(x, lp["ln2"])
        h = _linear(
            jax.nn.gelu(_linear(h, lp["fc1"]), approximate=False), lp["fc2"]
        )
        return x + h, (ck, cv)

    x, (cache_k, cache_v) = jax.lax.scan(
        body, x, (params["dec_layers"], cache_k, cache_v, cross_k, cross_v)
    )
    x = _layer_norm(x, params["dec_ln"])
    logits = (x @ params["tok_emb"].T)[0]  # tied head
    return logits, cache_k, cache_v


def _cross_kv(params: Params, cfg: WhisperConfig,
              enc: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute per-layer cross-attention K/V: [L, H, T_enc, hd]."""

    def one(layer):
        k = _split_heads(_linear(enc, layer["xattn"]["k"]), cfg.n_heads)
        v = _split_heads(_linear(enc, layer["xattn"]["v"]), cfg.n_heads)
        return k, v

    return jax.vmap(one)(params["dec_layers"])


@partial(jax.jit, static_argnames=("cfg", "max_new"))
def greedy_decode(
    params: Params,
    cfg: WhisperConfig,
    features: jnp.ndarray,     # [3000, n_mels]
    prefix: jnp.ndarray,       # [P] int32 forced prefix (sot, lang, ...)
    max_new: int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Transcribe one 30 s window. Returns (tokens [max_new], n_valid).

    The whole loop — prefix teacher-forcing plus generation — is a single
    fixed-length ``lax.scan`` with a done mask, so the compiled graph has
    no data-dependent shapes and the host fetches one result tuple.
    """
    if max_new <= 0:
        max_new = cfg.max_target_positions - int(prefix.shape[0])
    enc = encode(params, cfg, features)
    cross_k, cross_v = _cross_kv(params, cfg, enc)
    P = prefix.shape[0]
    T_max = P + max_new
    L = cfg.decoder_layers
    cache_k = jnp.zeros((L, T_max, cfg.n_heads, cfg.head_dim), enc.dtype)
    cache_v = jnp.zeros_like(cache_k)
    eos = jnp.int32(cfg.eos_token_id)

    def step(carry, pos):
        tok, ck, cv, done = carry
        logits, ck, cv = _decoder_step(
            params, cfg, tok, pos, ck, cv, cross_k, cross_v
        )
        sampled = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        in_prefix = pos + 1 < P
        next_tok = jnp.where(
            in_prefix,
            jax.lax.dynamic_index_in_dim(
                jnp.concatenate([prefix, prefix[-1:]]),
                jnp.minimum(pos + 1, P - 1), keepdims=False,
            ),
            sampled,
        )
        emitted = jnp.where(done | in_prefix, eos, sampled)
        done = done | (~in_prefix & (sampled == eos))
        return (next_tok, ck, cv, done), emitted

    (_, _, _, _), out = jax.lax.scan(
        step,
        (prefix[0], cache_k, cache_v, jnp.bool_(False)),
        jnp.arange(T_max),
    )
    gen = out[P - 1 : P - 1 + max_new]  # tokens emitted after the prefix
    n_valid = jnp.argmax(gen == eos)    # 0 if none hit EOS...
    n_valid = jnp.where(jnp.any(gen == eos), n_valid, max_new)
    return gen, n_valid


# --------------------------------------------------------------------------
# HF checkpoint import
# --------------------------------------------------------------------------

def _to_np(t) -> np.ndarray:
    return np.asarray(t, dtype=np.float32)


def import_hf_whisper(model_dir: str) -> tuple[Params, WhisperConfig]:
    """Load an HF Whisper checkpoint (safetensors or torch .bin) into the
    stacked-pytree layout. Raises FileNotFoundError/KeyError loudly on
    unrecognized layouts — a half-mapped ASR model must never load."""
    with open(os.path.join(model_dir, "config.json")) as fh:
        cfg = WhisperConfig.from_hf(json.load(fh))

    st_path = os.path.join(model_dir, "model.safetensors")
    bin_path = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        raw = {k: np.asarray(v) for k, v in load_file(st_path).items()}
    elif os.path.exists(bin_path):
        import torch

        raw = {
            k: _to_np(v)
            for k, v in torch.load(
                bin_path, map_location="cpu", weights_only=True
            ).items()
        }
    else:
        raise FileNotFoundError(
            f"{model_dir}: no model.safetensors or pytorch_model.bin"
        )
    raw = {k.removeprefix("model."): np.asarray(v, np.float32)
           for k, v in raw.items()}

    def lin(prefix: str) -> Params:
        p = {"w": raw[f"{prefix}.weight"]}
        if f"{prefix}.bias" in raw:
            p["b"] = raw[f"{prefix}.bias"]
        return p

    def attn(prefix: str) -> Params:
        return {
            "q": lin(f"{prefix}.q_proj"),
            "k": lin(f"{prefix}.k_proj"),  # no bias in checkpoints
            "v": lin(f"{prefix}.v_proj"),
            "o": lin(f"{prefix}.out_proj"),
        }

    def ln(prefix: str) -> Params:
        return {"w": raw[f"{prefix}.weight"], "b": raw[f"{prefix}.bias"]}

    def enc_layer(i: int) -> Params:
        p = f"encoder.layers.{i}"
        return {
            "attn": attn(f"{p}.self_attn"),
            "ln1": ln(f"{p}.self_attn_layer_norm"),
            "fc1": lin(f"{p}.fc1"),
            "fc2": lin(f"{p}.fc2"),
            "ln2": ln(f"{p}.final_layer_norm"),
        }

    def dec_layer(i: int) -> Params:
        p = f"decoder.layers.{i}"
        return {
            "attn": attn(f"{p}.self_attn"),
            "ln1": ln(f"{p}.self_attn_layer_norm"),
            "xattn": attn(f"{p}.encoder_attn"),
            "ln_x": ln(f"{p}.encoder_attn_layer_norm"),
            "fc1": lin(f"{p}.fc1"),
            "fc2": lin(f"{p}.fc2"),
            "ln2": ln(f"{p}.final_layer_norm"),
        }

    from .talker import _stack

    params: Params = {
        "conv1": {"w": raw["encoder.conv1.weight"],
                  "b": raw["encoder.conv1.bias"]},
        "conv2": {"w": raw["encoder.conv2.weight"],
                  "b": raw["encoder.conv2.bias"]},
        "enc_pos": raw["encoder.embed_positions.weight"],
        "enc_layers": _stack(
            [enc_layer(i) for i in range(cfg.encoder_layers)]
        ),
        "enc_ln": ln("encoder.layer_norm"),
        "tok_emb": raw["decoder.embed_tokens.weight"],
        "dec_pos": raw["decoder.embed_positions.weight"],
        "dec_layers": _stack(
            [dec_layer(i) for i in range(cfg.decoder_layers)]
        ),
        "dec_ln": ln("decoder.layer_norm"),
    }
    return jax.tree.map(jnp.asarray, params), cfg


# --------------------------------------------------------------------------
# high-level ASR wrapper (what transcription.py's provider calls)
# --------------------------------------------------------------------------

class WhisperASR:
    """One loaded Whisper checkpoint + its tokenizer, ready to transcribe
    WAV files chunk by chunk (30 s windows, sequential carry-less join —
    enrollment references are a few seconds long)."""

    def __init__(self, model_dir: str):
        self.params, self.cfg = import_hf_whisper(model_dir)
        from transformers import AutoTokenizer  # text decoding only

        self.tokenizer = AutoTokenizer.from_pretrained(model_dir)
        self.prefix = self._build_prefix(model_dir)

    def _build_prefix(self, model_dir: str) -> np.ndarray:
        """<|startoftranscript|> [<|lang|> <|transcribe|> <|notimestamps|>]
        — multilingual checkpoints carry the task tokens, English-only ones
        (vocab without them) fall back to just the start token."""
        ids = [self.cfg.decoder_start_token_id]
        lang = os.environ.get("QWEN3_TTS_ASR_LANG", "en")
        for tok_str in (f"<|{lang}|>", "<|transcribe|>", "<|notimestamps|>"):
            tid = self.tokenizer.convert_tokens_to_ids(tok_str)
            if tid is None or tid == getattr(
                self.tokenizer, "unk_token_id", None
            ):
                break
            ids.append(int(tid))
        return np.asarray(ids, np.int32)

    @staticmethod
    def _device():
        """Where to run ASR. The TTS engine usually owns the accelerator's
        HBM in the same process (one big-cache engine per process — the
        HBM rule in CLAUDE.md), so QWEN3_TTS_ASR_DEVICE=cpu pins this
        side-model to host compute; default is the platform default."""
        if os.environ.get("QWEN3_TTS_ASR_DEVICE", "auto") == "cpu":
            return jax.devices("cpu")[0]
        return None

    def transcribe_array(
        self, audio: np.ndarray, rate: int, *, max_new: int = 224
    ) -> str:
        """Mono float waveform → text."""
        from ..audio import resample

        if rate != SAMPLE_RATE:
            audio = resample(audio.astype(np.float32), rate, SAMPLE_RATE)
        audio = np.asarray(audio, np.float32)
        texts = []
        n_chunks = max(1, math.ceil(len(audio) / N_SAMPLES))
        import contextlib

        dev = self._device()
        ctx = jax.default_device(dev) if dev is not None \
            else contextlib.nullcontext()
        with ctx:
            for c in range(n_chunks):
                window = pad_or_trim(
                    audio[c * N_SAMPLES : (c + 1) * N_SAMPLES]
                )
                feats = log_mel_spectrogram(
                    jnp.asarray(window), self.cfg.n_mels
                )
                toks, n = greedy_decode(
                    self.params, self.cfg, feats,
                    jnp.asarray(self.prefix), max_new=max_new,
                )
                ids = np.asarray(toks)[: int(n)]
                texts.append(
                    self.tokenizer.decode(
                        ids, skip_special_tokens=True
                    ).strip()
                )
        return " ".join(t for t in texts if t).strip()

    def transcribe_wav(self, wav_path: str) -> str:
        from ..audio import read_wav
        from ..audio.wavio import to_mono

        data, rate = read_wav(wav_path)
        mono = to_mono(data)
        if mono.dtype.kind in "iu":
            mono = mono.astype(np.float32) / 32768.0
        return self.transcribe_array(mono, rate)
