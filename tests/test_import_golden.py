"""Golden numeric fixture for checkpoint-import fidelity (BASELINE.md
"bit-comparable" row, VERDICT.md next #5).

Fabricates an MLX-layout checkpoint with known quantized values, imports it
through the production path (``import_hf_checkpoint`` -> uint32 unpack ->
affine dequant -> pytree), runs ``talker_forward`` — and checks the logits
against an INDEPENDENT numpy float64 re-implementation of the architecture
(rotate-half RoPE, per-head QK RMSNorm, GQA, SwiGLU) computed straight from
the fabricated dense weights. Nothing in the reference chain touches the
production code paths, so a mapping/packing/dequant bug anywhere shows up as
a numeric mismatch here.
"""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from qwen3_tts_tpu.engine import configs  # noqa: E402
from qwen3_tts_tpu.engine.weights import import_hf_checkpoint  # noqa: E402
from qwen3_tts_tpu.models.layers import rope_tables  # noqa: E402
from qwen3_tts_tpu.models.talker import talker_forward  # noqa: E402


# --------------------------------------------------------------------------
# independent numpy reference (float64)
# --------------------------------------------------------------------------

def _np_rms(x, w, eps):
    var = (x * x).mean(-1, keepdims=True)
    return x / np.sqrt(var + eps) * w


def _np_rope(x, positions, theta):
    """Rotate-half RoPE on [T, H, hd]."""
    half = x.shape[-1] // 2
    inv = 1.0 / theta ** (np.arange(half, dtype=np.float64) / half)
    freqs = np.outer(positions, inv)
    c = np.cos(freqs)[:, None, :]
    s = np.sin(freqs)[:, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    return np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def _np_silu(x):
    return x / (1.0 + np.exp(-x))


def _np_softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def _np_talker_forward(W, t, tokens):
    """Dense float64 forward over the fabricated weights dict W (HF names)."""
    x = W["model.embed_tokens.weight"][tokens]          # [T, D]
    T = len(tokens)
    positions = np.arange(T)
    hd = t.head_dim
    groups = t.n_heads // t.n_kv_heads
    for i in range(t.n_layers):
        p = f"model.layers.{i}"
        pre = _np_rms(x, W[f"{p}.input_layernorm.weight"], t.rms_eps)
        q = (pre @ W[f"{p}.self_attn.q_proj"].T).reshape(T, t.n_heads, hd)
        k = (pre @ W[f"{p}.self_attn.k_proj"].T).reshape(T, t.n_kv_heads, hd)
        v = (pre @ W[f"{p}.self_attn.v_proj"].T).reshape(T, t.n_kv_heads, hd)
        q = _np_rms(q, W[f"{p}.self_attn.q_norm.weight"], t.rms_eps)
        k = _np_rms(k, W[f"{p}.self_attn.k_norm.weight"], t.rms_eps)
        q = _np_rope(q, positions, t.rope_theta)
        k = _np_rope(k, positions, t.rope_theta)
        qg = q.reshape(T, t.n_kv_heads, groups, hd)
        scores = np.einsum("thgd,shd->hgts", qg, k) * (hd ** -0.5)
        mask = np.tril(np.ones((T, T), bool))
        scores = np.where(mask[None, None], scores, -np.inf)
        probs = _np_softmax(scores, axis=-1)
        ctx = np.einsum("hgts,shd->thgd", probs, v).reshape(T, t.n_heads * hd)
        x = x + ctx @ W[f"{p}.self_attn.o_proj"].T
        pre2 = _np_rms(x, W[f"{p}.post_attention_layernorm.weight"], t.rms_eps)
        gate = pre2 @ W[f"{p}.mlp.gate_proj"].T
        up = pre2 @ W[f"{p}.mlp.up_proj"].T
        x = x + (_np_silu(gate) * up) @ W[f"{p}.mlp.down_proj"].T
    h = _np_rms(x, W["model.norm.weight"], t.rms_eps)
    return h @ W["lm_head"].T                            # [T, codec_vocab]


# --------------------------------------------------------------------------
# fixture: MLX-packed checkpoint with non-trivial values everywhere
# --------------------------------------------------------------------------

def _write_golden_checkpoint(path, cfg, seed=23):
    from safetensors.numpy import save_file

    from qwen3_tts_tpu.ops.quant import dequantize, quantize_weights

    t = cfg.talker
    gs = cfg.quant.group_size
    rng = np.random.default_rng(seed)
    tensors = {}
    dense = {}

    def pack(base, out_dim, in_dim):
        w = rng.normal(0, 0.08, (out_dim, in_dim)).astype(np.float32)
        qp = quantize_weights(w, group_size=gs, bits=8)
        codes = qp["q"].astype(np.uint32)
        packed = (
            codes.reshape(out_dim, in_dim // 4, 4)
            * (1 << (8 * np.arange(4, dtype=np.uint32)))
        ).sum(axis=-1, dtype=np.uint32)
        tensors[f"{base}.weight"] = packed
        tensors[f"{base}.scales"] = qp["scale"]
        tensors[f"{base}.biases"] = qp["bias"]
        # the reference forward uses the ROUND-TRIPPED dense weights — the
        # quantization grid itself is the fixture's ground truth
        dense[base] = np.asarray(dequantize(qp, jnp.float32), np.float64)

    def norm(name, dim):
        w = rng.uniform(0.5, 1.5, dim).astype(np.float32)
        tensors[name] = w
        dense[name] = w.astype(np.float64)

    emb = rng.normal(0, 0.3, (t.vocab_size, t.hidden)).astype(np.float32)
    tensors["model.embed_tokens.weight"] = emb
    dense["model.embed_tokens.weight"] = emb.astype(np.float64)
    tensors["codec_embedding.weight"] = rng.normal(
        0, 0.3, (t.codec_vocab, t.hidden)
    ).astype(np.float32)
    norm("model.norm.weight", t.hidden)
    pack("lm_head", t.codec_vocab, t.hidden)
    for i in range(t.n_layers):
        p = f"model.layers.{i}"
        pack(f"{p}.self_attn.q_proj", t.q_dim, t.hidden)
        pack(f"{p}.self_attn.k_proj", t.kv_dim, t.hidden)
        pack(f"{p}.self_attn.v_proj", t.kv_dim, t.hidden)
        pack(f"{p}.self_attn.o_proj", t.hidden, t.q_dim)
        pack(f"{p}.mlp.gate_proj", t.ffn, t.hidden)
        pack(f"{p}.mlp.up_proj", t.ffn, t.hidden)
        pack(f"{p}.mlp.down_proj", t.hidden, t.ffn)
        norm(f"{p}.self_attn.q_norm.weight", t.head_dim)
        norm(f"{p}.self_attn.k_norm.weight", t.head_dim)
        norm(f"{p}.input_layernorm.weight", t.hidden)
        norm(f"{p}.post_attention_layernorm.weight", t.hidden)

    os.makedirs(path, exist_ok=True)
    save_file(tensors, os.path.join(path, "model.safetensors"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(
            {
                "vocab_size": t.vocab_size,
                "hidden_size": t.hidden,
                "num_hidden_layers": t.n_layers,
                "num_attention_heads": t.n_heads,
                "num_key_value_heads": t.n_kv_heads,
                "head_dim": t.head_dim,
                "intermediate_size": t.ffn,
                "rope_theta": t.rope_theta,
                "rms_norm_eps": t.rms_eps,
                "codec_vocab_size": t.codec_vocab,
                "codec_bos_token_id": t.codec_bos,
                "codec_eos_token_id": t.codec_eos,
                "codec_pad_token_id": t.codec_pad,
                "quantization": {"bits": 8, "group_size": gs},
            },
            f,
        )
    return dense


def test_imported_checkpoint_matches_numpy_reference(temp_dir):
    cfg = configs.tiny("custom", quant=True)
    t = cfg.talker
    path = os.path.join(temp_dir, "golden")
    dense = _write_golden_checkpoint(path, cfg)

    with pytest.warns(UserWarning):  # codec/cp absent by design
        model = import_hf_checkpoint(path, allow_partial=True)

    tokens = np.array([3, 1, 4, 1, 5, 9, 2, 6], dtype=np.int32)
    expected = _np_talker_forward(dense, t, tokens)

    # production forward: fp32 embeddings keep the whole path in fp32
    emb = jnp.take(
        jnp.asarray(model.params["text_emb"]), jnp.asarray(tokens), axis=0
    )[None]
    S = len(tokens)
    ck = jnp.zeros((t.n_layers, 1, S, t.n_kv_heads, t.head_dim), jnp.float32)
    cv = jnp.zeros_like(ck)
    cos, sin = rope_tables(S, t.head_dim, t.rope_theta)
    _, logits, _, _ = talker_forward(
        model.params, t, emb, ck, cv, jnp.int32(0), cos, sin
    )
    got = np.asarray(logits[0], np.float64)

    assert got.shape == expected.shape == (len(tokens), t.codec_vocab)
    np.testing.assert_allclose(got, expected, atol=5e-4, rtol=5e-4)
    # and they genuinely vary (not trivially zero/constant)
    assert np.std(expected) > 1e-3
