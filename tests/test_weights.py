"""Checkpoint save/load: native round-trip and HF/MLX import.

The reference trusts mlx_audio's loader entirely (reference io.py:111-112);
here the loader is ours, so it gets the numeric tests the reference never
needed: an imported checkpoint must produce the same logits as the source
weights (SURVEY.md §4 "implication for the TPU build").
"""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from qwen3_tts_tpu.engine import configs  # noqa: E402
from qwen3_tts_tpu.engine.api import Qwen3TTSModel, load_model  # noqa: E402
from qwen3_tts_tpu.engine.weights import (  # noqa: E402
    config_from_dict,
    config_to_dict,
    flatten_tree,
    import_hf_checkpoint,
    load_checkpoint,
    save_model,
    unflatten_tree,
)
from qwen3_tts_tpu.models.talker import talker_forward  # noqa: E402
from qwen3_tts_tpu.models.layers import rope_tables  # noqa: E402


def _logits_fingerprint(model, tokens=(3, 7, 11)):
    """Deterministic forward over a fixed token prompt -> prefill logits."""
    cfg = model.cfg
    t = cfg.talker
    emb = jnp.take(
        jnp.asarray(model.params["text_emb"]),
        jnp.asarray(tokens, dtype=jnp.int32),
        axis=0,
    )[None]
    S = 32
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    ck = jnp.zeros((t.n_layers, 1, S, t.n_kv_heads, t.head_dim), dtype)
    cv = jnp.zeros_like(ck)
    cos, sin = rope_tables(S, t.head_dim, t.rope_theta)
    _, logits, _, _ = talker_forward(
        model.params, t, emb, ck, cv, jnp.int32(0), cos, sin
    )
    return np.asarray(logits[0, -1])


def test_flatten_unflatten_roundtrip():
    tree = {
        "a": np.arange(4.0),
        "b": {"c": np.ones((2, 2)), "d": [np.zeros(3), np.ones(3)]},
    }
    flat = flatten_tree(tree)
    assert set(flat) == {"a", "b/c", "b/d/0", "b/d/1"}
    back = unflatten_tree(flat)
    np.testing.assert_array_equal(back["b"]["d"][1], np.ones(3))


def test_config_dict_roundtrip():
    cfg = configs.tiny("design", quant=True)
    back = config_from_dict(json.loads(json.dumps(config_to_dict(cfg))))
    assert back == cfg


def test_native_save_load_roundtrip(temp_dir):
    cfg = configs.tiny("custom", quant=True)
    model = Qwen3TTSModel.synthetic(cfg, seed=3)
    ref = _logits_fingerprint(model)

    path = os.path.join(temp_dir, "ckpt")
    save_model(model, path)
    loaded = load_model(path)
    assert loaded.cfg == cfg
    np.testing.assert_allclose(_logits_fingerprint(loaded), ref, atol=1e-5)


def _write_mlx_style_checkpoint(path, cfg, seed=11):
    """Synthesize an MLX-layout talker checkpoint (uint32-packed quantized
    linears + dense norms/embeddings) and return the dense weights used."""
    from safetensors.numpy import save_file

    from qwen3_tts_tpu.ops.quant import dequantize, quantize_weights

    t = cfg.talker
    rng = np.random.default_rng(seed)
    gs = cfg.quant.group_size
    tensors = {}
    dense = {}

    def pack_linear(base, out_dim, in_dim):
        w = rng.normal(0, 0.05, (out_dim, in_dim)).astype(np.float32)
        qp = quantize_weights(w, group_size=gs, bits=8)
        codes = qp["q"].astype(np.uint32)
        packed = (
            codes.reshape(out_dim, in_dim // 4, 4)
            * (1 << (8 * np.arange(4, dtype=np.uint32)))
        ).sum(axis=-1, dtype=np.uint32)
        tensors[f"{base}.weight"] = packed
        tensors[f"{base}.scales"] = qp["scale"]
        tensors[f"{base}.biases"] = qp["bias"]
        dense[base] = np.asarray(dequantize(qp, jnp.float32))

    tensors["model.embed_tokens.weight"] = rng.normal(
        0, 0.02, (t.vocab_size, t.hidden)
    ).astype(np.float32)
    tensors["codec_embedding.weight"] = rng.normal(
        0, 0.02, (t.codec_vocab, t.hidden)
    ).astype(np.float32)
    tensors["model.norm.weight"] = np.ones(t.hidden, np.float32)
    pack_linear("lm_head", t.codec_vocab, t.hidden)
    for i in range(t.n_layers):
        p = f"model.layers.{i}"
        pack_linear(f"{p}.self_attn.q_proj", t.q_dim, t.hidden)
        pack_linear(f"{p}.self_attn.k_proj", t.kv_dim, t.hidden)
        pack_linear(f"{p}.self_attn.v_proj", t.kv_dim, t.hidden)
        pack_linear(f"{p}.self_attn.o_proj", t.hidden, t.q_dim)
        pack_linear(f"{p}.mlp.gate_proj", t.ffn, t.hidden)
        pack_linear(f"{p}.mlp.up_proj", t.ffn, t.hidden)
        pack_linear(f"{p}.mlp.down_proj", t.hidden, t.ffn)
        tensors[f"{p}.self_attn.q_norm.weight"] = np.ones(t.head_dim, np.float32)
        tensors[f"{p}.self_attn.k_norm.weight"] = np.ones(t.head_dim, np.float32)
        tensors[f"{p}.input_layernorm.weight"] = np.ones(t.hidden, np.float32)
        tensors[f"{p}.post_attention_layernorm.weight"] = np.ones(
            t.hidden, np.float32
        )

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
                "quantization": {"bits": 8, "group_size": gs},
            },
            f,
        )
    return tensors, dense


@pytest.fixture
def tiny_hf_ckpt(temp_dir):
    cfg = configs.tiny("custom", quant=True)
    # the importer reads architecture dims from config.json but keeps the
    # flagship codec/control-token defaults, so give it the real flagship
    # talker dims scaled down via config.json overrides below
    path = os.path.join(temp_dir, "hf_ckpt")
    tensors, dense = _write_mlx_style_checkpoint(path, cfg)
    return path, cfg, tensors, dense


def test_hf_import_maps_quantized_linears(tiny_hf_ckpt):
    path, cfg, tensors, dense = tiny_hf_ckpt
    with pytest.warns(UserWarning):
        # codec/code-predictor tensors absent -> import warns (by design)
        model = import_hf_checkpoint(path)
    # embeddings mapped exactly
    np.testing.assert_array_equal(
        np.asarray(model.params["text_emb"], dtype=np.float32),
        tensors["model.embed_tokens.weight"],
    )
    # quantized linear mapped losslessly: codes+scales round-trip
    from qwen3_tts_tpu.ops.quant import dequantize

    got = np.asarray(
        dequantize(
            jax.tree.map(
                lambda x: np.asarray(x)[0],
                {
                    "q": model.params["blocks"]["attn"]["q"]["q"],
                    "scale": model.params["blocks"]["attn"]["q"]["scale"],
                    "bias": model.params["blocks"]["attn"]["q"]["bias"],
                },
            ),
            jnp.float32,
        )
    )
    np.testing.assert_allclose(
        got, dense["model.layers.0.self_attn.q_proj"], atol=1e-6
    )


def test_hf_import_config_from_json(tiny_hf_ckpt):
    path, cfg, _, _ = tiny_hf_ckpt
    with pytest.warns(UserWarning):
        model = import_hf_checkpoint(path)
    assert model.cfg.talker.hidden == cfg.talker.hidden
    assert model.cfg.talker.n_layers == cfg.talker.n_layers
    assert model.cfg.quant.group_size == cfg.quant.group_size


def test_load_checkpoint_caches_native(tiny_hf_ckpt):
    path, _, _, _ = tiny_hf_ckpt
    with pytest.warns(UserWarning):
        m1 = load_checkpoint(path)
    assert os.path.exists(os.path.join(path, "_tpu_native", "tts_config.json"))
    m2 = load_checkpoint(path)  # second load: from native cache, no warning
    np.testing.assert_allclose(
        _logits_fingerprint(m1), _logits_fingerprint(m2), atol=1e-5
    )
