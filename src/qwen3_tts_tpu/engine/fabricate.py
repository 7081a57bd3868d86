"""Fabricate checkpoint snapshots in the layouts the importer consumes.

The reference framework never needs this — it downloads real MLX
snapshots and trusts mlx_audio's loader (reference io.py:111-112). Here
the loader is ours, and this environment has no real weights, so a
faithful fabricated snapshot (uint32-packed MLX-quantized linears +
dense norms/embeddings + per-component config.json sections) is the
backbone of the import tests AND of the offline dress rehearsal: it
exercises the exact tensor-name mapping, dequantization, and config
plumbing a real download would, end-to-end, without network access.

Used by tests/test_weights.py (golden import fixtures), by
tools/dress_rehearsal.py --fabricate, and by bench.py's dress-rehearsal
block (driver-visible PASS/WARN/FAIL counts each round).
"""

from __future__ import annotations

import json
import os

import numpy as np


def hf_config_dict(cfg) -> dict:
    """config.json content describing ALL THREE components of ``cfg`` the
    way a real snapshot would (per-component sections)."""
    t, cp, cc = cfg.talker, cfg.code_predictor, cfg.codec
    return {
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
        "num_speakers": t.n_speakers,
        "code_predictor_config": {
            "hidden_size": cp.hidden,
            "num_hidden_layers": cp.n_layers,
            "num_attention_heads": cp.n_heads,
            "head_dim": cp.head_dim,
            "intermediate_size": cp.ffn,
            "rms_norm_eps": cp.rms_eps,
            "rope_theta": cp.rope_theta,
        },
        "codec_config": {
            "sample_rate": cc.sample_rate,
            "frame_rate": cc.frame_rate,
            "num_codebooks": cc.num_codebooks,
            "codebook_size": cc.codebook_size,
            "residual_codebook_size": cc.residual_codebook_size,
            "latent_dim": cc.latent_dim,
            "upsample_rates": list(cc.upsample_rates),
            "decoder_channels": list(cc.decoder_channels),
            "decoder_kernel": cc.decoder_kernel,
            "n_transformer_layers": cc.n_transformer_layers,
            "transformer_heads": cc.transformer_heads,
        },
        "quantization": {"bits": 8, "group_size": cfg.quant.group_size},
    }


def add_cp_tensors(tensors: dict, cfg, rng) -> None:
    """Qwen-style code-predictor tensors under the code_predictor. prefix
    (dense fp32; the importer re-quantizes to match quantized init
    slots)."""
    cp, t, cc = cfg.code_predictor, cfg.talker, cfg.codec
    q_dim = cp.n_heads * cp.head_dim
    n_res = cc.num_codebooks - 1

    def lin(name, o, i):
        tensors[f"code_predictor.{name}.weight"] = rng.normal(
            0, 0.05, (o, i)
        ).astype(np.float32)

    lin("in_proj", cp.hidden, t.hidden)
    tensors["code_predictor.cb0_embedding.weight"] = rng.normal(
        0, 0.02, (cc.codebook_size, cp.hidden)
    ).astype(np.float32)
    tensors["code_predictor.res_embedding.weight"] = rng.normal(
        0, 0.02, (n_res, cc.residual_codebook_size, cp.hidden)
    ).astype(np.float32)
    tensors["code_predictor.heads.weight"] = rng.normal(
        0, 0.02, (n_res, cc.residual_codebook_size, cp.hidden)
    ).astype(np.float32)
    tensors["code_predictor.norm.weight"] = np.ones(cp.hidden, np.float32)
    for i in range(cp.n_layers):
        lin(f"layers.{i}.self_attn.q_proj", q_dim, cp.hidden)
        lin(f"layers.{i}.self_attn.k_proj", q_dim, cp.hidden)
        lin(f"layers.{i}.self_attn.v_proj", q_dim, cp.hidden)
        lin(f"layers.{i}.self_attn.o_proj", cp.hidden, q_dim)
        lin(f"layers.{i}.mlp.gate_proj", cp.ffn, cp.hidden)
        lin(f"layers.{i}.mlp.up_proj", cp.ffn, cp.hidden)
        lin(f"layers.{i}.mlp.down_proj", cp.hidden, cp.ffn)
        p = f"code_predictor.layers.{i}"
        tensors[f"{p}.self_attn.q_norm.weight"] = np.ones(
            cp.head_dim, np.float32
        )
        tensors[f"{p}.self_attn.k_norm.weight"] = np.ones(
            cp.head_dim, np.float32
        )
        tensors[f"{p}.input_layernorm.weight"] = np.ones(
            cp.hidden, np.float32
        )
        tensors[f"{p}.post_attention_layernorm.weight"] = np.ones(
            cp.hidden, np.float32
        )


def add_codec_tensors(tensors: dict, cfg, seed: int) -> None:
    """Codec tensors as dotted native paths under the codec. prefix —
    exactly the geometry init_codec builds from config.json's codec
    section."""
    from .weights import flatten_tree
    from ..models.codec import init_codec

    codec = init_codec(cfg, seed=seed)
    for path, arr in flatten_tree(codec).items():
        tensors["codec." + path.replace("/", ".")] = np.asarray(
            arr, dtype=np.float32
        )


def write_mlx_style_checkpoint(path: str, cfg, seed: int = 11,
                               full: bool = False, extra_tensors=None,
                               config_extra=None):
    """Synthesize an MLX-layout talker checkpoint (uint32-packed quantized
    linears + dense norms/embeddings) and return (tensors, dense) where
    ``dense`` holds the dequantized weights used. ``full=True`` adds
    codec + code-predictor tensors so the import needs no synthetic
    fallback at all. ``extra_tensors``/``config_extra`` merge additional
    tensors / config.json keys (protocol-evidence tests)."""
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from ..ops.quant import dequantize, quantize_weights

    t = cfg.talker
    rng = np.random.default_rng(seed)
    gs = cfg.quant.group_size
    tensors: dict = {}
    dense: dict = {}

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
        tensors[f"{p}.self_attn.q_norm.weight"] = np.ones(
            t.head_dim, np.float32
        )
        tensors[f"{p}.self_attn.k_norm.weight"] = np.ones(
            t.head_dim, np.float32
        )
        tensors[f"{p}.input_layernorm.weight"] = np.ones(t.hidden, np.float32)
        tensors[f"{p}.post_attention_layernorm.weight"] = np.ones(
            t.hidden, np.float32
        )

    if full:
        tensors["speaker_embedding.weight"] = rng.normal(
            0, 0.02, (t.n_speakers, t.hidden)
        ).astype(np.float32)
        add_cp_tensors(tensors, cfg, rng)
        add_codec_tensors(tensors, cfg, seed + 5)

    if extra_tensors:
        tensors.update(extra_tensors)
    hf = hf_config_dict(cfg)
    if config_extra:
        hf.update(config_extra)
    os.makedirs(path, exist_ok=True)
    save_file(tensors, os.path.join(path, "model.safetensors"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf, f)
    return tensors, dense


def fabricate_full_checkpoint(path: str, *, seed: int = 11,
                              template: bool = True) -> str:
    """Write a complete tiny quantized 3-component snapshot (talker + code
    predictor + codec) plus prompt-template files — the offline stand-in
    for a real download, consumed by the dress rehearsal
    (tools/dress_rehearsal.py) and bench.py's per-round checklist."""
    from .configs import tiny

    cfg = tiny("custom", quant=True)
    write_mlx_style_checkpoint(path, cfg, seed=seed, full=True)
    if template:
        with open(os.path.join(path, "tts_prompts.json"), "w") as f:
            json.dump({
                "custom": "<|instruct|>{instruct}<|/instruct|>{text}",
                "design": "<|voice|>{instruct}<|/voice|>{text}",
                "base": "<|ref|>{ref_text}<|/ref|>{text}",
            }, f)
    return path
