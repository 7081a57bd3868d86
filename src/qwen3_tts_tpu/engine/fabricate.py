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


def speech_tokenizer_tensors(cfg, seed: int = 13) -> tuple[dict, dict]:
    """Mimi-layout ``speech_tokenizer.*`` tensors whose code space matches
    ``cfg.codec``, plus the ``speech_tokenizer_config`` section for
    config.json. Geometry is a scaled-down Mimi (4-stage SEANet at
    ~12.5 Hz): with these in the fabricated snapshot the offline dress
    rehearsal exercises the REAL ST import + clone-encode path (family=
    mimi, fully mapped) instead of WARNing about an absent encoder
    (VERDICT r4 #8). Names/layouts mirror the torch ``MimiModel``
    state_dict the importer maps (models/speech_tokenizer.py)."""
    from ..models.speech_tokenizer import (
        SpeechTokenizerConfig,
        init_speech_tokenizer,
    )

    cc = cfg.codec
    st = SpeechTokenizerConfig(
        num_filters=4, upsampling_ratios=(8, 6, 5, 4), hidden=32,
        n_layers=2, n_heads=2, n_kv_heads=2, head_dim=16, ffn=64,
        codebook_size=cc.codebook_size, codebook_dim=16,
        num_quantizers=cc.num_codebooks, num_semantic_quantizers=1,
        frame_div=2, sampling_rate=cc.sample_rate,
    )
    p = init_speech_tokenizer(st, seed=seed)
    out: dict = {}
    pre = "speech_tokenizer."

    def conv(idx: int, sub: dict) -> None:
        out[f"{pre}encoder.layers.{idx}.conv.weight"] = sub["w"]
        if "b" in sub:
            out[f"{pre}encoder.layers.{idx}.conv.bias"] = sub["b"]

    conv(0, p["enc"]["conv_in"])
    per_stage = st.num_residual_layers + 2  # res..., ELU, down
    for s, stage in enumerate(p["enc"]["stages"]):
        base = 1 + s * per_stage
        for j, blk in enumerate(stage["res"]):
            for tag, c in (("1", blk["c1"]), ("3", blk["c2"])):
                nm = f"{pre}encoder.layers.{base + j}.block.{tag}.conv"
                out[nm + ".weight"] = c["w"]
                out[nm + ".bias"] = c["b"]
        conv(base + st.num_residual_layers + 1, stage["down"])
    conv(1 + len(p["enc"]["stages"]) * per_stage + 1, p["enc"]["conv_out"])

    lin = {"q": "self_attn.q_proj", "k": "self_attn.k_proj",
           "v": "self_attn.v_proj", "o": "self_attn.o_proj",
           "fc1": "mlp.fc1", "fc2": "mlp.fc2"}
    vec = {"ln1_w": "input_layernorm.weight",
           "ln1_b": "input_layernorm.bias",
           "ln2_w": "post_attention_layernorm.weight",
           "ln2_b": "post_attention_layernorm.bias",
           "scale_attn": "self_attn_layer_scale.scale",
           "scale_mlp": "mlp_layer_scale.scale"}
    for li, blk in enumerate(p["tf"]):
        tb = f"{pre}encoder_transformer.layers.{li}."
        for k, name in lin.items():
            # init stores x@w layout [in, out]; files carry torch [out, in]
            out[tb + name + ".weight"] = np.ascontiguousarray(blk[k]["w"].T)
        for k, name in vec.items():
            out[tb + name] = blk[k]
    if "down" in p:
        out[f"{pre}downsample.conv.weight"] = p["down"]["w"]
    for fam, q in (("semantic", p["quant"]["sem"]),
                   ("acoustic", p["quant"]["ac"])):
        qb = f"{pre}quantizer.{fam}_residual_vector_quantizer."
        out[qb + "input_proj.weight"] = np.ascontiguousarray(
            q["in_proj"]["w"].T
        )[:, :, None]                         # conv1x1 [D, H, 1]
        for i, cb in enumerate(q["codebooks"]):
            # cluster_usage of ones -> embed_sum IS the codebook
            out[f"{qb}layers.{i}.codebook.embed_sum"] = cb
            out[f"{qb}layers.{i}.codebook.cluster_usage"] = np.ones(
                st.codebook_size, np.float32
            )
    section = {"head_dim": st.head_dim, "num_attention_heads": st.n_heads,
               "num_key_value_heads": st.n_kv_heads,
               "sampling_rate": st.sampling_rate}
    return out, section


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
    st_tensors, st_section = speech_tokenizer_tensors(cfg, seed=seed + 9)
    write_mlx_style_checkpoint(
        path, cfg, seed=seed, full=True, extra_tensors=st_tensors,
        config_extra={"speech_tokenizer_config": st_section},
    )
    if template:
        with open(os.path.join(path, "tts_prompts.json"), "w") as f:
            json.dump({
                "custom": "<|instruct|>{instruct}<|/instruct|>{text}",
                "design": "<|voice|>{instruct}<|/voice|>{text}",
                "base": "<|ref|>{ref_text}<|/ref|>{text}",
            }, f)
    return path
