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


# Fabrication helpers moved to the engine (bench.py's dress-rehearsal
# block and tools/dress_rehearsal.py --fabricate need them outside
# tests); the old private names stay as aliases for sibling test files.
from qwen3_tts_tpu.engine.fabricate import (  # noqa: E402
    add_codec_tensors as _add_codec_tensors,
    add_cp_tensors as _add_cp_tensors,
    hf_config_dict as _hf_config_dict,
    write_mlx_style_checkpoint as _write_mlx_style_checkpoint,
)


def test_cp_import_published_layout(temp_dir):
    """The published code-predictor naming (transformers
    Qwen3OmniMoeTalkerCodePredictor: per-depth lm_head.{i} /
    model.codec_embedding.{i} ModuleLists, NO q/k norms) maps onto the
    stacked pytree, and the missing q_norm tensors flip cp qk_norm off."""
    import json

    from safetensors.numpy import save_file

    import dataclasses

    base = configs.tiny("custom", quant=True)
    # published layout: no input projection — the talker hidden feeds the
    # depth transformer raw, so cp hidden == talker hidden
    cfg = dataclasses.replace(
        base,
        code_predictor=dataclasses.replace(
            base.code_predictor, hidden=base.talker.hidden
        ),
    )
    cp, t, cc = cfg.code_predictor, cfg.talker, cfg.codec
    rng = np.random.default_rng(3)
    n_res = cc.num_codebooks - 1
    q_dim = cp.n_heads * cp.head_dim
    tensors = {}

    def lin(name, o, i):
        tensors[f"code_predictor.{name}.weight"] = rng.normal(
            0, 0.05, (o, i)).astype(np.float32)

    tensors["code_predictor.cb0_embedding.weight"] = rng.normal(
        0, 0.02, (cc.codebook_size, cp.hidden)).astype(np.float32)
    for i in range(n_res):
        tensors[f"code_predictor.model.codec_embedding.{i}.weight"] = (
            rng.normal(0, 0.02, (cc.residual_codebook_size, cp.hidden))
            .astype(np.float32)
        )
        tensors[f"code_predictor.lm_head.{i}.weight"] = rng.normal(
            0, 0.02, (cc.residual_codebook_size, cp.hidden)
        ).astype(np.float32)
    tensors["code_predictor.model.norm.weight"] = np.ones(cp.hidden, np.float32)
    for i in range(cp.n_layers):
        lin(f"model.layers.{i}.self_attn.q_proj", q_dim, cp.hidden)
        lin(f"model.layers.{i}.self_attn.k_proj", q_dim, cp.hidden)
        lin(f"model.layers.{i}.self_attn.v_proj", q_dim, cp.hidden)
        lin(f"model.layers.{i}.self_attn.o_proj", cp.hidden, q_dim)
        lin(f"model.layers.{i}.mlp.gate_proj", cp.ffn, cp.hidden)
        lin(f"model.layers.{i}.mlp.up_proj", cp.ffn, cp.hidden)
        lin(f"model.layers.{i}.mlp.down_proj", cp.hidden, cp.ffn)
        p = f"code_predictor.model.layers.{i}"
        tensors[f"{p}.input_layernorm.weight"] = np.ones(cp.hidden, np.float32)
        tensors[f"{p}.post_attention_layernorm.weight"] = np.ones(
            cp.hidden, np.float32)

    path = os.path.join(temp_dir, "omni_cp_ckpt")
    os.makedirs(path)
    save_file(tensors, os.path.join(path, "model.safetensors"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(_hf_config_dict(cfg), f)

    with pytest.warns(UserWarning):  # talker/codec synthetic
        model = import_hf_checkpoint(path, allow_partial=True)
    assert model.cfg.code_predictor.qk_norm is False
    # no in_proj tensor -> the two-position published layout auto-detects
    assert model.cfg.code_predictor.input_layout == "hidden_token"
    assert model.cfg.code_predictor.input_proj is False
    cp_unmapped = [u for u in model.import_report.unmapped
                   if u.startswith("code_predictor")]
    assert not cp_unmapped, cp_unmapped
    assert model.import_report.assigned["code_predictor"] == len(tensors)
    # the per-depth heads landed where predict_residuals reads them
    got = np.asarray(model.cp_params["heads"][1])
    want = tensors["code_predictor.lm_head.1.weight"]
    np.testing.assert_array_equal(got.astype(np.float32), want)


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
        # codec/code-predictor tensors absent -> explicit opt-in + warning
        model = import_hf_checkpoint(path, allow_partial=True)
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
        model = import_hf_checkpoint(path, allow_partial=True)
    assert model.cfg.talker.hidden == cfg.talker.hidden
    assert model.cfg.talker.n_layers == cfg.talker.n_layers
    assert model.cfg.quant.group_size == cfg.quant.group_size
    # per-component sections drive cp + codec geometry (VERDICT.md missing #2)
    assert model.cfg.code_predictor == cfg.code_predictor
    assert model.cfg.codec == cfg.codec
    assert model.cfg.talker.codec_vocab == cfg.talker.codec_vocab


@pytest.fixture
def full_hf_ckpt(temp_dir):
    cfg = configs.tiny("custom", quant=True)
    path = os.path.join(temp_dir, "hf_full")
    tensors, dense = _write_mlx_style_checkpoint(path, cfg, full=True)
    return path, cfg, tensors, dense


def test_full_import_no_synthetic_no_unmapped(full_hf_ckpt):
    """A checkpoint carrying all three components imports with zero
    synthetic fallbacks and an empty unmapped list (VERDICT.md next #3)."""
    path, cfg, tensors, _ = full_hf_ckpt
    model = import_hf_checkpoint(path)  # strict mode: must not raise/warn
    rep = model.import_report
    assert rep.synthetic == ()
    assert rep.unmapped == []
    assert rep.assigned["talker"] > 0
    assert rep.assigned["code_predictor"] > 0
    assert rep.assigned["codec"] > 0
    # codec tensors actually landed (not seed-2 synthetic): exact values
    np.testing.assert_allclose(
        np.asarray(model.codec_params["dec"]["cb0_emb"], np.float32),
        tensors["codec.dec.cb0_emb"],
        atol=1e-2,  # fp32 fixture -> bf16 slot cast
    )
    # cp embedding landed
    np.testing.assert_allclose(
        np.asarray(model.cp_params["cb0_emb"], np.float32),
        tensors["code_predictor.cb0_embedding.weight"],
        atol=1e-2,
    )


def test_import_missing_components_raises_without_optin(tiny_hf_ckpt):
    from qwen3_tts_tpu.engine.weights import CheckpointImportError

    path, _, _, _ = tiny_hf_ckpt
    with pytest.raises(CheckpointImportError, match="no code_predictor"):
        import_hf_checkpoint(path)


def test_import_unrecognised_codec_layout_raises(temp_dir):
    """Codec tensors present under a codec prefix but in an unknown layout
    must fail loudly, never silently substitute random weights."""
    from safetensors.numpy import save_file

    from qwen3_tts_tpu.engine.weights import CheckpointImportError

    cfg = configs.tiny("custom", quant=True)
    path = os.path.join(temp_dir, "hf_badcodec")
    _write_mlx_style_checkpoint(path, cfg)
    save_file(
        {"codec.mystery.block.0.weight": np.zeros((3, 3), np.float32)},
        os.path.join(path, "model-codec.safetensors"),
    )
    with pytest.raises(CheckpointImportError, match="codec"):
        import_hf_checkpoint(path, allow_partial=True)


def test_text_vocab_lm_head_rejected_by_shape_check(temp_dir):
    """A text-vocab lm_head must not clobber the codec head slot
    (ADVICE.md weights.py:430): it fails the shape check and is reported."""
    from safetensors.numpy import save_file

    cfg = configs.tiny("custom", quant=True)
    t = cfg.talker
    path = os.path.join(temp_dir, "hf_lmhead")
    os.makedirs(path)
    save_file(
        {
            "model.embed_tokens.weight": np.zeros(
                (t.vocab_size, t.hidden), np.float32
            ),
            # TEXT-vocab head — wrong shape for the codec-vocab head slot
            "lm_head.weight": np.zeros((t.vocab_size, t.hidden), np.float32),
        },
        os.path.join(path, "model.safetensors"),
    )
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(_hf_config_dict(cfg), f)
    with pytest.warns(UserWarning):
        model = import_hf_checkpoint(path, allow_partial=True)
    assert any("lm_head" in u for u in model.import_report.unmapped)
    # head slot untouched (synthetic init keeps codec-vocab geometry)
    head = model.params["head"]
    shape = np.shape(head["q"] if "q" in head else head["w"])
    assert shape[0] == t.codec_vocab


def test_load_checkpoint_caches_native_only_when_complete(full_hf_ckpt):
    path, _, _, _ = full_hf_ckpt
    m1 = load_checkpoint(path)
    assert os.path.exists(os.path.join(path, "_tpu_native", "tts_config.json"))
    m2 = load_checkpoint(path)  # second load: from native cache
    np.testing.assert_allclose(
        _logits_fingerprint(m1), _logits_fingerprint(m2), atol=1e-5
    )
    # the cached native config must preserve native_speed (ADVICE.md
    # weights.py:116 — reload used to flip it back to False)
    assert m1.cfg.native_speed is True
    assert m2.cfg.native_speed is True


def test_partial_import_is_not_cached(tiny_hf_ckpt):
    path, _, _, _ = tiny_hf_ckpt
    with pytest.warns(UserWarning, match="not caching"):
        load_checkpoint(path, allow_partial=True)
    assert not os.path.exists(os.path.join(path, "_tpu_native"))


def test_rename_map_adapts_unusual_layouts(temp_dir):
    """_tpu_rename.json lets users map unrecognised checkpoint names onto
    native dotted paths without code changes."""
    from safetensors.numpy import save_file

    cfg = configs.tiny("custom", quant=True)
    path = os.path.join(temp_dir, "hf_rename")
    _write_mlx_style_checkpoint(path, cfg)  # talker-only
    odd = np.full(
        (cfg.codec.codebook_size, cfg.codec.latent_dim), 0.25, np.float32
    )
    save_file(
        {"weird.vq.table": odd}, os.path.join(path, "model-weird.safetensors")
    )
    with open(os.path.join(path, "_tpu_rename.json"), "w") as f:
        json.dump({"weird.vq.table": "codec.dec.cb0_emb"}, f)
    with pytest.warns(UserWarning):  # cp still synthetic
        model = import_hf_checkpoint(path, allow_partial=True)
    assert model.import_report.assigned["codec"] == 1
    np.testing.assert_allclose(
        np.asarray(model.codec_params["dec"]["cb0_emb"], np.float32),
        odd,
        atol=1e-2,
    )


# -- published decode protocol: importer evidence gate ------------------------

def _published_cp_tensors(cfg, rng):
    """Published code-predictor naming (two-position layout: no in_proj,
    no q/k norms) — the evidence half the feedback gate reads from
    tensors (see test_cp_import_published_layout for the mapping test)."""
    cp, cc = cfg.code_predictor, cfg.codec
    n_res = cc.num_codebooks - 1
    q_dim = cp.n_heads * cp.head_dim
    tensors = {}

    def lin(name, o, i):
        tensors[f"code_predictor.{name}.weight"] = rng.normal(
            0, 0.05, (o, i)).astype(np.float32)

    tensors["code_predictor.cb0_embedding.weight"] = rng.normal(
        0, 0.02, (cc.codebook_size, cp.hidden)).astype(np.float32)
    for i in range(n_res):
        tensors[f"code_predictor.model.codec_embedding.{i}.weight"] = (
            rng.normal(0, 0.02, (cc.residual_codebook_size, cp.hidden))
            .astype(np.float32))
        tensors[f"code_predictor.lm_head.{i}.weight"] = rng.normal(
            0, 0.02, (cc.residual_codebook_size, cp.hidden)
        ).astype(np.float32)
    tensors["code_predictor.model.norm.weight"] = np.ones(
        cp.hidden, np.float32)
    for i in range(cp.n_layers):
        lin(f"model.layers.{i}.self_attn.q_proj", q_dim, cp.hidden)
        lin(f"model.layers.{i}.self_attn.k_proj", q_dim, cp.hidden)
        lin(f"model.layers.{i}.self_attn.v_proj", q_dim, cp.hidden)
        lin(f"model.layers.{i}.self_attn.o_proj", cp.hidden, q_dim)
        lin(f"model.layers.{i}.mlp.gate_proj", cp.ffn, cp.hidden)
        lin(f"model.layers.{i}.mlp.up_proj", cp.ffn, cp.hidden)
        lin(f"model.layers.{i}.mlp.down_proj", cp.hidden, cp.ffn)
        p = f"code_predictor.model.layers.{i}"
        tensors[f"{p}.input_layernorm.weight"] = np.ones(
            cp.hidden, np.float32)
        tensors[f"{p}.post_attention_layernorm.weight"] = np.ones(
            cp.hidden, np.float32)
    return tensors


def _feedback_cfg_and_extras(seed=7):
    import dataclasses

    base = configs.tiny("custom", quant=True)
    cfg = dataclasses.replace(
        base,
        code_predictor=dataclasses.replace(
            base.code_predictor, hidden=base.talker.hidden
        ),
    )
    t = cfg.talker
    rng = np.random.default_rng(seed)
    extra = _published_cp_tensors(cfg, rng)
    _add_codec_tensors(extra, cfg, seed + 2)
    extra["speaker_embedding.weight"] = rng.normal(
        0, 0.02, (t.n_speakers, t.hidden)).astype(np.float32)
    # text_projection ResizeMLP (biased fc1 -> act -> biased fc2)
    tp = {}
    tp["talker.text_projection.linear_fc1.weight"] = rng.normal(
        0, 0.05, (t.ffn, t.hidden)).astype(np.float32)
    tp["talker.text_projection.linear_fc1.bias"] = rng.normal(
        0, 0.01, (t.ffn,)).astype(np.float32)
    tp["talker.text_projection.linear_fc2.weight"] = rng.normal(
        0, 0.05, (t.hidden, t.ffn)).astype(np.float32)
    tp["talker.text_projection.linear_fc2.bias"] = rng.normal(
        0, 0.01, (t.hidden,)).astype(np.float32)
    extra.update(tp)
    config_extra = {
        "codec_nothink_id": 60,
        "codec_think_bos_id": 61,
        "codec_think_eos_id": 62,
        "tts_pad_token_id": 250,
        "tts_bos_token_id": 251,
        "tts_eos_token_id": 252,
    }
    return cfg, extra, tp, config_extra


def test_feedback_protocol_autodetected(temp_dir):
    """A checkpoint with the two-position code-predictor layout + think
    markers + tts control ids enables the published decode protocol
    (feedback='residual_sum'), imports text_projection, and synthesizes
    end-to-end; the native-cache round trip preserves it all."""
    from qwen3_tts_tpu.engine.weights import load_checkpoint

    cfg, extra, tp, config_extra = _feedback_cfg_and_extras()
    path = os.path.join(temp_dir, "fb_ckpt")
    _write_mlx_style_checkpoint(
        path, cfg, full=False, extra_tensors=extra, config_extra=config_extra
    )
    model = import_hf_checkpoint(path)
    t = model.cfg.talker
    assert t.feedback == "residual_sum"
    assert (t.tts_pad_id, t.tts_bos_id, t.tts_eos_id) == (250, 251, 252)
    assert (t.codec_nothink, t.codec_think_bos, t.codec_think_eos) == (
        60, 61, 62)
    assert model.cfg.code_predictor.input_layout == "hidden_token"
    # text_projection mapped losslessly, bias included
    np.testing.assert_array_equal(
        np.asarray(model.params["text_proj"]["fc1"]["w"], np.float32),
        tp["talker.text_projection.linear_fc1.weight"])
    np.testing.assert_array_equal(
        np.asarray(model.params["text_proj"]["fc2"]["b"], np.float32),
        tp["talker.text_projection.linear_fc2.bias"])
    assert not [u for u in model.import_report.unmapped
                if "text_projection" in u]

    # the imported model runs the protocol end-to-end
    out = model.generate(
        text="hello protocol", voice=sorted(model.cfg.speakers)[0],
        max_frames=6,
    ) if hasattr(model, "generate") else None
    if out is None:
        from qwen3_tts_tpu.runtime.prompts import PromptSpec

        res = model.generator.synthesize(
            PromptSpec(text_tokens=np.arange(8, dtype=np.int32) + 5,
                       speaker_id=0),
            max_frames=6,
        )
        assert res.frames > 0

    # native round trip preserves the protocol config
    native = os.path.join(temp_dir, "native")
    save_model(model, native)
    back = load_model(native)
    assert back.cfg.talker.feedback == "residual_sum"
    assert back.cfg.talker.tts_eos_id == 252
    assert "text_proj" in back.params


def test_feedback_gate_needs_tts_ids(temp_dir):
    """Same evidence minus the tts ids: the importer warns and stays on the
    cb0 protocol instead of running half the published loop."""
    cfg, extra, _, config_extra = _feedback_cfg_and_extras()
    for k in ("tts_pad_token_id", "tts_bos_token_id", "tts_eos_token_id"):
        del config_extra[k]
    path = os.path.join(temp_dir, "fb_ckpt_no_tts")
    _write_mlx_style_checkpoint(
        path, cfg, full=False, extra_tensors=extra, config_extra=config_extra
    )
    with pytest.warns(UserWarning, match="tts_"):
        model = import_hf_checkpoint(path)
    assert model.cfg.talker.feedback == "cb0"
    assert model.cfg.code_predictor.input_layout == "hidden_token"


def test_speech_tokenizer_tensors_tolerated(temp_dir):
    """A Base checkpoint ships the ref-audio speech tokenizer alongside
    talker/cp/codec. Its architecture is unrecoverable offline (PARITY.md),
    so those tensors must be tolerated with a specific warning — never
    failing an otherwise-complete import or polluting the codec's
    unmapped list."""
    cfg = configs.tiny("custom", quant=True)
    rng = np.random.default_rng(2)
    extra = {
        "speech_tokenizer.encoder.layers.0.weight":
            rng.normal(0, 0.05, (8, 8)).astype(np.float32),
        "speech_tokenizer.quantizer.codebook":
            rng.normal(0, 0.05, (16, 8)).astype(np.float32),
    }
    path = os.path.join(temp_dir, "base_ckpt")
    _write_mlx_style_checkpoint(path, cfg, full=True, extra_tensors=extra)
    with pytest.warns(UserWarning, match="speech_tokenizer"):
        model = import_hf_checkpoint(path)
    assert model.import_report.synthetic == ()
    assert not [u for u in model.import_report.unmapped
                if "speech_tokenizer" in u]


def test_generation_config_sampling_adopted(temp_dir):
    """generation_config.json carries the checkpoint's intended talker
    sampling; the loaded model's engines must default to it."""
    from qwen3_tts_tpu.engine.weights import sampling_from_generation_config

    cfg = configs.tiny("custom", quant=True)
    path = os.path.join(temp_dir, "gc_ckpt")
    _write_mlx_style_checkpoint(path, cfg, full=True)
    with open(os.path.join(path, "generation_config.json"), "w") as f:
        json.dump({"do_sample": True, "temperature": 0.7, "top_k": 30,
                   "top_p": 0.85}, f)
    model = import_hf_checkpoint(path)
    assert model.sampling is not None
    assert model.sampling.temperature == 0.7
    assert model.sampling.top_k == 30
    assert model.sampling.top_p == 0.85
    assert model.generator.sampling == model.sampling

    # native cache round trip keeps it (the file lives in the snapshot
    # root, which load_native reads as the aux dir)
    native = os.path.join(path, "_tpu_native")
    save_model(model, native)
    back = load_model(native)
    assert back.sampling == model.sampling

    # do_sample: false -> greedy
    with open(os.path.join(path, "generation_config.json"), "w") as f:
        json.dump({"do_sample": False}, f)
    s = sampling_from_generation_config(path)
    assert s.greedy

    # a file with no sampling intent (e.g. only tts_prompts) -> None
    with open(os.path.join(path, "generation_config.json"), "w") as f:
        json.dump({"tts_prompts": {"custom": "{text}"}}, f)
    assert sampling_from_generation_config(path) is None
