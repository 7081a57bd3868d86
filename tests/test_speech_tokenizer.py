"""The real speech tokenizer (ref-audio -> codec codes, cloning).

The reference loads it as part of the Base checkpoint
(`/root/reference/src/qwen3_tts/io.py:111-112`) and cloning feeds ref_audio
through it (`/root/reference/src/qwen3_tts/sessions/clone.py:218-224`).
models/speech_tokenizer.py is a JAX port of the published Mimi encoder
family; parity here is asserted against the actual installed transformers
torch class, mirroring the code2wav recovery (tests/test_code2wav.py).
"""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

from qwen3_tts_tpu.models import speech_tokenizer as ST  # noqa: E402


def _tiny_mimi(seed=0):
    from transformers.models.mimi.configuration_mimi import MimiConfig
    from transformers.models.mimi.modeling_mimi import MimiModel

    torch.manual_seed(seed)
    cfg = MimiConfig(
        hidden_size=32, num_filters=8, num_residual_layers=1,
        upsampling_ratios=[4, 2], codebook_size=64, codebook_dim=16,
        num_quantizers=4, num_semantic_quantizers=1,
        sliding_window=8, num_hidden_layers=2, num_attention_heads=2,
        num_key_value_heads=2, head_dim=16, intermediate_size=64,
        vector_quantization_hidden_dimension=16,
        sampling_rate=1000, frame_rate=62.5, upsample_groups=8,
    )
    m = MimiModel(cfg).eval()
    with torch.no_grad():
        # MimiEuclideanCodebook initialises embed_sum to zeros (EMA
        # training state) — give the books real values for a meaningful
        # nearest-neighbour encode
        for rvq in (m.quantizer.semantic_residual_vector_quantizer,
                    m.quantizer.acoustic_residual_vector_quantizer):
            for layer in rvq.layers:
                layer.codebook.embed_sum.normal_(0, 1.0)
                layer.codebook.cluster_usage.fill_(1.0)
        for lyr in m.encoder_transformer.layers:
            lyr.self_attn_layer_scale.scale.normal_(0, 0.1)
            lyr.mlp_layer_scale.scale.normal_(0, 0.1)
    return m


_HF_ST_CFG = {"head_dim": 16, "num_attention_heads": 2,
              "num_key_value_heads": 2, "sampling_rate": 1000}


def _import_tiny(m):
    tensors = {k: v.numpy() for k, v in m.state_dict().items()}
    cfg = ST.st_config_from_tensors(tensors, _HF_ST_CFG)
    unmapped: list[str] = []
    params, n = ST.import_speech_tokenizer(tensors, cfg, unmapped)
    return cfg, params, n, unmapped


def test_config_inferred_from_tensor_shapes():
    m = _tiny_mimi()
    cfg, _, n, unmapped = _import_tiny(m)
    assert cfg.num_filters == 8 and cfg.kernel_size == 7
    assert cfg.upsampling_ratios == (4, 2)          # waveform-side order
    assert cfg.hidden == 32 and cfg.n_layers == 2 and cfg.ffn == 64
    assert cfg.frame_div == 2                        # downsample conv K=4
    assert cfg.codebook_size == 64 and cfg.codebook_dim == 16
    assert cfg.num_quantizers == 4 and cfg.num_semantic_quantizers == 1
    assert cfg.hop == 4 * 2 * 2
    assert n > 0 and unmapped == []


@pytest.mark.parametrize("seed,n_samples", [(0, 321), (1, 400), (2, 97)])
def test_codes_match_torch_mimi_exactly(seed, n_samples):
    """Full encode parity vs the installed transformers MimiModel: SEANet
    conv encoder, causal transformer, replicate-padded downsample, split
    RVQ — codes must match EXACTLY (integer outputs)."""
    m = _tiny_mimi(seed)
    rng = np.random.default_rng(seed)
    wav = (rng.standard_normal(n_samples) * 0.3).astype(np.float32)
    with torch.no_grad():
        out = m.encode(torch.tensor(wav)[None, None, :])
    codes_t = np.asarray(out.audio_codes)

    cfg, params, _, _ = _import_tiny(m)
    codes_j = np.asarray(ST.st_encode(params, cfg, wav[None]))
    assert codes_j.shape == codes_t.shape
    assert codes_j.shape[2] == ST.st_frames(cfg, n_samples)
    np.testing.assert_array_equal(codes_j, codes_t)


def test_trailing_zero_padding_keeps_whole_frames():
    """encode_reference pads clips to a frame bucket. Causal convs + causal
    attention make every WHOLE frame ((t+1)*hop <= n) of the padded run
    equal the unpadded encode's; only a final partial frame may differ
    (its receptive field spans past the clip, where the unpadded run's
    "extra" conv padding inserts literal zeros but the padded run carries
    bias-propagated zero-waveform activations)."""
    m = _tiny_mimi()
    cfg, params, _, _ = _import_tiny(m)
    rng = np.random.default_rng(3)
    wav = (rng.standard_normal(5 * cfg.hop + 3) * 0.3).astype(np.float32)
    T_whole = len(wav) // cfg.hop
    codes = np.asarray(ST.st_encode(params, cfg, wav[None]))
    padded = np.zeros(16 * cfg.hop, np.float32)
    padded[: len(wav)] = wav
    codes_p = np.asarray(ST.st_encode(params, cfg, padded[None]))
    np.testing.assert_array_equal(
        codes_p[:, :, :T_whole], codes[:, :, :T_whole]
    )
    # a whole-frame clip is bucket-invariant across its FULL length
    wav2 = wav[: 4 * cfg.hop]
    codes2 = np.asarray(ST.st_encode(params, cfg, wav2[None]))
    np.testing.assert_array_equal(codes_p[:, :, :4], codes2)


# -- checkpoint import integration -------------------------------------------

def _tiny_hf_config():
    """Tiny three-component config.json content (test_weights helper) so
    allow_partial synthetic fallbacks init at tiny geometry, not flagship."""
    from test_weights import _hf_config_dict

    from qwen3_tts_tpu.engine import configs

    tiny = configs.tiny("base")
    return tiny, _hf_config_dict(tiny)


def test_import_report_and_wiring(tmp_path):
    """import_hf_checkpoint on a checkpoint carrying Mimi-layout
    speech_tokenizer.* tensors: codes space matches the codec -> the model
    gets real st_params, encode_reference uses them, and the ImportReport
    audits the mapping."""
    from safetensors.numpy import save_file

    from qwen3_tts_tpu.engine.weights import import_hf_checkpoint

    tiny, hf = _tiny_hf_config()
    m = _tiny_mimi()
    st = {f"speech_tokenizer.{k}": v.numpy()
          for k, v in m.state_dict().items()}
    # the tiny codec has a different code space; align the fabricated ST
    # to it so the wiring check exercises the accept path
    cb, q = tiny.codec.codebook_size, tiny.codec.num_codebooks
    rng = np.random.default_rng(0)
    pre = "speech_tokenizer.quantizer"
    sem, ac = (f"{pre}.semantic_residual_vector_quantizer",
               f"{pre}.acoustic_residual_vector_quantizer")
    for k in [k for k in st if ".codebook." in k]:
        del st[k]
    for fam, n in ((sem, 1), (ac, q - 1)):
        for i in range(n):
            st[f"{fam}.layers.{i}.codebook.embed_sum"] = (
                rng.standard_normal((cb, 16)).astype(np.float32))
            st[f"{fam}.layers.{i}.codebook.cluster_usage"] = (
                np.ones(cb, np.float32))

    # a codec bucket must exist, or the importer routes the whole
    # speech_tokenizer module into the codec import (full-Mimi packages
    # carry decoder.* tensors too)
    st["codec.dec.ln"] = np.ones(tiny.codec.latent_dim, np.float32)

    path = str(tmp_path / "ckpt")
    os.makedirs(path)
    hf["speech_tokenizer_config"] = _HF_ST_CFG
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf, f)
    save_file(st, os.path.join(path, "model.safetensors"))

    with pytest.warns(UserWarning):  # talker/cp/codec fall back synthetic
        model = import_hf_checkpoint(path, mode="base", allow_partial=True)
    rep = model.import_report.speech_tokenizer
    assert rep is not None and rep["family"] == "mimi"
    assert rep["mapped"] > 0 and not rep["preserved"]
    assert model.st_params is not None and model.st_cfg is not None
    assert model.st_cfg.num_quantizers == q

    wav = (np.sin(np.linspace(0, 80, 4 * model.st_cfg.hop))
           .astype(np.float32))
    codes, spk = model.encode_reference(wav)
    assert spk is None                       # real ST: codes-only protocol
    assert codes.shape == (q, ST.st_frames(model.st_cfg, len(wav)))
    assert codes.dtype == np.int32 and codes.max() < cb


def test_unknown_layout_preserved_and_reported(tmp_path):
    """An unrecognisable speech_tokenizer layout must be preserved in the
    native conversion (not dropped) and flagged in the report — VERDICT r2
    #4's minimum bar."""
    from safetensors.numpy import save_file

    from qwen3_tts_tpu.engine.weights import (
        import_hf_checkpoint,
        save_model,
        load_native,
    )

    tiny, hf = _tiny_hf_config()
    st = {
        "speech_tokenizer.mystery.w": np.ones((4, 4), np.float32),
        "speech_tokenizer.mystery.b": np.zeros(4, np.float32),
        # a codec bucket must exist or the importer routes st into codec;
        # one correctly-shaped codec tensor keeps the strictness gate happy
        "codec.dec.ln": np.ones(tiny.codec.latent_dim, np.float32),
    }
    path = str(tmp_path / "ckpt")
    os.makedirs(path)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf, f)
    save_file(st, os.path.join(path, "model.safetensors"))

    with pytest.warns(UserWarning, match="unrecognised layout"):
        model = import_hf_checkpoint(path, mode="base", allow_partial=True)
    rep = model.import_report.speech_tokenizer
    assert rep == {
        "tensors": 2, "mapped": 0, "family": "unknown", "preserved": True,
        "names": ["mystery.b", "mystery.w"],
    }
    assert model.st_params is None and model.st_raw is not None

    native = str(tmp_path / "native")
    save_model(model, native)
    assert os.path.exists(
        os.path.join(native, "speech_tokenizer_raw.safetensors")
    )
    re = load_native(native)
    assert set(re.st_raw) == {"mystery.w", "mystery.b"}
    np.testing.assert_array_equal(
        re.st_raw["mystery.w"], st["speech_tokenizer.mystery.w"]
    )


def test_native_round_trip_keeps_real_st(tmp_path):
    """save_model/load_native must carry the mapped speech tokenizer, so a
    cached conversion clones identically to the fresh import."""
    from qwen3_tts_tpu.engine import configs
    from qwen3_tts_tpu.engine.api import Qwen3TTSModel
    from qwen3_tts_tpu.engine.weights import load_native, save_model

    m = _tiny_mimi()
    tensors = {k: v.numpy() for k, v in m.state_dict().items()}
    cfg = ST.st_config_from_tensors(tensors, _HF_ST_CFG)
    params, _ = ST.import_speech_tokenizer(tensors, cfg, [])

    model = Qwen3TTSModel.synthetic(configs.tiny("base"), seed=0)
    model.st_params, model.st_cfg = params, cfg
    native = str(tmp_path / "native")
    save_model(model, native)
    re = load_native(native)
    assert re.st_cfg == cfg
    rng = np.random.default_rng(5)
    wav = (rng.standard_normal(3 * cfg.hop) * 0.2).astype(np.float32)
    a = np.asarray(ST.st_encode(params, cfg, wav[None]))
    b = np.asarray(ST.st_encode(re.st_params, re.st_cfg, wav[None]))
    np.testing.assert_array_equal(a, b)
