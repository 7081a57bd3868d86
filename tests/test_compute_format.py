"""Compute-format policy: int8 storage -> bf16 resident weights must be a
numerically-identical transformation of the decode path (the XLA int8 path
dequantizes to the activation dtype before the matmul, so pre-dequantizing
to bf16 yields the same operands)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from qwen3_tts_tpu.engine import configs  # noqa: E402
from qwen3_tts_tpu.engine.api import (  # noqa: E402
    Qwen3TTSModel,
    apply_compute_format,
    compute_format,
)
from qwen3_tts_tpu.ops.quant import dequantize_tree, is_quantized  # noqa: E402


def test_compute_format_env_override(monkeypatch):
    monkeypatch.setenv("QWEN3_TTS_COMPUTE", "bf16")
    assert compute_format() == "bf16"
    monkeypatch.setenv("QWEN3_TTS_COMPUTE", "int8")
    assert compute_format() == "int8"


def test_dequantize_tree_handles_stacked_blocks():
    cfg = configs.tiny("custom", quant=True)
    model = Qwen3TTSModel.synthetic(cfg, seed=1)
    assert is_quantized(model.params["blocks"]["attn"]["q"])
    dense = dequantize_tree(model.params)
    blk = dense["blocks"]["attn"]["q"]
    assert set(blk) == {"w"}
    L = cfg.talker.n_layers
    assert blk["w"].shape == (L, cfg.talker.q_dim, cfg.talker.hidden)
    # norms and embeddings pass through untouched
    np.testing.assert_array_equal(
        np.asarray(dense["ln_f"]), np.asarray(model.params["ln_f"])
    )


def test_bf16_format_matches_int8_outputs(monkeypatch):
    from qwen3_tts_tpu.runtime.generate import Generator
    from qwen3_tts_tpu.runtime.prompts import PromptSpec
    from qwen3_tts_tpu.runtime.sampling import SamplingConfig

    cfg = configs.tiny("custom", quant=True)
    prompt = PromptSpec(text_tokens=np.arange(5, dtype=np.int32), speaker_id=0)
    greedy = SamplingConfig(greedy=True)

    m_int8 = Qwen3TTSModel.synthetic(cfg, seed=4)          # int8 on CPU (auto)
    assert is_quantized(m_int8.params["blocks"]["attn"]["q"])
    g1 = Generator(cfg=cfg, params=m_int8.params, cp_params=m_int8.cp_params,
                   codec_params=m_int8.codec_params, sampling=greedy)
    r1 = g1.synthesize(prompt, max_frames=6, seed=0)

    monkeypatch.setenv("QWEN3_TTS_COMPUTE", "bf16")
    m_bf16 = Qwen3TTSModel.synthetic(cfg, seed=4)
    assert not is_quantized(m_bf16.params["blocks"]["attn"]["q"])
    g2 = Generator(cfg=cfg, params=m_bf16.params, cp_params=m_bf16.cp_params,
                   codec_params=m_bf16.codec_params, sampling=greedy)
    r2 = g2.synthesize(prompt, max_frames=6, seed=0)

    assert r1.frames == r2.frames
    np.testing.assert_allclose(r1.wav, r2.wav, atol=0.02 * 32767)  # PCM units
