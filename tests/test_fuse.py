"""Fused qkv/gate_up decode relayout (models.layers.fuse_block_projections):
the fused trees must be numerically identical to the split layout — row r of
a matmul depends only on row r of the weight, so concatenating along the
output axis changes nothing but the op count. Covers dense and quantized
leaves, the code-predictor depth loop, the streaming codec decode, and the
opt-out/LoRA-skip paths of runtime.generate.fuse_decode_params."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.engine import configs
from qwen3_tts_tpu.models.code_predictor import init_code_predictor, predict_residuals
from qwen3_tts_tpu.models.codec import (
    decode_codes,
    init_codec,
    init_codec_stream_state,
    decode_codes_streaming,
)
from qwen3_tts_tpu.models.layers import fuse_block_projections
from qwen3_tts_tpu.runtime.generate import fuse_decode_params


@pytest.fixture(scope="module", params=[False, True], ids=["dense", "quant"])
def cfg(request):
    return dataclasses.replace(
        configs.tiny(quant=request.param), dtype="float32"
    )


def _fused_cp(cp_params):
    out = dict(cp_params)
    out["blocks"] = fuse_block_projections(cp_params["blocks"])
    return out


def test_cp_depth_loop_exact(cfg):
    cp_params = init_code_predictor(cfg, seed=7)
    fused = _fused_cp(cp_params)
    rng = np.random.default_rng(0)
    B = 6
    hidden = jnp.asarray(
        rng.normal(0, 1, (B, cfg.talker.hidden)), dtype=jnp.float32
    )
    cb0 = jnp.asarray(rng.integers(0, cfg.codec.codebook_size, (B,)), jnp.int32)
    ref = predict_residuals(cp_params, cfg, hidden, cb0)
    got = predict_residuals(fused, cfg, hidden, cb0)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_fused_keys_replace_split(cfg):
    fused = _fused_cp(init_code_predictor(cfg, seed=7))
    attn = fused["blocks"]["attn"]
    mlp = fused["blocks"]["mlp"]
    assert "qkv" in attn and not {"q", "k", "v"} & set(attn)
    assert "q_norm" in attn and "o" in attn
    assert "gate_up" in mlp and not {"gate", "up"} & set(mlp)


def test_codec_decode_exact(cfg):
    codec_params = init_codec(cfg, seed=3)
    _, fused = fuse_decode_params(
        init_code_predictor(cfg, seed=7), codec_params
    )
    rng = np.random.default_rng(1)
    T = 9
    codes = jnp.asarray(
        np.stack(
            [rng.integers(0, cfg.codec.codebook_size, (1, T))]
            + [
                rng.integers(0, cfg.codec.residual_codebook_size, (1, T))
                for _ in range(cfg.codec.num_codebooks - 1)
            ],
            axis=1,
        ),
        jnp.int32,
    )
    ref = decode_codes(codec_params, cfg, codes)
    got = decode_codes(fused, cfg, codes)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_codec_streaming_fused_matches_full_split(cfg):
    """Streamed decode with the FUSED tree == one-shot decode with the SPLIT
    tree: relayout and per-conv streaming state compose exactly."""
    codec_params = init_codec(cfg, seed=3)
    _, fused = fuse_decode_params(
        init_code_predictor(cfg, seed=7), codec_params
    )
    rng = np.random.default_rng(2)
    T = 8
    codes = np.stack(
        [rng.integers(0, cfg.codec.codebook_size, (1, T))]
        + [
            rng.integers(0, cfg.codec.residual_codebook_size, (1, T))
            for _ in range(cfg.codec.num_codebooks - 1)
        ],
        axis=1,
    ).astype(np.int32)
    ref = np.asarray(decode_codes(codec_params, cfg, jnp.asarray(codes)))

    state = init_codec_stream_state(cfg, 1, dtype=jnp.float32)
    chunks = []
    pos = 0
    for lo, hi in ((0, 4), (4, 8)):
        wav, state = decode_codes_streaming(
            fused, cfg, jnp.asarray(codes[:, :, lo:hi]), state, pos
        )
        chunks.append(np.asarray(wav))
        pos += hi - lo
    # not exact: the fused dot may tile its f32 reduction differently than
    # the split dots (~1e-7 latent noise), and the untrained random convs
    # amplify it (same caveat as test_codec's bf16 note) — but the bound is
    # far below perceptual relevance and independent of sequence length
    np.testing.assert_allclose(
        np.concatenate(chunks, axis=-1), ref, atol=1e-4, rtol=0
    )


def test_fuse_env_opt_out(cfg, monkeypatch):
    monkeypatch.setenv("QWEN3_TTS_FUSE", "0")
    cp = init_code_predictor(cfg, seed=7)
    codec = init_codec(cfg, seed=3)
    cp2, codec2 = fuse_decode_params(cp, codec)
    assert cp2 is cp and codec2 is codec


def test_fuse_skips_unmerged_lora(cfg):
    cp = init_code_predictor(cfg, seed=7)
    q = cp["blocks"]["attn"]["q"]
    q = dict(
        q,
        lora_a=jnp.zeros((2, cfg.code_predictor.hidden)),
        lora_b=jnp.zeros((q["w"].shape[-2] if "w" in q else q["q"].shape[-2], 2)),
        lora_scale=jnp.float32(1.0),
    )
    cp = dict(cp, blocks=dict(cp["blocks"], attn=dict(cp["blocks"]["attn"], q=q)))
    codec = init_codec(cfg, seed=3)
    cp2, codec2 = fuse_decode_params(cp, codec)
    assert "qkv" not in cp2["blocks"]["attn"]      # left split
    assert "gate_up" in codec2["dec"]["tf_blocks"]["mlp"]  # codec still fused


def test_concat_linears_rejects_mixed_layouts():
    from qwen3_tts_tpu.models.layers import _concat_linears

    dense = {"w": jnp.zeros((4, 8))}
    quant = {
        "q": jnp.zeros((4, 8), jnp.uint8),
        "scale": jnp.zeros((4, 1)),
        "bias": jnp.zeros((4, 1)),
    }
    with pytest.raises(ValueError, match="differing layouts"):
        _concat_linears([dense, quant])


def test_fuse_decode_params_idempotent(cfg):
    cp = init_code_predictor(cfg, seed=7)
    codec = init_codec(cfg, seed=3)
    cp1, codec1 = fuse_decode_params(cp, codec)
    cp2, codec2 = fuse_decode_params(cp1, codec1)
    assert cp2["blocks"]["attn"] is cp1["blocks"]["attn"]
    assert codec2["dec"]["tf_blocks"] is codec1["dec"]["tf_blocks"]


def test_talker_fusing_env_greedy_parity(monkeypatch):
    """Opt-in talker fusing (QWEN3_TTS_FUSE_TALKER=1, the single-stream
    launch-overhead lever — PERF.md round 5): greedy decode must be
    bit-identical to the unfused default, and the flag must be a no-op
    when unset."""
    from qwen3_tts_tpu.engine.api import Qwen3TTSModel
    from qwen3_tts_tpu.runtime.prompts import PromptSpec
    from qwen3_tts_tpu.runtime.sampling import SamplingConfig

    tcfg = configs.tiny_feedback("custom")
    prompt = PromptSpec(
        text_tokens=np.arange(8, dtype=np.int32) + 2, speaker_id=1
    )
    greedy = SamplingConfig(greedy=True)

    def run():
        m = Qwen3TTSModel.synthetic(tcfg, seed=4)
        m.sampling = greedy
        r = m.generator.synthesize(prompt, max_frames=6, seed=0,
                                   collect_codes=True)
        return m, r

    monkeypatch.delenv("QWEN3_TTS_FUSE_TALKER", raising=False)
    m_plain, r_plain = run()
    assert "qkv" not in m_plain.generator.params["blocks"]["attn"]

    monkeypatch.setenv("QWEN3_TTS_FUSE_TALKER", "1")
    m_fused, r_fused = run()
    assert "qkv" in m_fused.generator.params["blocks"]["attn"]
    # the model keeps the canonical split tree
    assert "qkv" not in m_fused.params["blocks"]["attn"]

    assert r_plain.frames == r_fused.frames
    np.testing.assert_array_equal(r_plain.codes, r_fused.codes)
    np.testing.assert_array_equal(r_plain.wav, r_fused.wav)
