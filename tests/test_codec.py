"""Codec tests: causality (streaming-exactness), RVQ behaviour, encoder frame
rate, code-predictor shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.engine import configs
from qwen3_tts_tpu.models.code_predictor import init_code_predictor, predict_residuals
from qwen3_tts_tpu.models.codec import (
    codes_to_latent,
    decode_codes,
    encode_waveform,
    init_codec,
    rvq_quantize,
    speaker_embedding,
)


@pytest.fixture(scope="module")
def setup():
    cfg = configs.tiny(quant=False)
    params = jax.device_put(init_codec(cfg, seed=2))
    return cfg, params


def _codes(cfg, T, seed=0):
    rng = np.random.default_rng(seed)
    cc = cfg.codec
    cb0 = rng.integers(0, cc.codebook_size, size=(1, 1, T))
    res = rng.integers(0, cc.residual_codebook_size,
                       size=(1, cc.num_codebooks - 1, T))
    return jnp.asarray(np.concatenate([cb0, res], axis=1), dtype=jnp.int32)


def test_decode_shape_and_range(setup):
    cfg, params = setup
    T = 6
    wav = decode_codes(params, cfg, _codes(cfg, T))
    assert wav.shape == (1, T * cfg.codec.hop)
    w = np.asarray(wav)
    assert np.all(np.abs(w) <= 1.0)
    assert np.std(w) > 0  # not silent


def test_decoder_is_causal(setup):
    """Appending frames must not change earlier audio — this is what makes
    chunked streaming decode exact (runtime.generate)."""
    cfg, params = setup
    codes = _codes(cfg, 8)
    full = np.asarray(decode_codes(params, cfg, codes))
    head = np.asarray(decode_codes(params, cfg, codes[:, :, :5]))
    hop = cfg.codec.hop
    np.testing.assert_allclose(
        full[:, : 5 * hop], head, rtol=2e-2, atol=2e-3
    )


def test_rvq_recovers_exact_codebook_entry(setup):
    cfg, params = setup
    cc = cfg.codec
    dec = params["dec"]
    # latent = cb0_emb[k] (+ nothing) -> codebook 0 must pick k
    ks = np.array([0, 3, 17, cc.codebook_size - 1])
    latent = jnp.take(dec["cb0_emb"], jnp.asarray(ks), axis=0)[None]
    codes = np.asarray(rvq_quantize(params, cfg, latent))
    np.testing.assert_array_equal(codes[0, 0], ks)


def test_rvq_residual_error_decreases(setup):
    cfg, params = setup
    rng = np.random.default_rng(7)
    latent = jnp.asarray(
        0.05 * rng.normal(size=(1, 10, cfg.codec.latent_dim)).astype(np.float32)
    )
    codes = rvq_quantize(params, cfg, latent)
    recon = codes_to_latent(params["dec"], cfg.codec, codes)
    err_full = float(jnp.mean((recon.astype(jnp.float32) - latent) ** 2))

    # reconstruction with only the first codebook
    partial = jnp.take(params["dec"]["cb0_emb"], codes[:, 0, :], axis=0)
    err_one = float(jnp.mean((partial.astype(jnp.float32) - latent) ** 2))
    assert err_full <= err_one + 1e-6


def test_encoder_frame_rate_and_speaker_vec(setup):
    cfg, params = setup
    hop = cfg.codec.hop
    T = 5
    wav = jnp.asarray(
        np.random.default_rng(8).normal(size=(1, T * hop)).astype(np.float32) * 0.1
    )
    latent = encode_waveform(params, cfg, wav)
    assert latent.shape == (1, T, cfg.codec.latent_dim)
    codes = rvq_quantize(params, cfg, latent)
    assert codes.shape == (1, cfg.codec.num_codebooks, T)
    spk = speaker_embedding(params, cfg, latent)
    assert spk.shape == (1, cfg.talker.hidden)


def test_code_predictor_shapes_and_determinism():
    cfg = configs.tiny(quant=False)
    cp = jax.device_put(init_code_predictor(cfg, seed=1))
    B = 6
    rng = np.random.default_rng(9)
    hidden = jnp.asarray(rng.normal(size=(B, cfg.talker.hidden)).astype(np.float32))
    cb0 = jnp.asarray(rng.integers(0, cfg.codec.codebook_size, size=B), dtype=jnp.int32)
    out1 = np.asarray(predict_residuals(cp, cfg, hidden, cb0))
    out2 = np.asarray(predict_residuals(cp, cfg, hidden, cb0))
    assert out1.shape == (B, cfg.codec.num_codebooks - 1)
    assert out1.dtype == np.int32
    np.testing.assert_array_equal(out1, out2)  # greedy => deterministic
    assert np.all(out1 >= 0) and np.all(out1 < cfg.codec.residual_codebook_size)


def test_streaming_decode_matches_full():
    """Incremental decode (latent-transformer KV cache + per-conv carried
    left contexts) must reproduce the one-shot full decode exactly.

    f32 weights isolate the structural claim: in bf16 the cached and
    one-shot transformer differ by reduction-order noise (~1e-2 latents),
    which random untrained convs amplify — with the conv path itself exact
    (verified with shared latents)."""
    import dataclasses

    import jax.numpy as jnp

    from qwen3_tts_tpu.models.codec import (
        decode_codes,
        decode_codes_streaming,
        init_codec,
        init_codec_stream_state,
    )

    cfg = dataclasses.replace(configs.tiny(quant=False), dtype="float32")
    params = jax.device_put(init_codec(cfg, seed=2))
    cc = cfg.codec
    rng = np.random.default_rng(3)
    T, chunk = 24, 6
    codes = np.concatenate(
        [
            rng.integers(0, cc.codebook_size, (1, 1, T)),
            rng.integers(0, cc.residual_codebook_size, (1, cc.num_codebooks - 1, T)),
        ],
        axis=1,
    ).astype(np.int32)

    full = np.asarray(decode_codes(params, cfg, jnp.asarray(codes), 0))

    state = init_codec_stream_state(cfg, 1, dtype=jnp.float32)
    pieces = []
    for k in range(0, T, chunk):
        wav_chunk, state = decode_codes_streaming(
            params, cfg, jnp.asarray(codes[:, :, k: k + chunk]), state,
            jnp.int32(k),
        )
        pieces.append(np.asarray(wav_chunk[0]))
    streamed = np.concatenate(pieces)

    assert streamed.shape == full[0].shape
    np.testing.assert_allclose(streamed, full[0], atol=5e-3)


def test_streaming_decode_mixed_chunk_sizes():
    """The per-conv carried state is chunk-size independent: the adaptive
    chunk schedule (runtime serving/generate) hands the SAME state between
    differently-sized decode variants, so parity must hold across an
    uneven chunk split too."""
    import dataclasses

    import jax.numpy as jnp

    from qwen3_tts_tpu.models.codec import (
        decode_codes,
        decode_codes_streaming,
        init_codec,
        init_codec_stream_state,
    )

    cfg = dataclasses.replace(configs.tiny(quant=False), dtype="float32")
    params = jax.device_put(init_codec(cfg, seed=2))
    cc = cfg.codec
    rng = np.random.default_rng(7)
    T = 28
    codes = np.concatenate(
        [
            rng.integers(0, cc.codebook_size, (1, 1, T)),
            rng.integers(0, cc.residual_codebook_size, (1, cc.num_codebooks - 1, T)),
        ],
        axis=1,
    ).astype(np.int32)

    full = np.asarray(decode_codes(params, cfg, jnp.asarray(codes), 0))

    state = init_codec_stream_state(cfg, 1, dtype=jnp.float32)
    pieces, k = [], 0
    for chunk in (4, 8, 12, 4):  # ramping schedule, uneven boundaries
        wav_chunk, state = decode_codes_streaming(
            params, cfg, jnp.asarray(codes[:, :, k: k + chunk]), state,
            jnp.int32(k),
        )
        pieces.append(np.asarray(wav_chunk[0]))
        k += chunk
    streamed = np.concatenate(pieces)

    assert streamed.shape == full[0].shape
    np.testing.assert_allclose(streamed, full[0], atol=5e-3)


def test_cp_hidden_token_layout_consistency():
    """The published two-position depth layout (input_layout=hidden_token,
    no input projection): greedy decode must be self-consistent with the
    teacher-forced logits — feeding the predicted codes back through
    code_predictor_teacher_logits reproduces them at every depth."""
    import dataclasses

    import jax.numpy as jnp

    from qwen3_tts_tpu.engine import configs
    from qwen3_tts_tpu.training.loss import code_predictor_teacher_logits

    base = configs.tiny("custom", quant=False)
    cfg = dataclasses.replace(
        base,
        # hidden feeds the depth transformer raw: widths must match
        code_predictor=dataclasses.replace(
            base.code_predictor, hidden=base.talker.hidden,
            input_layout="hidden_token", input_proj=False, qk_norm=False,
        ),
    )
    cp = init_code_predictor(cfg, seed=7)
    rng = np.random.default_rng(0)
    B = 3
    hidden = jnp.asarray(
        rng.normal(0, 1, (B, cfg.talker.hidden)).astype(np.float32)
    )
    cb0 = jnp.asarray(rng.integers(0, cfg.codec.codebook_size, B),
                      dtype=jnp.int32)

    codes_res = np.asarray(predict_residuals(cp, cfg, hidden, cb0))
    assert codes_res.shape == (B, cfg.codec.num_codebooks - 1)

    full = np.concatenate([np.asarray(cb0)[:, None], codes_res], axis=1)
    logits = np.asarray(
        code_predictor_teacher_logits(cp, cfg, hidden, jnp.asarray(full))
    )
    np.testing.assert_array_equal(np.argmax(logits, axis=-1), codes_res)
