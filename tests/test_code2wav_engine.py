"""Engine integration of the real code2wav decoder (configs.tiny_code2wav):
generate_audio end-to-end, serving parity + slot recycling, stream quality
beyond the startup transient, and native save/load round trip."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from qwen3_tts_tpu.engine import configs  # noqa: E402
from qwen3_tts_tpu.engine.api import Qwen3TTSModel, generate_audio  # noqa: E402
from qwen3_tts_tpu.runtime.prompts import PromptSpec  # noqa: E402


@pytest.fixture(scope="module")
def c2w_model():
    return Qwen3TTSModel.synthetic(configs.tiny_code2wav("custom"), seed=0)


def test_generate_audio_end_to_end(c2w_model, tmp_path):
    cfg = c2w_model.cfg
    out = str(tmp_path / "out")
    m = generate_audio(
        model=c2w_model, text="code2wav end to end", voice="ryan",
        output_path=out, max_frames=24,
    )
    assert os.path.exists(os.path.join(out, "audio_000.wav"))
    # sample arithmetic: frames*hop minus the startup run-in, exactly
    import wave

    with wave.open(os.path.join(out, "audio_000.wav")) as w:
        n = w.getnframes()
    assert n == m["frames"] * cfg.codec.hop - cfg.code2wav.startup_samples


def test_serving_matches_single_stream(c2w_model):
    from qwen3_tts_tpu.runtime.generate import Generator
    from qwen3_tts_tpu.runtime.sampling import SamplingConfig
    from qwen3_tts_tpu.runtime.serving import ServingEngine

    cfg = c2w_model.cfg
    greedy = SamplingConfig(greedy=True)
    gen = Generator(
        cfg=cfg,
        params=c2w_model.params,
        cp_params=c2w_model.cp_params,
        codec_params=c2w_model.codec_params,
        sampling=greedy,
        chunk_schedule=(8,),
    )
    prompt = PromptSpec(
        text_tokens=np.arange(7, dtype=np.int32) % cfg.talker.vocab_size,
        speaker_id=1,
    )
    single = gen.synthesize(prompt, max_frames=16, seed=0)

    # 3 prompts through 2 slots: the third exercises slot recycling
    eng = ServingEngine(c2w_model, max_streams=2, chunk=8, sampling=greedy)
    results = eng.run([prompt, prompt, prompt], max_frames=16)
    for wav, stream in results:
        # greedy parity: serving wav == single-stream wav (the CLAUDE.md
        # invariant carries over to the code2wav arch, startup drop and
        # all); PCM differs only by codec f32 reassociation
        assert stream.frames == single.frames
        assert wav.shape == single.wav.shape
        np.testing.assert_allclose(
            wav.astype(np.int32), single.wav.astype(np.int32), atol=2
        )
        assert wav.shape[0] == (
            stream.frames * cfg.codec.hop - cfg.code2wav.startup_samples
        )


def test_stream_equals_one_shot_beyond_transient():
    """The uniform (serving-shaped) stream, after dropping the startup
    run-in, equals the one-shot reference decode beyond the conv stack's
    receptive field; the transient is bounded and documented."""
    from qwen3_tts_tpu.models.code2wav import (
        code2wav_decode,
        code2wav_stream_step,
        init_code2wav,
        stream_state_init,
    )

    cfg = configs.tiny_code2wav("custom").code2wav
    params = jax.tree.map(jnp.asarray, init_code2wav(cfg, seed=4))
    rng = np.random.default_rng(0)
    T = 64
    codes = rng.integers(
        0, cfg.codebook_size, (1, cfg.num_quantizers, T)
    ).astype(np.int32)
    one_shot = np.asarray(code2wav_decode(params, cfg, jnp.asarray(codes)))

    state = stream_state_init(params, cfg, batch=1)
    pieces = []
    t = 0
    for _ in range(T // 8):
        wav, state = code2wav_stream_step(
            params, cfg, state, jnp.asarray(codes[:, :, t : t + 8]), pos=t
        )
        pieces.append(np.asarray(wav))
        t += 8
    streamed = np.concatenate(pieces, axis=-1)

    d = cfg.startup_samples
    assert streamed.shape[-1] == T * cfg.total_upsample
    assert one_shot.shape[-1] == T * cfg.total_upsample - d
    # transient bound: the startup run-in plus every stride-1 conv's
    # receptive field scaled to output samples (dw + conv_in at the
    # pre-decoder rate; each block's dilated res units below it)
    rates = cfg.upsample_rates
    margin = 12 * int(np.prod(rates))          # dw k7 + conv_in k7
    for i in range(len(rates)):
        below = int(np.prod(rates[i + 1 :]))
        margin += 6 * (1 + 3 + 9) * below      # three res units k7 d1/3/9
    margin += 6                                 # final conv k7
    assert d + margin < streamed.shape[-1] // 2
    np.testing.assert_allclose(
        streamed[:, d + margin :], one_shot[:, margin:], rtol=1e-5, atol=1e-6
    )


def test_native_save_load_roundtrip(c2w_model, tmp_path):
    from qwen3_tts_tpu.engine.api import load_model
    from qwen3_tts_tpu.engine.weights import save_model

    path = str(tmp_path / "native_c2w")
    save_model(c2w_model, path)
    loaded = load_model(path)
    assert loaded.cfg.codec_arch == "code2wav"
    assert loaded.cfg.code2wav.upsample_rates == (3, 2)
    # the reloaded model synthesizes
    gen = loaded.generator
    prompt = PromptSpec(text_tokens=np.arange(5, dtype=np.int32),
                        speaker_id=0)
    r = gen.synthesize(prompt, max_frames=8, seed=0)
    assert r.frames > 0 and r.audio_s > 0
