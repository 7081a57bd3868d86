"""Regression tests for the round-2 engine/training review fixes."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from qwen3_tts_tpu.engine import configs  # noqa: E402
from qwen3_tts_tpu.engine.api import (  # noqa: E402
    Qwen3TTSModel,
    _split_segments,
    compute_format,
)


def test_cjk_sentences_split_without_whitespace():
    text = "这是第一句话。" * 150  # ~1050 chars, no whitespace anywhere
    segments = _split_segments(text)
    assert len(segments) > 1
    # every segment ends on a sentence boundary, none chopped mid-sentence
    assert all(s.endswith("。") for s in segments)
    assert all(len(s) <= 600 for s in segments)
    # no text lost (packing re-joins sentences with a space)
    assert "".join(s.replace(" ", "") for s in segments) == text


def test_latin_decimals_do_not_split():
    assert _split_segments("Pi is 3.14 exactly. Second sentence.") == [
        "Pi is 3.14 exactly. Second sentence."
    ]


def test_invalid_compute_format_raises(monkeypatch):
    monkeypatch.setenv("QWEN3_TTS_COMPUTE", "BF16")
    with pytest.raises(ValueError, match="QWEN3_TTS_COMPUTE"):
        compute_format()


def test_tiny_vocab_forces_byte_tokenizer(tmp_path):
    from qwen3_tts_tpu.engine.tokenizer import ByteTokenizer, load_tokenizer

    (tmp_path / "tokenizer.json").write_text("{}")  # present but irrelevant
    tok = load_tokenizer(str(tmp_path), vocab_size=64)
    assert isinstance(tok, ByteTokenizer)


def test_encode_reference_buckets_compile_once_and_trim():
    model = Qwen3TTSModel.synthetic(configs.tiny("base"), seed=0)
    hop = model.cfg.codec.hop
    rng = np.random.default_rng(0)
    w1 = rng.uniform(-0.5, 0.5, 5 * hop).astype(np.float32)
    w2 = rng.uniform(-0.5, 0.5, 7 * hop - 13).astype(np.float32)
    c1, s1 = model.encode_reference(w1)
    c2, s2 = model.encode_reference(w2)
    assert c1.shape[1] == 5 and c2.shape[1] == 7  # trimmed to true frames
    assert np.isfinite(s1).all() and np.isfinite(s2).all()


def test_encode_reference_speaker_mean_ignores_bucket_padding():
    """The pooled speaker vector must match an exact-length (unbucketed)
    computation — zero-padded bucket frames may not bias the mean."""
    import jax.numpy as jnp

    from qwen3_tts_tpu.models.codec import (
        encode_waveform,
        speaker_embedding,
    )

    model = Qwen3TTSModel.synthetic(configs.tiny("base"), seed=0)
    hop = model.cfg.codec.hop
    rng = np.random.default_rng(1)
    T = 6
    wav = rng.uniform(-0.5, 0.5, T * hop).astype(np.float32)

    _, spk_bucketed = model.encode_reference(wav)
    latent = encode_waveform(
        model.codec_params, model.cfg, jnp.asarray(wav)[None]
    )
    spk_exact = np.asarray(
        speaker_embedding(model.codec_params, model.cfg, latent)[0],
        np.float32,
    )
    np.testing.assert_allclose(
        np.asarray(spk_bucketed, np.float32), spk_exact, atol=2e-2
    )


def test_pad_batch_warns_on_truncation():
    from qwen3_tts_tpu.training.data import Example, pad_batch

    e = Example(
        text_tokens=np.arange(600, dtype=np.int32),   # > largest bucket 512
        codes=np.zeros((4, 4), np.int32),
    )
    with pytest.warns(UserWarning, match="TRUNCATED"):
        pad_batch([e])


def test_speaker_conditioned_loss_runs_and_conditions():
    from qwen3_tts_tpu.training.loss import joint_loss
    from qwen3_tts_tpu.training.train import synthetic_batch

    cfg = configs.tiny("custom")
    model = Qwen3TTSModel.synthetic(cfg, seed=0)
    batch = synthetic_batch(cfg, batch_size=2, t_text=6, t_frames=4, seed=0)
    assert "speaker_id" in batch

    loss_a, _ = joint_loss(model.params, model.cp_params, cfg, batch)
    batch2 = dict(batch, speaker_id=np.array([2, -1], np.int32))
    loss_b, _ = joint_loss(model.params, model.cp_params, cfg, batch2)
    assert np.isfinite(float(loss_a)) and np.isfinite(float(loss_b))
    # different speaker conditioning must change the loss (rows 0 differ)
    assert float(loss_a) != float(loss_b)
