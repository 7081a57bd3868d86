"""End-to-end engine API tests on the tiny config: the three generate_audio
call shapes (reference custom.py:163-170, design.py:76-81, clone.py:218-224),
the audio_000.wav contract (reference io.py:156), text segmentation, and
prompt construction."""

import os

import numpy as np
import pytest

from qwen3_tts_tpu.engine import load_model, generate_audio
from qwen3_tts_tpu.engine.api import _estimate_frames, _split_segments
from qwen3_tts_tpu.runtime.prompts import build_prompt, render_template, speed_bucket


@pytest.fixture(scope="module")
def tiny_model():
    return load_model("synthetic:tiny")


@pytest.fixture(scope="module")
def tiny_base_model():
    return load_model("synthetic:tiny:base")


def _check_wav(path):
    import wave

    with wave.open(path) as w:
        assert w.getframerate() == 24_000
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getnframes() > 0
        return w.getnframes()


def test_custom_voice_shape(tiny_model, temp_dir):
    metrics = generate_audio(
        model=tiny_model,
        text="Hello there.",
        voice="ryan",
        instruct="Normal tone",
        speed=1.0,
        output_path=temp_dir,
        max_frames=10,
    )
    n = _check_wav(os.path.join(temp_dir, "audio_000.wav"))
    assert metrics["frames"] > 0
    assert n == metrics["frames"] * tiny_model.cfg.codec.hop
    assert metrics["rtf"] > 0
    assert metrics["ttfa_s"] > 0


def test_design_shape(tiny_model, temp_dir):
    generate_audio(
        model=tiny_model,
        text="Testing voice design.",
        instruct="A deep warm narrator voice",
        output_path=temp_dir,
        max_frames=8,
    )
    _check_wav(os.path.join(temp_dir, "audio_000.wav"))


def test_clone_shape(tiny_base_model, temp_dir):
    from qwen3_tts_tpu.audio import write_wav

    ref = os.path.join(temp_dir, "ref.wav")
    t = np.arange(24_000) / 24_000.0
    write_wav(ref, (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), 24_000)

    generate_audio(
        model=tiny_base_model,
        text="Cloned speech.",
        ref_audio=ref,
        ref_text="reference transcript",
        output_path=temp_dir,
        max_frames=8,
    )
    _check_wav(os.path.join(temp_dir, "audio_000.wav"))


def test_streaming_chunks_match_final_length(tiny_model, temp_dir):
    chunks = []
    metrics = generate_audio(
        model=tiny_model,
        text="Stream me please.",
        voice="serena",
        output_path=temp_dir,
        max_frames=12,
        on_chunk=chunks.append,
    )
    assert chunks, "streaming callback never fired"
    streamed = sum(len(c) for c in chunks)
    assert streamed == metrics["frames"] * tiny_model.cfg.codec.hop


def test_deterministic_given_seed(tiny_model, temp_dir):
    from qwen3_tts_tpu.audio import read_wav

    out = {}
    for name in ("a", "b"):
        d = os.path.join(temp_dir, name)
        generate_audio(
            model=tiny_model, text="Same seed.", voice="ryan",
            output_path=d, max_frames=6, seed=123,
        )
        out[name], _ = read_wav(os.path.join(d, "audio_000.wav"))
    np.testing.assert_array_equal(out["a"], out["b"])


def test_split_segments():
    assert _split_segments("Short one.") == ["Short one."]
    text = "First sentence. Second sentence! Third?"
    assert _split_segments(text) == [text]  # packs under the limit
    long = ". ".join(["word " * 30] * 12)
    segs = _split_segments(long)
    assert len(segs) > 1
    assert all(len(s) <= 600 for s in segs)
    # no content lost (modulo whitespace normalisation)
    assert sum(len(s.replace(" ", "")) for s in segs) == len(long.replace(" ", ""))


def test_estimate_frames_scales():
    short = _estimate_frames("Hi.", 12.0)
    long = _estimate_frames("x" * 1000, 12.0)
    assert short < long
    assert short >= 12


def test_render_templates():
    custom = render_template("custom", "Hi", instruct="Sad tone", speed=1.3)
    assert "Sad tone" in custom and "fast" in custom and custom.endswith("Hi")
    design = render_template("design", "Hi", instruct="A robot voice")
    assert "A robot voice" in design
    clone = render_template("base", "Hi", ref_text="the transcript")
    assert "the transcript" in clone
    # "." placeholder transcript is dropped (reference clone.py:148-150)
    assert render_template("base", "Hi", ref_text=".") == "Hi"


def test_speed_buckets():
    assert speed_bucket(0.8) == "slow"
    assert speed_bucket(1.0) == "normal"
    assert speed_bucket(1.3) == "fast"


def test_build_prompt_speaker_resolution(tiny_model):
    spec = build_prompt(
        tiny_model.tokenizer, "custom", "Hello",
        voice="serena", speakers=tiny_model.cfg.speakers,
    )
    assert spec.speaker_id == tiny_model.cfg.speakers.index("serena")
    with pytest.raises(ValueError, match="unknown speaker"):
        build_prompt(
            tiny_model.tokenizer, "custom", "Hello",
            voice="nobody", speakers=tiny_model.cfg.speakers,
        )


def test_load_model_missing_path():
    with pytest.raises(FileNotFoundError):
        load_model("/nonexistent/model/dir")


def test_long_text_uses_concurrent_segments(temp_dir):
    """Multi-sentence long text routes through the serving engine and still
    produces one ordered WAV with per-segment gaps."""
    from qwen3_tts_tpu.engine.api import generate_audio, load_model

    model = load_model("synthetic:tiny:custom")
    long_text = " ".join(
        f"This is sentence number {i}, definitely long enough to matter."
        for i in range(40)
    )
    m = generate_audio(
        model=model, text=long_text, voice="ryan",
        output_path=temp_dir, max_frames=6, seed=0,
    )
    assert m["segments"] > 1
    assert m["frames"] >= m["segments"]  # every segment produced frames
    assert m["audio_s"] > 0
    import wave

    with wave.open(f"{temp_dir}/audio_000.wav") as w:
        assert w.getnframes() > 0


def test_vocab_mismatch_raises_for_real_sized_configs():
    """Out-of-range token ids on a real-sized config must fail loudly, not
    be modulo-aliased into the embedding table (VERDICT.md weak #7)."""
    import dataclasses

    import numpy as np

    from qwen3_tts_tpu.engine import configs
    from qwen3_tts_tpu.engine.api import Qwen3TTSModel
    from qwen3_tts_tpu.runtime.prompts import PromptSpec

    tiny = configs.tiny("custom", quant=False)
    cfg = dataclasses.replace(
        tiny, talker=dataclasses.replace(tiny.talker, vocab_size=1024)
    )
    model = Qwen3TTSModel.synthetic(cfg, seed=0, fast=True)
    bad = PromptSpec(text_tokens=np.array([5, 2000], np.int32))
    with pytest.raises(ValueError, match="tokenizer/config mismatch"):
        model.generator.assemble_prompt(bad)
    # in-range ids still assemble fine
    ok = PromptSpec(text_tokens=np.array([5, 1023], np.int32))
    emb, pad = model.generator.assemble_prompt(ok)
    assert emb.shape[1] >= 2


def test_clamp_ids_raises_for_real_sized_vocab():
    from qwen3_tts_tpu.engine.tokenizer import clamp_ids

    assert clamp_ids([300, 5], 64) == [300 % 64, 5]  # tiny config: aliased
    with pytest.raises(ValueError, match="mismatch"):
        clamp_ids([200_000], 151_936)


def test_device_randomize_preserves_structure_and_envelope():
    """_device_randomize (fast synthetic load on TPU) must reproduce each
    leaf's shape/dtype and value envelope; constant leaves exactly."""
    import numpy as np

    from qwen3_tts_tpu.engine import configs
    from qwen3_tts_tpu.engine.api import _device_randomize
    from qwen3_tts_tpu.models.talker import init_talker

    cfg = configs.tiny("custom", quant=True)
    host = init_talker(cfg, seed=0, fast=True)
    dev = _device_randomize(host, seed=0)

    import jax

    h_leaves = jax.tree.leaves_with_path(host)
    d_leaves = jax.tree.leaves_with_path(dev)
    assert [p for p, _ in h_leaves] == [p for p, _ in d_leaves]
    for (path, h), (_, d) in zip(h_leaves, d_leaves):
        d = np.asarray(d)
        h = np.asarray(h)
        assert d.shape == h.shape, path
        assert d.dtype == h.dtype, path
        if h.size and h.min() == h.max():  # constants reproduce exactly
            assert np.all(d == h), path
        elif h.size:
            lo, hi = float(h.min()), float(h.max())
            span = hi - lo
            assert float(d.min()) >= lo - 1e-6 * abs(span), path
            assert float(d.max()) <= hi + 1e-6 * abs(span), path
