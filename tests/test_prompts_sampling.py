"""Prompt construction (three call shapes -> templates/conditioning) and
on-device sampling semantics."""

import numpy as np
import pytest

from qwen3_tts_tpu.runtime.prompts import (
    build_prompt,
    render_template,
    speed_bucket,
)


class _Tok:
    def encode(self, text):
        return list(text.encode("utf-8"))


def test_speed_buckets():
    assert speed_bucket(0.8) == "slow"
    assert speed_bucket(1.0) == "normal"
    assert speed_bucket(1.3) == "fast"


def test_render_template_modes():
    custom = render_template("custom", "hi", instruct="angry", speed=1.3)
    assert "angry" in custom and "speed:fast" in custom and custom.endswith("hi")
    design = render_template("design", "hi", instruct="a deep voice")
    assert "a deep voice" in design
    base = render_template("base", "hi", ref_text="the reference words")
    assert "the reference words" in base
    # "." sentinel means "no transcript" (reference clone.py:148-150)
    assert render_template("base", "hi", ref_text=".") == "hi"
    with pytest.raises(ValueError):
        render_template("nope", "hi")


def test_build_prompt_speaker_resolution():
    speakers = ("ryan", "serena")
    p = build_prompt(_Tok(), "custom", "x", voice="Serena", speakers=speakers)
    assert p.speaker_id == 1
    p = build_prompt(_Tok(), "custom", "x", voice="unknown", speakers=speakers)
    assert p.speaker_id == 0  # unknown -> default voice
    p = build_prompt(_Tok(), "design", "x", instruct="desc")
    assert p.speaker_id is None


def test_sampling_semantics():
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp

    from qwen3_tts_tpu.runtime.sampling import SamplingConfig, sample_token

    logits = jnp.asarray(
        np.array([[0.0, 5.0, 1.0, -2.0, 4.0]]), jnp.float32
    )
    key = jax.random.PRNGKey(0)

    # greedy picks the argmax
    assert int(sample_token(logits, key, SamplingConfig(greedy=True))[0]) == 1
    # temperature <= 0 degrades to greedy
    assert int(sample_token(logits, key, SamplingConfig(temperature=0.0))[0]) == 1

    # top-k=2 restricts support to {1, 4}
    cfg = SamplingConfig(temperature=1.0, top_k=2)
    draws = {
        int(sample_token(logits, jax.random.PRNGKey(i), cfg)[0])
        for i in range(40)
    }
    assert draws <= {1, 4} and len(draws) == 2

    # top-p tiny keeps only the single most likely token
    cfg = SamplingConfig(temperature=1.0, top_k=0, top_p=0.1)
    draws = {
        int(sample_token(logits, jax.random.PRNGKey(i), cfg)[0])
        for i in range(20)
    }
    assert draws == {1}
