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
    # unknown speakers fail loudly (the reference surfaces them at the
    # picker; silent voice-0 substitution hid typos from API users)
    with pytest.raises(ValueError, match="unknown speaker"):
        build_prompt(_Tok(), "custom", "x", voice="nope", speakers=speakers)
    p = build_prompt(_Tok(), "design", "x", instruct="desc")
    assert p.speaker_id is None


def test_template_from_file_drives_all_three_modes(tmp_path):
    """Per-mode templates from a checkpoint's tts_prompts.json drive the
    rendered token stream (VERDICT.md next #4), covering the reference's
    three call shapes (custom.py:163-170, design.py:76-81, clone.py:218-224)."""
    import json

    from qwen3_tts_tpu.runtime.prompts import load_prompt_template

    spec = {
        "custom": "<V>{voice}</V><I>{instruct}</I><S>{speed_bucket}</S>{text}",
        "design": "<D>{instruct}</D>{text}",
        "base": "<R>{ref_text}</R>{text}",
        "base_noref": "{text}",
    }
    (tmp_path / "tts_prompts.json").write_text(json.dumps(spec))
    tpl = load_prompt_template(str(tmp_path))
    assert tpl.source == "file"

    p = build_prompt(
        _Tok(), "custom", "hello", voice="Ryan", speakers=("ryan",),
        instruct="angry", speed=1.3, template=tpl,
    )
    assert bytes(p.text_tokens.tolist()).decode() == "<V>ryan</V><I>angry</I><S>fast</S>hello"
    p = build_prompt(_Tok(), "design", "hi", instruct="a deep voice", template=tpl)
    assert bytes(p.text_tokens.tolist()).decode() == "<D>a deep voice</D>hi"
    p = build_prompt(_Tok(), "base", "hi", ref_text="the words", template=tpl)
    assert bytes(p.text_tokens.tolist()).decode() == "<R>the words</R>hi"
    p = build_prompt(_Tok(), "base", "hi", ref_text=".", template=tpl)
    assert bytes(p.text_tokens.tolist()).decode() == "hi"


def test_template_from_chat_template(tmp_path):
    """A tokenizer_config.json chat_template renders the prompt the way
    transformers' apply_chat_template would."""
    import json

    from qwen3_tts_tpu.runtime.prompts import load_prompt_template

    ct = (
        "{% for m in messages %}<|im_start|>{{ m.role }}\n"
        "{{ m.content }}<|im_end|>\n{% endfor %}"
        "{% if add_generation_prompt %}<|im_start|>assistant\n{% endif %}"
    )
    (tmp_path / "tokenizer_config.json").write_text(
        json.dumps({"chat_template": ct})
    )
    tpl = load_prompt_template(str(tmp_path))
    assert tpl.source == "chat_template"
    out = tpl.render("custom", "hello", instruct="whisper", speed=1.0)
    assert "<|im_start|>system\nwhisper<|im_end|>" in out
    assert "<|im_start|>user\nhello<|im_end|>" in out
    assert out.endswith("<|im_start|>assistant\n")
    # cloning: the reference transcript becomes the system turn
    out = tpl.render("base", "target", ref_text="said before")
    assert "system\nsaid before" in out


def test_template_fallback_is_synthetic(tmp_path):
    from qwen3_tts_tpu.runtime.prompts import load_prompt_template

    tpl = load_prompt_template(str(tmp_path))
    assert tpl.source == "synthetic"
    assert tpl.render("custom", "hi", instruct="x", speed=1.3) == \
        render_template("custom", "hi", instruct="x", speed=1.3)


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


def test_overlong_prompt_truncation_keeps_speaker_row():
    """Over-long prompts truncate TEXT, never the speaker conditioning at
    the head of the sequence."""
    import numpy as np

    from qwen3_tts_tpu.engine import configs
    from qwen3_tts_tpu.engine.api import Qwen3TTSModel
    from qwen3_tts_tpu.runtime.prompts import PromptSpec

    model = Qwen3TTSModel.synthetic(configs.tiny("custom"), seed=0)
    gen = model.generator
    long_text = np.arange(220, dtype=np.int32) % 200
    emb, pad = gen.assemble_prompt(
        PromptSpec(text_tokens=long_text, speaker_id=2)
    )
    assert pad == 0  # truncated to the bucket exactly
    spk = np.asarray(model.params["spk_emb"][2], np.float32)
    np.testing.assert_array_equal(
        np.asarray(emb[0, 0], np.float32), spk
    )


def test_codec_prompt_head_from_config():
    """Checkpoint-defined think-token ids insert a codec prompt head before
    BOS in BOTH the decode prompt and the training layout (PARITY.md);
    absent ids (the default) leave everything unchanged."""
    import dataclasses

    import numpy as np

    from qwen3_tts_tpu.engine import configs
    from qwen3_tts_tpu.engine.api import Qwen3TTSModel
    from qwen3_tts_tpu.runtime.prompts import PromptSpec
    from qwen3_tts_tpu.training.loss import joint_loss
    from qwen3_tts_tpu.training.train import synthetic_batch

    base = configs.tiny("custom", quant=False)
    assert base.talker.codec_prompt_head == ()
    cfg = dataclasses.replace(
        base,
        talker=dataclasses.replace(
            base.talker, codec_vocab=70, codec_nothink=67,
            codec_think_bos=68, codec_think_eos=69,
        ),
    )
    assert cfg.talker.codec_prompt_head == (67, 68, 69)

    m_plain = Qwen3TTSModel.synthetic(base, seed=0)
    m_head = Qwen3TTSModel.synthetic(cfg, seed=0)
    prompt = PromptSpec(text_tokens=np.arange(5, dtype=np.int32),
                        speaker_id=1)
    emb_p, pad_p = m_plain.generator.assemble_prompt(prompt)
    emb_h, pad_h = m_head.generator.assemble_prompt(prompt)
    # same bucket, three fewer pad rows: the head occupies real positions
    assert emb_p.shape == emb_h.shape
    assert pad_h == pad_p - 3
    # the rows right before BOS are the head embeddings, in order
    Lb = emb_h.shape[1]
    for k, tok in enumerate((67, 68, 69)):
        want = np.asarray(m_head.params["codec_emb"][tok], np.float32)
        got = np.asarray(emb_h[0, Lb - 4 + k], np.float32)
        np.testing.assert_array_equal(got, want)

    # the training layout mirrors it: losses differ from the plain config
    # but stay finite (BOS indexing shifted correctly)
    batch = synthetic_batch(cfg, batch_size=2, t_text=6, t_frames=4, seed=1)
    loss_h, _ = joint_loss(m_head.params, m_head.cp_params, cfg, batch)
    assert np.isfinite(float(loss_h))

    # guard rails: a partial head and out-of-range ids fail loudly at
    # config construction (a clamped gather would silently mis-condition)
    import pytest

    with pytest.raises(ValueError, match="all three"):
        dataclasses.replace(base.talker, codec_nothink=64)
    with pytest.raises(ValueError, match="out of range"):
        dataclasses.replace(
            base.talker, codec_nothink=200, codec_think_bos=201,
            codec_think_eos=202,
        )


def test_speaker_codec_token_from_config():
    """A checkpoint-defined speaker_id map (name -> codec token) conditions
    the speaker as a codec control token in the prompt instead of the
    synthetic spk_emb row; unknown voices list the map's names."""
    import dataclasses

    import numpy as np
    import pytest

    from qwen3_tts_tpu.engine import configs
    from qwen3_tts_tpu.engine.api import Qwen3TTSModel
    from qwen3_tts_tpu.runtime.prompts import PromptSpec, build_prompt

    base = configs.tiny("custom", quant=False)
    cfg = dataclasses.replace(
        base,
        speakers=("vivian", "ryan"),
        talker=dataclasses.replace(
            base.talker, speaker_tokens=(("ryan", 60), ("vivian", 61)),
        ),
    )
    model = Qwen3TTSModel.synthetic(cfg, seed=0)

    spec = build_prompt(
        model.tokenizer, "custom", "hello", voice="Ryan",
        speakers=cfg.speakers, speaker_tokens=dict(cfg.talker.speaker_tokens),
    )
    assert spec.speaker_token == 60 and spec.speaker_id is None

    with pytest.raises(ValueError, match="unknown speaker"):
        build_prompt(
            model.tokenizer, "custom", "hello", voice="nobody",
            speakers=cfg.speakers,
            speaker_tokens=dict(cfg.talker.speaker_tokens),
        )

    # the token's embedding row lands in the assembled prompt (before BOS)
    emb, pad = model.generator.assemble_prompt(
        PromptSpec(text_tokens=np.arange(4, dtype=np.int32),
                   speaker_token=60)
    )
    Lb = emb.shape[1]
    want = np.asarray(model.params["codec_emb"][60], np.float32)
    np.testing.assert_array_equal(np.asarray(emb[0, Lb - 2], np.float32), want)

    # ids outside the codec vocab fail loudly at config construction
    with pytest.raises(ValueError, match="out of range"):
        dataclasses.replace(base.talker, speaker_tokens=(("x", 999),))

    # config round trip keeps the map (nested tuples survive JSON)
    from qwen3_tts_tpu.engine.weights import config_from_dict, config_to_dict
    import json

    back = config_from_dict(json.loads(json.dumps(config_to_dict(cfg))))
    assert back.talker.speaker_tokens == (("ryan", 60), ("vivian", 61))


def test_fast_cb0_assembly_matches_eager():
    """The one-dispatch jitted cb0 assembly (TTFA lever) must be
    BIT-identical to the eager chain across text lengths, buckets, and
    speaker kinds; ineligible prompts (clone vectors, overlong) keep the
    eager path."""
    from qwen3_tts_tpu.engine import configs
    from qwen3_tts_tpu.engine.api import Qwen3TTSModel
    from qwen3_tts_tpu.runtime.prompts import PromptSpec

    m = Qwen3TTSModel.synthetic(configs.tiny("custom"), seed=3)
    gen = m.generator
    cases = [
        PromptSpec(text_tokens=np.arange(T, dtype=np.int32) % 97 + 1,
                   speaker_id=2)
        for T in (1, 6, 40, 61, 64, 100)
    ]
    cases.append(PromptSpec(
        text_tokens=np.arange(12, dtype=np.int32) + 1, speaker_id=None
    ))
    cases.append(PromptSpec(
        text_tokens=np.arange(12, dtype=np.int32) + 1, speaker_token=3
    ))
    for p in cases:
        emb_f, pad_f = gen._assemble_cb0(p)
        gen._fast_assembly = False
        try:
            emb_e, pad_e = gen._assemble_cb0(p)
        finally:
            gen._fast_assembly = True
        assert pad_f == pad_e, (p.text_tokens.size,)
        np.testing.assert_array_equal(
            np.asarray(emb_f), np.asarray(emb_e),
            err_msg=f"T={p.text_tokens.size}",
        )
