"""Chat-template rendering against a REALISTIC Qwen-style ChatML template.

VERDICT r2 weak #5: the chat-template path's role mapping (instruct ->
system, text -> user) was only exercised with fabricated templates; a wrong
mapping on a real checkpoint would mis-condition the talker while looking
healthy. These goldens pin the render against actual ChatML (`<|im_start|>`
roles, the Qwen tokenizer_config.json shape), and the special-token gate
rejects a template whose markers the tokenizer doesn't know.
"""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
pytest.importorskip("jinja2")

from qwen3_tts_tpu.runtime.prompts import (  # noqa: E402
    PromptTemplate,
    build_prompt,
    load_prompt_template,
    validate_special_tokens,
)

# the structural core of the shipped Qwen chat templates (qwen2.5/qwen3
# tokenizer_config.json): ChatML roles wrapped in <|im_start|>/<|im_end|>,
# trailing assistant header under add_generation_prompt
QWEN_CHATML = (
    "{%- for message in messages %}"
    "{{- '<|im_start|>' + message['role'] + '\\n' + message['content']"
    " + '<|im_end|>' + '\\n' }}"
    "{%- endfor %}"
    "{%- if add_generation_prompt %}"
    "{{- '<|im_start|>assistant\\n' }}"
    "{%- endif %}"
)


@pytest.fixture
def chatml_template(tmp_path):
    path = str(tmp_path / "ckpt")
    os.makedirs(path)
    with open(os.path.join(path, "tokenizer_config.json"), "w") as f:
        json.dump({"chat_template": QWEN_CHATML}, f)
    tpl = load_prompt_template(path)
    assert tpl.source == "chat_template"
    return tpl


def test_chatml_golden_custom(chatml_template):
    out = chatml_template.render(
        "custom", "Hello there.", instruct="Speak happily.", speed=1.0,
        voice="ryan",
    )
    assert out == (
        "<|im_start|>system\nSpeak happily.<|im_end|>\n"
        "<|im_start|>user\nHello there.<|im_end|>\n"
        "<|im_start|>assistant\n"
    )


def test_chatml_golden_custom_no_instruct(chatml_template):
    """No instruct -> no system turn (the reference passes instruct=None
    for the 'Neutral' emotion — custom.py:108-120)."""
    out = chatml_template.render("custom", "Hello there.", speed=1.0)
    assert out == (
        "<|im_start|>user\nHello there.<|im_end|>\n"
        "<|im_start|>assistant\n"
    )


def test_chatml_golden_design(chatml_template):
    out = chatml_template.render(
        "design", "Read this.", instruct="A deep calm narrator voice."
    )
    assert out == (
        "<|im_start|>system\nA deep calm narrator voice.<|im_end|>\n"
        "<|im_start|>user\nRead this.<|im_end|>\n"
        "<|im_start|>assistant\n"
    )


def test_chatml_golden_clone_ref_and_noref(chatml_template):
    out = chatml_template.render("base", "Target text.",
                                 ref_text="The reference transcript.")
    assert out == (
        "<|im_start|>system\nThe reference transcript.<|im_end|>\n"
        "<|im_start|>user\nTarget text.<|im_end|>\n"
        "<|im_start|>assistant\n"
    )
    # "." = the reference's missing-transcript fallback (clone.py:148-150)
    out = chatml_template.render("base", "Target text.", ref_text=".")
    assert out == (
        "<|im_start|>user\nTarget text.<|im_end|>\n"
        "<|im_start|>assistant\n"
    )


# -- special-token gate --------------------------------------------------------


class _SpecialsTok:
    """A real-checkpoint-shaped tokenizer: ChatML markers are single
    special tokens; everything else tokenizes as bytes after them."""

    vocab_size = 1000

    _SPECIALS = {"<|im_start|>": 900, "<|im_end|>": 901}

    def encode(self, text):
        ids, i = [], 0
        while i < len(text):
            for s, tid in self._SPECIALS.items():
                if text.startswith(s, i):
                    ids.append(tid)
                    i += len(s)
                    break
            else:
                ids.append(ord(text[i]) % 512)
                i += 1
        return ids


class _NoSpecialsTok:
    """Knows no special tokens — every marker splits into bytes (the
    wrong-tokenizer-for-this-template failure shape)."""

    vocab_size = 1000

    def encode(self, text):
        return [ord(c) % 512 for c in text]


def test_validate_accepts_known_specials():
    validate_special_tokens(
        "<|im_start|>user\nhi<|im_end|>\n<|im_start|>assistant\n",
        _SpecialsTok(),
    )


def test_validate_rejects_split_markers():
    with pytest.raises(ValueError, match="does not know as special"):
        validate_special_tokens("<|im_start|>user\n", _NoSpecialsTok())


def test_build_prompt_gates_chat_template_renders(chatml_template):
    spec = build_prompt(
        _SpecialsTok(), "custom", "Hi.", voice="ryan",
        speakers=("ryan",), instruct="Warm.", template=chatml_template,
    )
    assert spec.rendered.startswith("<|im_start|>system\nWarm.")
    assert spec.text_tokens.dtype == np.int32

    with pytest.raises(ValueError, match="does not know as special"):
        build_prompt(
            _NoSpecialsTok(), "custom", "Hi.", voice="ryan",
            speakers=("ryan",), instruct="Warm.", template=chatml_template,
        )


def test_synthetic_templates_skip_the_gate():
    """Synthetic fallback tags are placeholders by design (byte tokenizer,
    tiny vocab) — the gate must not fire there."""
    from qwen3_tts_tpu.engine.tokenizer import ByteTokenizer

    spec = build_prompt(
        ByteTokenizer(), "custom", "Hi.", voice="ryan", speakers=("ryan",),
        instruct="Warm.", template=PromptTemplate(),
    )
    assert "<|instruct|>" in spec.rendered


def test_import_report_carries_template_audit(tmp_path):
    """import_hf_checkpoint surfaces the template source + per-mode sample
    renders, so first contact with real weights can eyeball what the
    talker is conditioned on."""
    from safetensors.numpy import save_file

    from test_weights import _hf_config_dict

    from qwen3_tts_tpu.engine import configs
    from qwen3_tts_tpu.engine.weights import import_hf_checkpoint

    tiny = configs.tiny("custom")
    path = str(tmp_path / "ckpt")
    os.makedirs(path)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(_hf_config_dict(tiny), f)
    with open(os.path.join(path, "tokenizer_config.json"), "w") as f:
        json.dump({"chat_template": QWEN_CHATML}, f)
    save_file({"codec.dec.ln": np.ones(tiny.codec.latent_dim, np.float32)},
              os.path.join(path, "model.safetensors"))

    with pytest.warns(UserWarning):
        model = import_hf_checkpoint(path, allow_partial=True)
    rep = model.import_report.prompt_template
    assert rep["source"] == "chat_template"
    assert rep["samples"]["custom"].startswith(
        "<|im_start|>system\nSpeak warmly."
    )
    assert set(rep["samples"]) == {"custom", "design", "base"}
