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

The exact template strings are a checkpoint-compatibility adapter point: when
real Qwen3-TTS weights are loaded, ``engine.weights`` can override
``render_template`` via the model's ``template`` attribute.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class PromptSpec:
    """Host-side description of one prompt, ready to embed on device."""

    text_tokens: np.ndarray            # [T_text] int32
    speaker_id: int | None = None      # index into the talker spk_emb table
    # cloning extras:
    acoustic_codes: np.ndarray | None = None   # [Q, T_ref] codec codes
    speaker_vector: np.ndarray | None = None   # [D_talker] from codec encoder


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
    """Render the text half of the prompt for ``mode``."""
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
) -> PromptSpec:
    rendered = render_template(
        mode, text, instruct=instruct, speed=speed, ref_text=ref_text
    )
    tokens = np.asarray(tokenizer.encode(rendered), dtype=np.int32)

    speaker_id: int | None = None
    if mode == "custom" and voice:
        name = voice.lower()
        if name in speakers:
            speaker_id = speakers.index(name)
        else:
            speaker_id = 0  # unknown speaker name -> default voice

    return PromptSpec(
        text_tokens=tokens,
        speaker_id=speaker_id,
        acoustic_codes=acoustic_codes,
        speaker_vector=speaker_vector,
    )
