"""Text tokenization for the talker.

Real checkpoints ship a Qwen3 tokenizer (tokenizer.json etc.) which is loaded
through ``transformers``. When no tokenizer files exist (synthetic models,
CI), a deterministic byte-level fallback keeps every code path runnable —
the same absent-by-default gating philosophy the reference applies to its
optional platform features (transcription.py:7,22-24).
"""

from __future__ import annotations

import os


class ByteTokenizer:
    """UTF-8 byte fallback: ids 0..255, deterministic, vocab-safe."""

    vocab_size = 256

    def encode(self, text: str) -> list[int]:
        return list(text.encode("utf-8"))

    def decode(self, ids) -> str:
        return bytes(int(i) % 256 for i in ids).decode("utf-8", errors="replace")


class HFTokenizer:
    """transformers-backed tokenizer (Qwen3 BPE for real checkpoints)."""

    def __init__(self, path: str):
        from transformers import AutoTokenizer

        self._tok = AutoTokenizer.from_pretrained(path, trust_remote_code=False)
        self.vocab_size = len(self._tok)

    def encode(self, text: str) -> list[int]:
        return self._tok.encode(text, add_special_tokens=False)

    def decode(self, ids) -> str:
        return self._tok.decode(list(ids))


def load_tokenizer(model_path: str | None, vocab_size: int):
    """Pick the best available tokenizer for a model directory.

    Falls back to bytes when files are missing or the text vocab is smaller
    than 256 (tiny test configs clamp byte ids with a modulo in that case —
    handled by the caller via ``clamp_ids``).
    """
    if vocab_size < 256:
        # tiny test configs: a real tokenizer would emit ids past the
        # embedding table; the byte fallback + caller-side clamp_ids is
        # the supported path
        return ByteTokenizer()
    if model_path is not None:
        for fname in ("tokenizer.json", "tokenizer_config.json", "vocab.json"):
            if os.path.exists(os.path.join(model_path, fname)):
                try:
                    return HFTokenizer(model_path)
                except Exception:
                    break
    return ByteTokenizer()


def clamp_ids(ids, vocab_size: int) -> list[int]:
    """Map token ids into [0, vocab_size) — ONLY legal for tiny synthetic
    configs whose embedding tables are smaller than the byte tokenizer's 256
    ids. For real-sized configs an out-of-range id means the tokenizer does
    not belong to the checkpoint; aliasing it would silently corrupt the
    prompt, so this raises instead (mirrors runtime.generate.assemble_prompt).
    """
    ids = [int(i) for i in ids]
    if not ids:
        return ids
    if (max(ids) >= vocab_size or min(ids) < 0) and vocab_size >= 512:
        raise ValueError(
            f"token id {max(ids)} out of range for vocab_size {vocab_size}: "
            f"tokenizer/config mismatch"
        )
    return [i % vocab_size for i in ids]
