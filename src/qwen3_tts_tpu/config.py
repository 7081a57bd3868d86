"""App configuration, model registry and generation presets.

Layer L0 of the framework (no dependencies on other app modules — mirrors the
reference's config layer, /root/reference/src/qwen3_tts/config.py).

The data (model repos, speakers, emotions, speeds, limits) matches the
reference for capability parity:
- model registry        -> reference config.py:14-42
- speaker map           -> reference config.py:44-49
- emotion presets       -> reference config.py:51-58
- speed presets         -> reference config.py:60-64
- limits / paths        -> reference config.py:5-12

Unlike the reference (bare dicts), the registry is typed, and engine-level
configuration (dtype, quantization, mesh shape, cache sizes) lives in
dataclasses under ``qwen3_tts_tpu.engine.configs``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _root() -> str:
    return os.getcwd()


# --- paths (resolved at import, overridable in tests via module globals) -----
BASE_OUTPUT_DIR = os.path.join(_root(), "outputs")
MODELS_DIR = os.path.join(_root(), "models")
VOICES_DIR = os.path.join(_root(), "voices")

# --- global knobs ------------------------------------------------------------
AUTO_PLAY = True                 # play each generated WAV (reference config.py:9)
SAMPLE_RATE = 24_000             # output sample rate (reference config.py:10)
FILENAME_MAX_LEN = 20            # snippet length in saved filenames (config.py:11)
MAX_TEXT_LENGTH = 10_000         # max input characters (reference config.py:12)


@dataclass(frozen=True)
class ModelSpec:
    """One entry of the model registry (reference config.py:14-42)."""

    key: str                     # menu key: "1" | "2" | "3"
    name: str                    # human name shown in the menu
    repo_id: str                 # Hugging Face repo id
    folder: str                  # local folder name under MODELS_DIR
    mode: str                    # session dispatch: custom | design | clone_manager
    output_subfolder: str        # subfolder of BASE_OUTPUT_DIR for generated WAVs
    description: str
    icon: str = ""


_REGISTRY: tuple[ModelSpec, ...] = (
    ModelSpec(
        key="1",
        name="Custom Voice",
        repo_id="mlx-community/Qwen3-TTS-12Hz-1.7B-CustomVoice-8bit",
        folder="Qwen3-TTS-12Hz-1.7B-CustomVoice-8bit",
        mode="custom",
        output_subfolder="CustomVoice",
        description="Preset speakers with emotion & speed control",
        icon="\U0001f399",
    ),
    ModelSpec(
        key="2",
        name="Voice Design",
        repo_id="mlx-community/Qwen3-TTS-12Hz-1.7B-VoiceDesign-8bit",
        folder="Qwen3-TTS-12Hz-1.7B-VoiceDesign-8bit",
        mode="design",
        output_subfolder="VoiceDesign",
        description="Design a voice from a text description",
        icon="\U0001f3a8",
    ),
    ModelSpec(
        key="3",
        name="Voice Cloning",
        repo_id="mlx-community/Qwen3-TTS-12Hz-1.7B-Base-8bit",
        folder="Qwen3-TTS-12Hz-1.7B-Base-8bit",
        mode="clone_manager",
        output_subfolder="Clones",
        description="Clone any voice from a reference audio sample",
        icon="\U0001f9ec",
    ),
)

# Public registry keyed by menu key — same shape of information as the
# reference's MODELS dict (config.py:14-42), but typed.
MODELS: dict[str, ModelSpec] = {spec.key: spec for spec in _REGISTRY}

# --- speakers (reference config.py:44-49) ------------------------------------
SPEAKER_MAP: dict[str, list[str]] = {
    "English": ["Ryan", "Aiden", "Serena", "Vivian"],
    "Chinese": ["Vivian", "Serena", "Uncle_Fu", "Dylan", "Eric"],
    "Japanese": ["Ono_Anna"],
    "Korean": ["Sohee"],
}


def all_speakers() -> list[str]:
    """Flattened, order-preserving, de-duplicated speaker list."""
    seen: dict[str, None] = {}
    for names in SPEAKER_MAP.values():
        for n in names:
            seen.setdefault(n, None)
    return list(seen)


# --- emotion presets (reference config.py:51-58) -----------------------------
# key -> (label, instruct text); a None instruct means "prompt the user".
EMOTION_PRESETS: dict[str, tuple[str, str | None]] = {
    "1": ("Normal", "Normal tone"),
    "2": ("Sad", "Sad and crying, speaking slowly"),
    "3": ("Excited", "Excited and happy, speaking very fast"),
    "4": ("Angry", "Angry and shouting"),
    "5": ("Whisper", "Whispering quietly"),
    "6": ("Custom", None),
}

# --- speed presets (reference config.py:60-64) -------------------------------
SPEED_PRESETS: dict[str, tuple[str, float]] = {
    "1": ("Normal", 1.0),
    "2": ("Fast", 1.3),
    "3": ("Slow", 0.8),
}


@dataclass
class EngineSettings:
    """Engine-level knobs threaded into model load (new vs the reference —
    the reference has no engine configuration because MLX hides it)."""

    dtype: str = "bfloat16"          # activation dtype
    quant: str = "int8"              # weight quant: int8 | none (bf16)
    max_decode_frames: int = 2048    # KV-cache length budget for one chunk
    decode_chunk: int = 8            # frames decoded per on-device scan chunk
    mesh_shape: dict[str, int] = field(default_factory=lambda: {"dp": 1, "tp": 1})
    use_pallas: str = "auto"         # auto | always | never
