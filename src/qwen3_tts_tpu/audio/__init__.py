"""Audio substrate: WAV I/O, resampling/conversion, playback, features.

Replaces the reference's platform glue — AVFoundation / afconvert
(/root/reference/src/qwen3_tts/apple_audio.py) and afplay
(/root/reference/src/qwen3_tts/io.py:171-176) — with portable, array-based
implementations that work on Linux TPU hosts and in CI.
"""

from .wavio import read_wav, to_mono, wav_info, write_wav  # noqa: F401
from .resample import resample, convert_to_wav  # noqa: F401
from .playback import play_wav  # noqa: F401
