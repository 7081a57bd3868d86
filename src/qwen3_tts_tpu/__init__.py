"""qwen3_tts_tpu — a TPU-native Qwen3-TTS framework.

Re-implements the full capability surface of the reference app
(gyroworld/qwen3-tts-apple-silicon) and, unlike the reference — which delegates
all neural inference to the external ``mlx_audio`` package — ships its own
inference engine built from scratch in JAX/XLA/Pallas for TPU:

- ``engine``   : public ``load_model`` / ``generate_audio`` API (the observable
                 contract of mlx_audio per reference io.py:111 and
                 sessions/custom.py:163).
- ``models``   : the Qwen3 talker transformer, residual-codebook predictor and
                 the 12 Hz neural codec (encoder + decoder/vocoder).
- ``ops``      : Pallas TPU kernels (fused int8 dequant matmul, KV-cache decode
                 attention) with XLA reference implementations for CPU/tests.
- ``runtime``  : jitted prefill/decode loops, sampling, KV caches, and a
                 continuously-batched multi-stream serving engine.
- ``parallel`` : device-mesh / sharding configuration (tensor- and
                 data-parallel layouts over ``jax.sharding.Mesh``).
- ``audio``    : WAV I/O, polyphase resampling/conversion, playback probing and
                 jitted feature extraction (replaces the reference's
                 AVFoundation / afconvert / afplay platform glue).
- app modules  : ``config``, ``ui``, ``io``, ``voices``, ``transcription`` and
                 ``sessions`` mirror the reference's layer map (SURVEY.md §1).
"""

__version__ = "0.1.0"
