#!/usr/bin/env python3
"""Randomized soak of the ServingEngine state machine on CPU.

Fuzzes the slot lifecycle — random submits (varied prompt lengths and
budgets), interleaved decode steps, random cancellations, deferred-fetch
toggling is env-driven — and checks the invariants the unit tests assert
only on fixed scripts:

- every non-cancelled stream finishes and its wav length == frames * hop;
- slots always recycle (free_slots returns to max);
- cancel never corrupts a later occupant (ids never resurrect);
- the engine never raises.

Usage: QWEN3_TTS_CPU=1 python tools/soak_serving.py [--seconds 300] [--seed 0]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import jax

if os.environ.get("QWEN3_TTS_CPU", "0") not in ("", "0") or (
    os.environ.get("JAX_PLATFORMS") == "cpu"
):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from qwen3_tts_tpu.engine import configs  # noqa: E402
from qwen3_tts_tpu.engine.api import Qwen3TTSModel  # noqa: E402
from qwen3_tts_tpu.runtime.prompts import PromptSpec  # noqa: E402
from qwen3_tts_tpu.runtime.sampling import SamplingConfig  # noqa: E402
from qwen3_tts_tpu.runtime.serving import ServingEngine  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=300.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--codec", choices=["rvq", "code2wav"], default="rvq",
                    help="codec architecture to soak (code2wav = the real "
                    "decoder family incl. per-stream startup drops)")
    ap.add_argument("--pipeline", type=int, default=1,
                    help=">1 keeps N speculative steps in flight, so "
                         "cancels race dispatched-but-uncollected payloads")
    ap.add_argument("--protocol", choices=["cb0", "feedback"], default="cb0",
                    help="feedback = the published residual-sum decode "
                         "protocol (trailing text, per-frame cp)")
    ap.add_argument("--accum", action="store_true",
                    help="accumulate_wav batch mode (device-resident audio,"
                         " one fetch per finished stream)")
    args = ap.parse_args()
    from qwen3_tts_tpu.device_lock import require_device_lock

    require_device_lock('soak_serving.py')

    rng = np.random.default_rng(args.seed)
    if args.protocol == "feedback":
        assert args.codec == "rvq", "feedback soak uses the tiny rvq config"
        assert not args.accum, "accum is not wired for the feedback protocol"
        cfg = configs.tiny_feedback("custom")
    else:
        cfg = (configs.tiny_code2wav("custom") if args.codec == "code2wav"
               else configs.tiny("custom"))
    model = Qwen3TTSModel.synthetic(cfg, seed=5)
    engine = ServingEngine(
        model, max_streams=args.streams,
        sampling=SamplingConfig(temperature=0.9, top_k=20),
        accumulate_wav=args.accum, accum_cap_frames=220,
    )
    hop = model.cfg.codec.hop
    # code2wav streams drop a fixed startup run-in per utterance
    startup = (model.cfg.code2wav.startup_samples
               if model.cfg.codec_arch == "code2wav" else 0)

    live: dict[int, int] = {}     # stream_id -> budget
    inflight: list = []
    cancelled: set[int] = set()
    finished = 0
    submitted = 0
    deadline = time.time() + args.seconds

    while time.time() < deadline or live:
        # random submits while slots free (after the deadline, just drain)
        while (
            time.time() < deadline
            and engine.free_slots()
            and rng.random() < 0.7
        ):
            n_tok = int(rng.integers(3, 40))
            prompt = PromptSpec(
                text_tokens=rng.integers(
                    0, model.cfg.talker.vocab_size, n_tok
                ).astype(np.int32),
                speaker_id=int(rng.integers(0, 4)),
            )
            sid = engine.submit(
                prompt, max_frames=int(rng.integers(2, 40))
            )
            assert sid not in live and sid not in cancelled, "id resurrected"
            live[sid] = 1
            submitted += 1

        # random cancellation
        if live and rng.random() < 0.08:
            victim = int(rng.choice(list(live)))
            engine.cancel(victim)
            cancelled.add(victim)
            del live[victim]

        if args.pipeline > 1:
            while len(inflight) < args.pipeline:
                payload = engine.dispatch_step()
                if payload is None:
                    break
                inflight.append(payload)
            engine.collect_step(inflight.pop(0) if inflight else None)
        else:
            engine.step()

        for sid in [s for s in live if engine.streams[s].done]:
            wav, st = engine.collect(sid)
            want = st.frames * hop - startup if st.frames else 0
            assert len(wav) == want, (
                f"stream {sid}: wav {len(wav)} != frames {st.frames} * "
                f"{hop} - {startup}"
            )
            del live[sid]
            del engine.streams[sid]
            finished += 1

        if submitted % 50 == 1:
            sys.stderr.write(
                f"\r[{time.time() - deadline + args.seconds:6.0f}s] "
                f"submitted={submitted} finished={finished} "
                f"cancelled={len(cancelled)} live={len(live)}"
            )

    assert engine.free_slots() == args.streams, "slots leaked"
    print(
        f"\nsoak OK: {submitted} submitted, {finished} finished, "
        f"{len(cancelled)} cancelled, 0 invariant violations"
    )


if __name__ == "__main__":
    main()
