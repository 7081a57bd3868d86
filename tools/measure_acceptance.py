"""Measure the trained grouped-draft's acceptance rate for the speculative
depth decode (VERDICT r3 #2b).

The lossless recovery path (``finetune.py --depth-group K --spec``) runs
the grouped heads as a DRAFT and verifies with teacher-forced full-depth
passes; its decode cost sits between the dg=K ladder shape (acceptance 1)
and ~0.6x the raw import (acceptance 0) at the draft's ACCEPTANCE — the
fraction of depths where the draft equals the exact dg=1 greedy chain.
PERF.md round 3 measured only the two synthetic endpoints; this tool
produces the missing number on the trained tiny pipeline (the same rig
that calibrated the quality gate):

 1. train a tiny published-protocol model to memorization
    (``finetune.py --model synthetic-tiny-feedback``);
 2. apply the documented recovery fine-tune from its export
    (``--depth-group 3 --spec``; dg=3 is the tiny analog of flagship
    dg=15 — the tiny codec has 3 residual codebooks);
 3. teacher-force the tuned model over train AND HELD-OUT prompts
    (training/loss.py `_talker_hidden_and_logits` — the exact hiddens the
    cp sees in decode), then per frame compare the grouped draft against
    the exact sequential dg=1 greedy chain, and run the real spec
    while_loop for its correction-round count.

Prints one JSON line: per-depth acceptance, overall acceptance, mean
correction rounds (train and held-out), plus the untrained-draft floor.
The held-out acceptance is what transfers to bench.py's pinned-surgery
spec entry (QWEN3_TTS_BENCH_SPEC_ACCEPT); flagship dg=15 has 5x the
depths, so treat it as the per-depth agreement rate, not a rounds count.

Usage: python tools/measure_acceptance.py [--steps1 600] [--steps2 200]
       [--keep DIR]
"""

from __future__ import annotations

import argparse
import dataclasses as dc
import json
import os
import shutil
import sys
import tempfile
import wave

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

# offline CPU pipeline: force the platform before any jax import touches
# the preloaded TPU plugin, and let finetune.main see the same decision
os.environ["QWEN3_TTS_CPU"] = "1"

import numpy as np  # noqa: E402


def _write_pair(d: str, name: str, text: str, seconds: float, freq: float,
                sr: int = 24_000) -> None:
    t = np.arange(int(seconds * sr))
    pcm = (np.sin(2 * np.pi * freq * t / sr) * 9000).astype(np.int16)
    with wave.open(os.path.join(d, f"{name}.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    with open(os.path.join(d, f"{name}.txt"), "w") as fh:
        fh.write(text + "\n")


_TRAIN_TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "speech synthesis turns text into sound",
    "a calm narrator reads the evening news",
    "numbers station nine repeating at dawn",
    "the harbor lights flicker across the bay",
    "gentle rain taps against the window glass",
    "seven travelers crossed the old stone bridge",
    "morning coffee steams beside the keyboard",
]
_HELDOUT_TEXTS = [
    "an unexpected melody drifts through the market",
    "the telescope found a new comet last night",
    "fresh bread cools on the bakery windowsill",
    "winter trains run slower through the mountains",
]


def _make_dataset(d: str, texts: list[str], base_freq: float) -> None:
    os.makedirs(d, exist_ok=True)
    for i, text in enumerate(texts):
        _write_pair(d, f"clip{i}", text, seconds=0.35 + 0.05 * (i % 4),
                    freq=base_freq + 40.0 * i)


def _frame_inputs(model, pairs, batch_size: int = 4):
    """Teacher-forced (hidden, cb0, target-residuals ground truth) triples
    for every valid frame: exactly what the code predictor consumes in
    decode, extracted with the training forward (training/loss.py)."""
    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.training import loss as loss_mod
    from qwen3_tts_tpu.training.data import batches_from_pairs

    hs, cb0s = [], []
    for batch in batches_from_pairs(model, pairs, batch_size=batch_size,
                                    shuffle_seed=0):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        hidden, _ = loss_mod._talker_hidden_and_logits(
            model.params, model.cfg, batch, cp_params=model.cp_params
        )                                                  # [B, Tf, D]
        mask = np.asarray(batch["frame_mask"])             # [B, Tf]
        h = np.asarray(hidden.astype(jnp.float32))
        cb0 = np.asarray(batch["codes"][:, 0, :])
        hs.append(h[mask])
        cb0s.append(cb0[mask])
    return np.concatenate(hs), np.concatenate(cb0s)


def _acceptance(model, hidden: np.ndarray, cb0: np.ndarray,
                rounds_rows: int = 64) -> dict:
    """Draft-vs-exact agreement per depth + real spec-loop round counts."""
    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.models.code_predictor import (
        predict_residuals,
        predict_residuals_spec,
    )

    cfg = model.cfg
    cfg1 = dc.replace(
        cfg, code_predictor=dc.replace(
            cfg.code_predictor, depth_group=1, spec_decode=False
        )
    )
    h = jnp.asarray(hidden)
    c = jnp.asarray(cb0)
    draft = np.asarray(predict_residuals(
        model.cp_params, cfg, h, c, _as_draft=True
    ))                                                     # [N, Q-1]
    exact = np.asarray(predict_residuals(
        model.cp_params, cfg1, h, c
    ))                                                     # [N, Q-1]
    agree = draft == exact
    # real correction-round counts: one spec while_loop per frame (B=1 so
    # the loop's trip count is that frame's own cost, not a batch max)
    spec_one = jax.jit(lambda hh, cc: predict_residuals_spec(
        model.cp_params, cfg, hh, cc, return_rounds=True
    ))
    n = min(rounds_rows, hidden.shape[0])
    rounds = []
    for i in range(n):
        codes_i, r = spec_one(h[i:i + 1], c[i:i + 1])
        rounds.append(int(r))
        np.testing.assert_array_equal(  # spec output == exact dg=1 chain
            np.asarray(codes_i)[0], exact[i]
        )
    return {
        "frames": int(agree.shape[0]),
        "acceptance": round(float(agree.mean()), 4),
        "per_depth_acceptance": [round(float(x), 4)
                                 for x in agree.mean(axis=0)],
        "frames_fully_accepted": round(float(agree.all(axis=1).mean()), 4),
        "mean_rounds": round(float(np.mean(rounds)), 3),
        "rounds_rows": n,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps1", type=int, default=600,
                    help="base-model training steps (memorization)")
    ap.add_argument("--steps2", type=int, default=200,
                    help="recovery fine-tune steps (--depth-group 3 --spec)")
    ap.add_argument("--lr1", type=float, default=1e-3,
                    help="stage-1 lr (tiny-from-scratch wants a hot rate; "
                    "1e-4 leaves the base un-memorized at 600 steps)")
    ap.add_argument("--lr2", type=float, default=3e-4,
                    help="stage-2 recovery lr")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--freeze-base", action="store_true",
                    help="stage-2 recovery with finetune.py --freeze-base: "
                    "the draft trains as an ADAPTER copy (base weights "
                    "bit-identical; the spec verify chain stays the raw "
                    "import's) — measures whether the adapter draft "
                    "accepts as well as the shared-weight draft")
    ap.add_argument("--keep", default=None,
                    help="keep work dir here (default: temp, deleted)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from qwen3_tts_tpu import finetune
    from qwen3_tts_tpu.engine.api import load_model

    work = args.keep or tempfile.mkdtemp(prefix="q3tts_accept_")
    os.makedirs(work, exist_ok=True)
    train_dir = os.path.join(work, "train")
    held_dir = os.path.join(work, "held")
    _make_dataset(train_dir, _TRAIN_TEXTS, base_freq=220.0)
    _make_dataset(held_dir, _HELDOUT_TEXTS, base_freq=1000.0)
    stage1 = os.path.join(work, "stage1")
    stage2 = os.path.join(work, "stage2")

    print(f"[stage1: {args.steps1} steps to memorization]", flush=True)
    rc = finetune.main([
        "--model", "synthetic-tiny-feedback", "--data", train_dir,
        "--steps", str(args.steps1), "--batch-size", str(args.batch_size),
        "--lr", str(args.lr1),
        "--export", stage1,
    ])
    assert rc == 0, f"stage1 fine-tune failed rc={rc}"

    print(f"[stage2: recovery fine-tune dg=3 --spec, {args.steps2} steps]",
          flush=True)
    stage2_cli = [
        "--model", stage1, "--data", train_dir,
        "--steps", str(args.steps2), "--batch-size", str(args.batch_size),
        "--lr", str(args.lr2),
        "--depth-group", "3", "--spec",
        "--export", stage2,
    ]
    if args.freeze_base:
        stage2_cli.append("--freeze-base")
    rc = finetune.main(stage2_cli)
    assert rc == 0, f"stage2 fine-tune failed rc={rc}"

    tuned = load_model(stage2)
    assert tuned.cfg.code_predictor.spec_decode, "export lost spec_decode"
    assert tuned.cfg.code_predictor.depth_group == 3

    from qwen3_tts_tpu.finetune import load_pairs

    report: dict = {"steps1": args.steps1, "steps2": args.steps2,
                    "depth_group": 3, "freeze_base": args.freeze_base}
    for split, d in (("train", train_dir), ("heldout", held_dir)):
        h, c = _frame_inputs(tuned, load_pairs(d))
        report[split] = _acceptance(tuned, h, c)
        print(f"[{split}: acceptance {report[split]['acceptance']}, "
              f"mean rounds {report[split]['mean_rounds']}]", flush=True)

    # untrained-draft floor: the SAME grouped config on the stage1 weights
    # (no recovery fine-tune) — what a raw checkpoint's draft would do
    raw = load_model(stage1)
    raw = finetune.apply_decode_extensions(raw, depth_group=3, spec=True)
    h, c = _frame_inputs(raw, load_pairs(held_dir))
    report["untrained_floor"] = _acceptance(raw, h, c)

    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
