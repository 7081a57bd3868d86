"""Fine-tuning CLI: adapt a model to a directory of (wav, txt) pairs.

The reference is inference-only (SURVEY.md §5: no training anywhere); this
closes the loop the reference can't: take the voice-library layout the app
already produces (``<name>.wav`` + ``<name>.txt`` pairs, voices.py) and
fine-tune the talker + code predictor on it — full fine-tune or LoRA —
with sharded steps over the device mesh, orbax checkpoint/resume, and a
native-format export that ``load_model`` serves directly.

Run as::

    python -m qwen3_tts_tpu.finetune --model <ckpt> --data voices/ \
        --steps 200 --batch-size 8 --export out_model/
    # LoRA voice adaptation (adapter-sized grads/moments, exact merge):
    python -m qwen3_tts_tpu.finetune --model <ckpt> --data voices/ \
        --lora 8 --steps 200 --export out_model/

TPU shape discipline: batches bucket by (text, frame) length
(training/data.py ladders — examples are length-sorted before grouping so
padding waste stays low), so expect one compile per bucket pair that
actually occurs in the dataset. The batch axis shards over ``dp``; the
batch size must divide dp, and a trailing incomplete batch is dropped.
"""

from __future__ import annotations

import json
import os
import sys
import time
import warnings
from typing import Any

import numpy as np


def load_pairs(data_dir: str) -> list[tuple[str, np.ndarray, int]]:
    """Collect (text, wav, rate) pairs from ``<name>.wav``+``<name>.txt``
    files (the voice-library layout, voices.py). WAVs without a transcript
    are skipped with a warning — silent inclusion with empty text would
    teach the model to speak unprompted."""
    from .audio import read_wav, to_mono

    pairs = []
    skipped = []
    for f in sorted(os.listdir(data_dir)):
        if not f.lower().endswith(".wav") or f.startswith("."):
            continue
        name = os.path.splitext(f)[0]
        txt = os.path.join(data_dir, name + ".txt")
        if not os.path.exists(txt):
            skipped.append(name)
            continue
        with open(txt, encoding="utf-8", errors="replace") as fh:
            text = fh.read().strip()
        if not text or text == ".":
            skipped.append(name)
            continue
        data, rate = read_wav(os.path.join(data_dir, f))
        mono = to_mono(data)
        if mono.dtype.kind in "iu":
            mono = mono.astype(np.float32) / 32768.0
        pairs.append((text, mono.astype(np.float32), rate))
    if skipped:
        warnings.warn(
            f"skipped {len(skipped)} wav(s) without a usable transcript: "
            f"{skipped[:5]}{'...' if len(skipped) > 5 else ''}"
        )
    return pairs


def apply_decode_extensions(model, *, fps: int = 0, depth_group: int = 0,
                            mtp_cp_batch: bool = False, spec: bool = False,
                            seed: int = 0):
    """Enable the decode fine-tune extension pair on a loaded model.

    Real checkpoints decode one frame per talker pass and one residual
    codebook per code-predictor pass; the two measured recovery levers
    (PERF.md: 8.5× → 19.1× single-stream on the published protocol) are
    architectural extensions that the training stack teacher-forces:

    - ``fps > 1``: multi-token prediction. Grafts fresh MTP heads
      (models.talker.add_mtp_params) when the tree lacks them — train
      before serving, the heads are random until then.
    - ``depth_group > 1``: grouped depth prediction. Config-only (the
      published per-depth heads/tables are re-indexed, no new
      parameters) — still fine-tune before serving, the layout changes.
    - ``mtp_cp_batch`` (needs fps > 1): batched-cp MTP. Config-only — the
      MTP chain conditions on cb0 embeddings alone so decode predicts all
      fps frames' residuals in ONE batched cp pass, dividing cp weight
      bytes (the fps>1 binding cost) by fps; the teacher-forced chain
      mirrors the conditioning (training/loss.py).
    - ``spec`` (needs depth_group > 1): LOSSLESS speculative depth decode.
      The grouped heads become a DRAFT verified by one teacher-forced
      full-depth pass per round — the exported model's output stays
      bit-exact dg=1 greedy (distribution-identical when sampled), so the
      quality gate only has to cover fine-tune drift, not the depth
      factorization (models/code_predictor.predict_residuals_spec,
      PERF.md round 3). Decode cost lands between the plain dg=K ladder
      shape and dg=1 at the trained draft's acceptance rate.

    Returns a rebuilt model (fresh jit caches); raises ValueError for
    invalid geometry (e.g. depth_group not dividing the residual count).
    """
    import dataclasses as _dc

    from .engine.configs import with_frames_per_step

    cfg, params = model.cfg, model.params
    if fps > 1:
        cfg = with_frames_per_step(cfg, fps)
        if "mtp" not in params:
            from .models.talker import add_mtp_params

            params = add_mtp_params(params, cfg, seed=seed)
    if mtp_cp_batch:
        if fps <= 1 and cfg.talker.frames_per_step <= 1:
            raise ValueError(
                "--mtp-cp-batch needs frames_per_step > 1 (--mtp-fps N): "
                "there is nothing to batch at one frame per pass"
            )
        cfg = _dc.replace(
            cfg, talker=_dc.replace(cfg.talker, mtp_cp_batch=True)
        )
    if depth_group > 1:
        cfg = _dc.replace(
            cfg,
            code_predictor=_dc.replace(
                cfg.code_predictor, depth_group=depth_group
            ),
        )
    if spec:
        if cfg.code_predictor.depth_group <= 1:
            raise ValueError(
                "--spec needs a grouped draft (--depth-group K > 1): "
                "speculative depth decode drafts with the grouped heads "
                "and verifies against the full-depth pass"
            )
        cfg = _dc.replace(
            cfg,
            code_predictor=_dc.replace(
                cfg.code_predictor, spec_decode=True
            ),
        )
    return _dc.replace(
        model, cfg=cfg, params=params,
        _generator=None, _serving=None, _enc_fn=None,
    )


def main(argv: list[str] | None = None) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        description="qwen3-tts-tpu fine-tuning (full or LoRA)"
    )
    ap.add_argument("--model", default="synthetic-tiny",
                    help="checkpoint path, or 'synthetic'/'synthetic-tiny'/"
                    "'synthetic-tiny-feedback' (the published-protocol "
                    "tiny — the shape real imported checkpoints run)")
    ap.add_argument("--mode", default="custom",
                    choices=["custom", "design", "base"])
    ap.add_argument("--data", required=True,
                    help="directory of <name>.wav + <name>.txt pairs")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--lora", type=int, default=0, metavar="RANK",
                    help="LoRA rank (0 = full fine-tune)")
    ap.add_argument("--pp", type=int, default=1, metavar="STAGES",
                    help="pipeline-parallel stages (full fine-tune only): "
                    "talker layers split into STAGES, microbatches rotate "
                    "via collective permute (parallel/pipeline.py)")
    ap.add_argument("--microbatches", type=int, default=0,
                    help="pipeline microbatches (default 4*pp); the batch "
                    "size must divide by it")
    ap.add_argument("--sequence-parallel", action="store_true",
                    help="shard the residual stream along T over tp between "
                    "talker blocks (needs tp > 1; full fine-tune only)")
    ap.add_argument("--mtp-fps", type=int, default=0, metavar="N",
                    help="enable multi-token prediction at N frames per "
                    "talker pass before training (grafts fresh MTP heads "
                    "onto checkpoints that lack them — the single-stream "
                    "decode lever, PERF.md); the exported model decodes "
                    "at fps=N")
    ap.add_argument("--depth-group", type=int, default=0, metavar="K",
                    help="enable grouped depth prediction (K residual "
                    "codebooks per code-predictor pass) before training — "
                    "no new parameters, config + fine-tune only; cuts the "
                    "published protocol's cp-in-loop cost K-fold (PERF.md)")
    ap.add_argument("--spec", action="store_true",
                    help="with --depth-group K: export with LOSSLESS "
                    "speculative depth decode enabled — the grouped heads "
                    "draft, one teacher-forced full-depth pass verifies, "
                    "output stays bit-exact dg=1 greedy (the quality gate "
                    "then only covers fine-tune drift); decode speed lands "
                    "at the trained draft's acceptance rate (PERF.md)")
    ap.add_argument("--mtp-cp-batch", action="store_true",
                    help="with --mtp-fps N: condition the MTP chain on cb0 "
                    "embeddings alone so decode batches all N frames' "
                    "code-predictor passes into one — divides cp weight "
                    "bytes (the fps>1 binding cost, PERF.md) by N; "
                    "config-only, trained by the same fine-tune")
    ap.add_argument("--anchor", type=float, default=0.0, metavar="W",
                    help="L2-SP anchored recovery: add W * mean||theta - "
                    "theta0||^2 to the loss (theta0 = the pre-fine-tune "
                    "weights; freshly-grafted MTP params move freely). "
                    "Bounds weight drift so recovered@fps1/dg1 stays near "
                    "the base model and the quality gate measures the "
                    "extension's cost, not drift "
                    "(tools/calibrate_quality_gate.py). Holds a second "
                    "copy of the params; full fine-tune only")
    ap.add_argument("--freeze-base", action="store_true",
                    help="strict recovery: train ONLY the recovery "
                    "parameters — the grafted MTP chain (--mtp-fps) and a "
                    "grafted DRAFT copy of the code predictor that the "
                    "grouped layout reads (--depth-group; "
                    "models/code_predictor.py draft-adapter indirection). "
                    "The base weights never move, so the exported model's "
                    "fps=1/dg=1 decode — and the --spec verifier — stay "
                    "BIT-IDENTICAL to the input checkpoint: --spec "
                    "recovery becomes lossless against the raw import, "
                    "not merely against the drifted fine-tune "
                    "(tools/calibrate_quality_gate.py)")
    ap.add_argument("--distill", type=float, default=0.0, metavar="W",
                    help="function-space anchored recovery: add W * "
                    "KL(frozen pre-fine-tune model || student) on the "
                    "sequential fps=1/dg=1 teacher-forced path (talker + "
                    "code predictor). The distillation optimum keeps the "
                    "base shape's logits — hence its greedy codes — "
                    "exactly, while the decode extension learns through "
                    "the primary CE; this is what makes recovered@base "
                    "measurable against original in the offline quality "
                    "gate (tools/calibrate_quality_gate.py). Costs two "
                    "extra teacher-forced forwards per step; full "
                    "fine-tune only")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ckpt-dir", default=None,
                    help="orbax checkpoint directory (enables save/resume)")
    ap.add_argument("--save-every", type=int, default=100)
    ap.add_argument("--resume", action="store_true",
                    help="restore the latest checkpoint in --ckpt-dir")
    ap.add_argument("--export", default=None,
                    help="write the tuned model (native format) here; "
                    "LoRA deltas are merged exactly before export")
    ap.add_argument("--eval-quality", action="store_true",
                    help="post-train decode-quality eval (quality.py): "
                    "synthesize held texts at the trained decode shape "
                    "(--mtp-fps/--depth-group) AND the fps=1/dg=1 baseline "
                    "of the same tuned weights, ASR both, report the WER "
                    "delta in the summary BEFORE native export; a delta "
                    "past --eval-max-wer-delta exports with a loud warning "
                    "and exits non-zero")
    ap.add_argument("--eval-max-wer-delta", type=float, default=0.02)
    ap.add_argument("--eval-texts", type=int, default=4,
                    help="how many training transcripts to evaluate on")
    args = ap.parse_args(argv)

    # CPU escape hatch before any device work (sitecustomize preloads the
    # TPU plugin; jax.config is the reliable lever)
    import jax

    if os.environ.get("QWEN3_TTS_CPU", "0") not in ("", "0"):
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .engine import configs
    from .engine.api import Qwen3TTSModel, load_model
    from .parallel import build_mesh, shard_model
    from .parallel.mesh import auto_plan
    from .training import (
        default_optimizer,
        init_train_state,
        make_train_step,
    )
    from .training.checkpoint import (
        latest_checkpoint,
        restore_train_state,
        save_train_state,
    )
    from .training.data import batches_from_pairs

    if args.model == "synthetic":
        # trainable synthetics are dense (the quant guard below explains)
        model = Qwen3TTSModel.synthetic(
            configs.with_quant(configs.flagship(args.mode), False)
        )
    elif args.model == "synthetic-tiny":
        model = Qwen3TTSModel.synthetic(configs.tiny(args.mode))
    elif args.model == "synthetic-tiny-feedback":
        # the published decode protocol (residual-sum feedback, cp-in-loop)
        # at tiny size: the offline stand-in for quality-gating the
        # --mtp-fps/--depth-group recovery on the shape real checkpoints run
        model = Qwen3TTSModel.synthetic(configs.tiny_feedback(args.mode))
    else:
        model = load_model(args.model)
    if (args.mtp_fps > 1 or args.depth_group > 1 or args.mtp_cp_batch
            or args.spec):
        try:
            model = apply_decode_extensions(
                model, fps=args.mtp_fps, depth_group=args.depth_group,
                mtp_cp_batch=args.mtp_cp_batch, spec=args.spec,
                seed=args.seed,
            )
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
    if args.freeze_base:
        if args.lora:
            print("error: --freeze-base is the full-fine-tune sibling of "
                  "LoRA-style adaptation; use one or the other",
                  file=sys.stderr)
            return 1
        if args.anchor > 0.0 or args.distill > 0.0:
            print("error: --anchor/--distill are pointless under "
                  "--freeze-base — the base weights they anchor cannot "
                  "move (their updates are masked to zero), so --distill "
                  "only burns two teacher-forced forwards per step and "
                  "--anchor actively penalises the draft's distance from "
                  "its own grafted init (the one thing the mode trains)",
                  file=sys.stderr)
            return 1
        if args.mtp_fps <= 1 and args.depth_group <= 1:
            print("error: --freeze-base trains ONLY the recovery params "
                  "(MTP chain / grouped draft) — it needs --mtp-fps N "
                  "and/or --depth-group K", file=sys.stderr)
            return 1
        if args.depth_group > 1 and "draft" not in model.cp_params:
            # graft the draft adapter: a full copy of the cp module that
            # the grouped layout (and the spec draft) reads while the
            # primary tree — sequential decode and the spec verifier —
            # stays bit-identical to the raw import
            model.cp_params = {
                **model.cp_params,
                "draft": jax.tree.map(
                    jnp.array,
                    {k: v for k, v in model.cp_params.items()
                     if k != "draft"},
                ),
            }
    cfg = model.cfg
    if cfg.quant.enabled:
        print("error: fine-tuning needs an unquantized base "
              "(QWEN3_TTS_COMPUTE=bf16 import, or a native bf16 export)",
              file=sys.stderr)
        return 1

    if args.lora and (args.pp > 1 or args.sequence_parallel):
        print("error: --pp/--sequence-parallel apply to the full fine-tune "
              "path only (LoRA's adapter-sized step has no layer pipeline)",
              file=sys.stderr)
        return 1
    if args.lora and (args.anchor > 0.0 or args.distill > 0.0):
        print("error: --anchor/--distill apply to the full fine-tune path "
              "only (LoRA already anchors implicitly — the base is frozen)",
              file=sys.stderr)
        return 1
    if args.pp < 1:
        print(f"error: --pp {args.pp} must be >= 1", file=sys.stderr)
        return 1
    if args.microbatches and args.pp <= 1:
        print("error: --microbatches only applies with --pp > 1 (the "
              "pipeline schedule is what consumes microbatches)",
              file=sys.stderr)
        return 1
    n_dev = len(jax.devices())
    if args.pp > 1 and (n_dev % args.pp or cfg.talker.n_layers % args.pp):
        print(f"error: --pp {args.pp} must divide both the device count "
              f"({n_dev}) and n_layers ({cfg.talker.n_layers})",
              file=sys.stderr)
        return 1
    from .parallel.mesh import MeshPlan

    inner = auto_plan(n_dev // args.pp, tp_divisors=cfg.talker.n_kv_heads)
    plan = MeshPlan(dp=inner.dp, tp=inner.tp, pp=args.pp)
    mesh = build_mesh(plan, jax.devices())
    shard_model(model, mesh)
    microbatches = (args.microbatches or 4 * plan.pp) if plan.pp > 1 else 0
    if args.batch_size % plan.dp:
        print(f"error: --batch-size {args.batch_size} must divide "
              f"dp={plan.dp}", file=sys.stderr)
        return 1
    if microbatches and args.batch_size % microbatches:
        print(f"error: --batch-size {args.batch_size} must divide into "
              f"--microbatches {microbatches}", file=sys.stderr)
        return 1
    if args.sequence_parallel and plan.tp <= 1:
        print(f"error: --sequence-parallel needs tp > 1 (mesh has "
              f"tp={plan.tp})", file=sys.stderr)
        return 1

    pairs = load_pairs(args.data)
    if not pairs:
        print(f"error: no usable (wav, txt) pairs in {args.data}",
              file=sys.stderr)
        return 1
    batches = [
        b for b in batches_from_pairs(
            model, pairs, batch_size=args.batch_size,
            shuffle_seed=args.seed,
        )
        if b["text_tokens"].shape[0] == args.batch_size
    ]
    if not batches:
        print("error: dataset smaller than one batch; lower --batch-size",
              file=sys.stderr)
        return 1
    batch_sharding = NamedSharding(mesh, P("dp"))

    def put(b: dict) -> dict:
        return {k: jax.device_put(jnp.asarray(v), batch_sharding)
                for k, v in b.items()}

    print(f"fine-tune: {len(pairs)} pairs, {len(batches)} batches/epoch, "
          f"mesh pp={plan.pp} dp={plan.dp} tp={plan.tp}"
          f"{' sp' if args.sequence_parallel else ''}, "
          f"{'LoRA r=%d' % args.lora if args.lora else 'full'}")

    opt = default_optimizer(lr=args.lr)
    if args.freeze_base:
        import optax

        def trainable(sub: str):
            def leaf_mask(tree):
                return jax.tree_util.tree_map_with_path(
                    lambda path, _: sub in str(path).lower(), tree
                )
            return leaf_mask

        # updates flow ONLY into the recovery subtrees. optax.masked
        # passes NON-masked leaves' updates through UNTOUCHED (raw
        # grads!), so the frozen complement must be explicitly zeroed.
        def mask_fn(trees):
            return (trainable("mtp")(trees[0]),
                    trainable("draft")(trees[1]))

        def frozen_fn(trees):
            return jax.tree.map(lambda m: not m, mask_fn(trees))

        opt = optax.chain(
            optax.masked(opt, mask_fn),
            optax.masked(optax.set_to_zero(), frozen_fn),
        )
    t0 = time.perf_counter()
    losses: list[float] = []
    saved_at = -1

    def save(state) -> None:
        nonlocal saved_at
        if int(state.step) != saved_at:
            save_train_state(state, args.ckpt_dir)
            saved_at = int(state.step)

    if args.lora:
        from .training import (
            add_lora,
            init_lora_train_state,
            make_lora_train_step,
            merge_lora,
            merge_trees,
            split_lora,
        )

        lora, base = split_lora(
            add_lora(model.params, rank=args.lora, seed=args.seed)
        )
        state = init_lora_train_state(lora, opt)
        lstep = make_lora_train_step(cfg, opt)
        if args.resume and args.ckpt_dir:
            path = latest_checkpoint(args.ckpt_dir)
            if path:
                state = restore_train_state(path, state)
                print(f"resumed LoRA state from {path}")
        start = int(state.step)
        for i in range(start, args.steps):
            state, metrics = lstep(
                state, base, model.cp_params, put(batches[i % len(batches)])
            )
            losses.append(float(metrics["loss"]))
            if (i + 1) % 10 == 0 or i + 1 == args.steps:
                print(f"step {i + 1}/{args.steps}: loss={losses[-1]:.4f}")
            if args.ckpt_dir and (i + 1) % args.save_every == 0:
                save(state)
        final_params = merge_lora(merge_trees(base, state.lora))
        final_cp = model.cp_params
        if args.ckpt_dir:
            save(state)
    else:
        anchor = distill = None
        if args.anchor > 0.0 or args.distill > 0.0:
            # fresh buffers: the train step donates state.params, so the
            # frozen reference must not alias the initial param arrays
            frozen = jax.tree.map(
                jnp.array, (model.params, model.cp_params)
            )
            anchor = frozen if args.anchor > 0.0 else None
            distill = frozen if args.distill > 0.0 else None
        state = init_train_state(model.params, model.cp_params, opt)
        step = make_train_step(
            cfg, opt, mesh=mesh, microbatches=microbatches,
            sequence_parallel=args.sequence_parallel,
            anchor=anchor, anchor_weight=args.anchor,
            distill=distill, distill_weight=args.distill,
        )
        if args.resume and args.ckpt_dir:
            path = latest_checkpoint(args.ckpt_dir)
            if path:
                state = restore_train_state(path, state)
                print(f"resumed from {path}")
        start = int(state.step)
        for i in range(start, args.steps):
            state, metrics = step(state, put(batches[i % len(batches)]))
            losses.append(float(metrics["loss"]))
            if (i + 1) % 10 == 0 or i + 1 == args.steps:
                print(f"step {i + 1}/{args.steps}: loss={losses[-1]:.4f}")
            if args.ckpt_dir and (i + 1) % args.save_every == 0:
                save(state)
        final_params, final_cp = state.params, state.cp_params
        if args.ckpt_dir:
            save(state)

    summary: dict[str, Any] = {
        "steps": args.steps,
        "first_loss": losses[0] if losses else None,
        "final_loss": losses[-1] if losses else None,
        "wall_seconds": round(time.perf_counter() - t0, 1),
    }
    # the train step donates its inputs, so the live tuned trees are the
    # only copy — hand them to the model before eval/export
    model.params = final_params
    model.cp_params = final_cp

    gate_ok = True
    if args.eval_quality:
        from . import transcription
        from .quality import compare_decode_configs

        transcribe = (
            transcription.transcribe_wav
            if transcription.asr_available() else None
        )
        fps = max(1, args.mtp_fps or cfg.talker.frames_per_step)
        dg = max(1, args.depth_group or cfg.code_predictor.depth_group)
        spec = cfg.code_predictor.spec_decode
        texts = [t for t, _, _ in pairs[: args.eval_texts]]
        voice = "ryan" if args.mode == "custom" else None
        variant: dict[str, Any] = {"fps": fps, "dg": dg}
        if spec:
            variant["spec"] = True
        rep = compare_decode_configs(
            model,
            {"trained_shape": variant},
            texts,
            transcribe,
            voice=voice,
        )
        v = rep["variants"]["trained_shape"]
        summary["quality"] = {
            "decode_shape": {"fps": fps, "depth_group": dg, "spec": spec,
                             "mtp_cp_batch": cfg.talker.mtp_cp_batch},
            "median_wer_delta": v["median_wer_delta"],
            "median_mel_dist": v["median_mel_dist"],
            "median_identical_frac": v["median_identical_frac"],
            "asr": transcribe is not None,
            "texts": len(texts),
        }
        if v["median_wer_delta"] is None:
            warnings.warn(
                "quality eval ran without an ASR provider: WER delta "
                "unmeasured (register one or install a local Whisper "
                "checkpoint — transcription.py)"
            )
        elif v["median_wer_delta"] > args.eval_max_wer_delta:
            gate_ok = False
            warnings.warn(
                f"quality gate FAILED: decoding at fps={fps}/dg={dg} costs "
                f"{v['median_wer_delta']:+.4f} median WER vs the fps=1/dg=1 "
                f"baseline of the same weights (budget "
                f"{args.eval_max_wer_delta}); exporting anyway — do not "
                "serve this shape without listening checks"
            )
        summary["quality"]["pass"] = (
            None if v["median_wer_delta"] is None else gate_ok
        )

    if args.export:
        from .engine.weights import save_model

        save_model(model, args.export)
        summary["exported"] = args.export
    print(json.dumps(summary))
    return 0 if gate_ok else 3


if __name__ == "__main__":
    raise SystemExit(main())
