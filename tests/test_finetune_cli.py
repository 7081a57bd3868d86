"""Fine-tuning CLI (finetune.py): data-dir loading, full and LoRA runs on
the virtual 8-device mesh, checkpoint resume, and native export that
load_model can serve."""

import json
import os
import wave

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from qwen3_tts_tpu import finetune  # noqa: E402


def _write_pair(d, name, text, seconds=0.4, sr=24_000, freq=330):
    t = np.arange(int(seconds * sr))
    pcm = (np.sin(2 * np.pi * freq * t / sr) * 9000).astype(np.int16)
    with wave.open(os.path.join(d, f"{name}.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    if text is not None:
        with open(os.path.join(d, f"{name}.txt"), "w") as fh:
            fh.write(text + "\n")


@pytest.fixture()
def data_dir(tmp_path):
    d = str(tmp_path / "data")
    os.makedirs(d)
    for i in range(4):
        _write_pair(d, f"clip{i}", f"utterance number {i}",
                    seconds=0.3 + 0.1 * i, freq=220 + 60 * i)
    return d


def test_load_pairs_skips_untranscribed(tmp_path):
    d = str(tmp_path)
    _write_pair(d, "good", "hello there")
    _write_pair(d, "no_txt", None)
    _write_pair(d, "dot", ".")
    _write_pair(d, "empty", "")
    with pytest.warns(UserWarning, match="without a usable transcript"):
        pairs = finetune.load_pairs(d)
    assert len(pairs) == 1
    text, wav, rate = pairs[0]
    assert text == "hello there" and rate == 24_000
    assert wav.dtype == np.float32 and np.abs(wav).max() <= 1.0


def test_full_finetune_with_resume_and_export(data_dir, tmp_path, capsys):
    ckpt = str(tmp_path / "ckpts")
    export = str(tmp_path / "tuned_model")
    base_args = [
        "--model", "synthetic-tiny", "--data", data_dir,
        "--batch-size", "4", "--lr", "1e-3",
        "--ckpt-dir", ckpt, "--save-every", "2",
    ]
    assert finetune.main(base_args + ["--steps", "2"]) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["steps"] == 2 and first["final_loss"] is not None

    # resume continues from step 2 (runs 2 more, not 4)
    rc = finetune.main(
        base_args + ["--steps", "4", "--resume", "--export", export]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "resumed from" in out
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["exported"] == export

    # the export serves through the public engine API
    from qwen3_tts_tpu.engine.api import generate_audio, load_model

    model = load_model(export)
    outdir = str(tmp_path / "gen")
    metrics = generate_audio(
        model=model, text="post finetune synthesis",
        voice=sorted(model.cfg.speakers)[0], output_path=outdir,
        max_frames=12,
    )
    assert os.path.exists(os.path.join(outdir, "audio_000.wav"))
    assert metrics["audio_s"] > 0


def test_lora_finetune_exports_merged_model(data_dir, tmp_path, capsys):
    export = str(tmp_path / "lora_model")
    rc = finetune.main([
        "--model", "synthetic-tiny", "--data", data_dir,
        "--batch-size", "4", "--steps", "2", "--lora", "2",
        "--lr", "1e-2", "--export", export,
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["final_loss"] is not None

    from qwen3_tts_tpu.engine.api import load_model

    model = load_model(export)
    # merged export is a plain dense model: no lora subtrees survive
    flat_keys = []

    def walk(t, pre=""):
        if isinstance(t, dict):
            for k, v in t.items():
                walk(v, pre + k + "/")
        else:
            flat_keys.append(pre)

    walk(model.params)
    assert not any("lora" in k for k in flat_keys)


def test_pipeline_parallel_finetune(data_dir, capsys):
    # pp=2 over the 8 virtual devices (auto dp/tp fill the rest); the tiny
    # talker has 2 layers -> one per stage. sp rides the tp>1 submesh.
    rc = finetune.main([
        "--model", "synthetic-tiny", "--data", data_dir,
        "--batch-size", "4", "--steps", "2", "--lr", "1e-3",
        "--pp", "2", "--microbatches", "2", "--sequence-parallel",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "pp=2" in out and " sp" in out
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["final_loss"] is not None
    assert np.isfinite(summary["final_loss"])


def test_pp_rejects_lora_and_indivisible(data_dir, capsys):
    rc = finetune.main([
        "--model", "synthetic-tiny", "--data", data_dir,
        "--batch-size", "4", "--steps", "1", "--lora", "2", "--pp", "2",
    ])
    assert rc == 1
    assert "full fine-tune path only" in capsys.readouterr().err
    rc = finetune.main([
        "--model", "synthetic-tiny", "--data", data_dir,
        "--batch-size", "4", "--steps", "1", "--pp", "3",
    ])
    assert rc == 1
    assert "must divide" in capsys.readouterr().err
    # --pp 0 is a clean CLI error, not a ZeroDivisionError
    rc = finetune.main([
        "--model", "synthetic-tiny", "--data", data_dir,
        "--batch-size", "4", "--steps", "1", "--pp", "0",
    ])
    assert rc == 1
    assert "must be >= 1" in capsys.readouterr().err
    # --microbatches without --pp errors instead of being silently ignored
    rc = finetune.main([
        "--model", "synthetic-tiny", "--data", data_dir,
        "--batch-size", "4", "--steps", "1", "--microbatches", "4",
    ])
    assert rc == 1
    assert "only applies with --pp" in capsys.readouterr().err


def test_batch_size_must_divide_dp(data_dir, capsys):
    rc = finetune.main([
        "--model", "synthetic-tiny", "--data", data_dir,
        "--batch-size", "3", "--steps", "1",
    ])
    assert rc == 1
    assert "must divide" in capsys.readouterr().err


def test_empty_data_dir_errors(tmp_path, capsys):
    d = str(tmp_path / "empty")
    os.makedirs(d)
    rc = finetune.main([
        "--model", "synthetic-tiny", "--data", d, "--steps", "1",
        "--batch-size", "4",
    ])
    assert rc == 1
    assert "no usable" in capsys.readouterr().err


def test_decode_extension_flags_train_and_export(data_dir, tmp_path, capsys):
    """--mtp-fps / --depth-group: the measured real-checkpoint recovery
    path (PERF.md 8.5x -> 19.1x) must be executable end-to-end — graft,
    train, export, and the export decodes at the extended geometry."""
    export = str(tmp_path / "tuned_ext")
    rc = finetune.main([
        "--model", "synthetic-tiny", "--data", data_dir,
        "--batch-size", "4", "--steps", "1", "--lr", "1e-3",
        "--mtp-fps", "2", "--depth-group", "3", "--export", export,
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["exported"] == export

    from qwen3_tts_tpu.engine.api import generate_audio, load_model

    model = load_model(export)
    assert model.cfg.talker.frames_per_step == 2
    assert model.cfg.code_predictor.depth_group == 3
    assert "mtp" in model.params
    outdir = str(tmp_path / "gen_ext")
    generate_audio(model=model, text="extended decode", voice="ryan",
                   output_path=outdir, max_frames=8)
    assert os.path.exists(os.path.join(outdir, "audio_000.wav"))


def test_spec_flag_exports_lossless_decode(data_dir, tmp_path, capsys):
    """--spec (VERDICT r3 #3): the LOSSLESS recovery path must ship
    end-to-end from the CLI that owns recovery — train with the grouped
    draft, export with spec_decode enabled, and the export serves with
    output bit-exact to the same weights' dg=1 greedy chain."""
    import dataclasses

    import numpy as np

    export = str(tmp_path / "tuned_spec")
    rc = finetune.main([
        "--model", "synthetic-tiny-feedback", "--data", data_dir,
        "--batch-size", "4", "--steps", "1", "--lr", "1e-3",
        "--depth-group", "3", "--spec", "--export", export,
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["exported"] == export

    from qwen3_tts_tpu.engine.api import load_model
    from qwen3_tts_tpu.runtime.prompts import PromptSpec
    from qwen3_tts_tpu.runtime.sampling import SamplingConfig

    model = load_model(export)
    assert model.cfg.code_predictor.spec_decode is True
    assert model.cfg.code_predictor.depth_group == 3

    # losslessness: spec greedy decode == the SAME weights at dg=1 greedy
    model.sampling = SamplingConfig(greedy=True)
    p = PromptSpec(text_tokens=np.arange(6, dtype=np.int32) + 5,
                   speaker_id=1)
    r_spec = model.generator.synthesize(p, max_frames=6, seed=0)
    base = dataclasses.replace(
        model,
        cfg=dataclasses.replace(
            model.cfg,
            code_predictor=dataclasses.replace(
                model.cfg.code_predictor, depth_group=1, spec_decode=False
            ),
        ),
        _generator=None, _serving=None,
    )
    base.sampling = SamplingConfig(greedy=True)
    r_base = base.generator.synthesize(p, max_frames=6, seed=0)
    np.testing.assert_array_equal(r_spec.wav, r_base.wav)


def test_spec_flag_requires_grouped_draft(data_dir, capsys):
    rc = finetune.main([
        "--model", "synthetic-tiny-feedback", "--data", data_dir,
        "--batch-size", "4", "--steps", "1", "--spec",
    ])
    assert rc == 1
    assert "--spec needs a grouped draft" in capsys.readouterr().err


def test_depth_group_flag_rejects_bad_divisor(data_dir, capsys):
    # tiny codec has 3 residual codebooks; 2 does not divide 3
    rc = finetune.main([
        "--model", "synthetic-tiny", "--data", data_dir,
        "--batch-size", "4", "--steps", "1", "--depth-group", "2",
    ])
    assert rc == 1
    assert "depth_group" in capsys.readouterr().err


def test_feedback_protocol_finetune_recovery_shape(data_dir, tmp_path,
                                                   capsys):
    """--model synthetic-tiny-feedback: the decode-recovery fine-tune on
    the published protocol (the shape real imported checkpoints run —
    residual-sum feedback + cp-in-loop), exported and servable."""
    export = str(tmp_path / "tuned_fb")
    rc = finetune.main([
        "--model", "synthetic-tiny-feedback", "--data", data_dir,
        "--batch-size", "4", "--steps", "1", "--lr", "1e-3",
        "--mtp-fps", "2", "--depth-group", "3", "--export", export,
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["exported"] == export

    from qwen3_tts_tpu.engine.api import generate_audio, load_model

    model = load_model(export)
    assert model.cfg.talker.feedback == "residual_sum"
    assert model.cfg.talker.frames_per_step == 2
    assert model.cfg.code_predictor.depth_group == 3
    outdir = str(tmp_path / "gen_fb")
    generate_audio(model=model, text="protocol recovery", voice="ryan",
                   output_path=outdir, max_frames=8)
    assert os.path.exists(os.path.join(outdir, "audio_000.wav"))
