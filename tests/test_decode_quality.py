"""Decode-configuration quality harness (src/qwen3_tts_tpu/quality.py +
tools/decode_quality.py + finetune.py --eval-quality).

The perf ladder's decode extensions (fps/depth_group — PERF.md) and the
int8 KV cache needed a fidelity measurement to gate them (VERDICT r2 #3);
these tests cover the harness mechanics offline on tiny models with a fake
ASR provider — real-weight runs use a real transcription provider."""

import json
import os
import wave

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from qwen3_tts_tpu import quality  # noqa: E402
from qwen3_tts_tpu.engine import configs  # noqa: E402
from qwen3_tts_tpu.engine.api import Qwen3TTSModel  # noqa: E402


@pytest.fixture(scope="module")
def model():
    # fps=2 at init so the MTP chain params exist (a trained model's shape)
    return Qwen3TTSModel.synthetic(
        configs.with_frames_per_step(configs.tiny("custom"), 2), seed=4
    )


def test_parse_variant():
    assert quality.parse_variant("fps=2") == {"fps": 2}
    assert quality.parse_variant("fps=3+dg=5") == {"fps": 3, "dg": 5}
    assert quality.parse_variant("kv=int8") == {"kv": "int8"}
    assert quality.parse_variant("depth_group=15") == {"dg": 15}
    assert quality.parse_variant("fps=2+cpb=1") == {"fps": 2, "cpb": True}
    assert quality.parse_variant("mtp_cp_batch=0") == {"cpb": False}
    with pytest.raises(ValueError, match="unknown variant key"):
        quality.parse_variant("foo=1")
    with pytest.raises(ValueError, match="expected key=value"):
        quality.parse_variant("fps")
    with pytest.raises(ValueError, match="int8 or dense"):
        quality.parse_variant("kv=fp8")


def test_mel_dtw_dist_properties():
    """The ASR-free fidelity metric: 0 for identical audio, small for a
    time-stretch of the same content (DTW absorbs length), large for
    spectrally different content."""
    sr = 24000
    t = np.arange(int(0.5 * sr)) / sr
    sine = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)
    # pairwise-L2 expansion leaves float-epsilon residue on the diagonal,
    # so "identical" is near-zero, not exactly zero
    assert quality.mel_dtw_dist(sine, sine, sr) < 0.1
    # same tone, 25% longer: DTW aligns, distance stays near zero
    t2 = np.arange(int(0.625 * sr)) / sr
    stretched = (np.sin(2 * np.pi * 440 * t2) * 20000).astype(np.int16)
    d_stretch = quality.mel_dtw_dist(sine, stretched, sr)
    # a different timbre entirely (white noise) is far away
    rng = np.random.default_rng(0)
    noise = (rng.normal(0, 0.3, len(sine)) * 20000).astype(np.int16)
    d_noise = quality.mel_dtw_dist(sine, noise, sr)
    assert d_stretch < d_noise / 3
    assert d_noise > 1.0
    # stride cap keeps long inputs bounded and finite
    long_a = np.tile(sine, 40)  # 20 s
    assert np.isfinite(quality.mel_dtw_dist(long_a, long_a[: len(long_a) // 2], sr))


def test_variant_fps_without_mtp_raises():
    """Asking for an fps>1 variant on a model without the MTP chain must
    fail loudly (not KeyError deep in the talker)."""
    m = Qwen3TTSModel.synthetic(configs.tiny("custom"), seed=0)
    with pytest.raises(ValueError, match="MTP chain"):
        quality.variant_model(m, {"fps": 2})
    # fps=1 and dg variants need no extension params
    assert quality.variant_model(m, {"fps": 1}).params is m.params


def test_variant_model_shares_weights(model):
    vm = quality.variant_model(model, {"fps": 1, "dg": 1})
    assert vm.params is model.params          # a view, not a copy
    assert vm.cp_params is model.cp_params
    assert vm.cfg.talker.frames_per_step == 1
    assert vm.cfg.code_predictor.depth_group == 1
    assert model.cfg.talker.frames_per_step == 2  # original untouched
    # kv-only variant keeps the decode shape
    kv = quality.variant_model(model, {"kv": "int8"})
    assert kv.cfg == model.cfg
    # batched-cp MTP variant flips the talker flag, shares the tree
    cpb = quality.variant_model(model, {"fps": 2, "cpb": True})
    assert cpb.cfg.talker.mtp_cp_batch and cpb.params is model.params
    with pytest.raises(ValueError, match="frames_per_step"):
        quality.variant_model(model, {"fps": 1, "cpb": True})


def test_compare_decode_configs_report_shape(model):
    calls = []

    def fake_asr(path):
        calls.append(path)
        return "hello tpu"

    rep = quality.compare_decode_configs(
        model,
        {"fps2": {"fps": 2}, "kv8": {"kv": "int8"}},
        ["hello tpu", "another line entirely"],
        fake_asr,
        max_frames=6,
    )
    assert rep["baseline"] == {"fps": 1, "dg": 1}
    # 2 texts x (baseline + 2 variants)
    assert len(calls) == 6
    fps2 = rep["variants"]["fps2"]
    assert fps2["protocol_changing"] is True
    assert not rep["variants"]["kv8"]["protocol_changing"]
    # constant fake hyp -> per-text deltas cancel exactly
    assert fps2["median_wer_delta"] == 0.0
    for v in rep["variants"].values():
        assert 0.0 <= v["median_identical_frac"] <= 1.0
        assert np.isfinite(v["median_mel_dist"]) and v["median_mel_dist"] >= 0
        for r in v["rows"]:
            assert set(r) == {"text", "wer_baseline", "wer_variant",
                              "identical_frac", "mel_dist"}
    assert "QWEN3_TTS_KV" not in os.environ

    assert quality.gate_passes(rep, 0.02)
    # an unmeasured variant is not silently a pass
    rep["variants"]["fps2"]["median_wer_delta"] = 0.5
    assert not quality.gate_passes(rep, 0.02)


def test_compare_without_asr_reports_unmeasured(model):
    rep = quality.compare_decode_configs(
        model, {"fps2": {"fps": 2}}, ["one text"], None, max_frames=6,
    )
    v = rep["variants"]["fps2"]
    assert v["median_wer_delta"] is None
    assert 0.0 <= v["median_identical_frac"] <= 1.0
    assert quality.gate_passes(rep, 0.02)  # nothing measured, nothing failed


def test_kv_dense_baseline_is_bit_identical(model):
    """kv=dense vs kv=dense through the harness must be byte-identical —
    pins that the harness itself adds no nondeterminism."""
    rep = quality.compare_decode_configs(
        model, {"same": {"kv": "dense"}}, ["deterministic check"], None,
        max_frames=8,
        baseline={"fps": 2, "dg": 1, "kv": "dense"},
    )
    v = rep["variants"]["same"]
    # same shape as the baseline (fps=2 default on this model)... the
    # variant's fps defaults to the model's own (2), matching the baseline
    assert v["median_identical_frac"] == 1.0
    assert v["median_mel_dist"] < 0.1        # identical audio -> ~0 dB


@pytest.mark.slow
def test_finetune_eval_quality_summary(tmp_path, capsys, monkeypatch):
    """finetune.py --eval-quality: post-train WER-delta report lands in
    the summary JSON before export, using the registered ASR provider.
    Slow tier: the default tier keeps the gate's FAILURE path
    (test_finetune_eval_quality_gate_fails_loudly) and the harness itself
    (test_compare_decode_configs_report_shape)."""
    from test_finetune_cli import _write_pair

    from qwen3_tts_tpu import finetune, transcription

    d = str(tmp_path / "data")
    os.makedirs(d)
    for i in range(4):
        _write_pair(d, f"clip{i}", f"utterance number {i}",
                    seconds=0.3, freq=220 + 60 * i)

    # isolate the provider registry: transcribe_wav returns the FIRST
    # non-None provider, so leftovers from other tests would shadow ours
    monkeypatch.setattr(
        transcription, "_providers",
        {"fake-eval": lambda p: "utterance number"},
    )

    export = str(tmp_path / "tuned")
    rc = finetune.main([
        "--model", "synthetic-tiny", "--data", d,
        "--steps", "1", "--batch-size", "4", "--mtp-fps", "2",
        "--eval-quality", "--eval-texts", "2", "--export", export,
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    q = summary["quality"]
    assert q["decode_shape"] == {
        "fps": 2, "depth_group": 1, "spec": False, "mtp_cp_batch": False,
    }
    assert q["asr"] is True and q["texts"] == 2
    assert q["median_wer_delta"] == 0.0      # constant hyp: deltas cancel
    assert q["pass"] is True
    assert summary["exported"] == export
    assert os.path.exists(os.path.join(export, "tts_config.json"))


def test_finetune_eval_quality_gate_fails_loudly(tmp_path, capsys,
                                                 monkeypatch):
    """A WER delta past the budget exports WITH a warning and exits 3."""
    from test_finetune_cli import _write_pair

    from qwen3_tts_tpu import finetune, transcription

    d = str(tmp_path / "data")
    os.makedirs(d)
    for i in range(4):
        _write_pair(d, f"clip{i}", f"utterance number {i}", seconds=0.3)

    # baseline decode transcribes perfectly, variant decode as garbage:
    # alternate per call (baseline texts come first in the harness)
    state = {"n": 0}

    def split_brain(path):
        state["n"] += 1
        return "utterance number" if state["n"] <= 2 else "x y z q"

    monkeypatch.setattr(
        transcription, "_providers", {"fake-split": split_brain}
    )

    export = str(tmp_path / "tuned")
    with pytest.warns(UserWarning, match="quality gate FAILED"):
        rc = finetune.main([
            "--model", "synthetic-tiny", "--data", d,
            "--steps", "1", "--batch-size", "4", "--mtp-fps", "2",
            "--eval-quality", "--eval-texts", "2", "--export", export,
        ])
    assert rc == 3
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["quality"]["pass"] is False
    assert summary["quality"]["median_wer_delta"] > 0.02
    assert summary["exported"] == export     # exported anyway, loudly


def test_decode_quality_cli_offline(tmp_path, capsys, monkeypatch):
    """tools/decode_quality.py end-to-end offline: synthetic model, fake
    provider, JSON line, exit codes."""
    import importlib.util
    import sys

    from qwen3_tts_tpu import transcription

    spec = importlib.util.spec_from_file_location(
        "decode_quality",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "decode_quality.py"),
    )
    dq = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dq)

    monkeypatch.setattr(
        transcription, "_providers", {"fake-cli": lambda p: "hello"}
    )
    monkeypatch.setenv("QWEN3_TTS_DEVICE_LOCK", "0")
    monkeypatch.setattr(sys, "argv", [
        "decode_quality.py", "--model", "synthetic:tiny",
        "--variants", "fps=1+dg=1", "--max-frames", "6", "--json",
    ])
    with pytest.raises(SystemExit) as e:
        dq.main()
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "gate PASS" in out
    line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    rep = json.loads(line)
    assert rep["variants"]["fps=1+dg=1"]["median_wer_delta"] is not None
