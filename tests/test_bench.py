"""The driver captures BENCH_r*.json from bench.py's output — its helper
paths must keep working on any backend. Runs the serving-metrics helper on
the tiny config (CPU) and checks the JSON-facing shape."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

import bench  # noqa: E402  (repo root on sys.path via pytest rootdir)
from qwen3_tts_tpu.engine import configs  # noqa: E402
from qwen3_tts_tpu.engine.api import Qwen3TTSModel  # noqa: E402


def test_serving_metrics_shape_and_sanity():
    model = Qwen3TTSModel.synthetic(configs.tiny("custom"), seed=0)
    m = bench._serving_metrics(model, n_streams=2)
    assert set(m) == {
        "streams", "agg_rtf", "total_audio_s", "wall_s",
        "ttfa_s_p50", "join_ttfa_s_under_load",
    }
    assert m["streams"] == 2
    assert m["agg_rtf"] > 0 and m["total_audio_s"] > 0
    assert m["ttfa_s_p50"] > 0 and m["join_ttfa_s_under_load"] > 0


def test_single_stream_metrics_shape():
    model = Qwen3TTSModel.synthetic(configs.tiny("custom"), seed=0)
    m = bench._single_stream_metrics(model, reps=2, target_frames=12)
    assert set(m) == {"rtf", "ttfa_s_p50", "frames", "audio_s", "wall_s",
                      "compile_s"}
    assert m["rtf"] > 0 and m["audio_s"] > 0 and m["frames"] > 0


@pytest.mark.slow
def test_real_checkpoint_block_shape():
    """The real_checkpoint audit (VERDICT r2 #1, r3 #3) must produce all
    three decode shapes — raw import, lossy recovery, lossless spec
    recovery — with single-stream AND serving metrics; run on tiny
    feedback geometry (the flagship run happens on the TPU driver
    capture). Slow tier: the default tier covers the block machinery via
    test_real_checkpoint_budget_gate_skips_late_configs (one config +
    incremental emission) and the spec pinning via
    test_pin_draft_acceptance_zeroes_heads; the decode paths themselves
    are covered per-shape in test_feedback/test_mtp/test_spec_decode."""
    done = []
    real = bench._real_checkpoint_metrics(
        bench._tiny_feedback_factory, n_streams=2, reps=1, target_frames=12,
        on_config_done=lambda label, row: done.append(label),
    )
    assert set(real) == {"raw_import_fps1", "recovered_fps2_dg5",
                         "recovered_lossless_spec"}
    assert done == list(real)  # one incremental emission per config
    for label, row in real.items():
        assert row["rtf"] > 0 and row["vs_baseline"] > 0
        assert row["serving_8stream"]["agg_rtf"] > 0
        assert row["ttfa_s_p50"] > 0
    assert real["raw_import_fps1"]["fps"] == 1
    assert real["recovered_fps2_dg5"]["fps"] == 2
    spec = real["recovered_lossless_spec"]
    assert spec["spec_decode"] is True
    assert 0 < spec["draft_acceptance_pinned"] <= 1
    # tiny geometry: 3 residual books -> pinned depths clamp to [0, 3]
    assert 0 <= spec["accepted_depths"] <= 3


def test_pin_draft_acceptance_zeroes_heads():
    """Cheap default-tier coverage of the spec-entry pinning used by the
    real_checkpoint block (the full three-shape audit is in the slow
    tier): zeroed head rows make draft and verifier agree at exactly
    round(acceptance * n_res) depths."""
    cfg = bench._tiny_feedback_factory(
        "custom", depth_group=3, spec_decode=True
    )
    model = Qwen3TTSModel.synthetic(cfg, seed=0, fast=True)
    n_res = cfg.codec.num_codebooks - 1
    heads_before = np.asarray(model.cp_params["heads"])
    accepted = bench._pin_draft_acceptance(model, 0.67)
    assert accepted == round(0.67 * n_res)
    heads = np.asarray(model.cp_params["heads"])
    zeroed = [d for d in range(n_res) if not heads[d].any()]
    assert len(zeroed) == accepted
    kept = [d for d in range(n_res) if heads[d].any()]
    for d in kept:
        np.testing.assert_array_equal(heads[d], heads_before[d])
    # acceptance 0 is a no-op
    model2 = Qwen3TTSModel.synthetic(cfg, seed=0, fast=True)
    assert bench._pin_draft_acceptance(model2, 0.0) == 0


def test_real_checkpoint_budget_gate_skips_late_configs():
    """When the wall budget is exhausted mid-block, remaining configs are
    recorded as skipped (and still reported incrementally) instead of
    silently missing — the wedge-resilience contract (VERDICT r3 #1)."""
    calls = []

    def cont():
        calls.append(1)
        return len(calls) <= 1  # allow only the first config

    real = bench._real_checkpoint_metrics(
        bench._tiny_feedback_factory, n_streams=2, reps=1, target_frames=12,
        should_continue=cont,
    )
    assert "rtf" in real["raw_import_fps1"]
    assert real["recovered_fps2_dg5"] == {"skipped": "wall budget exhausted"}
    assert real["recovered_lossless_spec"] == {
        "skipped": "wall budget exhausted"
    }


def test_bench_killed_mid_run_leaves_parseable_superset():
    """The wedge rehearsal (VERDICT r3 #1): SIGKILL bench.py the moment
    the serving superset line lands — mid dress-rehearsal/real_checkpoint,
    exactly where round 3's driver timeout struck — and assert the last
    stdout line is a complete JSON document carrying the headline AND the
    serving block. That is the last-line-wins contract that keeps a
    device wedge from erasing the round's numbers."""
    import json
    import os
    import subprocess
    import sys
    import time

    root = os.path.join(os.path.dirname(__file__), "..")
    env = {**os.environ, "QWEN3_TTS_CPU": "1", "QWEN3_TTS_BENCH_TINY": "1"}
    env.pop("JAX_PLATFORMS", None)  # the in-process config API rules
    proc = subprocess.Popen(
        [sys.executable, "bench.py"], cwd=root, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    lines = []
    try:
        deadline = time.time() + 900
        while time.time() < deadline:
            line = proc.stdout.readline()
            if not line:
                break
            if line.lstrip().startswith("{"):
                lines.append(line)
                if '"serving_8stream"' in line:
                    proc.kill()  # the wedge
                    break
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=60)
    assert lines, "bench printed no JSON line before the kill"
    last = json.loads(lines[-1])  # what the driver would parse
    assert last["metric"] == "rtf_single_stream"
    assert last["value"] > 0
    assert last["detail"]["serving_8stream"]["agg_rtf"] > 0


def test_real_row_subprocess_returns_row_json():
    """bench.py --real-row <label> (the crash-containment path: one fresh
    process per real_checkpoint config) prints a complete row as its last
    stdout JSON line, on tiny CPU geometry via env propagation."""
    import json
    import os
    import subprocess
    import sys

    root = os.path.join(os.path.dirname(__file__), "..")
    env = {**os.environ, "QWEN3_TTS_CPU": "1", "QWEN3_TTS_BENCH_TINY": "1"}
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, "bench.py", "--real-row", "raw_import_fps1"],
        cwd=root, env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    row = json.loads(r.stdout.strip().splitlines()[-1])
    assert row["fps"] == 1 and row["rtf"] > 0
    assert row["serving_8stream"]["agg_rtf"] > 0

    # unknown label: error JSON + rc 2 (the parent records it, not crashes)
    r2 = subprocess.run(
        [sys.executable, "bench.py", "--real-row", "nope"],
        cwd=root, env=env, capture_output=True, text=True, timeout=120,
    )
    assert r2.returncode == 2
    assert "unknown real-row label" in json.loads(
        r2.stdout.strip().splitlines()[-1]
    )["error"]


def test_preflight_returns_quickly_when_device_answers(monkeypatch):
    """preflight must return fast when the probe subprocess succeeds
    (CPU backend answers trivially in the child)."""
    import subprocess

    calls = []
    real_run = subprocess.run

    def fake_run(cmd, **kw):
        calls.append(cmd)

        class R:
            returncode = 0

        return R()

    monkeypatch.setattr(subprocess, "run", fake_run)
    bench.preflight(deadline_s=5.0, probe_timeout_s=1.0)
    assert len(calls) == 1


def test_preflight_wedged_device_emits_honest_failure(monkeypatch, capsys):
    """A device that never answers must produce a recorded failure line and
    a non-zero exit, not an indefinite hang (the driver captures whatever
    bench.py prints as BENCH_r*.json)."""
    import json
    import subprocess

    def fake_run(cmd, **kw):
        raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 1))

    monkeypatch.setattr(subprocess, "run", fake_run)
    with pytest.raises(SystemExit) as exc:
        bench.preflight(deadline_s=0.5, probe_timeout_s=0.1)
    assert exc.value.code == 1
    line = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(line)
    assert payload["metric"] == "rtf_single_stream"
    assert payload["value"] == 0.0
    assert "unresponsive" in payload["detail"]["error"]
