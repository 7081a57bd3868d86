"""Observability: stage timers, trace annotations, opt-in metrics lines."""

import json

import numpy as np

from qwen3_tts_tpu import profiling


def test_stage_timer_accumulates():
    timer = profiling.StageTimer()
    with timer.stage("a"):
        sum(range(1000))
    with timer.stage("a"):
        pass
    with timer.stage("b"):
        pass
    s = timer.summary()
    assert s["a"]["calls"] == 2 and s["b"]["calls"] == 1
    assert s["a"]["total_s"] >= 0


def test_trace_is_noop_safe():
    with profiling.trace("anything"):
        x = np.ones(3).sum()
    assert x == 3


def test_metrics_opt_in(monkeypatch, capsys):
    monkeypatch.setenv("QWEN3_TTS_METRICS", "0")
    profiling.emit_metrics("e", {"x": 1})
    assert capsys.readouterr().err == ""

    monkeypatch.setenv("QWEN3_TTS_METRICS", "1")
    profiling.emit_metrics("e", {"x": 1})
    line = capsys.readouterr().err.strip()
    parsed = json.loads(line)
    assert parsed["event"] == "e" and parsed["x"] == 1
