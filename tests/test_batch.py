"""Offline batch synthesis (batch.py): input parsing, concurrent bulk
synthesis through one TTSService, manifest/resume semantics.

The reference has no bulk path (one interactive utterance at a time,
`/root/reference/src/qwen3_tts/sessions/custom.py:154-176`); this is the
production-scale surface the serving engine enables."""

import json
import os
import wave

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from qwen3_tts_tpu import batch  # noqa: E402
from qwen3_tts_tpu.engine import configs  # noqa: E402
from qwen3_tts_tpu.engine.api import Qwen3TTSModel  # noqa: E402
from qwen3_tts_tpu.runtime.sampling import SamplingConfig  # noqa: E402
from qwen3_tts_tpu.server import TTSService  # noqa: E402


@pytest.fixture(scope="module")
def service():
    model = Qwen3TTSModel.synthetic(configs.tiny("custom"), seed=7)
    svc = TTSService(
        model, max_streams=2, sampling=SamplingConfig(greedy=True)
    ).start()
    yield svc
    svc.stop()


# -- parse_items -------------------------------------------------------------

def test_parse_plain_text(tmp_path):
    p = tmp_path / "lines.txt"
    p.write_text("hello world\n\n# a comment\nsecond line\n")
    items = batch.parse_items(str(p), {"voice": "ryan"})
    assert [it["text"] for it in items] == ["hello world", "second line"]
    assert all(it["voice"] == "ryan" for it in items)
    # ids are the (1-based) input line numbers, stable under edits elsewhere
    assert [it["id"] for it in items] == ["000001", "000004"]


def test_parse_jsonl_defaults_and_overrides(tmp_path):
    p = tmp_path / "items.jsonl"
    p.write_text(
        json.dumps({"text": "a", "id": "x"}) + "\n"
        + json.dumps({"text": "b", "voice": "serena", "speed": 1.3}) + "\n"
    )
    items = batch.parse_items(str(p), {"voice": "ryan"})
    assert items[0]["voice"] == "ryan" and items[0]["id"] == "x"
    assert items[1]["voice"] == "serena" and items[1]["speed"] == 1.3


@pytest.mark.parametrize("line,err", [
    ('{"text": "a", "voics": "ryan"}', "unknown keys"),
    ('{"voice": "ryan"}', "missing/empty 'text'"),
    ('["not", "an", "object"]', "expected an object"),
    ('{bad json', "bad JSON"),
])
def test_parse_jsonl_rejects_bad_rows(tmp_path, line, err):
    p = tmp_path / "bad.jsonl"
    p.write_text(line + "\n")
    with pytest.raises(ValueError, match=err):
        batch.parse_items(str(p), {})


def test_parse_rejects_duplicate_ids(tmp_path):
    p = tmp_path / "dup.jsonl"
    p.write_text(
        json.dumps({"text": "a", "id": "same"}) + "\n"
        + json.dumps({"text": "b", "id": "same"}) + "\n"
    )
    with pytest.raises(ValueError, match="duplicate item ids"):
        batch.parse_items(str(p), {})


# -- submit-kwargs translation (duck-typed service; no engine needed) --------

class _FakeService:
    class cfg:
        class codec:
            frame_rate = 12
    def resolve_saved_voice(self, name):
        if name != "known":
            raise FileNotFoundError(name)
        return "/tmp/known.wav", "the transcript"


def test_submit_kwargs_saved_voice_and_budget():
    kw = batch._submit_kwargs(_FakeService(), {
        "text": "t", "saved_voice": "known", "max_seconds": 2.5,
    })
    assert kw["ref_wav_path"] == "/tmp/known.wav"
    assert kw["ref_text"] == "the transcript"
    assert kw["max_frames"] == 30  # 2.5 s * 12 Hz


def test_submit_kwargs_explicit_ref_beats_nothing():
    kw = batch._submit_kwargs(_FakeService(), {
        "text": "t", "ref_audio": "/a/b.wav",
    })
    assert kw["ref_wav_path"] == "/a/b.wav" and kw["ref_text"] == "."


# -- end-to-end over a live tiny service -------------------------------------

def _read_manifest(out_dir):
    rows = {}
    with open(os.path.join(out_dir, "manifest.jsonl")) as fh:
        for line in fh:
            row = json.loads(line)
            rows[row["id"]] = row
    return rows


def test_run_batch_end_to_end(service, tmp_path):
    voice = sorted(service.cfg.speakers)[0]
    items = [
        {"id": "a", "text": "first utterance", "voice": voice,
         "max_seconds": 2},
        {"id": "b", "text": "second utterance", "voice": voice,
         "max_seconds": 2},
        {"id": "c", "text": "third one", "voice": "no-such-speaker"},
    ]
    out = str(tmp_path / "out")
    summary = batch.run_batch(service, items, out)
    assert summary["items"] == 3
    assert summary["ok"] == 2 and summary["failed"] == 1
    rows = _read_manifest(out)
    for good in ("a", "b"):
        assert rows[good]["ok"] is True
        with wave.open(os.path.join(out, rows[good]["wav"])) as w:
            assert w.getframerate() == service.cfg.codec.sample_rate
            assert w.getnframes() > 0
        assert rows[good]["seconds"] > 0
    assert rows["c"]["ok"] is False and "no-such-speaker" in rows["c"]["error"]
    assert summary["audio_seconds"] == pytest.approx(
        rows["a"]["seconds"] + rows["b"]["seconds"], abs=1e-6
    )


def test_run_batch_resume_skips_done(service, tmp_path):
    voice = sorted(service.cfg.speakers)[0]
    items = [{"id": "r1", "text": "resume target", "voice": voice,
              "max_seconds": 1}]
    out = str(tmp_path / "out")
    s1 = batch.run_batch(service, items, out)
    assert s1["ok"] == 1
    mtime = os.path.getmtime(os.path.join(out, "r1.wav"))

    s2 = batch.run_batch(service, items, out, resume=True)
    assert s2["skipped"] == 1 and s2["ok"] == 0 and s2["failed"] == 0
    # the wav was not rewritten
    assert os.path.getmtime(os.path.join(out, "r1.wav")) == mtime
    # without resume it runs again (manifest gains a second r1 row)
    s3 = batch.run_batch(service, items, out)
    assert s3["ok"] == 1


def test_run_batch_resume_survives_torn_manifest_line(service, tmp_path):
    voice = sorted(service.cfg.speakers)[0]
    out = str(tmp_path / "out")
    os.makedirs(out)
    with open(os.path.join(out, "manifest.jsonl"), "w") as fh:
        fh.write(json.dumps({"id": "t1", "ok": True}) + "\n")
        fh.write('{"id": "t2", "ok": tr')  # crash mid-write
    items = [
        {"id": "t1", "text": "done already", "voice": voice},
        {"id": "t2", "text": "torn row reruns", "voice": voice,
         "max_seconds": 1},
    ]
    summary = batch.run_batch(service, items, out, resume=True)
    assert summary["skipped"] == 1 and summary["ok"] == 1
    assert os.path.exists(os.path.join(out, "t2.wav"))
