"""HTTP serving daemon (server.py): request/response contract, streaming
framing, error mapping, and parity between streamed and buffered responses.

Runs a real ThreadingHTTPServer on an ephemeral port against a tiny
synthetic model — no network beyond loopback, no weights."""

import io
import json
import queue
import threading
import urllib.error
import urllib.request
import wave

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from qwen3_tts_tpu.engine import configs  # noqa: E402
from qwen3_tts_tpu.engine.api import Qwen3TTSModel  # noqa: E402
from qwen3_tts_tpu.runtime.sampling import SamplingConfig  # noqa: E402
from qwen3_tts_tpu.server import (  # noqa: E402
    TTSService,
    make_server,
    wav_stream_header,
)

GREEDY = SamplingConfig(greedy=True)


@pytest.fixture(scope="module")
def served():
    model = Qwen3TTSModel.synthetic(configs.tiny("custom"), seed=5)
    service = TTSService(model, max_streams=2, sampling=GREEDY).start()
    srv = make_server(service, "127.0.0.1", 0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, service
    srv.shutdown()
    service.stop()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, json.loads(r.read())


def _post(base, payload, timeout=600):
    req = urllib.request.Request(
        base + "/v1/synthesize",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, dict(r.headers), r.read()


def test_healthz_and_models(served):
    base, service = served
    status, body = _get(base + "/healthz")
    assert status == 200 and body["ok"] is True
    assert body["max_streams"] == 2

    status, body = _get(base + "/v1/models")
    assert status == 200
    assert body["sample_rate"] == service.cfg.codec.sample_rate
    assert isinstance(body["speakers"], list) and body["speakers"]


def _parse_wav(data: bytes) -> tuple[np.ndarray, int]:
    with wave.open(io.BytesIO(data)) as w:
        sr = w.getframerate()
        pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    return pcm, sr


def test_synthesize_complete(served):
    base, service = served
    voice = sorted(service.cfg.speakers)[0]
    status, headers, data = _post(
        base, {"text": "hello from the tpu server", "voice": voice,
               "max_seconds": 2}
    )
    assert status == 200
    assert headers["Content-Type"] == "audio/wav"
    pcm, sr = _parse_wav(data)
    assert sr == service.cfg.codec.sample_rate
    assert len(pcm) > 0
    assert "X-TTFA-Ms" in headers


def test_streaming_matches_buffered(served):
    """Greedy decode: the chunked-streaming response must carry the exact
    same PCM as the buffered response for the same request."""
    base, service = served
    voice = sorted(service.cfg.speakers)[0]
    req = {"text": "stream parity check", "voice": voice, "max_seconds": 2}

    _, _, buffered = _post(base, req)
    pcm_buf, _ = _parse_wav(buffered)

    _, headers, streamed = _post(base, dict(req, stream=True))
    # urllib de-chunks; payload = 44-byte unknown-length header + raw PCM
    header = wav_stream_header(service.cfg.codec.sample_rate)
    assert streamed[: len(header)] == header
    pcm_stream = np.frombuffer(streamed[len(header):], np.int16)

    np.testing.assert_array_equal(pcm_stream, pcm_buf)


def test_multi_segment_request(served):
    """Text long enough to split into several segments synthesizes all of
    them concurrently and joins with silence gaps, like generate_audio."""
    base, service = served
    voice = sorted(service.cfg.speakers)[0]
    text = ("First sentence here. " * 20) + ("Second thought. " * 20)
    status, _, data = _post(
        base, {"text": text, "voice": voice, "max_seconds": 1}
    )
    assert status == 200
    pcm, _ = _parse_wav(data)
    from qwen3_tts_tpu.engine.api import _SEGMENT_GAP_S, _split_segments

    n_segs = len(_split_segments(text))
    assert n_segs > 1
    gap = int(_SEGMENT_GAP_S * service.cfg.codec.sample_rate)
    # at least the inter-segment gaps' worth of samples beyond one segment
    assert len(pcm) > (n_segs - 1) * gap


def test_bad_requests(served):
    base, service = served
    for payload in (
        {"text": ""},                                  # empty text
        {"text": "hi", "speed": 99.0},                 # speed out of range
        {"voice": "x"},                                # missing text
        {"text": "hi", "voice": "no-such-speaker-xyz"},  # unknown voice
    ):
        req = urllib.request.Request(
            base + "/v1/synthesize",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=120)
        assert e.value.code == 400, payload
    status, body = _get(base + "/healthz")
    assert body["errors_total"] >= 1  # unknown voice surfaced as an error


def test_metrics_endpoint(served):
    """Prometheus exposition: counters advance with served audio."""
    base, service = served
    voice = sorted(service.cfg.speakers)[0]
    _post(base, {"text": "metrics check", "voice": voice, "max_seconds": 1})
    with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    metrics = {
        line.split()[0]: line.split()[1]
        for line in text.splitlines()
        if line and not line.startswith("#") and "{" not in line
    }
    assert int(metrics["qwen3_tts_frames_total"]) > 0
    assert float(metrics["qwen3_tts_audio_seconds_total"]) > 0
    assert int(metrics["qwen3_tts_free_slots"]) == 2
    assert 'quantile="0.5"' in text  # TTFA summary present
    # summary-type contract: _sum and _count both exposed
    assert float(metrics["qwen3_tts_ttfa_seconds_sum"]) > 0
    assert int(metrics["qwen3_tts_ttfa_seconds_count"]) >= 1


def test_unknown_route(served):
    base, _ = served
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(base + "/nope", timeout=30)
    assert e.value.code == 404


def test_intake_backpressure():
    """A full intake queue raises queue.Full (503 at the HTTP layer) instead
    of stacking unbounded work. Service deliberately NOT started."""
    model = Qwen3TTSModel.synthetic(configs.tiny("custom"), seed=5)
    service = TTSService(model, max_streams=2, queue_size=1)
    service.submit(text="one")
    with pytest.raises(queue.Full):
        service.submit(text="two")


def test_bad_max_frames_rejected_at_intake(served):
    """A non-numeric max_frames must 400 at intake, not explode later in
    the driver thread (which would take the whole daemon down)."""
    base, service = served
    req = urllib.request.Request(
        base + "/v1/synthesize",
        data=json.dumps({"text": "hi", "max_frames": "twenty"}).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 400
    # the daemon must still be alive and serving
    status, body = _get(base + "/healthz")
    assert status == 200 and body["ok"] is True


def test_engine_cancel_frees_slot():
    """ServingEngine.cancel releases the slot, drops pending prefills and
    removes the stream record; in-flight speculative steps can no longer
    credit frames to it."""
    from qwen3_tts_tpu.runtime.prompts import PromptSpec
    from qwen3_tts_tpu.runtime.serving import ServingEngine

    model = Qwen3TTSModel.synthetic(configs.tiny("custom"), seed=5)
    engine = ServingEngine(model, max_streams=2, chunk=8, sampling=GREEDY)
    prompt = PromptSpec(
        text_tokens=np.arange(6, dtype=np.int32), speaker_id=0
    )
    sid = engine.submit(prompt, max_frames=64)
    assert engine.free_slots() == 1
    for _ in range(3):  # activate + decode a bit
        engine.step()
    payload = engine.dispatch_step()      # speculative in-flight step
    engine.cancel(sid)
    assert engine.free_slots() == 2
    assert sid not in engine.streams
    assert engine.collect_step(payload) == []  # stale payload: no credit

    # a pending (not yet prefilled) stream cancels cleanly too
    sid2 = engine.submit(prompt, max_frames=8)
    engine.cancel(sid2)
    assert engine.free_slots() == 2 and not engine._pending
    engine.step()  # no crash with nothing active


def test_engine_failure_fails_jobs_but_driver_survives():
    """A dispatch/collect failure must fail the in-flight jobs with an
    engine-error (500) payload, release their slots, and leave the driver
    thread alive to serve the next request."""
    import time as _time

    model = Qwen3TTSModel.synthetic(configs.tiny("custom"), seed=5)
    service = TTSService(model, max_streams=2, sampling=GREEDY).start()
    try:
        real_dispatch = service.engine.dispatch_step
        calls = {"n": 0}

        def exploding_dispatch():
            calls["n"] += 1
            raise RuntimeError("synthetic device blowup")

        service.engine.dispatch_step = exploding_dispatch
        job = service.submit(text="doomed request", max_frames=40)
        kind, payload = job.out.get(timeout=120)
        assert kind == "error"
        assert payload["code"] == 500
        assert "engine failure" in payload["message"]
        assert service.engine.free_slots() == 2 or not service._active

        # driver survived: restore the engine and serve a real request
        service.engine.dispatch_step = real_dispatch
        ok_job = service.submit(text="recovery request", max_frames=8)
        kind, payload = ok_job.out.get(timeout=300)
        while kind == "chunk":
            kind, payload = ok_job.out.get(timeout=300)
        assert kind == "done" and ok_job.frames > 0
        assert service._thread.is_alive()
    finally:
        service.stop()


def test_service_cancel_stops_job():
    """TTSService.cancel (client disconnect path) frees the engine slots a
    job occupies so they stop decoding discarded audio."""
    import time as _time

    model = Qwen3TTSModel.synthetic(configs.tiny("custom"), seed=5)
    service = TTSService(model, max_streams=2, sampling=GREEDY).start()
    # pin a single chunk size: the driver only drains cancels between
    # engine steps, and the default adaptive schedule compiles three decode
    # variants inside the step — minutes on a CPU contended by a parallel
    # test run, which starved this test's deadline
    service.engine.chunk = 4
    try:
        job = service.submit(text="cancel me please", max_frames=400)
        deadline = _time.time() + 300
        while not job.seg_of_stream and _time.time() < deadline:
            _time.sleep(0.05)  # wait for the driver to submit the segment
        assert job.seg_of_stream, "job never reached the engine"
        service.cancel(job)
        deadline = _time.time() + 300
        while (
            service.engine.free_slots() < 2 or service._active
        ) and _time.time() < deadline:
            _time.sleep(0.05)
        assert service.engine.free_slots() == 2
        assert not service._active
    finally:
        service.stop()


def test_server_does_not_leak_streams(served):
    """Long-lived server: finished engine streams must be dropped (codes +
    wav chunks would otherwise accumulate forever)."""
    base, service = served
    voice = sorted(service.cfg.speakers)[0]
    _post(base, {"text": "leak check", "voice": voice, "max_seconds": 1})
    assert len(service.engine.streams) == 0


# -- voice library over HTTP (clone-mode model) ------------------------------

@pytest.fixture(scope="module")
def clone_served(tmp_path_factory):
    model = Qwen3TTSModel.synthetic(configs.tiny("base"), seed=5)
    voices_dir = str(tmp_path_factory.mktemp("voices"))
    service = TTSService(
        model, max_streams=2, sampling=GREEDY, voices_dir=voices_dir
    ).start()
    srv = make_server(service, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", service
    srv.shutdown()
    service.stop()


def _ref_wav_b64(seconds=0.4, sr=16_000):
    """A small sine reference sample, deliberately NOT at 24 kHz (enroll
    must resample)."""
    import base64
    from qwen3_tts_tpu.audio import write_wav

    t = np.arange(int(seconds * sr)) / sr
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    import tempfile, os as _os
    fd, p = tempfile.mkstemp(suffix=".wav")
    _os.close(fd)
    write_wav(p, wav, sr)
    data = open(p, "rb").read()
    _os.unlink(p)
    return base64.b64encode(data).decode()


def test_voice_library_http_lifecycle(clone_served):
    base, service = clone_served
    b64 = _ref_wav_b64()

    # enroll (name gets sanitized like the terminal app)
    status, _, _ = (0, 0, 0)
    req = urllib.request.Request(
        base + "/v1/voices",
        data=json.dumps({"name": "My Voice!", "audio_b64": b64,
                         "transcript": "hello there"}).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        assert json.loads(r.read())["enrolled"] == "My_Voice"

    # duplicate -> 409; overwrite -> 200
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 409
    req2 = urllib.request.Request(
        base + "/v1/voices",
        data=json.dumps({"name": "My Voice!", "audio_b64": b64,
                         "transcript": "hello again",
                         "overwrite": True}).encode(),
        method="POST",
    )
    urllib.request.urlopen(req2, timeout=60).close()

    # listed, 24 kHz mono on disk
    _, voices = _get(base + "/v1/voices")
    assert voices["voices"] == [
        {"name": "My_Voice", "transcript": "hello again"}
    ]
    import wave as _wave
    with _wave.open(
        service.voices_dir + "/My_Voice.wav"
    ) as w:
        assert w.getframerate() == service.cfg.codec.sample_rate
        assert w.getnchannels() == 1

    # synthesize with the saved voice (clone call shape)
    status, headers, data = _post(
        base, {"text": "cloned hello", "saved_voice": "My Voice!",
               "max_seconds": 1}
    )
    assert status == 200 and headers["Content-Type"] == "audio/wav"
    pcm, sr = _parse_wav(data)
    assert len(pcm) > 0 and sr == service.cfg.codec.sample_rate

    # unknown saved voice -> 404
    reqv = urllib.request.Request(
        base + "/v1/synthesize",
        data=json.dumps({"text": "x", "saved_voice": "nobody"}).encode(),
        method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(reqv, timeout=60)
    assert e.value.code == 404

    # delete -> gone -> 404 on re-delete
    reqd = urllib.request.Request(
        base + "/v1/voices/My_Voice", method="DELETE"
    )
    urllib.request.urlopen(reqd, timeout=60).close()
    _, voices = _get(base + "/v1/voices")
    assert voices["voices"] == []
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(reqd, timeout=60)
    assert e.value.code == 404


# -- OpenAI-compatible /v1/audio/speech --------------------------------------

def _post_json(base, path, payload, timeout=600):
    req = urllib.request.Request(
        base + path,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, dict(r.headers), r.read()


def test_openai_speech_wav_and_pcm_parity(served):
    """An OpenAI alias voice resolves to a real speaker, and the 'pcm'
    response carries the exact samples of the 'wav' response."""
    base, service = served
    body = {"model": "tts-1", "input": "openai surface check",
            "voice": "alloy"}
    status, headers, wav_data = _post_json(base, "/v1/audio/speech", body)
    assert status == 200 and headers["Content-Type"] == "audio/wav"
    pcm_wav, sr = _parse_wav(wav_data)
    assert sr == service.cfg.codec.sample_rate and len(pcm_wav) > 0

    status, headers, raw = _post_json(
        base, "/v1/audio/speech", dict(body, response_format="pcm")
    )
    assert status == 200 and headers["Content-Type"] == "audio/pcm"
    assert np.array_equal(np.frombuffer(raw, np.int16), pcm_wav)


def test_openai_speech_native_speaker_name(served):
    base, service = served
    voice = sorted(service.cfg.speakers)[0]
    status, _, data = _post_json(
        base, "/v1/audio/speech", {"input": "native name", "voice": voice}
    )
    assert status == 200
    pcm, _ = _parse_wav(data)
    assert len(pcm) > 0


def test_openai_speech_streaming(served):
    base, service = served
    status, headers, streamed = _post_json(
        base, "/v1/audio/speech",
        {"input": "stream please", "voice": "echo",
         "stream_format": "audio"},
    )
    assert status == 200
    header = wav_stream_header(service.cfg.codec.sample_rate)
    assert streamed[: len(header)] == header
    assert len(streamed) > len(header)


def test_openai_speech_error_envelope(served):
    base, _ = served
    # unsupported container -> 400 with OpenAI error envelope
    with pytest.raises(urllib.error.HTTPError) as e:
        _post_json(base, "/v1/audio/speech",
                   {"input": "x", "voice": "alloy",
                    "response_format": "mp3"})
    assert e.value.code == 400
    err = json.loads(e.value.read())["error"]
    assert err["type"] == "invalid_request_error"
    assert "mp3" in err["message"]

    # unknown voice -> 400; missing input -> 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post_json(base, "/v1/audio/speech",
                   {"input": "x", "voice": "nobody-real"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post_json(base, "/v1/audio/speech", {"voice": "alloy"})
    assert e.value.code == 400
    assert "input" in json.loads(e.value.read())["error"]["message"]


def test_openai_speech_saved_voice_on_clone_model(clone_served):
    """On a cloning-mode model, OpenAI 'voice' names a library voice."""
    base, service = clone_served
    b64 = _ref_wav_b64()
    req = urllib.request.Request(
        base + "/v1/voices",
        data=json.dumps({"name": "oai_ref", "audio_b64": b64,
                         "transcript": "reference words"}).encode(),
        method="POST",
    )
    urllib.request.urlopen(req, timeout=60).close()
    try:
        status, headers, data = _post_json(
            base, "/v1/audio/speech",
            {"input": "clone via openai api", "voice": "oai_ref"},
        )
        assert status == 200 and headers["Content-Type"] == "audio/wav"
        pcm, _ = _parse_wav(data)
        assert len(pcm) > 0

        with pytest.raises(urllib.error.HTTPError) as e:
            _post_json(base, "/v1/audio/speech",
                       {"input": "x", "voice": "ghost"})
        assert e.value.code == 404
    finally:
        urllib.request.urlopen(urllib.request.Request(
            base + "/v1/voices/oai_ref", method="DELETE"), timeout=60
        ).close()


def test_service_serves_feedback_protocol_model():
    """The daemon's driver loop over a published-protocol model: submit
    through TTSService, get a finished WAV back (the engine runs the
    residual-sum feedback serve step underneath)."""
    # seed 5: seed 3's tiny random weights greedy-EOS at frame 0
    model = Qwen3TTSModel.synthetic(configs.tiny_feedback("custom"), seed=5)
    service = TTSService(model, max_streams=2, sampling=GREEDY).start()
    service.engine.chunk = 4
    try:
        voice = sorted(model.cfg.speakers)[0]
        job = service.submit(text="daemon over the published protocol",
                             voice=voice, max_frames=8)
        kind, payload = job.out.get(timeout=600)
        while kind == "chunk":
            kind, payload = job.out.get(timeout=600)
        assert kind == "done", payload
        assert job.frames > 0
    finally:
        service.stop()
