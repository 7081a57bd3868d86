"""Python client SDK (client.py) against a live daemon on loopback:
request shaping, streaming reassembly, error mapping, voice library."""

import io
import struct
import threading
import wave

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from qwen3_tts_tpu.client import ClientError, Qwen3TTSClient  # noqa: E402
from qwen3_tts_tpu.engine import configs  # noqa: E402
from qwen3_tts_tpu.engine.api import Qwen3TTSModel  # noqa: E402
from qwen3_tts_tpu.runtime.sampling import SamplingConfig  # noqa: E402
from qwen3_tts_tpu.server import TTSService, make_server  # noqa: E402


@pytest.fixture(scope="module")
def client_service(tmp_path_factory):
    model = Qwen3TTSModel.synthetic(configs.tiny("custom"), seed=11)
    service = TTSService(
        model, max_streams=2, sampling=SamplingConfig(greedy=True),
        voices_dir=str(tmp_path_factory.mktemp("voices")),
    ).start()
    srv = make_server(service, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    client = Qwen3TTSClient(f"http://127.0.0.1:{srv.server_address[1]}")
    yield client, service
    srv.shutdown()
    service.stop()


def test_health_and_models(client_service):
    client, service = client_service
    h = client.health()
    assert h["ok"] is True and h["max_streams"] == 2
    m = client.models()
    assert m["sample_rate"] == service.cfg.codec.sample_rate
    assert "qwen3_tts_requests_total" in client.metrics_text()


def test_synthesize_buffered_and_streamed_parity(client_service):
    client, service = client_service
    voice = sorted(service.cfg.speakers)[0]
    wav = client.synthesize("client parity text", voice=voice,
                            max_seconds=2)
    with wave.open(io.BytesIO(wav)) as w:
        assert w.getframerate() == service.cfg.codec.sample_rate
        buffered = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    assert len(buffered) > 0

    chunks = list(client.synthesize_stream(
        "client parity text", voice=voice, max_seconds=2
    ))
    assert len(chunks) >= 1
    streamed = np.concatenate(chunks)
    # greedy sampling + identical request -> identical PCM
    assert np.array_equal(streamed, buffered)


def test_stream_chunk_reassembly_odd_sizes(client_service):
    """chunk_samples smaller than the server's emit size forces the client
    to split/rejoin across read boundaries without tearing int16 frames."""
    client, service = client_service
    voice = sorted(service.cfg.speakers)[0]
    small = np.concatenate(list(client.synthesize_stream(
        "reassembly check", voice=voice, max_seconds=1, chunk_samples=7
    )))
    big = np.concatenate(list(client.synthesize_stream(
        "reassembly check", voice=voice, max_seconds=1, chunk_samples=65536
    )))
    assert np.array_equal(small, big)


def test_openai_speech_surface(client_service):
    client, service = client_service
    wav = client.speech("openai via client", voice="alloy")
    with wave.open(io.BytesIO(wav)) as w:
        assert w.getnframes() > 0
    pcm = client.speech("openai via client", voice="alloy",
                        response_format="pcm", max_seconds=1)
    assert len(pcm) % 2 == 0 and len(pcm) > 0


def test_error_mapping(client_service):
    client, _ = client_service
    with pytest.raises(ClientError) as e:
        client.synthesize("x", voice="nobody-here")
    assert e.value.status == 400 and "nobody-here" in e.value.message
    # OpenAI envelope ({"error": {"message": ...}}) parses too
    with pytest.raises(ClientError) as e:
        client.speech("x", voice="alloy", response_format="mp3")
    assert e.value.status == 400 and "mp3" in e.value.message


def _tiny_wav_bytes(sr=24000, n=2400) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        t = np.arange(n)
        w.writeframes(
            (np.sin(2 * np.pi * 220 * t / sr) * 8000).astype(np.int16)
            .tobytes()
        )
    return buf.getvalue()


def test_voice_library_roundtrip(client_service):
    client, _ = client_service
    assert client.list_voices() == []
    name = client.enroll_voice("client_voice", _tiny_wav_bytes(),
                               transcript="spoken words")
    assert name == "client_voice"
    voices = client.list_voices()
    assert voices == [{"name": "client_voice",
                       "transcript": "spoken words"}]
    # duplicate without overwrite -> 409 mapped to ClientError
    with pytest.raises(ClientError) as e:
        client.enroll_voice("client_voice", _tiny_wav_bytes())
    assert e.value.status == 409
    client.enroll_voice("client_voice", _tiny_wav_bytes(), overwrite=True)
    client.delete_voice("client_voice")
    assert client.list_voices() == []
    with pytest.raises(ClientError) as e:
        client.delete_voice("client_voice")
    assert e.value.status == 404
