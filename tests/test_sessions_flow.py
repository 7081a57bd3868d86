"""End-to-end session flows driven with scripted inputs against a tiny
synthetic engine — integration coverage the reference never had (its sessions
were only import-smoke-tested, SURVEY.md §4 "what is NOT tested")."""

import os

import pytest

jax = pytest.importorskip("jax")

import qwen3_tts_tpu.io as io_module  # noqa: E402
from qwen3_tts_tpu.sessions import custom as custom_session  # noqa: E402
from qwen3_tts_tpu.sessions import design as design_session  # noqa: E402
from qwen3_tts_tpu.ui import BackSignal  # noqa: E402


class ScriptedInput:
    def __init__(self, lines):
        self.lines = list(lines)

    def __call__(self, prompt=""):
        if not self.lines:
            raise EOFError
        return self.lines.pop(0)


class ScriptedText:
    def __init__(self, texts):
        self.texts = list(texts)

    def __call__(self, prompt="Enter text (or drag a .txt file)"):
        if not self.texts:
            raise BackSignal
        return self.texts.pop(0)


@pytest.fixture
def fake_engine(monkeypatch, temp_dir):
    """Route the session's model acquisition to a synthetic tiny model and
    its outputs into a temp dir."""
    monkeypatch.setattr(io_module, "BASE_OUTPUT_DIR", temp_dir)
    monkeypatch.setattr(io_module, "AUTO_PLAY", False)

    def fake_ensure_model(spec):
        return "synthetic:tiny:custom"

    for mod in (custom_session, design_session):
        monkeypatch.setattr(mod, "ensure_model", fake_ensure_model)
        # skip the 1s cosmetic sleep in save_audio_file
    monkeypatch.setattr(io_module.time, "sleep", lambda s: None)
    return temp_dir


def _saved_wavs(root):
    out = []
    for dirpath, _, files in os.walk(root):
        out += [os.path.join(dirpath, f) for f in files if f.endswith(".wav")]
    return out


def test_custom_session_generates_and_saves(fake_engine, monkeypatch):
    # speaker "1", emotion default (empty), speed default (empty),
    # one utterance, then back
    monkeypatch.setattr(
        custom_session, "safe_line_input", ScriptedInput(["1", "", ""])
    )
    monkeypatch.setattr(
        custom_session, "get_text_input", ScriptedText(["Hello there."])
    )
    custom_session.run_custom_session("1")
    wavs = _saved_wavs(fake_engine)
    assert len(wavs) == 1
    assert os.path.getsize(wavs[0]) > 1000


def test_custom_session_back_at_speaker(fake_engine, monkeypatch):
    monkeypatch.setattr(
        custom_session, "safe_line_input", ScriptedInput([""])
    )
    custom_session.run_custom_session("1")  # must return cleanly, no output
    assert _saved_wavs(fake_engine) == []


def test_design_session_generates(fake_engine, monkeypatch):
    monkeypatch.setattr(
        design_session, "safe_line_input",
        ScriptedInput(["a calm narrator with a deep voice"]),
    )
    monkeypatch.setattr(
        design_session, "get_text_input", ScriptedText(["Designed voice."])
    )
    design_session.run_design_session("2")
    assert len(_saved_wavs(fake_engine)) == 1


def test_clone_quick_flow(fake_engine, monkeypatch, temp_dir):
    """Quick clone: drag a reference wav, type a transcript, generate once.
    Exercises the full cloning pipeline (codec encoder -> acoustic prompt)."""
    import wave

    import numpy as np

    from qwen3_tts_tpu.sessions import clone as clone_session

    ref = os.path.join(temp_dir, "ref_voice.wav")
    rng = np.random.default_rng(0)
    with wave.open(ref, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(24_000)
        w.writeframes(
            (rng.normal(0, 0.1, 24_000).clip(-1, 1) * 32767)
            .astype(np.int16).tobytes()
        )

    monkeypatch.setattr(
        clone_session, "ensure_model", lambda spec: "synthetic:tiny:base"
    )
    # menu: quick clone, then back out
    menu = iter(["3", "b"])
    monkeypatch.setattr(
        clone_session, "instant_menu_choice", lambda keys: next(menu)
    )
    monkeypatch.setattr(
        clone_session, "safe_line_input",
        ScriptedInput([ref, "a reference transcript"]),
    )
    monkeypatch.setattr(
        clone_session, "get_text_input", ScriptedText(["Cloned speech."])
    )
    clone_session.run_clone_manager("3")
    wavs = [w for w in _saved_wavs(fake_engine) if "QuickClones" in w]
    assert len(wavs) == 1


def test_enroll_voice_flow(monkeypatch, temp_dir):
    """Enrollment: name -> audio -> transcript -> saved wav+txt pair
    (reference voices.py:74-156 behavior)."""
    import wave

    import numpy as np

    import qwen3_tts_tpu.voices as voices_module

    src = os.path.join(temp_dir, "sample voice.wav")
    with wave.open(src, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(24_000)
        w.writeframes(np.zeros(24_000, np.int16).tobytes())

    store = os.path.join(temp_dir, "voices")
    monkeypatch.setattr(voices_module, "VOICES_DIR", store)
    monkeypatch.setattr(
        voices_module, "safe_line_input",
        ScriptedInput(["My Test Voice!", src, "the transcript text"]),
    )
    name = voices_module.enroll_new_voice()
    assert name == "My_Test_Voice"
    wav_dst, txt_dst = voices_module.voice_paths(name)
    assert os.path.exists(wav_dst)
    assert open(txt_dst).read() == "the transcript text"
    assert voices_module.get_saved_voices() == [name]


def _mk_voice(store, name, transcript=None):
    import wave

    import numpy as np

    os.makedirs(store, exist_ok=True)
    wav = os.path.join(store, f"{name}.wav")
    with wave.open(wav, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(24_000)
        w.writeframes(np.zeros(2400, np.int16).tobytes())
    if transcript:
        with open(os.path.join(store, f"{name}.txt"), "w") as fh:
            fh.write(transcript)
    return wav


def test_delete_voice_flow(monkeypatch, temp_dir):
    import qwen3_tts_tpu.voices as voices_module

    store = os.path.join(temp_dir, "voices")
    _mk_voice(store, "alpha", "hello")
    _mk_voice(store, "beta")
    monkeypatch.setattr(voices_module, "VOICES_DIR", store)
    # pick #1 (alpha), confirm y
    monkeypatch.setattr(
        voices_module, "safe_line_input", ScriptedInput(["1", "y"])
    )
    assert voices_module.delete_voice() is True
    assert voices_module.get_saved_voices() == ["beta"]
    assert not os.path.exists(os.path.join(store, "alpha.txt"))


def test_delete_voice_declined(monkeypatch, temp_dir):
    import qwen3_tts_tpu.voices as voices_module

    store = os.path.join(temp_dir, "voices")
    _mk_voice(store, "alpha")
    monkeypatch.setattr(voices_module, "VOICES_DIR", store)
    monkeypatch.setattr(
        voices_module, "safe_line_input", ScriptedInput(["alpha", "n"])
    )
    assert voices_module.delete_voice() is False
    assert voices_module.get_saved_voices() == ["alpha"]


def test_update_voice_transcript_only(monkeypatch, temp_dir):
    import qwen3_tts_tpu.voices as voices_module

    store = os.path.join(temp_dir, "voices")
    _mk_voice(store, "alpha", "old words")
    monkeypatch.setattr(voices_module, "VOICES_DIR", store)
    # pick alpha, keep audio (empty), type new transcript
    monkeypatch.setattr(
        voices_module, "safe_line_input",
        ScriptedInput(["1", "", "new words"]),
    )
    assert voices_module.update_voice() == "alpha"
    assert voices_module.load_voice_transcript("alpha") == "new words"
