"""tools/dress_rehearsal.py: the first-contact checklist, exercised
offline against a fabricated FULL 3-component checkpoint with template
files (VERDICT r2 #6)."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "dress_rehearsal",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "dress_rehearsal.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def full_checkpoint(tmp_path_factory):
    """A fabricated full checkpoint: quantized talker + cp + codec tensors,
    config.json, tts_prompts.json template file (test_weights fixtures)."""
    from test_weights import _write_mlx_style_checkpoint

    from qwen3_tts_tpu.engine import configs

    path = str(tmp_path_factory.mktemp("rehearsal") / "ckpt")
    cfg = configs.tiny("custom", quant=True)
    _write_mlx_style_checkpoint(path, cfg, full=True)
    with open(os.path.join(path, "tts_prompts.json"), "w") as f:
        json.dump({
            "custom": "<|instruct|>{instruct}<|/instruct|>{text}",
            "design": "<|voice|>{instruct}<|/voice|>{text}",
            "base": "<|ref|>{ref_text}<|/ref|>{text}",
        }, f)
    return path


def test_rehearse_full_checkpoint(full_checkpoint):
    dr = _load_tool()
    hyps = []

    def fake_asr(path):
        hyps.append(path)
        return dr._TEXT  # perfect round-trip: WER 0

    report = dr.rehearse(
        full_checkpoint, text=dr._TEXT, max_frames=8,
        transcribe=fake_asr,
    )
    by_name = {c["name"]: c for c in report["checks"]}

    assert by_name["import"]["status"] == "PASS"
    assert report["import"]["synthetic"] == []
    assert report["import"]["assigned"]["talker"] > 0
    assert report["import"]["assigned"]["codec"] > 0
    assert report["import"]["assigned"]["code_predictor"] > 0

    assert by_name["prompt-template"]["status"] == "PASS"
    assert report["protocol"]["template_source"] == "file"
    assert report["template_samples"]["custom"].startswith("<|instruct|>")

    # all three call shapes synthesized + ASR-scored
    for shape in ("custom", "design", "clone"):
        row = report["synthesis"][shape]
        assert row["audio_s"] > 0 and os.path.exists(row["wav"])
        assert row["wer"] == 0.0
        assert by_name[f"synthesis-{shape}"]["status"] == "PASS"
    assert len(hyps) == 3
    assert not any(c["status"] == "FAIL" for c in report["checks"])


def test_rehearse_flags_synthetic_fallback(tmp_path):
    """A checkpoint missing components imports (allow_partial) but the
    checklist flags the synthetic stand-ins as a FAIL — first contact
    must not read as healthy."""
    from test_weights import _hf_config_dict

    from safetensors.numpy import save_file

    from qwen3_tts_tpu.engine import configs

    dr = _load_tool()
    tiny = configs.tiny("custom")
    path = str(tmp_path / "partial")
    os.makedirs(path)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(_hf_config_dict(tiny), f)
    save_file({"codec.dec.ln": np.ones(tiny.codec.latent_dim, np.float32)},
              os.path.join(path, "model.safetensors"))

    report = dr.rehearse(path, synthesis=False)
    by_name = {c["name"]: c for c in report["checks"]}
    assert by_name["import"]["status"] == "FAIL"
    assert set(report["import"]["synthetic"]) == {"talker", "code_predictor"}
    assert by_name["prompt-template"]["status"] == "WARN"  # placeholder tags


def test_rehearsal_cli(full_checkpoint, capsys, monkeypatch):
    dr = _load_tool()
    monkeypatch.setenv("QWEN3_TTS_DEVICE_LOCK", "0")
    monkeypatch.setattr(sys, "argv", [
        "dress_rehearsal.py", "--snapshot", full_checkpoint,
        "--mode", "custom", "--max-frames", "8",
    ])
    with pytest.raises(SystemExit) as e:
        dr.main()
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "synthesis-custom" in out and "[PASS] import" in out
    line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    rep = json.loads(line)
    assert rep["protocol"]["codec_arch"] in ("rvq", "code2wav")
