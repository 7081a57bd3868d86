"""Freeze-base recovery (finetune.py --freeze-base): the strict recovery
mode grafts a DRAFT copy of the code predictor for the grouped layout and
trains ONLY the recovery params (MTP chain + draft), so the exported
model's base-shape decode — and the spec verifier — stay BIT-IDENTICAL to
the input checkpoint (VERDICT r4 #5; models/code_predictor.py
draft-adapter indirection; tools/calibrate_quality_gate.py).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qwen3_tts_tpu.engine import configs  # noqa: E402
from qwen3_tts_tpu.engine.api import Qwen3TTSModel, load_model  # noqa: E402
from qwen3_tts_tpu.quality import variant_model  # noqa: E402
from qwen3_tts_tpu.runtime.prompts import PromptSpec  # noqa: E402
from qwen3_tts_tpu.runtime.sampling import SamplingConfig  # noqa: E402

GREEDY = SamplingConfig(greedy=True)


def _moved_leaves(a, b, skip: tuple = ()):
    fa = {str(p): np.asarray(x, np.float32)
          for p, x in jax.tree_util.tree_flatten_with_path(a)[0]}
    fb = {str(p): np.asarray(x, np.float32)
          for p, x in jax.tree_util.tree_flatten_with_path(b)[0]}
    return [
        k for k in fa
        if not any(s in k for s in skip)
        and k in fb and not np.array_equal(fa[k], fb[k])
    ]


def _write_pairs(d, n=4):
    import wave

    os.makedirs(d, exist_ok=True)
    sr = 24_000
    for i in range(n):
        t = np.arange(sr // 3)
        pcm = (np.sin(2 * np.pi * (200 + 60 * i) * t / sr) * 9000).astype(
            np.int16
        )
        with wave.open(os.path.join(d, f"c{i}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm.tobytes())
        with open(os.path.join(d, f"c{i}.txt"), "w") as fh:
            fh.write(f"sample text number {i}\n")


@pytest.fixture(scope="module")
def recovery(tmp_path_factory):
    """base export + freeze-base recovery export (fps=2, dg=3, spec)."""
    from qwen3_tts_tpu import finetune

    work = tmp_path_factory.mktemp("freeze_base")
    data = str(work / "data")
    _write_pairs(data)
    base_d, rec_d = str(work / "base"), str(work / "rec")
    rc = finetune.main([
        "--model", "synthetic-tiny-feedback", "--data", data,
        "--steps", "6", "--batch-size", "4", "--lr", "1e-3",
        "--export", base_d,
    ])
    assert rc == 0
    rc = finetune.main([
        "--model", base_d, "--data", data,
        "--steps", "5", "--batch-size", "4", "--lr", "3e-4",
        "--freeze-base", "--mtp-fps", "2", "--depth-group", "3", "--spec",
        "--export", rec_d,
    ])
    assert rc == 0
    return base_d, rec_d


def test_base_weights_bit_identical(recovery):
    base_d, rec_d = recovery
    base, rec = load_model(base_d), load_model(rec_d)
    assert "draft" in rec.cp_params
    assert not _moved_leaves(base.params, rec.params, skip=("mtp",))
    assert not _moved_leaves(base.cp_params, rec.cp_params,
                             skip=("draft",))


def test_recovery_params_actually_trained(recovery):
    base_d, rec_d = recovery
    rec = load_model(rec_d)
    draft_init = {k: v for k, v in rec.cp_params.items() if k != "draft"}
    moved = _moved_leaves(draft_init, rec.cp_params["draft"])
    assert moved, "draft never moved from its grafted copy"
    base = load_model(base_d)
    assert _moved_leaves({"m": 0}, {"m": 0}) == []  # helper sanity
    assert "mtp" in rec.params and "mtp" not in base.params


def test_spec_decode_bit_exact_vs_raw_base(recovery):
    """The money property: after a freeze-base --spec recovery, spec
    decode is bit-exact to the RAW input checkpoint's dg=1 greedy chain —
    not merely to a drifted fine-tune."""
    base_d, rec_d = recovery
    base, rec = load_model(base_d), load_model(rec_d)
    base.sampling = rec.sampling = GREEDY
    p = PromptSpec(text_tokens=np.arange(8, dtype=np.int32) + 3,
                   speaker_id=1)
    r_base = base.generator.synthesize(p, max_frames=6, seed=0,
                                       collect_codes=True)
    spec_view = variant_model(rec, {"fps": 1})  # dg=3+spec from training
    spec_view.sampling = GREEDY
    r_spec = spec_view.generator.synthesize(p, max_frames=6, seed=0,
                                            collect_codes=True)
    assert r_base.frames == r_spec.frames
    np.testing.assert_array_equal(r_base.codes, r_spec.codes)
    np.testing.assert_array_equal(r_base.wav, r_spec.wav)


def test_grouped_decode_reads_draft(recovery):
    """dg>1 non-spec decode must read the draft copy: zeroing the draft
    heads changes its residual codes; the primary heads stay in charge of
    the sequential path."""
    _, rec_d = recovery
    rec = load_model(rec_d)
    rec.sampling = GREEDY
    p = PromptSpec(text_tokens=np.arange(8, dtype=np.int32) + 5,
                   speaker_id=0)
    dg_view = variant_model(rec, {"fps": 1, "spec": False})
    dg_view.sampling = GREEDY
    r1 = dg_view.generator.synthesize(p, max_frames=4, seed=0,
                                      collect_codes=True)

    rec2 = load_model(rec_d)
    rec2.sampling = GREEDY
    draft = dict(rec2.cp_params["draft"])
    draft["heads"] = jnp.zeros_like(draft["heads"])
    rec2.cp_params = {**rec2.cp_params, "draft": draft}
    dg2 = variant_model(rec2, {"fps": 1, "spec": False})
    dg2.sampling = GREEDY
    r2 = dg2.generator.synthesize(p, max_frames=4, seed=0,
                                  collect_codes=True)
    # the draft changed the grouped decode (its residual codes enter the
    # talker's residual-sum feedback from the seed frame onward, so even
    # the cb0 stream legitimately diverges)
    assert not np.array_equal(r1.codes, r2.codes)

    # sequential decode ignores the draft entirely
    seq1 = variant_model(rec, {"fps": 1, "dg": 1, "spec": False})
    seq2 = variant_model(rec2, {"fps": 1, "dg": 1, "spec": False})
    seq1.sampling = seq2.sampling = GREEDY
    s1 = seq1.generator.synthesize(p, max_frames=4, seed=0,
                                   collect_codes=True)
    s2 = seq2.generator.synthesize(p, max_frames=4, seed=0,
                                   collect_codes=True)
    np.testing.assert_array_equal(s1.codes, s2.codes)


def test_serving_draft_model_matches_single_stream(recovery):
    """An exported freeze-base model (draft subtree, dg=3+spec) must serve
    token-identically to its own single-stream decode — the draft rides
    the serving engine's fused cp relayout too."""
    from qwen3_tts_tpu.runtime.serving import ServingEngine

    _, rec_d = recovery
    rec = load_model(rec_d)
    rec.sampling = GREEDY
    view = variant_model(rec, {"fps": 1})
    view.sampling = GREEDY
    prompts = [
        PromptSpec(text_tokens=np.arange(8, dtype=np.int32) + s,
                   speaker_id=s % 4)
        for s in (2, 5)
    ]
    singles = [
        view.generator.synthesize(p, max_frames=6, seed=0,
                                  collect_codes=True)
        for p in prompts
    ]
    eng = ServingEngine(view, max_streams=2, chunk=4, sampling=GREEDY)
    served = eng.run(prompts, max_frames=6)
    for r, (_, stream) in zip(singles, served):
        assert stream.frames == r.frames
        np.testing.assert_array_equal(
            np.concatenate(stream.codes, axis=1)[:, : r.frames], r.codes
        )
