"""Speculative depth decode (models/code_predictor.py
predict_residuals_spec): the grouped depth pass as a DRAFT, teacher-forced
full-depth verification with first-mismatch correction — output must be
BIT-EXACT depth_group=1 greedy for any draft quality, turning the
depth_group fine-tune from a fidelity trade into a pure throughput knob
(PERF.md round 3; the MTP + speculative-decoding recipe of
arXiv:2410.13839 applied to the depth axis)."""

import dataclasses as dc

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from qwen3_tts_tpu.engine import configs  # noqa: E402
from qwen3_tts_tpu.models.code_predictor import (  # noqa: E402
    depth_argmax_teacher_forced,
    init_code_predictor,
    predict_residuals,
    predict_residuals_spec,
)


def _cfgs(layout: str, dg: int = 3):
    base = configs.tiny_feedback("custom")
    if layout == "sum":
        base = dc.replace(base, code_predictor=dc.replace(
            base.code_predictor, input_layout="sum", input_proj=True))
    spec = dc.replace(base, code_predictor=dc.replace(
        base.code_predictor, depth_group=dg, spec_decode=True))
    return base, spec


def _inputs(cfg, B=5, seed=0):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(
        rng.normal(0, 1, (B, cfg.talker.hidden)).astype(np.float32)
    ).astype(jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32)
    cb0 = jnp.asarray(
        rng.integers(0, cfg.codec.codebook_size, B).astype(np.int32))
    return h, cb0


@pytest.mark.parametrize("layout", ["hidden_token", "sum"])
def test_spec_matches_depth_ar_greedy_exactly(layout):
    """Random weights = adversarial draft (near-zero acceptance): the
    verify+correct loop must still converge to the exact dg=1 stream."""
    base, spec = _cfgs(layout)
    params = jax.tree.map(jnp.asarray, init_code_predictor(base, seed=7))
    h, cb0 = _inputs(base)
    exact, rs_exact = predict_residuals(
        params, base, h, cb0, return_feedback=True)
    got, rs_got, rounds = predict_residuals_spec(
        params, spec, h, cb0, return_feedback=True, return_rounds=True)
    n_res = base.codec.num_codebooks - 1
    assert jnp.array_equal(exact, got)
    assert jnp.allclose(rs_exact, rs_got)
    assert int(rounds) <= n_res + 1  # one fix per round + confirming pass


def test_routed_through_predict_residuals():
    """cfg.spec_decode routes the plain greedy call sites (decode loop,
    MTP chain, seeding, serving) without touching them."""
    base, spec = _cfgs("hidden_token")
    params = jax.tree.map(jnp.asarray, init_code_predictor(base, seed=1))
    h, cb0 = _inputs(base, seed=2)
    assert jnp.array_equal(
        predict_residuals(params, base, h, cb0),
        predict_residuals(params, spec, h, cb0))


def test_stochastic_residuals_fall_back_to_plain_grouped():
    """Sampled residuals (published cp.generate args) can't be verified by
    argmax comparison: a spec config with a sampling key must take the
    plain grouped path, not the spec path."""
    base, spec = _cfgs("hidden_token")
    stoch = dc.replace(spec, code_predictor=dc.replace(
        spec.code_predictor, top_k=5))
    grouped = dc.replace(stoch, code_predictor=dc.replace(
        stoch.code_predictor, spec_decode=False))
    params = jax.tree.map(jnp.asarray, init_code_predictor(base, seed=4))
    h, cb0 = _inputs(base, seed=5)
    key = jax.random.PRNGKey(9)
    assert jnp.array_equal(
        predict_residuals(params, stoch, h, cb0, key=key),
        predict_residuals(params, grouped, h, cb0, key=key))


def test_teacher_forced_rows_exact_on_matching_prefix():
    """Row d of the verifier equals the sequential dg=1 greedy token when
    codes[:, :d] match — asserted by feeding the exact codes and expecting
    a full fixed point."""
    base, _ = _cfgs("hidden_token")
    params = jax.tree.map(jnp.asarray, init_code_predictor(base, seed=11))
    h, cb0 = _inputs(base, seed=12)
    exact = predict_residuals(params, base, h, cb0)
    am = depth_argmax_teacher_forced(params, base, h, cb0, exact)
    assert jnp.array_equal(am, exact)


def test_perfect_draft_costs_one_verify_round():
    """Zeroed output heads make every logit row constant, so the grouped
    draft and the depth-AR argmax agree everywhere (token 0): the
    while_loop must exit after the single confirming pass — the
    acceptance=1 ceiling the TPU A/B measures."""
    base, spec = _cfgs("hidden_token")
    params = jax.tree.map(jnp.asarray, init_code_predictor(base, seed=3))
    params["heads"] = jnp.zeros_like(params["heads"])
    h, cb0 = _inputs(base, seed=6)
    got, rounds = predict_residuals_spec(
        params, spec, h, cb0, return_rounds=True)
    assert int(rounds) == 1
    assert jnp.array_equal(got, predict_residuals(params, base, h, cb0))


def test_spec_decode_end_to_end_bit_identical():
    """Whole decode path (prompt assembly, talker scan, MTP-free feedback
    loop, codec): a dg=3+spec model produces BIT-IDENTICAL audio to the
    dg=1 model with the same weights."""
    from qwen3_tts_tpu.engine.api import Qwen3TTSModel
    from qwen3_tts_tpu.runtime.prompts import PromptSpec

    m1 = Qwen3TTSModel.synthetic(configs.tiny_feedback("custom"), seed=3)
    m3 = Qwen3TTSModel.synthetic(
        configs.tiny_feedback("custom", depth_group=3, spec_decode=True),
        seed=3)
    toks = (np.arange(24) * 7 % m1.cfg.talker.vocab_size).astype(np.int32)
    p = PromptSpec(text_tokens=toks, speaker_id=1)
    r1 = m1.generator.synthesize(p, max_frames=32, seed=0)
    r3 = m3.generator.synthesize(p, max_frames=32, seed=0)
    assert np.array_equal(r1.wav, r3.wav)


def test_spec_config_roundtrips_native_format(tmp_path):
    """spec_decode survives save_model -> load_model."""
    from qwen3_tts_tpu.engine.api import Qwen3TTSModel, load_model
    from qwen3_tts_tpu.engine.weights import save_model

    m = Qwen3TTSModel.synthetic(
        configs.tiny_feedback("custom", depth_group=3, spec_decode=True),
        seed=0)
    save_model(m, str(tmp_path / "m"))
    back = load_model(str(tmp_path / "m"))
    assert back.cfg.code_predictor.spec_decode is True
    assert back.cfg.code_predictor.depth_group == 3


def test_spec_serving_matches_single_stream():
    """The CLAUDE.md greedy-parity invariant must hold with the spec cp
    inside the shared serving/single-stream decode builder."""
    from qwen3_tts_tpu.runtime.prompts import PromptSpec
    from qwen3_tts_tpu.runtime.sampling import SamplingConfig
    from qwen3_tts_tpu.runtime.serving import ServingEngine
    from qwen3_tts_tpu.engine.api import Qwen3TTSModel

    greedy = SamplingConfig(temperature=0.0)
    m = Qwen3TTSModel.synthetic(
        configs.tiny_feedback("custom", depth_group=3, spec_decode=True),
        seed=0)
    m.generator.sampling = greedy
    prompts = [
        PromptSpec(text_tokens=np.arange(6 + i, dtype=np.int32) + 5,
                   speaker_id=i % 2)
        for i in range(3)
    ]
    singles = [
        m.generator.synthesize(p, max_frames=12, seed=0).wav for p in prompts
    ]
    eng = ServingEngine(m, max_streams=4, chunk=4, sampling=greedy)
    outs = eng.run(prompts, max_frames=12)
    for i, (wav, _st) in enumerate(outs):
        np.testing.assert_array_equal(wav, singles[i])


def test_quality_harness_spec_variant_is_lossless():
    """quality.py 'dg=3+spec=1' variant vs the dg=1 baseline of the same
    weights: identical waveform (identical_frac 1.0, ~0 mel distance) —
    the decode-shape approximation is GONE, unlike plain dg."""
    from qwen3_tts_tpu.engine.api import Qwen3TTSModel
    from qwen3_tts_tpu.quality import compare_decode_configs, parse_variant
    from qwen3_tts_tpu.runtime.sampling import SamplingConfig

    m = Qwen3TTSModel.synthetic(configs.tiny_feedback("custom"), seed=2)
    m.sampling = SamplingConfig(greedy=True)
    rep = compare_decode_configs(
        m, {"spec": parse_variant("dg=3+spec=1")},
        ["lossless spec check"], None, voice=None, max_frames=12)
    v = rep["variants"]["spec"]
    assert v["median_identical_frac"] == 1.0
    assert v["median_mel_dist"] < 0.1
