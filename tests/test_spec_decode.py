"""Speculative depth decode (models/code_predictor.py): the grouped depth
pass as a DRAFT, teacher-forced full-depth verification — greedy configs
must be BIT-EXACT depth_group=1 greedy (first-mismatch correction), and
sampled configs (the published cp.generate args) must be EXACT IN
DISTRIBUTION vs the sequential dg=1 sampled stream (accept /
residual-resample speculative sampling). Either way depth_group stops
being a fidelity trade and becomes a pure throughput knob (PERF.md round
3; the MTP + speculative-decoding recipe of arXiv:2410.13839 applied to
the depth axis, where the published protocol's bytes actually go)."""

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
    predict_residuals_spec_sampled,
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


def _stoch_cfgs(top_k=4, top_p=0.9, temperature=1.0):
    """Stochastic cp configs (published cp.generate shape): sequential
    dg=1 target, dg=3+spec draft/verify, plain grouped dg=3 (the lossy
    negative control)."""
    base = configs.tiny_feedback("custom")
    base = dc.replace(base, code_predictor=dc.replace(
        base.code_predictor, top_k=top_k, top_p=top_p,
        temperature=temperature))
    spec = dc.replace(base, code_predictor=dc.replace(
        base.code_predictor, depth_group=3, spec_decode=True))
    grouped = dc.replace(base, code_predictor=dc.replace(
        base.code_predictor, depth_group=3))
    return base, spec, grouped


def test_sampled_spec_matches_sequential_distribution():
    """Exact speculative SAMPLING (predict_residuals_spec_sampled): the
    joint distribution over all residual depths must equal the sequential
    dg=1 sampled stream's — total variation below the sequential
    sampler's own split-half noise floor. Negative control: the plain
    grouped dg=3 path (the lossy factorization the spec loop replaces)
    must show a LARGE gap, proving the test has power."""
    base, spec, grouped = _stoch_cfgs()
    params = jax.tree.map(jnp.asarray, init_code_predictor(base, seed=7))
    h, cb0 = _inputs(base, B=2)
    N = 2500
    keys = jax.random.split(jax.random.PRNGKey(42), N)

    def dist(cfg):
        fn = jax.jit(jax.vmap(
            lambda k: predict_residuals(params, cfg, h, cb0, key=k)))
        return np.asarray(fn(keys))                       # [N, B, 3]

    seq, spc, grp = dist(base), dist(spec), dist(grouped)
    V = base.codec.residual_codebook_size

    def joint(a, row):
        x = a[:, row, :]
        flat = (x[:, 0] * V + x[:, 1]) * V + x[:, 2]
        return np.bincount(flat, minlength=V ** 3) / len(flat)

    for b in range(2):
        tv_spec = 0.5 * np.abs(joint(seq, b) - joint(spc, b)).sum()
        floor = 0.5 * np.abs(
            joint(seq[: N // 2], b) - joint(seq[N // 2:], b)).sum()
        tv_grp = 0.5 * np.abs(joint(seq, b) - joint(grp, b)).sum()
        assert tv_spec < max(2.0 * floor, 0.1), (tv_spec, floor)
        assert tv_grp > 0.5, tv_grp  # the control the spec loop removes


def test_sampled_spec_topk1_bit_matches_sequential():
    """top_k=1 collapses every filtered categorical to its argmax: the
    sampled spec path is then fully deterministic and must BIT-match the
    sequential dg=1 stream. A random-init grouped draft CAN miss the
    sequential argmax (each miss finalizes one depth and costs one more
    verify round), so rounds is only bounded by the depth count; a draft
    whose distribution equals the target's (zeroed heads -> p == q at
    every depth) must be fully accepted in ONE round."""
    base, spec, _ = _stoch_cfgs(top_k=1, top_p=1.0)
    params = jax.tree.map(jnp.asarray, init_code_predictor(base, seed=4))
    h, cb0 = _inputs(base, seed=5)
    key = jax.random.PRNGKey(9)
    n_res = base.codec.num_codebooks - 1
    exact = predict_residuals(params, base, h, cb0, key=key)
    got, rounds = predict_residuals_spec_sampled(
        params, spec, h, cb0, key=key, return_rounds=True)
    assert jnp.array_equal(exact, got)
    assert 1 <= int(rounds) <= n_res
    # and the public dispatch routes there
    assert jnp.array_equal(
        exact, predict_residuals(params, spec, h, cb0, key=key))
    # full-acceptance bound: constant logit rows make draft == target
    # distribution, so acceptance is exactly 1 -> one verify round
    flat = dict(params, heads=jnp.zeros_like(params["heads"]))
    _, r1 = predict_residuals_spec_sampled(
        flat, spec, h, cb0, key=key, return_rounds=True)
    assert int(r1) == 1


def test_sampled_spec_zero_temperature_routes_greedy():
    """temperature <= 0 is argmax inside sample_token regardless of the
    other sampling knobs, so the dispatch must take the bit-exact greedy
    verifier (the sampled path's filtered_logits would divide by the zero
    temperature and NaN out)."""
    base, spec, _ = _stoch_cfgs(top_k=4, top_p=1.0, temperature=0.0)
    params = jax.tree.map(jnp.asarray, init_code_predictor(base, seed=2))
    h, cb0 = _inputs(base)
    key = jax.random.PRNGKey(1)
    out = predict_residuals(params, spec, h, cb0, key=key)
    ref = predict_residuals(params, base, h, cb0, key=key)
    assert jnp.array_equal(out, ref)


def test_sampled_spec_duplicate_rows_identical():
    """row_keys mode (serving batched cold-start prefill): replicated
    padding rows must draw bit-identical residuals through the whole
    draft + accept/resample loop."""
    base, spec, _ = _stoch_cfgs()
    params = jax.tree.map(jnp.asarray, init_code_predictor(base, seed=3))
    h, cb0 = _inputs(base, B=2, seed=6)
    h3 = jnp.concatenate([h[:1], h[:1], h[1:]], axis=0)
    cb3 = jnp.concatenate([cb0[:1], cb0[:1], cb0[1:]], axis=0)
    rk = jax.vmap(jax.random.PRNGKey)(jnp.array([5, 5, 9]))
    out = predict_residuals(params, spec, h3, cb3, row_keys=rk)
    assert jnp.array_equal(out[0], out[1])


def test_sampled_spec_end_to_end_sampled_decode():
    """Whole sampled decode path (published protocol, cp sampling per the
    published args) runs with the spec cp inside the talker scan and
    produces finite audio — the while_loop composes with the decode
    scan's jit."""
    from qwen3_tts_tpu.engine.api import Qwen3TTSModel
    from qwen3_tts_tpu.runtime.prompts import PromptSpec
    from qwen3_tts_tpu.runtime.sampling import SamplingConfig

    cfg = configs.tiny_feedback("custom", depth_group=3, spec_decode=True)
    cfg = dc.replace(cfg, code_predictor=dc.replace(
        cfg.code_predictor, top_k=4, top_p=0.9))
    m = Qwen3TTSModel.synthetic(cfg, seed=3)
    m.generator.sampling = SamplingConfig(temperature=0.9, top_k=8)
    toks = (np.arange(16) * 5 % m.cfg.talker.vocab_size).astype(np.int32)
    r = m.generator.synthesize(
        PromptSpec(text_tokens=toks, speaker_id=1), max_frames=16, seed=0)
    assert r.wav.size > 0 and np.isfinite(r.wav.astype(np.float32)).all()


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
