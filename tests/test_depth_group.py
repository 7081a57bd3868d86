"""Grouped depth prediction (CodePredictorConfig.depth_group).

The code predictor's depth transformer normally emits ONE residual
codebook per sequential pass — under the published feedback protocol
(cp-in-loop, PERF.md) those passes stream the cp weights once per
residual codebook per frame, which dominates real-checkpoint decode.
``depth_group=k`` scores k consecutive residual heads per pass and feeds
the next pass the SUM of the group's code embeddings: k× fewer passes,
no new parameters (the per-depth heads/tables are re-indexed), so a real
checkpoint enables it with config + fine-tune — the same extension
family as talker MTP (frames_per_step).

Tests pin:
- config validation (group must divide the residual count),
- depth_group=1 is bit-identical to the pre-grouping implementation
  (covered implicitly by the whole existing suite; here: vs teacher),
- grouped decode end-to-end + serving greedy parity,
- teacher-forced cp logits argmax == greedily decoded residual codes
  (train/decode layout parity for the grouped transformer),
- grouping composes with MTP under the published protocol.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.engine import configs
from qwen3_tts_tpu.engine.api import Qwen3TTSModel
from qwen3_tts_tpu.models.code_predictor import predict_residuals
from qwen3_tts_tpu.runtime.prompts import PromptSpec
from qwen3_tts_tpu.runtime.sampling import SamplingConfig
from qwen3_tts_tpu.runtime.serving import ServingEngine
from qwen3_tts_tpu.training.loss import code_predictor_teacher_logits

GREEDY = SamplingConfig(temperature=0.0)


def _prompt(n: int = 8, speaker: int | None = 1) -> PromptSpec:
    return PromptSpec(
        text_tokens=np.arange(n, dtype=np.int32) + 5, speaker_id=speaker
    )


def _model(depth_group: int, fps: int = 1, seed: int = 0) -> Qwen3TTSModel:
    cfg = configs.tiny_feedback(
        "custom", frames_per_step=fps, depth_group=depth_group
    )
    m = Qwen3TTSModel.synthetic(cfg, seed=seed)
    m.generator.sampling = GREEDY
    return m


# -- config validation --------------------------------------------------------

def test_depth_group_must_divide_residuals():
    # tiny codec has 3 residual codebooks; 2 does not divide 3
    with pytest.raises(ValueError, match="depth_group"):
        configs.tiny_feedback("custom", depth_group=2)


def test_depth_group_accepts_divisors():
    cfg = configs.tiny_feedback("custom", depth_group=3)
    assert cfg.code_predictor.depth_group == 3
    cfg = configs.flagship_feedback("custom", depth_group=5)
    assert cfg.code_predictor.depth_group == 5


# -- cp-level: decode vs teacher layout parity --------------------------------

@pytest.mark.parametrize("depth_group", [1, 3])
@pytest.mark.parametrize("layout", ["sum", "hidden_token"])
def test_cp_greedy_decode_matches_teacher(depth_group, layout):
    """Greedy predict_residuals and the teacher-forced logits must agree:
    teacher-forcing the decoded codes reproduces them via argmax, for
    both input layouts, grouped and ungrouped."""
    from qwen3_tts_tpu.models.code_predictor import init_code_predictor

    cfg = configs.tiny_feedback("custom", depth_group=depth_group)
    if layout == "sum":
        cfg = dataclasses.replace(
            cfg,
            talker=dataclasses.replace(cfg.talker, feedback="cb0"),
            code_predictor=dataclasses.replace(
                cfg.code_predictor, input_layout="sum", input_proj=True
            ),
        )
    cp_params = jax.tree.map(
        jnp.asarray, init_code_predictor(cfg, seed=3)
    )
    B = 5
    rng = np.random.default_rng(0)
    hidden = jnp.asarray(
        rng.normal(0, 1, (B, cfg.talker.hidden)).astype(np.float32)
    )
    cb0 = jnp.asarray(rng.integers(0, cfg.codec.codebook_size, B), jnp.int32)

    codes = predict_residuals(cp_params, cfg, hidden, cb0)       # [B, Q-1]
    full = jnp.concatenate([cb0[:, None], codes], axis=1)        # [B, Q]
    logits = code_predictor_teacher_logits(cp_params, cfg, hidden, full)
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(logits, axis=-1)), np.asarray(codes)
    )


def test_grouped_sampling_matches_greedy_when_greedy():
    """row_keys/key plumbing survives grouping: greedy config ignores
    keys, so sampled and unkeyed calls agree."""
    from qwen3_tts_tpu.models.code_predictor import init_code_predictor

    cfg = configs.tiny_feedback("custom", depth_group=3)
    cp_params = jax.tree.map(jnp.asarray, init_code_predictor(cfg, seed=3))
    rng = np.random.default_rng(1)
    hidden = jnp.asarray(
        rng.normal(0, 1, (4, cfg.talker.hidden)).astype(np.float32)
    )
    cb0 = jnp.asarray(rng.integers(0, cfg.codec.codebook_size, 4), jnp.int32)
    a = predict_residuals(cp_params, cfg, hidden, cb0)
    b = predict_residuals(
        cp_params, cfg, hidden, cb0, key=jax.random.PRNGKey(0)
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grouped_stochastic_sampling_is_reproducible():
    """With the published cp sampling args, grouped depths sample
    reproducibly per key and fold per ABSOLUTE depth (k=1 and k=3 share
    the fold schedule, so seeds mean the same thing across configs)."""
    from qwen3_tts_tpu.models.code_predictor import init_code_predictor

    cfg = configs.tiny_feedback("custom", depth_group=3)
    cfg = dataclasses.replace(
        cfg,
        code_predictor=dataclasses.replace(
            cfg.code_predictor, top_k=5, top_p=0.9
        ),
    )
    cp_params = jax.tree.map(jnp.asarray, init_code_predictor(cfg, seed=3))
    rng = np.random.default_rng(2)
    hidden = jnp.asarray(
        rng.normal(0, 1, (4, cfg.talker.hidden)).astype(np.float32)
    )
    cb0 = jnp.asarray(rng.integers(0, cfg.codec.codebook_size, 4), jnp.int32)
    key = jax.random.PRNGKey(7)
    a = predict_residuals(cp_params, cfg, hidden, cb0, key=key)
    b = predict_residuals(cp_params, cfg, hidden, cb0, key=key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# -- engine-level: decode + serving -------------------------------------------

def test_depth_group_decode_end_to_end():
    m = _model(depth_group=3)
    res = m.generator.synthesize(_prompt(), max_frames=12, seed=3)
    assert res.frames > 0
    assert res.wav.dtype == np.int16
    assert len(res.wav) == res.frames * m.cfg.codec.hop


def test_depth_group_serving_matches_single_stream():
    """The CLAUDE.md greedy-parity invariant must hold under grouping."""
    m = _model(depth_group=3)
    prompts = [_prompt(6 + i, speaker=i % 2) for i in range(3)]
    singles = [
        m.generator.synthesize(p, max_frames=12, seed=0).wav for p in prompts
    ]
    eng = ServingEngine(m, max_streams=4, chunk=4, sampling=GREEDY)
    outs = eng.run(prompts, max_frames=12)
    for i, (wav, st) in enumerate(outs):
        np.testing.assert_array_equal(wav, singles[i])


def test_depth_group_composes_with_mtp():
    """depth_group=3 under fps=2 — the full post-fine-tune fast path for
    real checkpoints (talker passes /2, cp passes /3)."""
    m = _model(depth_group=3, fps=2)
    single = m.generator.synthesize(_prompt(), max_frames=12, seed=0).wav
    assert len(single) > 0
    eng = ServingEngine(m, max_streams=2, chunk=4, sampling=GREEDY)
    outs = eng.run([_prompt()], max_frames=12)
    np.testing.assert_array_equal(outs[0][0], single)


# -- training: grouped cp loss is finite and shaped ---------------------------

def test_grouped_cp_loss_runs():
    from qwen3_tts_tpu.training.loss import code_predictor_loss

    m = _model(depth_group=3)
    cfg = m.cfg
    Q = cfg.codec.num_codebooks
    B, Tf, Tt = 2, 6, 8
    rng = np.random.default_rng(0)
    batch = {
        "text_tokens": jnp.asarray(
            rng.integers(5, 50, (B, Tt)), jnp.int32
        ),
        "text_mask": jnp.ones((B, Tt), bool),
        "codes": jnp.asarray(
            rng.integers(0, cfg.codec.residual_codebook_size, (B, Q, Tf)),
            jnp.int32,
        ),
        "frame_mask": jnp.ones((B, Tf), bool),
        "speaker_id": jnp.asarray([1, 2], jnp.int32),
    }
    loss = code_predictor_loss(m.params, m.generator.cp_params, cfg, batch)
    assert np.isfinite(float(loss))


def test_grouped_row_keys_duplicate_rows_sample_identically():
    """Batched cold-start prefill replicates slot 0 into padding rows and
    scatters by slot id — duplicate (hidden, cb0, slot) rows MUST draw
    identical residual codes under grouped stochastic sampling or the
    duplicate-index scatter becomes order-dependent."""
    from qwen3_tts_tpu.models.code_predictor import init_code_predictor

    cfg = configs.tiny_feedback("custom", depth_group=3)
    cfg = dataclasses.replace(
        cfg,
        code_predictor=dataclasses.replace(
            cfg.code_predictor, top_k=5, top_p=0.9
        ),
    )
    cp_params = jax.tree.map(jnp.asarray, init_code_predictor(cfg, seed=3))
    rng = np.random.default_rng(4)
    row = rng.normal(0, 1, (1, cfg.talker.hidden)).astype(np.float32)
    hidden = jnp.asarray(np.repeat(row, 4, axis=0))
    cb0 = jnp.full((4,), 7, jnp.int32)
    base = jax.random.PRNGKey(11)
    row_keys = jax.vmap(lambda s: jax.random.fold_in(base, s))(
        jnp.zeros((4,), jnp.int32)   # all rows replicate slot 0
    )
    codes = np.asarray(predict_residuals(
        cp_params, cfg, hidden, cb0, row_keys=row_keys
    ))
    for i in range(1, 4):
        np.testing.assert_array_equal(codes[0], codes[i])
