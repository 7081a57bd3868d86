"""Batched-cp MTP variant (TalkerConfig.mtp_cp_batch): the MTP chain
conditions on cb0 embeddings ALONE so decode predicts all fps frames'
residuals in ONE batched code-predictor pass per step — cp weight bytes
per frame (the binding cost of the fps>1 recovery shapes, PERF.md) divide
by fps. A different fine-tune target from the full-feedback chain, so the
tests pin the invariant that makes it trainable: the teacher-forced
training layout (training/loss.py) reproduces the decode stream exactly,
plus serving parity, the seed-step row-keys invariant, and composition
with depth_group / spec_decode."""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.engine import configs
from qwen3_tts_tpu.engine.api import Qwen3TTSModel
from qwen3_tts_tpu.runtime.prompts import PromptSpec
from qwen3_tts_tpu.runtime.sampling import SamplingConfig
from qwen3_tts_tpu.runtime.serving import ServingEngine

GREEDY = SamplingConfig(temperature=0.0)


def _model(seed: int = 0, **kw) -> Qwen3TTSModel:
    cfg = configs.tiny_feedback(
        "custom", frames_per_step=2, mtp_cp_batch=True, **kw
    )
    m = Qwen3TTSModel.synthetic(cfg, seed=seed)
    m.generator.sampling = GREEDY
    return m


def _prompt(n: int = 8, speaker: int | None = 1) -> PromptSpec:
    return PromptSpec(
        text_tokens=np.arange(n, dtype=np.int32) + 5, speaker_id=speaker
    )


def test_decode_end_to_end_and_deterministic():
    m = _model()
    r1 = m.generator.synthesize(_prompt(), max_frames=16, seed=0)
    r2 = m.generator.synthesize(_prompt(), max_frames=16, seed=0)
    assert r1.wav.size > 0
    np.testing.assert_array_equal(r1.wav, r2.wav)


def test_differs_from_full_feedback_chain():
    """The cb0-only chain is a different conditioning: with the same
    weights the decoded stream must (generically) diverge from the
    full-feedback chain — a guard that the flag actually changes the
    graph rather than being dropped somewhere."""
    cfg_b = configs.tiny_feedback("custom", frames_per_step=2,
                                  mtp_cp_batch=True)
    cfg_f = configs.tiny_feedback("custom", frames_per_step=2)
    mb = Qwen3TTSModel.synthetic(cfg_b, seed=0)
    mf = Qwen3TTSModel.synthetic(cfg_f, seed=0)
    mb.generator.sampling = GREEDY
    mf.generator.sampling = GREEDY
    rb = mb.generator.synthesize(_prompt(12), max_frames=24, seed=0)
    rf = mf.generator.synthesize(_prompt(12), max_frames=24, seed=0)
    assert rb.wav.shape != rf.wav.shape or not np.array_equal(rb.wav, rf.wav)


def test_training_layout_matches_decode():
    """Teacher-forcing the greedily decoded codes through the published
    MTP training layout WITH mtp_cp_batch must reproduce the decoded
    token stream via argmax — the train/decode-consistency statement that
    makes the variant fine-tunable (the chain conditioning in
    training/loss.py mirrors the batched decode graph)."""
    from qwen3_tts_tpu.models.codec import init_codec_stream_state
    from qwen3_tts_tpu.runtime.generate import seed_feedback_frames
    from qwen3_tts_tpu.training.loss import _published_hidden_and_logits

    m = _model()
    cfg = m.cfg
    gen = m.generator
    prompt = _prompt(8, speaker=1)
    chunk = 8
    fps = cfg.talker.frames_per_step

    emb, pad, trailing = gen.assemble_prompt_full(prompt)
    Lb = emb.shape[1]
    cache_k, cache_v = gen._alloc_cache()
    pad_len = jnp.int32(pad)
    hidden_last, logits, cache_k, cache_v = gen._prefill_fn()(
        m.params, emb, pad_len, cache_k, cache_v
    )
    key = jax.random.PRNGKey(0)
    seed_tok, res_sum, seed_res, _ = seed_feedback_frames(
        m.params, gen.cp_params, cfg, GREEDY, hidden_last, logits, key
    )
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    cstate = init_codec_stream_state(cfg, 1, dtype=dtype)
    decode = gen._decode_fn(chunk, None)
    (_, _, _, _, _, _, _, _, _, n_valid, codes, _) = decode(
        m.params, gen.cp_params, gen.codec_params, cache_k, cache_v,
        cstate, trailing, jnp.full((1,), Lb, jnp.int32), pad_len,
        jnp.zeros((1,), jnp.int32), seed_tok, res_sum.astype(dtype),
        jnp.zeros((1,), jnp.int32), jnp.ones((1,), bool), key,
    )
    valid = int(n_valid[0])
    assert valid >= 2, "tiny model hit EOS immediately; adjust the prompt"

    cb = cfg.codec.codebook_size
    seed_frames = jnp.concatenate(
        [jnp.clip(seed_tok, 0, cb - 1)[:, None, :],
         jnp.transpose(seed_res, (0, 2, 1))], axis=1
    )                                                     # [1, Q, fps]
    keep = (valid // fps) * fps
    assert keep >= fps
    full_codes = jnp.concatenate(
        [seed_frames, codes[:, :, :keep]], axis=2
    )

    toks = prompt.text_tokens
    batch = {
        "text_tokens": jnp.asarray(toks)[None, :],
        "text_mask": jnp.ones((1, len(toks)), bool),
        "codes": full_codes,
        "frame_mask": jnp.ones((1, full_codes.shape[2]), bool),
        "speaker_id": jnp.asarray([1], jnp.int32),
    }
    _, tf_logits = _published_hidden_and_logits(
        m.params, gen.cp_params, cfg, batch
    )
    tfl = np.asarray(tf_logits[0].astype(jnp.float32))
    pred = tfl.argmax(axis=-1)
    got = np.asarray(full_codes[0, 0, :])
    ok = int(np.cumprod(got < cb - 1).sum())   # unambiguous prefix length
    assert ok >= fps + 1, f"too few comparable frames ({ok}); reseed"
    # bf16 argmax ties: the one-shot teacher-forced forward and the
    # incremental decode reduce in different orders, so a near-tied pair
    # of logits can flip argmax without any layout mismatch. Require the
    # decoded token to be argmax up to bf16 noise at EVERY frame, and
    # exact argmax at most of them (a conditioning bug wrecks both).
    gap = tfl.max(axis=-1)[:ok] - tfl[np.arange(ok), got[:ok]]
    assert (gap <= 2e-2).all(), (pred[:ok], got[:ok], gap)
    assert (pred[:ok] == got[:ok]).mean() >= 0.7, (pred[:ok], got[:ok])


def test_serving_matches_single_stream_greedy():
    """The CLAUDE.md invariant holds for the batched-cp variant: serving
    and single-stream decode are token-for-token identical under greedy
    sampling (the serving engine reuses the same chunk builder)."""
    m = _model()
    s0 = m.generator.synthesize(_prompt(8, 1), max_frames=8, seed=0).wav
    s1 = m.generator.synthesize(_prompt(6, 2), max_frames=8, seed=0).wav
    eng = ServingEngine(m, max_streams=2, chunk=4, sampling=GREEDY)
    id0 = eng.submit(_prompt(8, 1), max_frames=8)
    id1 = eng.submit(_prompt(6, 2), max_frames=8)
    for _ in range(40):
        eng.step()
        if eng.streams[id0].done and eng.streams[id1].done:
            break
    w0, _ = eng.collect(id0)
    w1, _ = eng.collect(id1)
    np.testing.assert_array_equal(w0, s0)
    np.testing.assert_array_equal(w1, s1)


def test_composes_with_depth_group_and_spec_decode():
    """mtp_cp_batch + depth_group + spec_decode in one decode graph (the
    full recovery stack): runs, finite, deterministic."""
    m = _model(depth_group=3, spec_decode=True)
    r1 = m.generator.synthesize(_prompt(), max_frames=16, seed=0)
    r2 = m.generator.synthesize(_prompt(), max_frames=16, seed=0)
    assert r1.wav.size > 0
    assert np.isfinite(r1.wav.astype(np.float32)).all()
    np.testing.assert_array_equal(r1.wav, r2.wav)


def test_sampled_cp_runs_and_duplicate_rows_identical():
    """Stochastic cp under the batched variant: the seed step expands
    row_keys per frame — replicated padding rows (the serving batched
    cold-start prefill) must draw bit-identical frames."""
    from qwen3_tts_tpu.runtime.generate import seed_feedback_frames

    cfg = configs.tiny_feedback("custom", frames_per_step=2,
                                mtp_cp_batch=True)
    cfg = dc.replace(cfg, code_predictor=dc.replace(
        cfg.code_predictor, top_k=4, top_p=0.9))
    m = Qwen3TTSModel.synthetic(cfg, seed=0)
    m.generator.sampling = SamplingConfig(temperature=0.9, top_k=8)
    gen = m.generator

    emb, pad, trailing = gen.assemble_prompt_full(_prompt(8, 1))
    cache_k, cache_v = gen._alloc_cache()
    hidden_last, logits, _, _ = gen._prefill_fn()(
        m.params, emb, jnp.int32(pad), cache_k, cache_v
    )
    h3 = jnp.concatenate([hidden_last] * 3, axis=0)
    lg3 = jnp.concatenate([logits] * 3, axis=0)
    key = jax.random.PRNGKey(7)
    slots = jnp.asarray([4, 4, 9], jnp.int32)   # rows 0,1 replicated
    tok, rs, res, _ = seed_feedback_frames(
        m.params, gen.cp_params, m.cfg, m.generator.sampling,
        h3, lg3, key, row_keys_from=slots,
    )
    np.testing.assert_array_equal(np.asarray(tok[0]), np.asarray(tok[1]))
    np.testing.assert_array_equal(np.asarray(res[0]), np.asarray(res[1]))
    np.testing.assert_array_equal(
        np.asarray(rs[0], np.float32), np.asarray(rs[1], np.float32)
    )


def test_finetune_extension_validation():
    """--mtp-cp-batch without frames_per_step > 1 is a config error (there
    is nothing to batch); with --mtp-fps it lands in the model config."""
    from qwen3_tts_tpu.finetune import apply_decode_extensions

    m = Qwen3TTSModel.synthetic(configs.tiny_feedback("custom"), seed=0)
    with pytest.raises(ValueError, match="mtp-cp-batch"):
        apply_decode_extensions(m, mtp_cp_batch=True)
    m2 = apply_decode_extensions(m, fps=2, mtp_cp_batch=True)
    assert m2.cfg.talker.frames_per_step == 2
    assert m2.cfg.talker.mtp_cp_batch
