"""The published decode protocol (TalkerConfig.feedback="residual_sum").

Covers PARITY.md item 3 — the transformers Qwen3OmniMoeTalker generate
loop: the next talker input is the SUM of all codebook embeddings of the
previous frame plus a per-step trailing-text row, the code predictor runs
per frame inside the decode scan, and the prompt is the dual-stream
(text-hidden + codec-embedding) layout. Tests pin:

- config validation (the protocol's structural requirements),
- the trailing-text buffer layout (text rows, tts_eos, tts_pad fill),
- decode end-to-end on the tiny feedback config,
- serving <-> single-stream greedy parity (the CLAUDE.md invariant) under
  the protocol, including a mid-flight join,
- teacher-forced training layout == decode layout (argmax of the training
  logits reproduces the greedily decoded token stream).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.engine import configs
from qwen3_tts_tpu.engine.api import Qwen3TTSModel
from qwen3_tts_tpu.models.code_predictor import (
    predict_residuals,
    residual_feedback_sum,
)
from qwen3_tts_tpu.runtime.prompts import PromptSpec
from qwen3_tts_tpu.runtime.sampling import SamplingConfig
from qwen3_tts_tpu.runtime.serving import ServingEngine

GREEDY = SamplingConfig(temperature=0.0)


def _model(seed: int = 0) -> Qwen3TTSModel:
    cfg = configs.tiny_feedback("custom")
    m = Qwen3TTSModel.synthetic(cfg, seed=seed)
    m.generator.sampling = GREEDY
    return m


def _prompt(n: int = 8, speaker: int | None = 1) -> PromptSpec:
    return PromptSpec(
        text_tokens=np.arange(n, dtype=np.int32) + 5, speaker_id=speaker
    )


def test_fast_prompt_assembly_matches_eager():
    """The one-dispatch jitted assembly (cold-start TTFA lever — it
    replaces ~20 eager device ops per submit) must be BIT-identical to
    the eager chain across text lengths (incl. trailing-buffer eos and
    truncation edges) and speaker-row kinds."""
    m = _model()
    gen = m.generator
    Tb = m.cfg.talker.trailing_bucket
    cases = []
    for T in (4, 6, 30, Tb + 1, Tb + 2, Tb + 6):  # spans truncation edge
        cases.append(PromptSpec(
            text_tokens=(np.arange(T, dtype=np.int32) * 7 + 3)
            % m.cfg.talker.vocab_size,
            speaker_id=2,
        ))
    cases.append(PromptSpec(
        text_tokens=np.arange(9, dtype=np.int32) + 1, speaker_id=None
    ))
    cases.append(PromptSpec(
        text_tokens=np.arange(9, dtype=np.int32) + 1, speaker_token=3
    ))
    for p in cases:
        emb_f, pad_f, tr_f = gen.assemble_prompt_full(p)
        gen._fast_assembly = False
        try:
            emb_e, pad_e, tr_e = gen.assemble_prompt_full(p)
        finally:
            gen._fast_assembly = True
        assert pad_f == pad_e, (p.text_tokens.size,)
        np.testing.assert_array_equal(
            np.asarray(emb_f), np.asarray(emb_e),
            err_msg=f"T={p.text_tokens.size}",
        )
        np.testing.assert_array_equal(
            np.asarray(tr_f), np.asarray(tr_e),
            err_msg=f"T={p.text_tokens.size}",
        )


# -- config validation -------------------------------------------------------

def test_feedback_composes_with_mtp():
    # frames_per_step > 1 under the published protocol is the documented
    # MTP fine-tune path (PERF.md) — the config must accept it
    cfg = configs.tiny_feedback("custom", frames_per_step=2)
    assert cfg.talker.feedback == "residual_sum"
    assert cfg.talker.frames_per_step == 2


def test_feedback_requires_tts_ids():
    with pytest.raises(ValueError, match="tts_pad_id"):
        dataclasses.replace(
            configs.tiny_feedback().talker, tts_eos_id=None
        )


def test_feedback_requires_width_match():
    base = configs.tiny_feedback()
    with pytest.raises(ValueError, match="widths must match"):
        dataclasses.replace(
            base,
            code_predictor=dataclasses.replace(
                base.code_predictor, hidden=32
            ),
        )


def test_tts_ids_range_checked():
    with pytest.raises(ValueError, match="out of range"):
        dataclasses.replace(
            configs.tiny_feedback().talker, tts_pad_id=4096
        )


# -- prompt + trailing buffer -----------------------------------------------

def test_trailing_buffer_layout():
    m = _model()
    t = m.cfg.talker
    prompt = _prompt(10, speaker=None)
    emb, pad, trail = m.generator.assemble_prompt_full(prompt)
    Tb = t.trailing_bucket
    assert trail.shape == (1, Tb, t.hidden)
    text_emb = np.asarray(m.params["text_emb"])
    toks = prompt.text_tokens
    n_head = 3
    trail_np = np.asarray(trail[0], dtype=np.float32)
    # rows 0..T-n_head-2: projected text rows after the FIRST text token
    # (no text_proj on the synthetic model -> raw text_emb rows)
    expect_rows = text_emb[toks[n_head + 1:]]
    n_trail = expect_rows.shape[0]
    np.testing.assert_allclose(
        trail_np[:n_trail], expect_rows.astype(np.float32), rtol=1e-6
    )
    # then one tts_eos row, then tts_pad fill to the bucket
    np.testing.assert_allclose(
        trail_np[n_trail], text_emb[t.tts_eos_id].astype(np.float32),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        trail_np[n_trail + 1:],
        np.broadcast_to(
            text_emb[t.tts_pad_id], (Tb - n_trail - 1, t.hidden)
        ).astype(np.float32),
        rtol=1e-6,
    )


def test_published_prompt_rows():
    """Dual-stream prompt: head text rows, pad+markers, pad+speaker,
    bos+codec_pad, first_text+codec_bos (left-padded to the bucket)."""
    m = _model()
    t = m.cfg.talker
    prompt = _prompt(8, speaker=1)
    emb, pad, _ = m.generator.assemble_prompt_full(prompt)
    rows = np.asarray(emb[0, pad:], dtype=np.float32)
    text_emb = np.asarray(m.params["text_emb"], dtype=np.float32)
    codec_emb = np.asarray(m.params["codec_emb"], dtype=np.float32)
    spk_emb = np.asarray(m.params["spk_emb"], dtype=np.float32)
    toks = prompt.text_tokens
    pad_e = text_emb[t.tts_pad_id]
    bos_e = text_emb[t.tts_bos_id]
    expected = [
        text_emb[toks[0]], text_emb[toks[1]], text_emb[toks[2]],
        pad_e + codec_emb[t.codec_nothink],
        pad_e + codec_emb[t.codec_think_bos],
        pad_e + codec_emb[t.codec_think_eos],
        pad_e + spk_emb[1],
        bos_e + codec_emb[t.codec_pad],
        text_emb[toks[3]] + codec_emb[t.codec_bos],
    ]
    assert rows.shape[0] == len(expected)
    for i, exp in enumerate(expected):
        # the summed rows round once in bf16; pure-copy rows are exact
        np.testing.assert_allclose(rows[i], exp, rtol=2e-2, atol=2e-2)


# -- decode ------------------------------------------------------------------

def test_feedback_decode_end_to_end():
    m = _model()
    res = m.generator.synthesize(_prompt(), max_frames=10, seed=3)
    assert res.frames > 0
    assert res.wav.dtype == np.int16
    assert len(res.wav) == res.frames * m.cfg.codec.hop


def test_feedback_decode_deterministic_greedy():
    m = _model()
    a = m.generator.synthesize(_prompt(), max_frames=10, seed=0)
    b = m.generator.synthesize(_prompt(), max_frames=10, seed=7)
    # greedy sampling ignores the key: identical streams
    np.testing.assert_array_equal(a.wav, b.wav)


# -- serving parity -----------------------------------------------------------

def test_serving_matches_single_stream():
    m = _model()
    prompts = [_prompt(6 + i, speaker=i % 2) for i in range(3)]
    singles = [
        m.generator.synthesize(p, max_frames=12, seed=0).wav for p in prompts
    ]
    eng = ServingEngine(m, max_streams=4, chunk=4, sampling=GREEDY)
    outs = eng.run(prompts, max_frames=12)
    for i, (wav, st) in enumerate(outs):
        assert st.frames == 12
        np.testing.assert_array_equal(wav, singles[i])


def test_serving_join_under_load_matches():
    """A stream joining mid-flight must not perturb live feedback streams,
    and must itself decode token-identically."""
    m = _model()
    p0, p1 = _prompt(6, 0), _prompt(9, 1)
    s0 = m.generator.synthesize(p0, max_frames=16, seed=0).wav
    s1 = m.generator.synthesize(p1, max_frames=8, seed=0).wav

    eng = ServingEngine(m, max_streams=4, chunk=4, sampling=GREEDY)
    id0 = eng.submit(p0, max_frames=16)
    for _ in range(2):
        eng.step()
    id1 = eng.submit(p1, max_frames=8)  # joins while stream 0 decodes
    for _ in range(40):
        eng.step()
        if eng.streams[id0].done and eng.streams[id1].done:
            break
    w0, _ = eng.collect(id0)
    w1, _ = eng.collect(id1)
    np.testing.assert_array_equal(w0, s0)
    np.testing.assert_array_equal(w1, s1)


# -- training layout == decode layout -----------------------------------------

def test_training_layout_matches_decode():
    """Teacher-forcing the greedily decoded codes through the published
    training layout must reproduce the decoded token stream via argmax —
    the strongest train/serve-parity statement available offline."""
    from qwen3_tts_tpu.models.codec import init_codec_stream_state
    from qwen3_tts_tpu.training.loss import _published_hidden_and_logits

    m = _model()
    cfg = m.cfg
    t = cfg.talker
    gen = m.generator
    prompt = _prompt(8, speaker=1)
    chunk = 8

    emb, pad, trailing = gen.assemble_prompt_full(prompt)
    Lb = emb.shape[1]
    cache_k, cache_v = gen._alloc_cache()
    pad_len = jnp.int32(pad)
    hidden_last, logits, cache_k, cache_v = gen._prefill_fn()(
        m.params, emb, pad_len, cache_k, cache_v
    )
    key = jax.random.PRNGKey(0)
    seed_tok = gen._seed_tokens(hidden_last, logits, key)      # [1, 1]
    seed_res, res_sum = predict_residuals(
        gen.cp_params, cfg, hidden_last,
        jnp.clip(seed_tok[:, 0], 0, cfg.codec.codebook_size - 1),
        return_feedback=True,
    )
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    cstate = init_codec_stream_state(cfg, 1, dtype=dtype)
    decode = gen._decode_fn(chunk, None)
    (_, _, _, _, _, _, _, _, _, n_valid, codes, _) = decode(
        m.params, gen.cp_params, gen.codec_params, cache_k, cache_v,
        cstate, trailing, jnp.full((1,), Lb, jnp.int32), pad_len,
        jnp.zeros((1,), jnp.int32), seed_tok,
        res_sum.astype(dtype)[:, None, :],      # [B, fps=1, D]
        jnp.zeros((1,), jnp.int32), jnp.ones((1,), bool), key,
    )
    valid = int(n_valid[0])
    assert valid >= 2, "tiny model hit EOS immediately; adjust the prompt"

    # frames: [seed, decoded 0..valid-1] (codebook-0 rows are stored
    # clipped, which matches what teacher forcing feeds)
    seed_frame = jnp.concatenate(
        [jnp.clip(seed_tok[:, :1], 0, cfg.codec.codebook_size - 1),
         seed_res], axis=1
    )[:, :, None]                                              # [1, Q, 1]
    full_codes = jnp.concatenate(
        [seed_frame, codes[:, :, :valid]], axis=2
    )                                                          # [1, Q, 1+valid]

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
    # position g predicts frame g (position 0 is the codec_bos row whose
    # output chose the seed). Decode stores cb0 CLIPPED to the codebook, so
    # a mid-stream control token (possible on tiny synthetic vocabularies)
    # makes teacher-forced inputs diverge from that frame on — compare the
    # prefix where every stored code is unambiguous.
    pred = np.asarray(jnp.argmax(tf_logits[0], axis=-1))
    got = np.asarray(full_codes[0, 0, :])
    cb = cfg.codec.codebook_size
    ok = int(np.cumprod(got < cb - 1).sum())   # unambiguous prefix length
    assert ok >= 3, f"too few comparable frames ({ok}); reseed the test"
    np.testing.assert_array_equal(pred[:ok], got[:ok])


def test_residual_feedback_sum_matches_tables():
    m = _model()
    cfg = m.cfg
    n_res = cfg.codec.num_codebooks - 1
    codes = jnp.asarray(
        np.random.default_rng(0).integers(
            0, cfg.codec.residual_codebook_size, size=(3, n_res)
        ),
        jnp.int32,
    )
    s = np.asarray(
        residual_feedback_sum(m.generator.cp_params, codes),
        dtype=np.float32,
    )
    tabs = np.asarray(m.generator.cp_params["res_emb"], dtype=np.float32)
    expect = np.zeros_like(s)
    for b in range(3):
        for d in range(n_res):
            expect[b] += tabs[d, int(codes[b, d])]
    np.testing.assert_allclose(s, expect, rtol=1e-3, atol=1e-3)


def test_trailing_overflow_conditions_as_pad():
    """Text longer than the trailing bucket: the buffer's final rows must
    be tts_pad (the clamped lookup repeats the LAST row forever — a
    truncated text must never condition every later frame on tts_eos)."""
    m = _model()
    t = m.cfg.talker
    Tb = t.trailing_bucket
    long_prompt = PromptSpec(
        text_tokens=(np.arange(Tb + 20, dtype=np.int32) % 200) + 5,
        speaker_id=None,
    )
    _, _, trail = m.generator.assemble_prompt_full(long_prompt)
    text_emb = np.asarray(m.params["text_emb"], dtype=np.float32)
    trail_np = np.asarray(trail[0], dtype=np.float32)
    pad_row = text_emb[t.tts_pad_id]
    eos_row = text_emb[t.tts_eos_id]
    # last row is pad, and eos appears nowhere (text was truncated)
    np.testing.assert_allclose(trail_np[-1], pad_row, rtol=1e-6)
    assert not any(
        np.allclose(trail_np[i], eos_row, rtol=1e-6)
        for i in range(Tb)
    )
    # an untruncated prompt still gets exactly one eos row then pads
    short = _prompt(10, speaker=None)
    _, _, trail2 = m.generator.assemble_prompt_full(short)
    t2 = np.asarray(trail2[0], dtype=np.float32)
    n_trail = len(short.text_tokens) - 3 - 1
    np.testing.assert_allclose(t2[n_trail], eos_row, rtol=1e-6)
    np.testing.assert_allclose(t2[-1], pad_row, rtol=1e-6)


# -- residual-code sampling (the published cp.generate arguments) -------------

def test_cp_sampling_respects_key_and_greedy_gate():
    """With cp top_k/top_p set (the published do_sample/top_k=50/top_p=0.8),
    predict_residuals samples when given a key (different keys -> different
    codes somewhere) and stays argmax when the key is None — the greedy
    serving-parity mode."""
    m = _model()
    cfg = dataclasses.replace(
        m.cfg,
        code_predictor=dataclasses.replace(
            m.cfg.code_predictor, top_k=8, top_p=0.9, temperature=1.5
        ),
    )
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(0, 1, (6, cfg.talker.hidden)), jnp.float32)
    cb0 = jnp.asarray(rng.integers(0, cfg.codec.codebook_size, 6), jnp.int32)

    greedy1 = predict_residuals(m.cp_params, cfg, h, cb0)
    greedy2 = predict_residuals(m.cp_params, cfg, h, cb0, key=None)
    np.testing.assert_array_equal(np.asarray(greedy1), np.asarray(greedy2))

    s1 = predict_residuals(m.cp_params, cfg, h, cb0,
                           key=jax.random.PRNGKey(1))
    s2 = predict_residuals(m.cp_params, cfg, h, cb0,
                           key=jax.random.PRNGKey(2))
    assert not np.array_equal(np.asarray(s1), np.asarray(s2)), (
        "different keys must produce different sampled residuals"
    )
    # codes stay in range
    for s in (s1, s2):
        arr = np.asarray(s)
        assert arr.min() >= 0
        assert arr.max() < cfg.codec.residual_codebook_size


def test_greedy_parity_survives_cp_sampling_config():
    """A model whose config enables cp sampling must still be bit-exact
    between serving and single-stream under GREEDY talker sampling (the
    cp_samples gate)."""
    cfg = dataclasses.replace(
        configs.tiny_feedback("custom"),
        code_predictor=dataclasses.replace(
            configs.tiny_feedback().code_predictor, top_k=50, top_p=0.8
        ),
    )
    m = Qwen3TTSModel.synthetic(cfg, seed=0)
    m.generator.sampling = GREEDY
    p = _prompt(7, speaker=0)
    single = m.generator.synthesize(p, max_frames=10, seed=0).wav
    eng = ServingEngine(m, max_streams=2, chunk=5, sampling=GREEDY)
    (wav, st), = eng.run([p], max_frames=10)
    np.testing.assert_array_equal(wav, single)


# -- MTP under the published protocol (frames_per_step > 1) -------------------

def _model_fps2(seed: int = 0) -> Qwen3TTSModel:
    cfg = configs.tiny_feedback("custom", frames_per_step=2)
    m = Qwen3TTSModel.synthetic(cfg, seed=seed)
    m.generator.sampling = GREEDY
    return m


def test_feedback_mtp_decode_end_to_end():
    m = _model_fps2()
    res = m.generator.synthesize(_prompt(), max_frames=12, seed=3)
    assert res.frames > 0
    assert res.wav.dtype == np.int16
    assert len(res.wav) == res.frames * m.cfg.codec.hop


def test_feedback_mtp_serving_matches_single_stream():
    """The CLAUDE.md greedy-parity invariant must hold for the MTP chain
    under the published protocol too (shared chunk builder)."""
    m = _model_fps2()
    prompts = [_prompt(6 + i, speaker=i % 2) for i in range(3)]
    singles = [
        m.generator.synthesize(p, max_frames=12, seed=0).wav for p in prompts
    ]
    eng = ServingEngine(m, max_streams=4, chunk=4, sampling=GREEDY)
    outs = eng.run(prompts, max_frames=12)
    for i, (wav, st) in enumerate(outs):
        np.testing.assert_array_equal(wav, singles[i])


def test_feedback_mtp_join_under_load_matches():
    m = _model_fps2()
    p0, p1 = _prompt(6, 0), _prompt(9, 1)
    s0 = m.generator.synthesize(p0, max_frames=16, seed=0).wav
    s1 = m.generator.synthesize(p1, max_frames=8, seed=0).wav
    eng = ServingEngine(m, max_streams=4, chunk=4, sampling=GREEDY)
    id0 = eng.submit(p0, max_frames=16)
    for _ in range(2):
        eng.step()
    id1 = eng.submit(p1, max_frames=8)
    for _ in range(40):
        eng.step()
        if eng.streams[id0].done and eng.streams[id1].done:
            break
    w0, _ = eng.collect(id0)
    w1, _ = eng.collect(id1)
    np.testing.assert_array_equal(w0, s0)
    np.testing.assert_array_equal(w1, s1)


def test_feedback_mtp_training_layout_matches_decode():
    """fps=2 train/decode parity: teacher-forcing the greedily decoded
    codes through the published MTP training layout must reproduce the
    decoded token stream via argmax (both the main-head frames and the
    MTP-chain frames)."""
    from qwen3_tts_tpu.models.codec import init_codec_stream_state
    from qwen3_tts_tpu.runtime.generate import seed_feedback_frames
    from qwen3_tts_tpu.training.loss import _published_hidden_and_logits

    m = _model_fps2()
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
    )                     # [1, fps], [1, fps, D], [1, fps, Q-1]
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
        [jnp.clip(seed_tok, 0, cb - 1)[:, None, :],       # [1, 1, fps]
         jnp.transpose(seed_res, (0, 2, 1))], axis=1
    )                                                     # [1, Q, fps]
    # keep a whole number of MTP steps of decoded frames
    keep = (valid // fps) * fps
    assert keep >= fps
    full_codes = jnp.concatenate(
        [seed_frames, codes[:, :, :keep]], axis=2
    )                                                     # [1, Q, fps+keep]

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
    pred = np.asarray(jnp.argmax(tf_logits[0], axis=-1))
    got = np.asarray(full_codes[0, 0, :])
    ok = int(np.cumprod(got < cb - 1).sum())   # unambiguous prefix length
    assert ok >= fps + 1, f"too few comparable frames ({ok}); reseed"
    np.testing.assert_array_equal(pred[:ok], got[:ok])


# -- protocol-aware chunk schedule (VERDICT r3 #4) ---------------------------

def test_feedback_fps1_leads_with_4frame_chunk():
    """The raw-import shape (residual_sum, fps=1) runs (4, 32): a 4-frame
    first chunk for TTFA (the cp-in-loop doubles per-frame serial cost,
    and the 8-frame first chunk alone blew the 8-stream cold-start TTFA
    budget), then straight to the steady chunk — the (8, 16) mid-ramp
    measured ~8-11% of single-stream steady state (PERF.md round 5).
    Other shapes keep (8, 32); explicit schedules are never
    overridden."""
    m = _model()
    assert m.generator.chunk_schedule == (4, 32)
    eng = ServingEngine(m, max_streams=2)
    assert eng.chunk_schedule == (4, 32)

    # fps=2 (the recovered shape) keeps the standard ladder
    m2 = Qwen3TTSModel.synthetic(
        configs.tiny_feedback("custom", frames_per_step=2), seed=0
    )
    assert m2.generator.chunk_schedule == (8, 32)

    # cb0 protocol: same standard ladder
    m3 = Qwen3TTSModel.synthetic(configs.tiny("custom"), seed=0)
    assert m3.generator.chunk_schedule == (8, 32)

    # explicit schedule wins
    eng2 = ServingEngine(m, max_streams=2, chunk_schedule=(8,))
    assert eng2.chunk_schedule == (8,)


# -- full-bandwidth clone conditioning (VERDICT r3 #5) -----------------------

def test_acoustic_rows_sum_all_codebooks():
    """Under the residual_sum protocol the clone prompt's acoustic rows
    must carry the FULL feedback sum — pad_e + codec_emb[cb0] +
    Σ_d res_emb[d][code_d] — matching what every decoded frame feeds back
    (the residual books carry most of the speaker timbre; the reference
    conditions on the complete ref audio, reference clone.py:218-224)."""
    from qwen3_tts_tpu.models.talker import text_projection

    m = _model()
    gen = m.generator
    cfg = m.cfg
    t = cfg.talker
    n_res = cfg.codec.num_codebooks - 1
    T_ref = 5
    rng = np.random.default_rng(7)
    codes = np.concatenate(
        [rng.integers(0, cfg.codec.codebook_size, (1, T_ref)),
         rng.integers(0, cfg.codec.residual_codebook_size, (n_res, T_ref))],
        axis=0,
    ).astype(np.int32)

    prompt = PromptSpec(text_tokens=np.arange(6, dtype=np.int32) + 5,
                        acoustic_codes=codes)
    emb, pad, _ = gen.assemble_prompt_full(prompt)
    emb = np.asarray(emb[0], np.float32)

    pad_e = np.asarray(text_projection(
        gen.params,
        jnp.take(gen.params["text_emb"],
                 jnp.asarray([t.tts_pad_id]), axis=0),
    )[0], np.float32)
    codec_emb = np.asarray(gen.params["codec_emb"], np.float32)
    res_emb = np.asarray(gen.cp_params["res_emb"], np.float32)
    want = pad_e[None, :] + codec_emb[codes[0]]
    for d in range(n_res):
        want = want + res_emb[d][codes[1 + d]]

    # acoustic rows sit immediately before the [tts_bos+codec_pad] and
    # [first_txt+codec_bos] tail rows
    got = emb[-2 - T_ref:-2]
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)

    # cb0-only conditioning (a 1-codebook reference) must differ: the
    # residual sum is real signal, not a no-op
    p0 = PromptSpec(text_tokens=np.arange(6, dtype=np.int32) + 5,
                    acoustic_codes=codes[:1])
    emb0, pad0, _ = gen.assemble_prompt_full(p0)
    got0 = np.asarray(emb0[0], np.float32)[-2 - T_ref:-2]
    assert np.abs(got - got0).max() > 1e-3


def test_acoustic_residual_codes_range_checked():
    m = _model()
    n_res = m.cfg.codec.num_codebooks - 1
    codes = np.zeros((1 + n_res, 3), np.int32)
    codes[1] = m.cfg.codec.residual_codebook_size  # out of range
    with pytest.raises(ValueError, match="residual acoustic code"):
        m.generator.assemble_prompt_full(
            PromptSpec(text_tokens=np.arange(6, dtype=np.int32),
                       acoustic_codes=codes)
        )


# -- the three generate_audio call shapes under the protocol ------------------

def test_generate_audio_call_shapes_feedback(tmp_path):
    """All three reference call shapes (custom / design / clone) run
    through the public engine surface on a feedback-protocol model —
    including the extrapolated acoustic-context rows in the published
    dual-stream prompt (cloning)."""
    import os

    from qwen3_tts_tpu.audio import write_wav
    from qwen3_tts_tpu.engine import generate_audio

    m = _model()

    d1 = str(tmp_path / "custom")
    generate_audio(model=m, text="Hello there.", voice="ryan",
                   instruct="Normal tone", output_path=d1, max_frames=8)
    assert os.path.exists(os.path.join(d1, "audio_000.wav"))

    d2 = str(tmp_path / "design")
    generate_audio(model=m, text="Design this.",
                   instruct="A deep warm narrator voice",
                   output_path=d2, max_frames=8)
    assert os.path.exists(os.path.join(d2, "audio_000.wav"))

    base = Qwen3TTSModel.synthetic(configs.tiny_feedback("base"), seed=1)
    base.generator.sampling = GREEDY
    ref = str(tmp_path / "ref.wav")
    t = np.arange(24_000) / 24_000.0
    write_wav(ref, (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32),
              24_000)
    d3 = str(tmp_path / "clone")
    generate_audio(model=base, text="Cloned speech.", ref_audio=ref,
                   ref_text="reference transcript", output_path=d3,
                   max_frames=8)
    assert os.path.exists(os.path.join(d3, "audio_000.wav"))
