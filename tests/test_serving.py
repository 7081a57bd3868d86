"""Continuous batched serving: multi-stream decode must match the
single-stream pipeline token-for-token under greedy sampling, and slots must
recycle (continuous batching)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from qwen3_tts_tpu.engine import configs  # noqa: E402
from qwen3_tts_tpu.engine.api import Qwen3TTSModel  # noqa: E402
from qwen3_tts_tpu.runtime.generate import Generator  # noqa: E402
from qwen3_tts_tpu.runtime.prompts import PromptSpec  # noqa: E402
from qwen3_tts_tpu.runtime.sampling import SamplingConfig  # noqa: E402
from qwen3_tts_tpu.runtime.serving import ServingEngine  # noqa: E402

GREEDY = SamplingConfig(greedy=True)


@pytest.fixture(scope="module")
def model():
    return Qwen3TTSModel.synthetic(configs.tiny("custom"), seed=5)


def _prompt(seed: int) -> PromptSpec:
    rng = np.random.default_rng(seed)
    return PromptSpec(
        text_tokens=rng.integers(0, 200, size=6).astype(np.int32),
        speaker_id=int(seed % 4),
    )


def _single_stream_chunks(model, prompt, max_frames):
    gen = Generator(
        cfg=model.cfg,
        params=model.params,
        cp_params=model.cp_params,
        codec_params=model.codec_params,
        sampling=GREEDY,
        chunk_schedule=(8,),   # fixed chunk: match the serving engine's
    )
    chunks = []
    result = gen.synthesize(
        prompt, max_frames=max_frames, seed=0, on_chunk=chunks.append
    )
    return np.concatenate(chunks) if chunks else np.zeros(0), result


def test_serving_matches_single_stream_greedy(model):
    prompts = [_prompt(1), _prompt(2)]
    max_frames = 10

    singles = [
        _single_stream_chunks(model, p, max_frames) for p in prompts
    ]

    engine = ServingEngine(model, max_streams=2, chunk=8, sampling=GREEDY)
    served = engine.run(prompts, max_frames=max_frames)

    for (wav_single, res), (wav_served, stream) in zip(singles, served):
        assert stream.done
        assert stream.frames == res.frames
        assert wav_served.shape == wav_single.shape
        np.testing.assert_allclose(wav_served, wav_single, atol=0.02 * 32767)  # PCM units


def test_serving_continuous_batching_recycles_slots(model):
    # 5 streams through 2 slots: slots must recycle, all must finish
    prompts = [_prompt(i) for i in range(5)]
    engine = ServingEngine(model, max_streams=2, chunk=4, sampling=GREEDY)
    results = engine.run(prompts, max_frames=6)
    assert len(results) == 5
    for wav, stream in results:
        assert stream.done
        assert stream.frames > 0
        assert len(wav) == stream.frames * model.cfg.codec.hop
    # all five went through only 2 slots
    assert all(s.slot in (0, 1) for _, s in results)


def test_serving_ttfa_recorded(model):
    engine = ServingEngine(model, max_streams=1, chunk=4, sampling=GREEDY)
    (wav, stream), = engine.run([_prompt(3)], max_frames=5)
    assert stream.ttfa_s is not None and stream.ttfa_s > 0


def test_submit_overflow_raises(model):
    engine = ServingEngine(model, max_streams=1, chunk=4, sampling=GREEDY)
    engine.submit(_prompt(1), max_frames=4)
    with pytest.raises(RuntimeError):
        engine.submit(_prompt(2), max_frames=4)


def test_budget_of_one_frame(model):
    engine = ServingEngine(model, max_streams=2, chunk=4, sampling=GREEDY)
    results = engine.run([_prompt(1), _prompt(2)], max_frames=1)
    for wav, stream in results:
        assert stream.done
        assert stream.frames == 1
        assert len(wav) == model.cfg.codec.hop


def test_per_prompt_budgets(model):
    engine = ServingEngine(model, max_streams=2, chunk=4, sampling=GREEDY)
    results = engine.run([_prompt(1), _prompt(2)], max_frames=[2, 6])
    assert results[0][1].frames == 2
    assert results[1][1].frames == 6


def test_engine_reuse_across_runs(model):
    engine = ServingEngine(model, max_streams=2, chunk=4, sampling=GREEDY)
    r1 = engine.run([_prompt(1)], max_frames=4)
    r2 = engine.run([_prompt(1)], max_frames=4)
    # same prompt, fresh slot state: identical output both runs (greedy)
    np.testing.assert_allclose(r1[0][0], r2[0][0], atol=1e-6)
    # finished-stream bookkeeping does not grow unboundedly
    assert len(engine.streams) <= 2


def _all_codes(stream):
    return (
        np.concatenate(stream.codes, axis=1)
        if stream.codes else np.zeros((0, 0), np.int32)
    )


def test_midflight_join_leaves_other_streams_token_identical(model):
    """A stream joining mid-flight (chunked prefill interleaved with decode)
    must not change any other stream's output (VERDICT.md next #6)."""
    # solo references (greedy => deterministic)
    solo = ServingEngine(model, max_streams=2, chunk=4, sampling=GREEDY)
    (wav_a_solo, sa), (wav_b_solo, sb) = (
        solo.run([_prompt(1)], max_frames=12)[0],
        solo.run([_prompt(2)], max_frames=6)[0],
    )

    eng = ServingEngine(
        model, max_streams=2, chunk=4, prefill_chunk=16, sampling=GREEDY
    )
    a = eng.submit(_prompt(1), max_frames=12)
    for _ in range(2):
        eng.step()
    assert not eng.streams[a].done
    b = eng.submit(_prompt(2), max_frames=6)  # joins mid-flight
    # the join is chunked: the prompt bucket (64) needs several slices
    assert eng._pending and eng._pending[0].Lb > 16
    guard = 0
    while not (eng.streams[a].done and eng.streams[b].done):
        eng.step()
        guard += 1
        assert guard < 100
    wav_a, stream_a = eng.collect(a)
    wav_b, stream_b = eng.collect(b)
    np.testing.assert_array_equal(_all_codes(stream_a), _all_codes(sa))
    np.testing.assert_array_equal(_all_codes(stream_b), _all_codes(sb))
    np.testing.assert_allclose(wav_a, wav_a_solo, atol=1)  # +-1 PCM LSB
    np.testing.assert_allclose(wav_b, wav_b_solo, atol=1)  # +-1 PCM LSB


def test_prefill_is_chunked_under_load(model):
    """While another stream is live, at most one prefill slice runs per
    decode step (the join never stalls live streams for a full prefill)."""
    eng = ServingEngine(
        model, max_streams=2, chunk=4, prefill_chunk=16, sampling=GREEDY
    )
    eng.submit(_prompt(1), max_frames=20)
    eng.step()  # activates A (drained: nobody live yet)
    eng.submit(_prompt(2), max_frames=4)
    slices = []
    while eng._pending:
        pp = eng._pending[0]
        before = pp.pos
        eng.step()
        slices.append(pp.pos - before)
    assert slices and all(s <= 16 for s in slices)


def test_slot_groups_separate_long_and_short_streams(model, monkeypatch):
    """Per-slot-group attention windows (VERDICT.md weak #5): streams with
    different expected lengths land in different slot groups, the decode
    compiles per-group windows, and outputs stay token-identical to solo
    greedy runs."""
    import qwen3_tts_tpu.runtime.generate as gen_mod

    # tiny model (max_seq_len 256): give it sub-256 window buckets so the
    # two groups genuinely read different cache prefixes
    monkeypatch.setattr(gen_mod, "ATTN_BUCKETS", (96, 160, 256))

    long_p, short_p = _prompt(1), _prompt(2)
    solo = ServingEngine(model, max_streams=2, chunk=4, sampling=GREEDY)
    (wav_long_solo, sl) = solo.run([long_p], max_frames=60)[0]
    (wav_short_solo, ss) = solo.run([short_p], max_frames=8)[0]

    eng = ServingEngine(model, max_streams=4, chunk=4, sampling=GREEDY)
    assert eng.n_groups == 2
    a = eng.submit(long_p, max_frames=60)    # expected_end ~ 64+30
    b = eng.submit(short_p, max_frames=8)    # expected_end ~ 64+4
    # the streams must land in different slot groups
    ga = eng.streams[a].slot // (eng.B // eng.n_groups)
    gb = eng.streams[b].slot // (eng.B // eng.n_groups)
    assert ga != gb
    guard = 0
    while not (eng.streams[a].done and eng.streams[b].done):
        eng.step()
        guard += 1
        assert guard < 200
    # distinct per-group windows were actually compiled at some point
    # (keys are (chunk, wins) tuples)
    assert any(
        len(set(wins)) > 1 for _, wins in eng._decode_fns
    ), list(eng._decode_fns)
    wav_a, stream_a = eng.collect(a)
    wav_b, stream_b = eng.collect(b)
    np.testing.assert_array_equal(_all_codes(stream_a), _all_codes(sl))
    np.testing.assert_array_equal(_all_codes(stream_b), _all_codes(ss))
    np.testing.assert_allclose(wav_a, wav_long_solo, atol=1)  # +-1 PCM LSB
    np.testing.assert_allclose(wav_b, wav_short_solo, atol=1)  # +-1 PCM LSB


def test_cold_start_prefill_is_batched(model):
    """N simultaneous cold submissions must prefill in ONE batched dispatch
    (per bucket length), with an odd count padded to the power-of-two batch,
    and stay token-identical to the single-stream pipeline."""
    prompts = [_prompt(11), _prompt(12), _prompt(13)]  # 3 -> nb=4 (padded)
    max_frames = 10
    singles = [_single_stream_chunks(model, p, max_frames) for p in prompts]

    engine = ServingEngine(model, max_streams=4, chunk=8, sampling=GREEDY)
    calls = []
    orig = engine._prefill_batch_fn

    def spy(Lb, nb):
        calls.append((Lb, nb))
        return orig(Lb, nb)

    engine._prefill_batch_fn = spy
    served = engine.run(prompts, max_frames=max_frames)

    assert calls == [(calls[0][0], 4)], calls  # one batched dispatch, padded
    assert not engine._prefill_fns  # the sequential path never compiled
    for (wav_single, res), (wav_served, stream) in zip(singles, served):
        assert stream.done
        assert stream.frames == res.frames
        np.testing.assert_allclose(wav_served, wav_single, atol=1)  # 1 LSB


def test_cold_start_assembly_is_deferred_and_batched(model):
    """Fast-path prompts must submit WITHOUT a device assembly dispatch
    (AssemblyPlan deferral) and materialise in ONE batched assembly call
    at the cold-start batch (VERDICT r4 #7), token-identical to the
    single-stream pipeline."""
    prompts = [_prompt(31), _prompt(32), _prompt(33), _prompt(34)]
    max_frames = 10
    singles = [_single_stream_chunks(model, p, max_frames) for p in prompts]

    engine = ServingEngine(model, max_streams=4, chunk=8, sampling=GREEDY)
    gen = engine.model.generator
    batched, per_stream = [], []
    orig_b, orig_s = gen.assemble_plans_batched, gen.assemble_from_plan

    def spy_b(plans):
        batched.append(len(plans))
        return orig_b(plans)

    def spy_s(plan):
        per_stream.append(1)
        return orig_s(plan)

    gen.assemble_plans_batched, gen.assemble_from_plan = spy_b, spy_s
    try:
        served = engine.run(prompts, max_frames=max_frames)
    finally:
        gen.assemble_plans_batched, gen.assemble_from_plan = orig_b, orig_s
    assert batched == [4], batched  # ONE batched assembly dispatch
    assert not per_stream           # and zero per-stream assembly calls
    for (wav_single, res), (wav_served, stream) in zip(singles, served):
        assert stream.done and stream.frames == res.frames
        np.testing.assert_allclose(wav_served, wav_single, atol=1)

    # deferral is visible at submit time: no emb until a step runs
    sid = engine.submit(_prompt(35), max_frames=4)
    assert engine._pending[0].emb is None
    assert engine._pending[0].plan is not None
    while not engine.streams[sid].done:
        engine.step()


def test_cold_start_mixed_eager_and_deferred_assembly(model):
    """A clone-conditioned prompt (eager assembly — no fast plan) sharing
    a cold start with fast-path prompts rides the same batched prefill,
    all streams token-identical to single-stream."""
    D = model.cfg.talker.hidden
    clone = PromptSpec(
        text_tokens=np.arange(6, dtype=np.int32),
        speaker_vector=np.random.default_rng(0)
        .normal(0, 0.02, D).astype(np.float32),
    )
    prompts = [clone, _prompt(41), _prompt(42)]
    max_frames = 10
    singles = [_single_stream_chunks(model, p, max_frames) for p in prompts]

    engine = ServingEngine(model, max_streams=4, chunk=8, sampling=GREEDY)
    served = engine.run(prompts, max_frames=max_frames)
    for (wav_single, res), (wav_served, stream) in zip(singles, served):
        assert stream.done and stream.frames == res.frames
        np.testing.assert_allclose(wav_served, wav_single, atol=1)


def test_join_under_load_still_uses_sliced_prefill(model):
    """With live streams decoding, a joining prompt must NOT take the
    batched cold-start path (it would stall the live streams)."""
    engine = ServingEngine(model, max_streams=4, chunk=8, sampling=GREEDY)
    a = engine.submit(_prompt(21), max_frames=24)
    for _ in range(2):
        engine.step()
    engine._prefill_batch_fns.clear()
    b = engine.submit(_prompt(22), max_frames=8)
    guard = 0
    while not (engine.streams[a].done and engine.streams[b].done):
        engine.step()
        guard += 1
        assert guard < 200
    assert not engine._prefill_batch_fns  # join used the sliced path


def test_chunk_switch_between_runs_matches_fresh_engine(model):
    """self.chunk may change between runs; outputs must match an engine
    built with that chunk from the start (greedy)."""
    prompts = [_prompt(31), _prompt(32)]
    eng = ServingEngine(model, max_streams=2, chunk=8, sampling=GREEDY)
    eng.run(prompts, max_frames=8)          # run + finish at chunk 8
    eng.chunk = 4
    served = eng.run(prompts, max_frames=10)

    fresh = ServingEngine(model, max_streams=2, chunk=4, sampling=GREEDY)
    expected = fresh.run(prompts, max_frames=10)
    for (wav_a, sa), (wav_b, sb) in zip(served, expected):
        assert sa.frames == sb.frames
        np.testing.assert_array_equal(wav_a, wav_b)


def test_deferred_wav_fetch_matches_eager(model, monkeypatch):
    """QWEN3_TTS_DEFER_WAV leaves steady-state wav rows on device until
    collect(); output must be byte-identical to eager fetching, the first
    chunk must still arrive eagerly (TTFA honesty), and later chunks must
    actually be deferred."""
    from qwen3_tts_tpu.runtime.serving import _DeferredCodes, _DeferredWav

    p = _prompt(41)
    eager = ServingEngine(model, max_streams=2, chunk=4, sampling=GREEDY)
    (wav_eager, se), = eager.run([p], max_frames=12)

    monkeypatch.setenv("QWEN3_TTS_DEFER_WAV", "1")
    eng = ServingEngine(model, max_streams=2, chunk=4, sampling=GREEDY)
    sid = eng.submit(p, max_frames=12)
    stream = eng.streams[sid]
    guard = 0
    while not stream.done:
        eng.step()
        guard += 1
        assert guard < 50
    assert not isinstance(stream.wav_chunks[0], _DeferredWav)  # ttfa chunk
    assert any(isinstance(c, _DeferredWav) for c in stream.wav_chunks[1:])
    # code slabs defer too: steady-state chunks fetch only n_valid
    assert all(isinstance(c, _DeferredCodes) for c in stream.codes)
    wav, stream = eng.collect(sid)
    assert stream.frames == se.frames
    np.testing.assert_array_equal(wav, wav_eager)
    np.testing.assert_array_equal(_all_codes(stream), _all_codes(se))
    # collect is idempotent after resolution
    wav2, _ = eng.collect(sid)
    np.testing.assert_array_equal(wav2, wav_eager)


def test_deferred_wav_keeps_on_chunk_streaming(model, monkeypatch):
    """Streams with an on_chunk callback keep per-chunk host audio even in
    deferred mode."""
    monkeypatch.setenv("QWEN3_TTS_DEFER_WAV", "1")
    eng = ServingEngine(model, max_streams=2, chunk=4, sampling=GREEDY)
    chunks = []
    sid = eng.submit(_prompt(42), max_frames=8, on_chunk=chunks.append)
    guard = 0
    while not eng.streams[sid].done:
        eng.step()
        guard += 1
        assert guard < 50
    wav, stream = eng.collect(sid)
    assert chunks and all(c is not None and c.dtype == np.int16 for c in chunks)
    np.testing.assert_array_equal(np.concatenate(chunks), wav)


def test_non_divisor_prefill_chunk_is_exact(model):
    """prefill_chunk that does not divide the prompt bucket must still
    prefill exactly (the final slice clamps to the remaining tokens)."""
    p = _prompt(51)
    solo = ServingEngine(model, max_streams=2, chunk=4, sampling=GREEDY)
    (wav_solo, ss), = solo.run([p], max_frames=10)

    eng = ServingEngine(
        model, max_streams=2, chunk=4, prefill_chunk=24, sampling=GREEDY
    )  # bucket 64 = 24 + 24 + 16: the last slice is short
    a = eng.submit(_prompt(52), max_frames=24)   # keep one stream live
    eng.step()
    b = eng.submit(p, max_frames=10)             # sliced join path
    guard = 0
    while not (eng.streams[a].done and eng.streams[b].done):
        eng.step()
        guard += 1
        assert guard < 200
    wav_b, stream_b = eng.collect(b)
    assert stream_b.frames == ss.frames
    np.testing.assert_array_equal(_all_codes(stream_b), _all_codes(ss))
    np.testing.assert_allclose(wav_b, wav_solo, atol=1)  # +-1 PCM LSB


def test_frame_budget_caps_at_codec_capacity(model, monkeypatch):
    """max_frames must clamp to the codec latent-transformer capacity, not
    just the talker's position budget (silent cache-clamp corruption past
    _MAX_FRAMES otherwise)."""
    import qwen3_tts_tpu.models.codec as codec_mod

    monkeypatch.setattr(codec_mod, "_MAX_FRAMES", 32)
    eng = ServingEngine(model, max_streams=2, chunk=4, sampling=GREEDY)
    sid = eng.submit(_prompt(53), max_frames=10_000)
    assert eng.streams[sid].max_frames <= 32 - 2 * eng.chunk


def test_adaptive_chunk_schedule_grows_and_stays_exact(model):
    """The default engine ramps chunk sizes as active streams age; greedy
    output must equal a fixed-chunk engine's (chunk size never changes
    tokens: decode is stepwise and the streaming codec is chunk-invariant)."""
    prompts = [_prompt(61), _prompt(62)]
    fixed = ServingEngine(model, max_streams=2, chunk=4, sampling=GREEDY)
    expected = fixed.run(prompts, max_frames=20)

    eng = ServingEngine(
        model, max_streams=2, chunk_schedule=(4, 8, 12), sampling=GREEDY
    )
    chunks_used = []
    orig = eng._decode_fn

    def spy(chunk, wins):
        chunks_used.append(chunk)
        return orig(chunk, wins)

    eng._decode_fn = spy
    served = eng.run(prompts, max_frames=20)

    assert chunks_used[0] == 4 and max(chunks_used) == 12, chunks_used
    assert chunks_used == sorted(chunks_used)  # monotone ramp, no joins here
    for (wav_a, sa), (wav_b, sb) in zip(served, expected):
        assert sa.frames == sb.frames
        np.testing.assert_array_equal(_all_codes(sa), _all_codes(sb))
        np.testing.assert_array_equal(wav_a, wav_b)


def test_adaptive_schedule_drops_back_for_joining_stream(model):
    """A stream joining mid-flight pulls the next dispatches back to the
    first-chunk size (its TTFA is one small chunk away), then the ramp
    resumes."""
    eng = ServingEngine(
        model, max_streams=2, chunk_schedule=(4, 8, 12), sampling=GREEDY
    )
    chunks_used = []
    orig = eng._decode_fn

    def spy(chunk, wins):
        chunks_used.append(chunk)
        return orig(chunk, wins)

    eng._decode_fn = spy
    a = eng.submit(_prompt(63), max_frames=40)
    for _ in range(4):
        eng.step()
    assert chunks_used[-1] > 4          # ramped up
    b = eng.submit(_prompt(64), max_frames=8)
    eng.step()
    eng.step()
    joined = chunks_used[-2:]
    assert 4 in joined, chunks_used      # dropped back for the join
    guard = 0
    while not (eng.streams[a].done and eng.streams[b].done):
        eng.step()
        guard += 1
        assert guard < 100


def test_cold_start_pipeline_ramps_after_first_audio(model):
    """run()'s dispatch pipeline stays ONE deep until some stream has
    first audio (device executions are serialized, so a speculative second
    chunk would queue ahead of the first chunk's eager wav fetch and land
    in every stream's TTFA), then ramps to pipeline_depth — and outputs
    stay token-identical to a fresh engine's."""
    prompts = [_prompt(81), _prompt(82)]
    base = ServingEngine(model, max_streams=2, chunk=4, sampling=GREEDY)
    expected = base.run(prompts, max_frames=12)

    eng = ServingEngine(model, max_streams=2, chunk=4, sampling=GREEDY)
    events = []
    real_dispatch, real_collect = eng.dispatch_step, eng.collect_step

    def spy_dispatch():
        events.append(("d", all(
            st.ttfa_s is None for st in eng.streams.values() if not st.done
        )))
        return real_dispatch()

    def spy_collect(payload):
        events.append(("c", None))
        return real_collect(payload)

    eng.dispatch_step = spy_dispatch
    eng.collect_step = spy_collect
    served = eng.run(prompts, max_frames=12, pipeline_depth=2)

    # every dispatch issued while ALL live streams were cold must be
    # followed by a collect before the next dispatch (depth 1)...
    for i, (kind, cold) in enumerate(events):
        if kind == "d" and cold and i + 1 < len(events):
            assert events[i + 1][0] == "c", (i, events)
    # ...and after first audio the pipeline actually went 2 deep
    warm_pairs = [
        1 for i in range(len(events) - 1)
        if events[i] == ("d", False) and events[i + 1][0] == "d"
    ]
    assert warm_pairs, f"pipeline never ramped past depth 1: {events}"

    for (wav_a, sa), (wav_b, sb) in zip(served, expected):
        assert sa.frames == sb.frames
        np.testing.assert_array_equal(wav_a, wav_b)


@pytest.mark.slow
def test_four_slot_groups(model):
    """n_groups is configurable (16-slot experiments use 4); outputs stay
    exact. Slow tier: the default tier exercises slot groups at n_groups=2
    (test_slot_groups_separate_long_and_short_streams); this adds only the
    4-group config variant."""
    prompts = [_prompt(i + 70) for i in range(4)]
    base = ServingEngine(model, max_streams=4, chunk=4, sampling=GREEDY)
    expected = base.run(prompts, max_frames=8)
    eng = ServingEngine(
        model, max_streams=4, chunk=4, sampling=GREEDY, n_groups=4
    )
    assert eng.n_groups == 4
    served = eng.run(prompts, max_frames=8)
    for (wav_a, sa), (wav_b, sb) in zip(served, expected):
        assert sa.frames == sb.frames
        np.testing.assert_array_equal(wav_a, wav_b)


def test_deferred_wav_survives_slot_recycling(model, monkeypatch):
    """Deferred device views reference their own step buffers, so streams
    that finished earlier in a run resolve correctly even after their slot
    was recycled by later streams."""
    monkeypatch.setenv("QWEN3_TTS_DEFER_WAV", "1")
    prompts = [_prompt(i + 80) for i in range(3)]
    eager = ServingEngine(model, max_streams=1, chunk=4, sampling=GREEDY)
    monkeypatch.setenv("QWEN3_TTS_DEFER_WAV", "0")
    expected = eager.run(prompts, max_frames=10)
    monkeypatch.setenv("QWEN3_TTS_DEFER_WAV", "1")
    eng = ServingEngine(model, max_streams=1, chunk=4, sampling=GREEDY)
    served = eng.run(prompts, max_frames=10)  # 3 streams recycle 1 slot
    for (wav_a, sa), (wav_b, sb) in zip(served, expected):
        assert sa.frames == sb.frames
        np.testing.assert_array_equal(wav_a, wav_b)


# -- wav accumulation (batch / non-streaming jobs) ----------------------------

def test_accum_wav_matches_streaming_engine(model):
    """accumulate_wav keeps audio on device until a stream finishes; the
    collected waveform must be byte-identical to the default per-chunk
    streaming engine's under greedy sampling."""
    prompts = [_prompt(11), _prompt(12), _prompt(13)]
    ref_engine = ServingEngine(model, max_streams=4, chunk=8, sampling=GREEDY)
    ref = ref_engine.run(prompts, max_frames=20)

    engine = ServingEngine(
        model, max_streams=4, chunk=8, sampling=GREEDY,
        accumulate_wav=True, accum_cap_frames=80,
    )
    out = engine.run(prompts, max_frames=20)
    for i, ((wav, st), (rwav, rst)) in enumerate(zip(out, ref)):
        assert st.frames == rst.frames
        np.testing.assert_array_equal(wav, rwav)
        assert st.codes == []  # codes are not collected in accum mode
        assert st.ttfa_s is not None


def test_accum_wav_slot_reuse_is_clean(model):
    """A slot reused by a later stream must not leak the previous
    occupant's buffered audio (continuous batching over the same rows)."""
    prompts = [_prompt(21), _prompt(22), _prompt(23), _prompt(24),
               _prompt(25)]
    ref_engine = ServingEngine(model, max_streams=2, chunk=8,
                               sampling=GREEDY)
    ref = ref_engine.run(prompts, max_frames=16)
    engine = ServingEngine(
        model, max_streams=2, chunk=8, sampling=GREEDY,
        accumulate_wav=True, accum_cap_frames=80,
    )
    out = engine.run(prompts, max_frames=16)
    for (wav, st), (rwav, _) in zip(out, ref):
        np.testing.assert_array_equal(wav, rwav)


def test_accum_wav_rejects_streaming_consumers(model):
    engine = ServingEngine(
        model, max_streams=2, chunk=8, sampling=GREEDY,
        accumulate_wav=True, accum_cap_frames=80,
    )
    with pytest.raises(ValueError, match="on_chunk"):
        engine.submit(_prompt(1), max_frames=8, on_chunk=lambda w: None)


def test_accum_wav_capacity_guard(model):
    engine = ServingEngine(
        model, max_streams=2, chunk=8, sampling=GREEDY,
        accumulate_wav=True, accum_cap_frames=40,
    )
    with pytest.raises(ValueError, match="accum_cap_frames"):
        engine.submit(_prompt(1), max_frames=39)


def test_accum_wav_matches_streaming_feedback_protocol():
    """accumulate_wav under the published residual_sum feedback protocol —
    the configuration batch jobs hit on REAL checkpoints (VERDICT r2 #5).
    The device-side scatter is protocol-agnostic (the fb decode fn returns
    per-chunk PCM like the cb0 one); collected audio must stay
    byte-identical to the streaming engine's under greedy sampling."""
    fb_model = Qwen3TTSModel.synthetic(configs.tiny_feedback("custom"),
                                       seed=5)
    prompts = [_prompt(41), _prompt(42), _prompt(43)]
    ref_engine = ServingEngine(fb_model, max_streams=2, chunk=8,
                               sampling=GREEDY)
    ref = ref_engine.run(prompts, max_frames=16)  # 3 streams recycle slots

    engine = ServingEngine(
        fb_model, max_streams=2, chunk=8, sampling=GREEDY,
        accumulate_wav=True, accum_cap_frames=80,
    )
    out = engine.run(prompts, max_frames=16, pipeline_depth=3)
    for (wav, st), (rwav, rst) in zip(out, ref):
        assert st.frames == rst.frames
        np.testing.assert_array_equal(wav, rwav)
        assert st.codes == []  # codes are not collected in accum mode


def test_accum_wav_deep_pipeline_keeps_tail_intact(model):
    """Speculative steps dispatched past EOS/budget advance the device
    frame counter; their buffer writes must be DROPPED when they would
    overflow (a clamped scatter would overwrite the stream's tail audio).
    Any pipeline depth must stay byte-identical to the streaming engine."""
    prompts = [_prompt(31), _prompt(32)]
    ref_engine = ServingEngine(model, max_streams=2, chunk=8,
                               sampling=GREEDY)
    ref = ref_engine.run(prompts, max_frames=24)
    engine = ServingEngine(
        model, max_streams=2, chunk=8, sampling=GREEDY,
        accumulate_wav=True, accum_cap_frames=64,
    )
    out = engine.run(prompts, max_frames=24, pipeline_depth=8)
    for (wav, st), (rwav, _) in zip(out, ref):
        np.testing.assert_array_equal(wav, rwav)


def test_cold_start_batches_multislice_prompts(model):
    """Long prompts (bucket > prefill_chunk) must ALSO take the batched
    cold-start prefill — with no live streams there is nothing to stall,
    and the slice-per-step trickle serialized long-prompt groups (round 5:
    longform segments ran at ~2-stream effective concurrency). Token
    identity vs single-stream is preserved."""

    def long_prompt(seed):
        rng = np.random.default_rng(seed)
        return PromptSpec(
            text_tokens=rng.integers(0, 200, size=100).astype(np.int32),
            speaker_id=int(seed % 4),
        )

    prompts = [long_prompt(61), long_prompt(62)]
    max_frames = 10
    singles = [_single_stream_chunks(model, p, max_frames) for p in prompts]

    engine = ServingEngine(model, max_streams=2, chunk=8,
                           prefill_chunk=64, sampling=GREEDY)
    calls = []
    orig = engine._prefill_batch_fn

    def spy(Lb, nb):
        calls.append((Lb, nb))
        return orig(Lb, nb)

    engine._prefill_batch_fn = spy
    served = engine.run(prompts, max_frames=max_frames)
    assert calls and all(Lb > 64 for Lb, _ in calls), calls
    assert not engine._prefill_fns  # the sequential path never compiled
    for (wav_single, res), (wav_served, stream) in zip(singles, served):
        assert stream.done and stream.frames == res.frames
        np.testing.assert_allclose(wav_served, wav_single, atol=1)


def test_cold_start_batches_multislice_feedback_prompts():
    """The whole-prompt cold batch must hold token identity on the
    FEEDBACK protocol too (trailing-buffer concat, trail/res_sum slot
    state at large Lb) — the longform fast path serves real imported
    checkpoints through exactly this code."""
    fb_model = Qwen3TTSModel.synthetic(configs.tiny_feedback("custom"),
                                       seed=5)

    def long_prompt(seed):
        rng = np.random.default_rng(seed)
        return PromptSpec(
            text_tokens=rng.integers(0, 200, size=40).astype(np.int32),
            speaker_id=int(seed % 4),
        )

    prompts = [long_prompt(71), long_prompt(72)]
    max_frames = 8
    fb_model.sampling = GREEDY
    singles = [
        fb_model.generator.synthesize(p, max_frames=max_frames, seed=0,
                                      collect_codes=True)
        for p in prompts
    ]

    engine = ServingEngine(fb_model, max_streams=2, chunk=4,
                           prefill_chunk=32, sampling=GREEDY)
    calls = []
    orig = engine._prefill_batch_fn_fb

    def spy(Lb, nb):
        calls.append((Lb, nb))
        return orig(Lb, nb)

    engine._prefill_batch_fn_fb = spy
    served = engine.run(prompts, max_frames=max_frames)
    assert calls and all(Lb > 32 for Lb, _ in calls), calls
    for r, (_, stream) in zip(singles, served):
        assert stream.done and stream.frames == r.frames
        np.testing.assert_array_equal(
            np.concatenate(stream.codes, axis=1)[:, : r.frames], r.codes
        )


def test_cold_batch_row_cap_falls_back_to_slice_path(model, monkeypatch):
    """Groups whose scratch would exceed the cold-batch row cap must keep
    the slice-per-step path (HBM bound — the remote service hangs on
    over-subscription) and still finish correctly."""
    monkeypatch.setenv("QWEN3_TTS_COLD_BATCH_ROWS", "64")  # 2 x 64 > 64

    prompts = [_prompt(81), _prompt(82)]
    engine = ServingEngine(model, max_streams=2, chunk=8, sampling=GREEDY)
    calls = []
    orig = engine._prefill_batch_fn

    def spy(Lb, nb):
        calls.append((Lb, nb))
        return orig(Lb, nb)

    engine._prefill_batch_fn = spy
    served = engine.run(prompts, max_frames=6)
    assert not calls  # capped: batched path skipped
    for wav, stream in served:
        assert stream.done and stream.frames == 6
