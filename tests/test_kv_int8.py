"""int8 KV cache (QWEN3_TTS_KV=int8): quantization math, attention-path
parity vs the dense cache, and end-to-end greedy serving parity.

The int8 cache halves decode attention-read bytes (the window read is ~1/3
of a B=8 serve-step's HBM traffic, PERF.md). It is flag-gated and off by
default; these tests pin down that (a) the quantizer's error is bounded and
representable values round-trip exactly, (b) the dense path is bit-
untouched, and (c) the serving engine and single-stream pipeline remain
token-identical to EACH OTHER when both run int8 (the quantizer is
elementwise per (position, head) row, so batching cannot change it).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from qwen3_tts_tpu.engine import configs  # noqa: E402
from qwen3_tts_tpu.engine.api import Qwen3TTSModel  # noqa: E402
from qwen3_tts_tpu.models.layers import (  # noqa: E402
    KVQuant,
    attention,
    kv_cache_init,
    kv_dequantize,
    kv_env_format,
    kv_quantize,
    rope_tables,
)
from qwen3_tts_tpu.runtime.generate import Generator  # noqa: E402
from qwen3_tts_tpu.runtime.prompts import PromptSpec  # noqa: E402
from qwen3_tts_tpu.runtime.sampling import SamplingConfig  # noqa: E402
from qwen3_tts_tpu.runtime.serving import ServingEngine  # noqa: E402

GREEDY = SamplingConfig(greedy=True)


# ---------------------------------------------------------------- unit ----

def test_kv_env_format_parses_and_rejects(monkeypatch):
    for v, want in [("", "dense"), ("0", "dense"), ("dense", "dense"),
                    ("bf16", "dense"), ("int8", "int8"), ("INT8", "int8")]:
        monkeypatch.setenv("QWEN3_TTS_KV", v)
        assert kv_env_format() == want, v
    monkeypatch.setenv("QWEN3_TTS_KV", "fp8")
    with pytest.raises(ValueError, match="QWEN3_TTS_KV"):
        kv_env_format()


def test_kv_cache_init_formats(monkeypatch):
    shape = (2, 1, 8, 2, 4)
    dense = kv_cache_init(shape, jnp.bfloat16, kv_format="dense")
    assert dense.shape == shape and dense.dtype == jnp.bfloat16

    q = kv_cache_init(shape, jnp.bfloat16, kv_format="int8")
    assert isinstance(q, KVQuant)
    assert q.q.shape == shape and q.q.dtype == jnp.int8
    assert q.s.shape == (*shape[:-1], 1) and q.s.dtype == jnp.float32
    # zero-filled int8 cache dequantizes to exact zeros (matches dense init)
    np.testing.assert_array_equal(
        np.asarray(kv_dequantize(q, jnp.float32)), np.zeros(shape)
    )

    # the env var drives the default
    monkeypatch.setenv("QWEN3_TTS_KV", "int8")
    assert isinstance(kv_cache_init(shape, jnp.bfloat16), KVQuant)
    monkeypatch.delenv("QWEN3_TTS_KV")
    assert not isinstance(kv_cache_init(shape, jnp.bfloat16), KVQuant)


def test_kv_quantize_error_bound_and_exactness():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 7, 2, 16)).astype(np.float32))
    c = kv_quantize(x)
    back = np.asarray(kv_dequantize(c, jnp.float32))
    # symmetric rounding error <= scale/2 per element
    err = np.abs(back - np.asarray(x))
    bound = np.broadcast_to(np.asarray(c.s) / 2, x.shape)
    assert (err <= bound + 1e-7).all()
    # rows on the int8 grid with amax = 127 (scale exactly 1) round-trip
    grid = rng.integers(-127, 128, size=(2, 5, 1, 8)).astype(np.float32)
    grid[..., 0] = 127.0  # pin amax so s = 127/127 = 1
    c2 = kv_quantize(jnp.asarray(grid))
    np.testing.assert_array_equal(
        np.asarray(kv_dequantize(c2, jnp.float32)), grid
    )
    # all-zero rows (unwritten cache slots) stay exactly zero
    z = kv_quantize(jnp.zeros((1, 4, 1, 8)))
    np.testing.assert_array_equal(np.asarray(z.q), 0)


# ----------------------------------------------------- attention parity ----

def _attn_setup(seed=0, B=2, T=4, S=32, D=32, H=4, HKV=2, hd=8):
    rng = np.random.default_rng(seed)

    def lin(o, i):
        return {"w": jnp.asarray(rng.normal(0, 0.05, (o, i)), jnp.float32)}

    p = {
        "q": lin(H * hd, D), "k": lin(HKV * hd, D), "v": lin(HKV * hd, D),
        "o": lin(D, H * hd),
        "q_norm": jnp.ones(hd, jnp.float32),
        "k_norm": jnp.ones(hd, jnp.float32),
    }
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (B, T, D),
                          jnp.float32)
    cos, sin = rope_tables(S, hd, 10000.0)
    kw = dict(cos=cos[:T], sin=sin[:T], pos=jnp.int32(0), n_heads=H,
              n_kv_heads=HKV, head_dim=hd, rms_eps=1e-6)
    return p, x, (B, S, HKV, hd), kw


def test_attention_int8_close_to_dense():
    p, x, cshape, kw = _attn_setup()
    dense = attention(
        p, x,
        cache_k=kv_cache_init(cshape, jnp.float32, kv_format="dense"),
        cache_v=kv_cache_init(cshape, jnp.float32, kv_format="dense"),
        **kw,
    )
    quant = attention(
        p, x,
        cache_k=kv_cache_init(cshape, jnp.float32, kv_format="int8"),
        cache_v=kv_cache_init(cshape, jnp.float32, kv_format="int8"),
        **kw,
    )
    assert isinstance(quant.cache_k, KVQuant)
    # int8 K/V perturbs keys/values by <=1/254 relative -> small output delta
    np.testing.assert_allclose(
        np.asarray(quant.out), np.asarray(dense.out), atol=0.02, rtol=0.02
    )
    # the quantized cache holds the quantization of the dense cache rows
    expect = kv_quantize(dense.cache_k[:, : x.shape[1]])
    np.testing.assert_array_equal(
        np.asarray(quant.cache_k.q[:, : x.shape[1]]), np.asarray(expect.q)
    )


def test_attention_int8_window_split_matches_full_window():
    """Per-group window reads must slice codes AND scales together: a
    window covering all written rows equals the unsplit read exactly."""
    p, x, cshape, kw = _attn_setup(B=2, T=4, S=32)
    ck = kv_cache_init(cshape, jnp.float32, kv_format="int8")
    cv = kv_cache_init(cshape, jnp.float32, kv_format="int8")
    full = attention(p, x, cache_k=ck, cache_v=cv, **kw)
    split = attention(
        p, x, cache_k=ck, cache_v=cv, window_split=((1, 16), (1, 32)), **kw
    )
    np.testing.assert_array_equal(
        np.asarray(full.out), np.asarray(split.out)
    )


# ----------------------------------------------------------- end-to-end ----

@pytest.fixture(scope="module")
def model():
    return Qwen3TTSModel.synthetic(configs.tiny("custom"), seed=5)


def _prompt(seed: int) -> PromptSpec:
    rng = np.random.default_rng(seed)
    return PromptSpec(
        text_tokens=rng.integers(0, 200, size=6).astype(np.int32),
        speaker_id=int(seed % 4),
    )


def _single(model, prompt, max_frames):
    gen = Generator(
        cfg=model.cfg, params=model.params, cp_params=model.cp_params,
        codec_params=model.codec_params, sampling=GREEDY, chunk_schedule=(8,),
    )
    chunks = []
    res = gen.synthesize(
        prompt, max_frames=max_frames, seed=0, on_chunk=chunks.append
    )
    return np.concatenate(chunks) if chunks else np.zeros(0), res


def test_int8_single_stream_runs_and_tracks_dense(model, monkeypatch):
    """Greedy decode with the int8 cache completes and stays close to the
    dense decode. Token streams may diverge after many frames (~0.4% KV
    noise accumulating through the AR loop), but the FIRST frame's greedy
    argmax margins dominate the noise, and the causal streaming codec maps
    frame 0's codes to the first hop of audio exactly — so the first hop
    must be bit-identical."""
    wav_dense, res_dense = _single(model, _prompt(1), max_frames=8)
    monkeypatch.setenv("QWEN3_TTS_KV", "int8")
    wav_q, res_q = _single(model, _prompt(1), max_frames=8)
    assert res_q.frames > 0
    hop = model.cfg.codec.hop
    np.testing.assert_array_equal(wav_q[:hop], wav_dense[:hop])


def test_int8_serving_matches_int8_single_stream(model, monkeypatch):
    """The serving engine must stay token-identical to the single-stream
    pipeline when BOTH run int8 KV (same quantizer, elementwise per row —
    batching cannot change the math). This is the serving-parity invariant
    (CLAUDE.md) carried over to the quantized cache."""
    monkeypatch.setenv("QWEN3_TTS_KV", "int8")
    prompts = [_prompt(1), _prompt(2)]
    max_frames = 10
    singles = [_single(model, p, max_frames) for p in prompts]

    engine = ServingEngine(model, max_streams=2, chunk=8, sampling=GREEDY)
    assert isinstance(engine.cache_k, KVQuant)
    served = engine.run(prompts, max_frames=max_frames)
    for (wav_single, res), (wav_served, stream) in zip(singles, served):
        assert stream.done
        assert stream.frames == res.frames
        np.testing.assert_allclose(wav_served, wav_single, atol=1)  # 1 LSB


def test_int8_with_mtp2_serving_matches_single_stream(monkeypatch):
    """frames_per_step=2 (the bench/flagship decode config) composed with
    the int8 cache: the MTP seed/merge path shares the same attention
    cache plumbing, and serving must stay token-identical to the
    single-stream pipeline."""
    monkeypatch.setenv("QWEN3_TTS_KV", "int8")
    cfg = configs.with_frames_per_step(configs.tiny("custom"), 2)
    m = Qwen3TTSModel.synthetic(cfg, seed=9)
    prompts = [_prompt(1), _prompt(2)]
    singles = [_single(m, p, max_frames=10) for p in prompts]
    engine = ServingEngine(m, max_streams=2, chunk=8, sampling=GREEDY)
    served = engine.run(prompts, max_frames=10)
    for (wav_single, res), (wav_served, stream) in zip(singles, served):
        assert stream.done and res.frames > 0
        assert stream.frames == res.frames
        np.testing.assert_allclose(wav_served, wav_single, atol=1)  # 1 LSB


def test_int8_serving_under_tp_sharding(monkeypatch):
    """tp=2-sharded weights + int8 KV caches: the engine-allocated KVQuant
    caches are replicated (like the dense ones) and GSPMD propagates the
    weight shardings through the serve step; greedy codes must equal the
    unsharded int8 engine's."""
    from qwen3_tts_tpu.parallel import MeshPlan, build_mesh, shard_model

    monkeypatch.setenv("QWEN3_TTS_KV", "int8")
    cfg = configs.tiny("custom", quant=False)  # tp=2-divisible dims
    prompts = [_prompt(1), _prompt(2)]

    m1 = Qwen3TTSModel.synthetic(cfg, seed=7)
    e1 = ServingEngine(m1, max_streams=2, chunk=8, sampling=GREEDY)
    r1 = e1.run(prompts, max_frames=10)

    m2 = Qwen3TTSModel.synthetic(cfg, seed=7)
    mesh = build_mesh(MeshPlan(dp=1, tp=2), jax.devices()[:2])
    shard_model(m2, mesh)
    e2 = ServingEngine(m2, max_streams=2, chunk=8, sampling=GREEDY)
    assert isinstance(e2.cache_k, KVQuant)
    r2 = e2.run(prompts, max_frames=10)

    for (w1, s1), (w2, s2) in zip(r1, r2):
        assert s1.frames == s2.frames
        np.testing.assert_array_equal(
            np.concatenate(s1.codes, axis=1), np.concatenate(s2.codes, axis=1)
        )


def test_kv_quality_gate_harness(model, monkeypatch):
    """tools/kv_quality_check.py mechanics offline: WER math, the gate loop
    over both formats with a fake ASR provider, and the divergence metric.
    (Real-weight runs use a real transcription provider.)"""
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "kv_quality_check",
        _os.path.join(_os.path.dirname(__file__), "..", "tools",
                      "kv_quality_check.py"),
    )
    kq = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(kq)

    assert kq.wer("a b c", "a b c") == 0.0
    assert kq.wer("a b c", "a x c") == pytest.approx(1 / 3)
    assert kq.wer("a b", "a b c") == pytest.approx(1 / 2)
    assert kq.wer("", "") == 0.0
    a = np.array([1, 2, 3, 4], np.int16)
    assert kq.divergence_frac(a, a.copy()) == 1.0
    assert kq.divergence_frac(a, np.array([1, 2, 9, 4], np.int16)) == 0.5

    calls = []

    def fake_asr(path):
        calls.append(path)
        return "hello tpu"  # constant hyp: deltas cancel to 0

    report = kq.run_gate(
        model, ["hello tpu", "another line"], fake_asr, max_frames=6
    )
    assert len(report["rows"]) == 2 and len(calls) == 4  # 2 texts x 2 formats
    assert report["median_wer_delta"] == 0.0
    for r in report["rows"]:
        assert 0.0 <= r["identical_frac"] <= 1.0
    assert "QWEN3_TTS_KV" not in _os.environ


def test_int8_serving_midflight_join_stays_exact(model, monkeypatch):
    """Chunked-prefill interleaving (scratch caches, slot scatter, prefix
    write-back) must plumb KVQuant leaves identically: a mid-flight join
    leaves the other stream token-identical to its solo int8 run."""
    monkeypatch.setenv("QWEN3_TTS_KV", "int8")
    solo = ServingEngine(model, max_streams=2, chunk=4, sampling=GREEDY)
    (wav_a_solo, sa), = solo.run([_prompt(1)], max_frames=12)

    eng = ServingEngine(
        model, max_streams=2, chunk=4, prefill_chunk=16, sampling=GREEDY
    )
    a = eng.submit(_prompt(1), max_frames=12)
    for _ in range(2):
        eng.step()
    b = eng.submit(_prompt(2), max_frames=6)
    guard = 0
    while not (eng.streams[a].done and eng.streams[b].done):
        eng.step()
        guard += 1
        assert guard < 100
    wav_a, stream_a = eng.collect(a)
    assert stream_a.frames == sa.frames
    np.testing.assert_allclose(wav_a, wav_a_solo, atol=1)  # +-1 PCM LSB
