"""Talker numerics: KV-cache incremental decode == full forward, left-pad
invariance, GQA/RoPE shape handling (SURVEY.md §4: "KV-cache equivalence
eager-vs-jit" class of tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.engine import configs
from qwen3_tts_tpu.models.layers import rope_tables
from qwen3_tts_tpu.models.talker import init_talker, talker_forward


@pytest.fixture(scope="module")
def setup():
    import dataclasses

    # f32 so numeric-exactness claims aren't smeared by bf16 reassociation
    cfg = dataclasses.replace(configs.tiny(quant=False), dtype="float32")
    params = jax.device_put(init_talker(cfg, seed=0))
    t = cfg.talker
    S = 32
    cos, sin = rope_tables(S, t.head_dim, t.rope_theta)
    return cfg, params, cos, sin, S


def _cache(cfg, S, B=1):
    t = cfg.talker
    shape = (t.n_layers, B, S, t.n_kv_heads, t.head_dim)
    return jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32)


def _embed(params, tokens):
    return jnp.take(params["codec_emb"], jnp.asarray(tokens), axis=0)[None]


def test_incremental_decode_matches_full(setup):
    cfg, params, cos, sin, S = setup
    t = cfg.talker
    tokens = np.array([3, 1, 4, 1, 5, 9, 2, 6], dtype=np.int32)

    # full pass
    ck, cv = _cache(cfg, S)
    _, full_logits, _, _ = talker_forward(
        params, t, _embed(params, tokens), ck, cv, jnp.int32(0), cos, sin
    )

    # token-by-token with cache
    ck, cv = _cache(cfg, S)
    step_logits = []
    for i, tok in enumerate(tokens):
        _, lg, ck, cv = talker_forward(
            params, t, _embed(params, [tok]), ck, cv, jnp.int32(i), cos, sin
        )
        step_logits.append(np.asarray(lg[0, -1]))

    np.testing.assert_allclose(
        np.asarray(full_logits[0]), np.stack(step_logits), rtol=2e-3, atol=2e-3
    )


def test_left_padding_is_exact(setup):
    cfg, params, cos, sin, S = setup
    t = cfg.talker
    tokens = np.array([7, 8, 9, 10, 11], dtype=np.int32)
    emb = _embed(params, tokens)

    ck, cv = _cache(cfg, S)
    _, logits_plain, _, _ = talker_forward(
        params, t, emb, ck, cv, jnp.int32(0), cos, sin, pad_len=0
    )

    pad = 6
    emb_padded = jnp.concatenate(
        [jnp.zeros((1, pad, emb.shape[-1]), emb.dtype), emb], axis=1
    )
    ck, cv = _cache(cfg, S)
    _, logits_padded, _, _ = talker_forward(
        params, t, emb_padded, ck, cv, jnp.int32(0), cos, sin,
        pad_len=jnp.int32(pad),
    )

    # RoPE is relative and padded keys are masked -> identical logits
    np.testing.assert_allclose(
        np.asarray(logits_plain[0]),
        np.asarray(logits_padded[0, pad:]),
        rtol=2e-3, atol=2e-3,
    )


def test_decode_after_padded_prefill_matches(setup):
    cfg, params, cos, sin, S = setup
    t = cfg.talker
    prompt = np.array([1, 2, 3], dtype=np.int32)
    nxt = np.array([4], dtype=np.int32)

    # unpadded: prefill 3, decode at pos 3
    ck, cv = _cache(cfg, S)
    _, _, ck, cv = talker_forward(
        params, t, _embed(params, prompt), ck, cv, jnp.int32(0), cos, sin
    )
    _, lg_a, _, _ = talker_forward(
        params, t, _embed(params, nxt), ck, cv, jnp.int32(3), cos, sin
    )

    # padded by 5: prefill 8, decode at pos 8 with pad_len=5
    pad = 5
    emb = _embed(params, prompt)
    emb_p = jnp.concatenate(
        [jnp.zeros((1, pad, emb.shape[-1]), emb.dtype), emb], axis=1
    )
    ck, cv = _cache(cfg, S)
    _, _, ck, cv = talker_forward(
        params, t, emb_p, ck, cv, jnp.int32(0), cos, sin, pad_len=jnp.int32(pad)
    )
    _, lg_b, _, _ = talker_forward(
        params, t, _embed(params, nxt), ck, cv, jnp.int32(3 + pad), cos, sin,
        pad_len=jnp.int32(pad),
    )

    np.testing.assert_allclose(
        np.asarray(lg_a[0, -1]), np.asarray(lg_b[0, -1]), rtol=2e-3, atol=2e-3
    )


def test_quantized_talker_close_to_dense():
    """int8 weight-only quantization perturbs logits only mildly."""
    cfg_q = configs.tiny(quant=True)
    cfg_d = configs.tiny(quant=False)
    t = cfg_q.talker
    params_q = jax.device_put(init_talker(cfg_q, seed=0))
    params_d = jax.device_put(init_talker(cfg_d, seed=0))

    S = 16
    cos, sin = rope_tables(S, t.head_dim, t.rope_theta)
    tokens = np.array([1, 2, 3, 4], dtype=np.int32)

    def run(params, cfg):
        shape = (t.n_layers, 1, S, t.n_kv_heads, t.head_dim)
        ck = jnp.zeros(shape, jnp.float32)
        cv = jnp.zeros(shape, jnp.float32)
        emb = jnp.take(params["codec_emb"], jnp.asarray(tokens), axis=0)[None]
        _, lg, _, _ = talker_forward(params, t, emb, ck, cv, jnp.int32(0), cos, sin)
        return np.asarray(lg)

    lg_q = run(params_q, cfg_q)
    lg_d = run(params_d, cfg_d)
    # same seed -> same underlying floats; int8 grid error stays small
    assert np.max(np.abs(lg_q - lg_d)) < 0.15
    assert np.corrcoef(lg_q.ravel(), lg_d.ravel())[0, 1] > 0.999
