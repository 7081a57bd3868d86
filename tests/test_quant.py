"""Quantization correctness: affine grid round-trips, dequant-matmul parity,
MLX uint32 unpacking (SURVEY.md §4 numeric-test requirements)."""

import numpy as np

from qwen3_tts_tpu.ops.quant import (
    dequantize,
    quantize_weights,
    unpack_mlx_uint32,
)


def test_quantize_shapes():
    w = np.random.default_rng(0).normal(size=(32, 64)).astype(np.float32)
    p = quantize_weights(w, group_size=16, bits=8)
    assert p["q"].shape == (32, 64) and p["q"].dtype == np.uint8
    assert p["scale"].shape == (32, 4)
    assert p["bias"].shape == (32, 4)


def test_quantize_dequantize_error_bounded():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(64, 128)).astype(np.float32)
    p = quantize_weights(w, group_size=32, bits=8)
    w_hat = np.asarray(dequantize(p, dtype=np.float32))
    # max error <= half a quantization step per group
    grouped = w.reshape(64, 4, 32)
    steps = (grouped.max(-1) - grouped.min(-1)) / 255.0
    assert np.all(np.abs(w_hat.reshape(64, 4, 32) - grouped) <= steps[..., None] * 0.51 + 1e-6)


def test_requantize_lossless_on_grid():
    """Values already on the affine grid survive a quant round-trip exactly."""
    rng = np.random.default_rng(2)
    w = rng.normal(size=(16, 64)).astype(np.float32)
    p1 = quantize_weights(w, group_size=16, bits=8)
    w1 = np.asarray(dequantize(p1, dtype=np.float32))
    p2 = quantize_weights(w1, group_size=16, bits=8)
    w2 = np.asarray(dequantize(p2, dtype=np.float32))
    np.testing.assert_allclose(w1, w2, atol=1e-5)


def test_quantized_matmul_xla_matches_dense():
    import jax.numpy as jnp

    from qwen3_tts_tpu.ops.linear import quantized_matmul_xla

    rng = np.random.default_rng(3)
    w = rng.normal(size=(48, 64)).astype(np.float32)
    x = rng.normal(size=(4, 64)).astype(np.float32)
    p = quantize_weights(w, group_size=16, bits=8)
    w_hat = np.asarray(dequantize(p, dtype=np.float32))

    got = np.asarray(
        quantized_matmul_xla(
            jnp.asarray(x), jnp.asarray(p["q"]), jnp.asarray(p["scale"]),
            jnp.asarray(p["bias"]),
        )
    )
    np.testing.assert_allclose(got, x @ w_hat.T, rtol=2e-4, atol=2e-4)


def test_unpack_mlx_uint32_8bit():
    codes = np.arange(256, dtype=np.uint8).reshape(8, 32)
    packed = codes.reshape(8, 8, 4).astype(np.uint32)
    words = (
        packed[..., 0]
        | (packed[..., 1] << 8)
        | (packed[..., 2] << 16)
        | (packed[..., 3] << 24)
    )
    out = unpack_mlx_uint32(words, bits=8)
    np.testing.assert_array_equal(out, codes)


def test_unpack_mlx_uint32_4bit():
    rng = np.random.default_rng(4)
    codes = rng.integers(0, 16, size=(4, 64), dtype=np.uint8)
    words = np.zeros((4, 8), dtype=np.uint32)
    for i in range(8):
        words |= codes[:, i::8].astype(np.uint32) << (4 * i)
    # interleaving: element j of word w is codes[:, w*8 + j]
    words = np.zeros((4, 8), dtype=np.uint32)
    for w in range(8):
        for j in range(8):
            words[:, w] |= codes[:, w * 8 + j].astype(np.uint32) << (4 * j)
    out = unpack_mlx_uint32(words, bits=4)
    np.testing.assert_array_equal(out, codes)


def test_pallas_kernel_parity_interpret():
    """Pallas fused dequant matmul == XLA reference (interpret mode on CPU)."""
    import jax.numpy as jnp

    from qwen3_tts_tpu.ops.linear import quantized_matmul_xla
    from qwen3_tts_tpu.ops.pallas_matmul import quantized_matmul_pallas

    rng = np.random.default_rng(5)
    M, K, N, gs = 3, 256, 128, 64
    w = rng.normal(size=(N, K)).astype(np.float32)
    x = rng.normal(size=(M, K)).astype(np.float32)
    p = quantize_weights(w, group_size=gs, bits=8)

    args = (
        jnp.asarray(x), jnp.asarray(p["q"]),
        jnp.asarray(p["scale"]), jnp.asarray(p["bias"]),
    )
    ref = np.asarray(quantized_matmul_xla(*args))
    got = np.asarray(quantized_matmul_pallas(*args, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
