"""Shared transformer building blocks (Qwen3-style).

Architecture choices follow the Qwen3 backbone that the Qwen3-TTS talker is
built on: RMSNorm (pre-norm), grouped-query attention with per-head QK
RMSNorm, rotate-half RoPE, and SwiGLU MLPs. Everything is a pure function of
(params pytree, inputs); the quantized/dense distinction is hidden behind
``ops.linear``.

Shape conventions:
  x          [B, T, D]
  q/k/v      [B, T, H, hd]
  KV cache   [B, S_max, H_kv, hd] per layer
  cos/sin    [T, hd/2] (already sliced to the query positions)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.linear import linear


def rmsnorm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(dtype)


def rope_tables(
    max_len: int, head_dim: int, theta: float, dtype=jnp.float32
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute rotate-half RoPE tables: cos/sin [max_len, head_dim/2]."""
    half = head_dim // 2
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, half, dtype=jnp.float32) / float(half))
    )
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # [max_len, half]
    return jnp.cos(freqs).astype(dtype), jnp.sin(freqs).astype(dtype)


def rope_slice(
    cos_table: jnp.ndarray,       # [S, hd/2]
    sin_table: jnp.ndarray,
    pos: jnp.ndarray,             # scalar, or [B] per-stream positions
    T: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Slice RoPE tables for T query positions starting at ``pos``.

    Scalar pos -> [T, hd/2] via dynamic_slice; vector pos -> per-stream
    [B, T, hd/2] via clipped gather (positions past the table budget clamp
    to the last row — callers bound positions, see runtime budget caps)."""
    pos = jnp.asarray(pos)
    if pos.ndim == 1:
        idx = pos[:, None] + jnp.arange(T)[None, :]          # [B, T]
        return (
            jnp.take(cos_table, idx, axis=0, mode="clip"),
            jnp.take(sin_table, idx, axis=0, mode="clip"),
        )
    half = cos_table.shape[-1]
    return (
        jax.lax.dynamic_slice(cos_table, (pos, 0), (T, half)),
        jax.lax.dynamic_slice(sin_table, (pos, 0), (T, half)),
    )


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Rotate-half RoPE on x [B, T, H, hd].

    cos/sin are [T, hd/2] (positions shared across the batch) or
    [B, T, hd/2] (per-stream positions — continuous batched serving)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    if cos.ndim == 2:
        c = cos[None, :, None, :].astype(x.dtype)
        s = sin[None, :, None, :].astype(x.dtype)
    else:
        c = cos[:, :, None, :].astype(x.dtype)
        s = sin[:, :, None, :].astype(x.dtype)
    return jnp.concatenate((x1 * c - x2 * s, x2 * c + x1 * s), axis=-1)


class KVQuant(NamedTuple):
    """int8 KV-cache leaf pair: codes + per-(position, kv-head) scale.

    Decode attention on a batched server is cache-bandwidth heavy (the
    window read is ~⅓ of a B=8 serve step's HBM bytes, PERF.md); storing
    K/V as int8 with a symmetric per-row scale halves those bytes. The
    scale keeps the SAME rank as the codes (trailing axis of size 1), so
    every cache plumbing expression — slot scatter, window slice, prefix
    write-back — applies identically to both leaves via ``jax.tree.map``.
    Scales are f32: a bf16 scale would add ~0.4% multiplicative noise on
    top of the ~0.4% int8 rounding for no bandwidth win (1/128 of bytes).

    Enabled per-process with ``QWEN3_TTS_KV=int8`` (see
    ``kv_cache_init``); default remains the dense bf16 cache.
    """

    q: jnp.ndarray  # int8 [..., S, H_kv, hd]
    s: jnp.ndarray  # f32  [..., S, H_kv, 1]


def kv_env_format(default: str = "dense") -> str:
    """Process-wide KV cache format knob: QWEN3_TTS_KV in {dense, int8}."""
    import os

    v = os.environ.get("QWEN3_TTS_KV", "").strip().lower()
    if v in ("", "0", "dense", "bf16"):
        return default
    if v == "int8":
        return "int8"
    raise ValueError(f"QWEN3_TTS_KV={v!r}: expected 'int8' or 'dense'")


def kv_cache_init(shape: tuple, dtype, kv_format: str | None = None):
    """Allocate one KV cache buffer: dense [..., S, H_kv, hd] zeros, or a
    ``KVQuant`` pair when ``kv_format`` (default: the QWEN3_TTS_KV env) is
    'int8'. Zero scales dequantize unwritten slots to exact zeros, matching
    the dense init (those slots are position-masked anyway)."""
    fmt = kv_env_format() if kv_format is None else kv_format
    if fmt == "int8":
        return KVQuant(
            q=jnp.zeros(shape, jnp.int8),
            s=jnp.zeros((*shape[:-1], 1), jnp.float32),
        )
    return jnp.zeros(shape, dtype)


def kv_quantize(x: jnp.ndarray) -> KVQuant:
    """Symmetric per-(position, head) int8 quantization over head_dim."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return KVQuant(q=q, s=s)


def kv_dequantize(c: KVQuant, dtype) -> jnp.ndarray:
    # int8 values are exact in f32; one rounding on the downcast
    return (c.q.astype(jnp.float32) * c.s).astype(dtype)


class AttnOut(NamedTuple):
    out: jnp.ndarray          # [B, T, D]
    cache_k: jnp.ndarray      # updated [B, S_max, H_kv, hd] (or KVQuant)
    cache_v: jnp.ndarray


def _row_scale(c: KVQuant) -> jnp.ndarray:
    """[B, S, H_kv, 1] per-row scales → [B, H_kv, 1, 1, S] for broadcasting
    over scores/probs [B, H_kv, g, T, S]."""
    return jnp.transpose(c.s, (0, 2, 3, 1))[:, :, :, None, :]


def _scores_ctx(
    qg: jnp.ndarray,        # [B', T, H_kv, g, hd]
    keys,                   # [B', S', H_kv, hd] — dense, or a KVQuant pair
    values,
    qry_idx: jnp.ndarray,   # [B'|1, T, 1]
    pad_b: jnp.ndarray,
    head_dim: int,
    out_dtype,
) -> jnp.ndarray:
    """Masked GQA attention read over a cache slice: returns ctx
    [B', T, H_kv, g, hd].

    int8 (KVQuant) slices are consumed WITHOUT materializing a dequantized
    cache buffer: the per-row scale is constant over the head_dim
    reduction, so it factors out of both dots exactly —
    ``q·(k_q*s) = (q·k_q)*s`` on the scores and
    ``Σ_s p[s]*(v_q[s]*s[s]) = Σ_s (p[s]*s[s])*v_q[s]`` on the context.
    The dots read int8 codes directly (int8 ≤ 127 is exact in bf16), which
    guarantees the halved HBM traffic independent of XLA's fusion
    heuristics, and skips the bf16 rounding a dequantize step would add.
    """
    B, T = qg.shape[0], qg.shape[1]
    k_quant = isinstance(keys, KVQuant)
    k_mat = keys.q.astype(qg.dtype) if k_quant else keys
    S = k_mat.shape[1]
    scores = jnp.einsum(
        "bthgd,bshd->bhgts", qg, k_mat, preferred_element_type=jnp.float32
    )
    if k_quant:
        scores = scores * _row_scale(keys)
    scores = scores * (head_dim ** -0.5)

    key_idx = jnp.arange(S)[None, None, :]              # [1, 1, S]
    causal = key_idx <= qry_idx                         # [B|1, T, S]
    valid = key_idx >= pad_b                            # mask left-padding
    allowed = (causal & valid) | (key_idx == qry_idx)
    allowed = jnp.broadcast_to(allowed, (B, T, S))
    scores = jnp.where(allowed[:, None, None, :, :], scores, -jnp.inf)

    probs = jax.nn.softmax(scores, axis=-1)
    if isinstance(values, KVQuant):
        probs = (probs * _row_scale(values)).astype(qg.dtype)
        v_mat = values.q.astype(qg.dtype)
    else:
        probs = probs.astype(values.dtype)
        v_mat = values
    return jnp.einsum(
        "bhgts,bshd->bthgd", probs, v_mat, preferred_element_type=jnp.float32
    ).astype(out_dtype)


def attention(
    p: dict,
    x: jnp.ndarray,
    *,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    pos: jnp.ndarray,
    n_heads: int,
    n_kv_heads: int,
    head_dim: int,
    rms_eps: float,
    qk_norm: bool = True,
    pad_len: jnp.ndarray | int = 0,
    window_split: tuple | None = None,
) -> AttnOut:
    """GQA attention with KV-cache write at offset ``pos``.

    Works for both prefill (T > 1) and single-token decode (T == 1): queries
    attend over the whole cache buffer with a position mask
    ``pad_len <= key_index <= pos + query_index``, so unwritten (future)
    slots and left-padding slots are masked out regardless of their
    contents. Left-padding is exact under RoPE (relative positions); padded
    *queries* are allowed self-attention only, to keep softmax finite.

    ``pos`` and ``pad_len`` may be scalars (all streams aligned — the
    single-utterance path) or [B] vectors (each stream at its own offset —
    continuous batched serving). With vector ``pos``, cos/sin must be
    per-stream [B, T, hd/2].

    ``window_split`` (serving, per-slot-group attention windows): a static
    tuple of (batch_size, window_len) pairs covering contiguous batch
    groups; group g's queries read only the first window_len cache rows, so
    short streams don't pay a long-running neighbour's KV bandwidth. The
    q/k/v/o projections stay full-batch (one weight read); only the
    scores/context einsums split.
    """
    B, T, _ = x.shape
    groups = n_heads // n_kv_heads
    pos = jnp.asarray(pos)
    vector_pos = pos.ndim == 1

    if "qkv" in p:
        # Fused projection (see fuse_block_projections): one weight read and
        # one matmul instead of three — the small-batch decode paths (the
        # code predictor's depth loop especially) are launch/latency bound,
        # so fewer, larger ops win even though the bytes moved are the same.
        q_dim = n_heads * head_dim
        kv_dim = n_kv_heads * head_dim
        qkv = linear(x, p["qkv"])
        q = qkv[..., :q_dim].reshape(B, T, n_heads, head_dim)
        k = qkv[..., q_dim : q_dim + kv_dim].reshape(B, T, n_kv_heads, head_dim)
        v = qkv[..., q_dim + kv_dim :].reshape(B, T, n_kv_heads, head_dim)
    else:
        q = linear(x, p["q"]).reshape(B, T, n_heads, head_dim)
        k = linear(x, p["k"]).reshape(B, T, n_kv_heads, head_dim)
        v = linear(x, p["v"]).reshape(B, T, n_kv_heads, head_dim)

    if qk_norm:  # per-head RMSNorm over head_dim (Qwen3)
        q = rmsnorm(q, p["q_norm"], rms_eps)
        k = rmsnorm(k, p["k_norm"], rms_eps)

    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    # cache dtype is authoritative (callers may keep f32 caches for tests);
    # KVQuant caches quantize at write and are read scale-factored inside
    # _scores_ctx (no dequantized buffer is ever materialized); all index
    # plumbing below applies to both layouts via jax.tree.map (the scale
    # leaf shares the codes' rank — see KVQuant)
    if isinstance(cache_k, KVQuant):
        k_upd, v_upd = kv_quantize(k), kv_quantize(v)
    else:
        k_upd, v_upd = k.astype(cache_k.dtype), v.astype(cache_v.dtype)
    if vector_pos:  # per-stream write offsets -> batched scatter
        def scatter(c, u):
            return jax.vmap(
                lambda cc, uu, p_: jax.lax.dynamic_update_slice(
                    cc, uu, (p_, 0, 0)
                )
            )(c, u, pos)

        cache_k = jax.tree.map(scatter, cache_k, k_upd)
        cache_v = jax.tree.map(scatter, cache_v, v_upd)
    else:
        cache_k = jax.tree.map(
            lambda c, u: jax.lax.dynamic_update_slice(c, u, (0, pos, 0, 0)),
            cache_k, k_upd,
        )
        cache_v = jax.tree.map(
            lambda c, u: jax.lax.dynamic_update_slice(c, u, (0, pos, 0, 0)),
            cache_v, v_upd,
        )

    # q: [B, T, H_kv, g, hd]; keys: [B, S, H_kv, hd]
    qg = q.reshape(B, T, n_kv_heads, groups, head_dim)
    if vector_pos:
        qry_idx = pos[:, None, None] + jnp.arange(T)[None, :, None]  # [B,T,1]
    else:
        qry_idx = (pos + jnp.arange(T))[None, :, None]               # [1,T,1]
    pad_arr = jnp.asarray(pad_len)
    pad_b = pad_arr[:, None, None] if pad_arr.ndim == 1 else pad_arr

    if window_split is None:
        ctx = _scores_ctx(
            qg, cache_k, cache_v, qry_idx, pad_b, head_dim, x.dtype
        )
    else:
        parts = []
        lo = 0
        for size, win in window_split:
            hi = lo + size
            qi = qry_idx[lo:hi] if qry_idx.shape[0] == B else qry_idx
            pb = pad_b[lo:hi] if pad_b.ndim == 3 and pad_b.shape[0] == B else pad_b
            # slice the window first: only window bytes are touched
            parts.append(_scores_ctx(
                qg[lo:hi],
                jax.tree.map(lambda c: c[lo:hi, :win], cache_k),
                jax.tree.map(lambda c: c[lo:hi, :win], cache_v),
                qi, pb, head_dim, x.dtype,
            ))
            lo = hi
        assert lo == B, (window_split, B)
        ctx = jnp.concatenate(parts, axis=0)
    ctx = ctx.reshape(B, T, n_heads * head_dim)
    return AttnOut(linear(ctx, p["o"]), cache_k, cache_v)


def swiglu_mlp(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    if "gate_up" in p:  # fused [gate; up] projection (fuse_block_projections)
        gate_up = linear(x, p["gate_up"])
        gate, up = jnp.split(gate_up, 2, axis=-1)
    else:
        gate = linear(x, p["gate"])
        up = linear(x, p["up"])
    return linear(jax.nn.silu(gate) * up, p["down"])


def _concat_linears(parts: list[dict]) -> dict:
    """Concatenate linear param dicts along the output dimension.

    Works for dense ({"w": [..., out, in]}) and quantized
    ({"q": [..., out, in], "scale"/"bias": [..., out, n_groups]}) layouts —
    both concatenate along axis -2 — including stacked-layer leading axes.
    Row r of a dot product is a function of row r of the weight alone, so
    the fused matmul is numerically identical to the separate ones.
    """
    keys = set(parts[0])
    for p in parts[1:]:
        if set(p) != keys:
            raise ValueError(
                f"cannot fuse linears with differing layouts: {sorted(keys)} "
                f"vs {sorted(set(p))}"
            )
    if {"lora_a", "lora_b"} & keys:
        raise ValueError(
            "cannot fuse linears carrying unmerged LoRA adapters; call "
            "training.lora.merge_lora first"
        )
    return {k: jnp.concatenate([p[k] for p in parts], axis=-2) for k in keys}


def fuse_block_projections(blocks: dict) -> dict:
    """Return a copy of stacked transformer-block params with q/k/v fused
    into one ``qkv`` linear and gate/up into one ``gate_up`` linear.

    Decode-path-only transform: ``attention``/``swiglu_mlp`` dispatch on the
    fused keys, so the fused tree drops in anywhere the unfused one is used.
    Checkpoints, training, and import keep the canonical split layout; the
    runtimes fuse once per process when building their compiled step
    (QWEN3_TTS_FUSE=0 disables). Fusing is a pure relayout — greedy decode
    parity vs the split layout is tested exactly
    (tests/test_talker.py, tests/test_serving.py).
    """
    attn = dict(blocks["attn"])
    mlp = dict(blocks["mlp"])
    attn["qkv"] = _concat_linears([attn.pop("q"), attn.pop("k"), attn.pop("v")])
    mlp["gate_up"] = _concat_linears([mlp.pop("gate"), mlp.pop("up")])
    out = dict(blocks)
    out["attn"] = attn
    out["mlp"] = mlp
    return out


class BlockOut(NamedTuple):
    x: jnp.ndarray
    cache_k: jnp.ndarray
    cache_v: jnp.ndarray


def transformer_block(
    p: dict,
    x: jnp.ndarray,
    *,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    pos: jnp.ndarray,
    n_heads: int,
    n_kv_heads: int,
    head_dim: int,
    rms_eps: float,
    qk_norm: bool = True,
    pad_len: jnp.ndarray | int = 0,
    window_split: tuple | None = None,
) -> BlockOut:
    """Pre-norm residual block: x + Attn(LN(x)); x + MLP(LN(x))."""
    attn_out = attention(
        p["attn"],
        rmsnorm(x, p["ln1"], rms_eps),
        cos=cos,
        sin=sin,
        cache_k=cache_k,
        cache_v=cache_v,
        pos=pos,
        n_heads=n_heads,
        n_kv_heads=n_kv_heads,
        head_dim=head_dim,
        rms_eps=rms_eps,
        qk_norm=qk_norm,
        pad_len=pad_len,
        window_split=window_split,
    )
    x = x + attn_out.out
    x = x + swiglu_mlp(p["mlp"], rmsnorm(x, p["ln2"], rms_eps))
    return BlockOut(x, attn_out.cache_k, attn_out.cache_v)
