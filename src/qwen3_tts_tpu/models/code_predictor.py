"""Residual-codebook predictor: a small depth transformer that, given the
talker's hidden state for a frame and its sampled codebook-0 token, predicts
the remaining RVQ codebooks 1..Q-1 for that frame (MTP-style).

TPU-first design decision (SURVEY.md §7): the talker autoregresses only on
codebook-0 embeddings, so residual prediction for a whole chunk of frames is
*batched over frames* — the depth loop runs Q-1 steps once per chunk instead
of once per frame, turning many tiny matvecs into chunk-sized matmuls and
cutting its HBM weight traffic by the chunk length.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.configs import ModelConfig
from .layers import rmsnorm, rope_tables, transformer_block
from .talker import _init_linear, _stack

Params = dict[str, Any]


def init_code_predictor(cfg: ModelConfig, seed: int = 1, fast: bool = False) -> Params:
    cp = cfg.code_predictor
    t = cfg.talker
    cc = cfg.codec
    rng = np.random.default_rng(seed)
    dtype = np.dtype(jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32)
    qz = dict(
        quantize=cfg.quant.enabled,
        group_size=min(cfg.quant.group_size, cp.hidden),
        bits=cfg.quant.bits,
        dtype=dtype,
        fast=fast,
    )
    n_res = cc.num_codebooks - 1
    q_dim = cp.n_heads * cp.head_dim

    def block() -> Params:
        return {
            "attn": {
                "q": _init_linear(rng, q_dim, cp.hidden, **qz),
                "k": _init_linear(rng, q_dim, cp.hidden, **qz),
                "v": _init_linear(rng, q_dim, cp.hidden, **qz),
                "o": _init_linear(rng, cp.hidden, q_dim, **qz),
                "q_norm": np.ones(cp.head_dim, dtype=dtype),
                "k_norm": np.ones(cp.head_dim, dtype=dtype),
            },
            "mlp": {
                "gate": _init_linear(rng, cp.ffn, cp.hidden, **qz),
                "up": _init_linear(rng, cp.ffn, cp.hidden, **qz),
                "down": _init_linear(rng, cp.hidden, cp.ffn, **qz),
            },
            "ln1": np.ones(cp.hidden, dtype=dtype),
            "ln2": np.ones(cp.hidden, dtype=dtype),
        }

    return {
        # talker hidden -> depth-transformer width
        "in_proj": _init_linear(rng, cp.hidden, t.hidden, **qz),
        # codebook-0 token embedding in depth-transformer width
        "cb0_emb": rng.normal(0, 0.02, (cc.codebook_size, cp.hidden)).astype(dtype),
        # input embeddings for residual codes fed back at depth d
        "res_emb": rng.normal(
            0, 0.02, (n_res, cc.residual_codebook_size, cp.hidden)
        ).astype(dtype),
        # output heads: one per residual codebook
        "heads": rng.normal(
            0, 0.02, (n_res, cc.residual_codebook_size, cp.hidden)
        ).astype(dtype),
        "blocks": _stack([block() for _ in range(cp.n_layers)]),
        "ln_f": np.ones(cp.hidden, dtype=dtype),
    }


def predict_residuals(
    params: Params,
    cfg: ModelConfig,
    talker_hidden: jnp.ndarray,   # [B, D_talker] — B is (batch*frames_in_chunk)
    cb0_tokens: jnp.ndarray,      # [B] sampled codebook-0 ids
    return_feedback: bool = False,
    key: "jax.Array | None" = None,
    row_keys: "jax.Array | None" = None,
    _as_draft: bool = False,
    _return_probs: bool = False,
) -> jnp.ndarray:
    """Depth-autoregressive prediction of residual codebooks.

    Returns codes [B, Q-1] (int32). The whole depth loop is one lax.scan,
    jit-friendly and batched over frames.

    ``key``: when given AND the config asks for it (cp.top_k > 0,
    cp.top_p < 1.0, or cp.temperature != 1.0), depths are SAMPLED per the
    published cp.generate arguments (do_sample, top_k=50, top_p=0.8 —
    transformers Qwen3OmniMoeTalker prepare_inputs_for_generation) with
    one fold of the key per depth; otherwise greedy argmax (bit-stable,
    the serving parity mode). ``row_keys`` ([B] batch of keys) replaces
    ``key`` when rows must sample deterministically PER IDENTITY — the
    batched cold-start prefill folds by slot so its padding rows (slot
    replicas) draw identical codes and the duplicate-index scatter stays
    order-independent.

    ``return_feedback``: also return the summed input embeddings of the
    predicted codes, Σ_d res_emb[d][code_d] — the residual half of the
    published talker feedback (TalkerConfig.feedback="residual_sum": the
    next talker input sums ALL codebook embeddings; transformers
    Qwen3OmniMoeTalker prepare_inputs_for_generation builds exactly this
    from the predictor's per-step input embeddings). Shape [B, H_cp].
    """
    cp = cfg.code_predictor
    cc = cfg.codec
    n_res = cc.num_codebooks - 1
    B = talker_hidden.shape[0]
    hidden_token = cp.input_layout == "hidden_token"
    # Grouped depth prediction (CodePredictorConfig.depth_group): each
    # sequence position scores ``k`` consecutive residual heads and the
    # next position's input is the SUM of the group's code embeddings —
    # k == 1 is exactly the published one-code-per-pass layout.
    k = cp.depth_group
    n_groups = n_res // k
    # "sum": position 0 = (in_proj(hidden) + cb0 emb), positions 1.. =
    # residual-group embedding sums. "hidden_token" (the published layout,
    # PARITY.md): positions 0-1 = [hidden, cb0 emb], positions 2.. =
    # residual groups; position p+1's heads score group p.
    depth_len = n_groups + (2 if hidden_token else 1)

    from ..ops.linear import linear

    # Draft-adapter indirection (freeze-base recovery, finetune.py
    # --freeze-base): when a grafted ``params["draft"]`` subtree (a full
    # copy of the cp module) is present, the GROUPED computation reads the
    # draft copy — the primary tree stays exactly the raw import's, so
    # sequential (k=1) decode and the spec verifier below remain
    # bit-identical to the untuned model while the draft trains freely.
    # The talker's residual-sum feedback still embeds through the PRIMARY
    # tables (mirrors teacher-forced training — training/loss.py).
    dp = params["draft"] if (k > 1 and "draft" in params) else params

    cos_t, sin_t = rope_tables(depth_len, cp.head_dim, cp.rope_theta)

    hid = talker_hidden[:, None, :]
    if cp.input_proj:
        hid = linear(hid, dp["in_proj"])                           # [B,1,H]
    cb0 = jnp.take(dp["cb0_emb"], cb0_tokens, axis=0)[:, None, :]
    if hidden_token:
        x0 = jnp.concatenate([hid, cb0.astype(hid.dtype)], axis=1)  # [B,2,H]
    else:
        x0 = hid + cb0

    q_dim_kv = cp.n_heads  # depth transformer uses MHA (n_kv == n_heads)
    cache_shape = (cp.n_layers, B, depth_len, q_dim_kv, cp.head_dim)
    cache_k = jnp.zeros(cache_shape, dtype=x0.dtype)
    cache_v = jnp.zeros(cache_shape, dtype=x0.dtype)

    def run_blocks(x, ck, cv, pos):
        T = x.shape[1]
        cos, sin = (
            jax.lax.dynamic_slice(cos_t, (pos, 0), (T, cp.head_dim // 2)),
            jax.lax.dynamic_slice(sin_t, (pos, 0), (T, cp.head_dim // 2)),
        )

        def body(xc, layer):
            bp, k_l, v_l = layer
            out = transformer_block(
                bp, xc,
                cos=cos, sin=sin,
                cache_k=k_l, cache_v=v_l, pos=pos,
                n_heads=cp.n_heads, n_kv_heads=cp.n_heads,
                head_dim=cp.head_dim, rms_eps=cp.rms_eps, qk_norm=cp.qk_norm,
            )
            return out.x, (out.cache_k, out.cache_v)

        x, (nk, nv) = jax.lax.scan(body, x, (dp["blocks"], ck, cv))
        return rmsnorm(x, dp["ln_f"], cp.rms_eps), nk, nv

    stochastic = (key is not None or row_keys is not None) and (
        cp.top_k > 0 or cp.top_p < 1.0 or cp.temperature != 1.0
    )
    # Speculative depth decode: grouped pass = draft, teacher-forced
    # verify loop = exact depth_group=1 output. Greedy verification
    # compares argmax (bit-exact); stochastic residuals go through exact
    # speculative SAMPLING (accept/residual-resample — identical in
    # distribution to the sequential dg=1 sampled stream for any draft).
    # ``_as_draft`` breaks the recursion when either spec path calls back
    # in for its draft.
    if (cp.spec_decode and k > 1 and not _as_draft):
        # temperature <= 0 is argmax in sample_token regardless of the
        # other knobs, so the bit-exact greedy verifier is the right
        # (and cheaper) route — and the sampled path's filtered_logits
        # can't divide by a zero temperature.
        if stochastic and cp.temperature > 0.0:
            return predict_residuals_spec_sampled(
                params, cfg, talker_hidden, cb0_tokens,
                key=key, row_keys=row_keys,
                return_feedback=return_feedback,
            )
        return predict_residuals_spec(
            params, cfg, talker_hidden, cb0_tokens,
            return_feedback=return_feedback,
        )
    if stochastic:
        from ..runtime.sampling import (
            SamplingConfig, filtered_logits, sample_token,
        )

        cp_sampling = SamplingConfig(
            temperature=cp.temperature, top_k=cp.top_k, top_p=cp.top_p
        )
    assert not _return_probs or stochastic, (
        "_return_probs captures the draft's proposal distribution — "
        "stochastic configs only"
    )

    def score_group(h_last, g):
        """Sample/argmax group ``g``'s ``k`` residual codes from one
        hidden ([B, H], traced group index -> [B, k] int32). RNG folds by
        ABSOLUTE depth index, so k == 1 reproduces the ungrouped stream
        bit-for-bit. With ``_return_probs`` also returns the filtered
        categorical distribution each code was drawn from ([B, k, V]
        float32) — the proposal q of the speculative sampled decode."""
        heads = jax.lax.dynamic_slice(
            dp["heads"], (g * k, 0, 0),
            (k, cc.residual_codebook_size, dp["heads"].shape[2]),
        )
        logits = jnp.einsum(
            "bd,kvd->bkv", h_last, heads, preferred_element_type=jnp.float32
        )
        cols, probs = [], []
        for j in range(k):
            lg = logits[:, j, :]
            d = g * k + j
            if stochastic and row_keys is not None:
                kd = jax.vmap(lambda kk: jax.random.fold_in(kk, d))(row_keys)
                cols.append(jax.vmap(
                    lambda l, kk: sample_token(l[None, :], kk, cp_sampling)[0]
                )(lg, kd))
            elif stochastic:  # one fold per depth (rows independent)
                cols.append(sample_token(lg, jax.random.fold_in(key, d),
                                         cp_sampling))
            else:
                cols.append(jnp.argmax(lg, axis=-1).astype(jnp.int32))
            if _return_probs:
                probs.append(jax.nn.softmax(
                    filtered_logits(lg, cp_sampling), axis=-1))
        codes_g = jnp.stack(cols, axis=1)                       # [B, k]
        if _return_probs:
            return codes_g, jnp.stack(probs, axis=1)            # [B, k, V]
        return codes_g

    def next_input(codes_g, g):
        """Summed embedding of group ``g``'s codes ([B, k] -> [B, 1, H])."""
        tabs = jax.lax.dynamic_slice(
            dp["res_emb"], (g * k, 0, 0),
            (k,) + dp["res_emb"].shape[1:],
        )
        embs = jax.vmap(
            lambda tab, c: jnp.take(tab, c, axis=0), in_axes=(0, 1)
        )(tabs, codes_g)                                        # [k, B, H]
        return jnp.sum(embs, axis=0)[:, None, :].astype(x0.dtype)

    def finish(stacked):
        # codes [n_groups, B, k] (+ probs [n_groups, B, k, V]) -> [B, Q-1]
        if _return_probs:
            codes_gf, probs_gf = stacked
        else:
            codes_gf = stacked
        codes = jnp.transpose(codes_gf, (1, 0, 2)).reshape(B, n_res)
        outs = (codes,)
        if return_feedback:
            outs = outs + (residual_feedback_sum(params, codes),)
        if _return_probs:
            outs = outs + (jnp.transpose(probs_gf, (1, 0, 2, 3)).reshape(
                B, n_res, cc.residual_codebook_size),)
        return outs[0] if len(outs) == 1 else outs

    def codes_of(out):
        return out[0] if _return_probs else out

    if hidden_token:
        # two-position prefill scores group 0; the scan continues with
        # single-token steps at positions 2.. (scan carries need one
        # static shape, so the T=2 seed runs outside it)
        h, ck, cv = run_blocks(x0, cache_k, cache_v, jnp.int32(0))
        grp0 = score_group(h[:, -1, :], jnp.int32(0))

        if n_groups == 1:
            return finish(jax.tree.map(lambda a: a[None], grp0))

        def depth_step(carry, g):
            x_in, ck, cv = carry
            h, ck, cv = run_blocks(x_in, ck, cv, g + 1)
            out = score_group(h[:, -1, :], g)
            return (next_input(codes_of(out), g), ck, cv), out

        (_, _, _), rest = jax.lax.scan(
            depth_step, (next_input(codes_of(grp0), 0), ck, cv),
            jnp.arange(1, n_groups),
        )
        return finish(jax.tree.map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), grp0, rest))

    def depth_step(carry, g):
        x_in, ck, cv = carry
        h, ck, cv = run_blocks(x_in, ck, cv, g)
        out = score_group(h[:, -1, :], g)
        return (next_input(codes_of(out), g), ck, cv), out

    (_, _, _), stacked = jax.lax.scan(
        depth_step, (x0, cache_k, cache_v), jnp.arange(n_groups)
    )
    return finish(stacked)


def depth_logits_teacher_forced(
    params: Params,
    cfg: ModelConfig,
    talker_hidden: jnp.ndarray,   # [B, D_talker]
    cb0_tokens: jnp.ndarray,      # [B]
    codes: jnp.ndarray,           # [B, Q-1] candidate residual codes
) -> jnp.ndarray:
    """ONE full-attention depth pass over the depth_group=1 layout,
    teacher-forced on ``codes``: returns the float32 logits of every
    residual head given the candidate prefix — [B, Q-1, V]. Because
    attention is causal, row d is the EXACT depth-autoregressive
    distribution at depth d whenever codes[:, :d] already equal the
    final ones. This is the verifier of the speculative depth decode
    (one weight stream for all Q-1 depths, vs Q-1 sequential streams):
    greedy verification compares its argmax, sampled verification its
    filtered softmax."""
    cp = cfg.code_predictor
    cc = cfg.codec
    n_res = cc.num_codebooks - 1
    hidden_token = cp.input_layout == "hidden_token"

    from ..ops.linear import linear

    hid = talker_hidden[:, None, :]
    if cp.input_proj:
        hid = linear(hid, params["in_proj"])
    cb0 = jnp.take(params["cb0_emb"], cb0_tokens, axis=0)[:, None, :].astype(
        hid.dtype
    )
    # input embeddings for depths 0..n_res-2 (the last code is never an
    # input — it only feeds the talker's residual-sum feedback)
    embs = jax.vmap(lambda tab, c: jnp.take(tab, c, axis=0))(
        params["res_emb"][: n_res - 1],
        jnp.transpose(codes[:, : n_res - 1], (1, 0)),
    )                                                     # [n_res-1, B, H]
    embs = jnp.transpose(embs, (1, 0, 2)).astype(hid.dtype)
    if hidden_token:
        x = jnp.concatenate([hid, cb0, embs], axis=1)     # [B, n_res+1, H]
        off = 1
    else:
        x = jnp.concatenate([hid + cb0, embs], axis=1)    # [B, n_res, H]
        off = 0
    B, T, _ = x.shape
    cos_t, sin_t = rope_tables(T, cp.head_dim, cp.rope_theta)
    cache_shape = (cp.n_layers, B, T, cp.n_heads, cp.head_dim)
    ck = jnp.zeros(cache_shape, dtype=x.dtype)
    cv = jnp.zeros(cache_shape, dtype=x.dtype)

    def body(xc, layer):
        bp, k_l, v_l = layer
        out = transformer_block(
            bp, xc,
            cos=cos_t, sin=sin_t,
            cache_k=k_l, cache_v=v_l, pos=jnp.int32(0),
            n_heads=cp.n_heads, n_kv_heads=cp.n_heads,
            head_dim=cp.head_dim, rms_eps=cp.rms_eps, qk_norm=cp.qk_norm,
        )
        return out.x, None

    x, _ = jax.lax.scan(body, x, (params["blocks"], ck, cv))
    h = rmsnorm(x, params["ln_f"], cp.rms_eps)[:, off: off + n_res, :]
    return jnp.einsum(
        "bnd,nvd->bnv", h, params["heads"],
        preferred_element_type=jnp.float32,
    )


def depth_argmax_teacher_forced(
    params: Params,
    cfg: ModelConfig,
    talker_hidden: jnp.ndarray,
    cb0_tokens: jnp.ndarray,
    codes: jnp.ndarray,
) -> jnp.ndarray:
    """Argmax of ``depth_logits_teacher_forced`` — the greedy verifier."""
    return jnp.argmax(
        depth_logits_teacher_forced(
            params, cfg, talker_hidden, cb0_tokens, codes
        ),
        axis=-1,
    ).astype(jnp.int32)


def predict_residuals_spec(
    params: Params,
    cfg: ModelConfig,
    talker_hidden: jnp.ndarray,   # [B, D_talker]
    cb0_tokens: jnp.ndarray,      # [B]
    return_feedback: bool = False,
    return_rounds: bool = False,
):
    """Speculative depth decode: bit-exact ``depth_group=1`` greedy
    residual codes at grouped-draft cost (PERF.md round 3; the MTP +
    speculative-decoding recipe of arXiv:2410.13839 applied to the depth
    axis, where the published protocol's bytes actually go).

    1. DRAFT all Q-1 codes with the grouped path (``cfg.depth_group``
       passes — the same heads/tables, just re-indexed; the fine-tuned
       grouping is the draft model, no extra parameters);
    2. VERIFY with one teacher-forced full-depth pass
       (depth_argmax_teacher_forced) — causal attention makes row d exact
       wherever the prefix already matches;
    3. CORRECT each row's FIRST mismatching depth to the verifier's token
       (exact there, since its prefix matched) and re-verify, until no
       row mismatches.

    Each round either finishes a row or fixes one depth, and a fixed
    depth never un-fixes (its prefix is final), so the lax.while_loop
    terminates in <= Q-1 rounds; a perfect draft costs draft + ONE
    verifying pass. Output is IDENTICAL to predict_residuals at
    depth_group=1 greedy for ANY draft quality — depth_group stops being
    a fidelity trade and becomes a throughput knob."""
    n_res = cfg.codec.num_codebooks - 1
    draft = predict_residuals(
        params, cfg, talker_hidden, cb0_tokens, _as_draft=True
    )                                                       # [B, Q-1]
    B = draft.shape[0]
    depth_iota = jnp.arange(n_res)[None, :]

    def cond(carry):
        _, not_done, _ = carry
        return jnp.any(not_done)

    def body(carry):
        codes, _, rounds = carry
        am = depth_argmax_teacher_forced(
            params, cfg, talker_hidden, cb0_tokens, codes
        )
        mism = am != codes                                  # [B, Q-1]
        any_m = jnp.any(mism, axis=1)                       # [B]
        first = jnp.argmax(mism, axis=1)                    # [B]
        fix = (depth_iota == first[:, None]) & any_m[:, None]
        return jnp.where(fix, am, codes), any_m, rounds + 1

    codes, _, rounds = jax.lax.while_loop(
        cond, body,
        (draft, jnp.ones((B,), dtype=bool), jnp.int32(0)),
    )
    out = (codes,)
    if return_feedback:
        out = out + (residual_feedback_sum(params, codes),)
    if return_rounds:
        out = out + (rounds,)
    return out[0] if len(out) == 1 else out


def predict_residuals_spec_sampled(
    params: Params,
    cfg: ModelConfig,
    talker_hidden: jnp.ndarray,   # [B, D_talker]
    cb0_tokens: jnp.ndarray,      # [B]
    key: "jax.Array | None" = None,
    row_keys: "jax.Array | None" = None,
    return_feedback: bool = False,
    return_rounds: bool = False,
):
    """Exact speculative SAMPLING over the depth axis — the stochastic
    sibling of ``predict_residuals_spec`` for the published sampled
    cp.generate decode (do_sample, top_k=50, top_p=0.8).

    Classic speculative sampling (the accept / residual-resample rule of
    arXiv:2211.17192 / 2302.01318) applied depth-wise:

    1. DRAFT all Q-1 codes with the grouped stochastic path, recording
       the filtered categorical q each code was drawn from;
    2. VERIFY with one teacher-forced full-depth pass: target
       distribution p(. | prefix) at every depth (exact wherever the
       prefix is final, causal attention);
    3. walk depths from the accepted frontier: ACCEPT code x while
       u * q(x) <= p(x)  (probability min(1, p/q)); at the first
       rejection RESAMPLE from the normalized residual (p - q)+ — an
       exact sample from p there, since its prefix is final — finalize
       through that depth, and re-verify. Unfinalized later drafts are
       kept as proposals for the next round (their stored q remains
       their true conditional law given everything the loop has looked
       at, so the acceptance correction stays exact; staleness only
       lowers the acceptance rate, never biases the output).

    Output is IDENTICAL IN DISTRIBUTION to the sequential depth_group=1
    sampled stream for ANY draft quality (it is NOT bit-identical for a
    fixed key: the proposal/acceptance randomness is consumed
    differently). Each round finalizes at least one depth per unfinished
    row, so the lax.while_loop terminates in <= Q-1 rounds; a
    high-acceptance draft costs draft + ONE verifying pass. RNG folds:
    the draft consumes the plain grouped path's per-depth folds
    unchanged; the loop derives fresh per-round uniforms/resample keys
    under a disjoint fold tag (per-row when ``row_keys`` is given, so
    duplicate slot-replica rows stay bit-identical — the serving
    batched-prefill invariant)."""
    from ..runtime.sampling import SamplingConfig, filtered_logits

    cp = cfg.code_predictor
    cc = cfg.codec
    n_res = cc.num_codebooks - 1
    cp_sampling = SamplingConfig(
        temperature=cp.temperature, top_k=cp.top_k, top_p=cp.top_p
    )

    draft, q = predict_residuals(
        params, cfg, talker_hidden, cb0_tokens,
        key=key, row_keys=row_keys, _as_draft=True, _return_probs=True,
    )                                           # [B, Q-1], [B, Q-1, V] f32
    B = draft.shape[0]
    depth_iota = jnp.arange(n_res)[None, :]
    LOOP_TAG = 0x5BEC  # disjoint from the draft's 0..Q-2 depth folds

    def cond(carry):
        _, m, _ = carry
        return jnp.any(m < n_res)

    def body(carry):
        codes, m, rounds = carry
        logits = depth_logits_teacher_forced(
            params, cfg, talker_hidden, cb0_tokens, codes
        )
        p = jax.nn.softmax(filtered_logits(logits, cp_sampling), axis=-1)
        if row_keys is not None:
            kb = jax.vmap(lambda kk: jax.random.fold_in(
                jax.random.fold_in(kk, LOOP_TAG), rounds))(row_keys)
            u = jax.vmap(lambda kk: jax.random.uniform(
                jax.random.fold_in(kk, 0), (n_res,)))(kb)
        else:
            k0 = jax.random.fold_in(jax.random.fold_in(key, LOOP_TAG),
                                    rounds)
            u = jax.random.uniform(jax.random.fold_in(k0, 0), (B, n_res))
        px = jnp.take_along_axis(p, codes[..., None], axis=-1)[..., 0]
        qx = jnp.take_along_axis(q, codes[..., None], axis=-1)[..., 0]
        # P(u*q <= p) = min(1, p/q); depths below the frontier are final
        acc = (u * qx <= px) | (depth_iota < m[:, None])
        rej_any = ~jnp.all(acc, axis=1)                     # [B]
        first = jnp.argmax(~acc, axis=1)                    # [B]
        p_at = jnp.take_along_axis(p, first[:, None, None], axis=1)[:, 0]
        q_at = jnp.take_along_axis(q, first[:, None, None], axis=1)[:, 0]
        res = jnp.maximum(p_at - q_at, 0.0)
        z = jnp.sum(res, axis=-1, keepdims=True)
        # z == 0 only on numeric ties (p <= q everywhere makes rejection
        # probability ~0); fall back to p itself there
        res_logits = jnp.log(jnp.where(z > 1e-9, res / z, p_at))
        if row_keys is not None:
            new_tok = jax.vmap(lambda lg, kk: jax.random.categorical(
                jax.random.fold_in(kk, 1), lg))(res_logits, kb)
        else:
            new_tok = jax.random.categorical(
                jax.random.fold_in(k0, 1), res_logits, axis=-1)
        fix = rej_any[:, None] & (depth_iota == first[:, None])
        codes = jnp.where(fix, new_tok.astype(jnp.int32)[:, None], codes)
        m = jnp.where(rej_any, first + 1, n_res).astype(jnp.int32)
        return codes, m, rounds + 1

    codes, _, rounds = jax.lax.while_loop(
        cond, body, (draft, jnp.zeros((B,), jnp.int32), jnp.int32(0))
    )
    out = (codes,)
    if return_feedback:
        out = out + (residual_feedback_sum(params, codes),)
    if return_rounds:
        out = out + (rounds,)
    return out[0] if len(out) == 1 else out


def residual_feedback_sum(params: Params, codes: jnp.ndarray) -> jnp.ndarray:
    """Σ_d res_emb[d][codes[:, d]] — the residual-codebook half of the
    published talker feedback sum ([B, Q-1] codes -> [B, H_cp]). The
    published loop sums the predictor's per-depth INPUT embeddings of the
    generated codes (mid hiddens + the last table applied to the last
    code), which is exactly each depth's res_emb row."""
    per_depth = jax.vmap(lambda tab, c: jnp.take(tab, c, axis=0))(
        params["res_emb"], jnp.transpose(codes, (1, 0))
    )                                                   # [Q-1, B, H]
    return jnp.sum(per_depth, axis=0)
