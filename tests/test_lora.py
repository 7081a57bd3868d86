"""LoRA fine-tuning (training/lora.py): identity at init, adapter-only
training, exact merge, and the frozen-base guarantee."""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from qwen3_tts_tpu.engine import configs  # noqa: E402
from qwen3_tts_tpu.models.talker import init_talker, talker_forward  # noqa: E402
from qwen3_tts_tpu.models.layers import rope_tables  # noqa: E402
from qwen3_tts_tpu.models.code_predictor import init_code_predictor  # noqa: E402
from qwen3_tts_tpu.training import (  # noqa: E402
    add_lora,
    init_lora_train_state,
    make_lora_train_step,
    merge_lora,
    merge_trees,
    split_lora,
)
from qwen3_tts_tpu.training.train import default_optimizer, synthetic_batch  # noqa: E402


def _cfg():
    # dense f32: training runs dense, and f32 keeps the identity/merge
    # assertions exact instead of bf16-rounding-limited
    return dataclasses.replace(configs.tiny("custom", quant=False), dtype="float32")


def _forward_logits(params, cfg, tokens):
    t = cfg.talker
    S = cfg.max_seq_len
    cos_t, sin_t = rope_tables(S, t.head_dim, t.rope_theta)
    B, T = tokens.shape
    emb = jnp.take(params["codec_emb"], tokens, axis=0)
    ck = jnp.zeros((t.n_layers, B, S, t.n_kv_heads, t.head_dim), emb.dtype)
    _, logits, _, _ = talker_forward(
        params, t, emb, ck, jnp.zeros_like(ck), jnp.int32(0), cos_t, sin_t
    )
    return logits


def test_zero_init_is_identity():
    """B=0 init: the adapted model equals the base model bit-for-bit."""
    cfg = _cfg()
    params = init_talker(cfg, seed=0)
    adapted = add_lora(params, rank=4, seed=1)
    tok = jnp.asarray(np.random.default_rng(0).integers(0, 60, (2, 5)))
    np.testing.assert_array_equal(
        np.asarray(_forward_logits(params, cfg, tok)),
        np.asarray(_forward_logits(adapted, cfg, tok)),
    )


def test_adapter_structure_and_split_merge_roundtrip():
    cfg = _cfg()
    params = init_talker(cfg, seed=0)
    adapted = add_lora(params, rank=4, seed=1)

    t = cfg.talker
    a = adapted["blocks"]["attn"]["q"]["lora_a"]
    b = adapted["blocks"]["attn"]["q"]["lora_b"]
    assert a.shape == (t.n_layers, 4, t.hidden)
    assert b.shape[0] == t.n_layers and b.shape[2] == 4
    assert not np.any(np.asarray(b))          # zero-init B
    # untargeted leaves untouched (embeddings stay bare arrays)
    assert isinstance(adapted["codec_emb"], np.ndarray)

    lora, base = split_lora(adapted)
    # only trainable a/b in the adapter tree; scale frozen in base
    leaves = jax.tree_util.tree_leaves_with_path(lora)
    assert leaves and all(
        p[-1].key in ("lora_a", "lora_b") for p, _ in leaves
    )
    assert "lora_scale" in base["blocks"]["attn"]["q"]
    rejoined = merge_trees(base, lora)
    assert jax.tree_util.tree_structure(rejoined) == jax.tree_util.tree_structure(adapted)
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_leaves_with_path(rejoined),
        jax.tree_util.tree_leaves_with_path(adapted),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_lora_train_step_updates_only_adapters():
    """A few LoRA steps: loss finite, adapters move, base frozen bitwise,
    optimizer state is adapter-sized."""
    cfg = _cfg()
    params = init_talker(cfg, seed=0)
    cp_params = init_code_predictor(cfg, seed=1)
    adapted = add_lora(params, rank=4, seed=1)
    lora, base = split_lora(adapted)

    opt = default_optimizer(lr=1e-2)
    state = init_lora_train_state(lora, opt)
    step = make_lora_train_step(cfg, opt, remat=True)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(cfg, batch_size=2, t_text=6, t_frames=5).items()
    }

    base_before = jax.tree.map(np.asarray, base)
    losses = []
    for _ in range(3):
        state, metrics = step(state, base, cp_params, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)), losses
    assert float(metrics["grad_norm"]) > 0.0

    # adapters moved (B leaves nonzero now)
    b_leaf = np.asarray(state.lora["blocks"]["attn"]["q"]["lora_b"])
    assert np.any(b_leaf != 0.0)
    # base bitwise identical
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_leaves_with_path(jax.tree.map(np.asarray, base)),
        jax.tree_util.tree_leaves_with_path(base_before),
    ):
        np.testing.assert_array_equal(la, lb, err_msg=str(pa))
    # optimizer state is adapter-sized: every moment leaf matches an
    # adapter leaf shape, none matches the full hidden x hidden weights
    n_lora = sum(x.size for x in jax.tree.leaves(state.lora))
    n_opt = sum(x.size for x in jax.tree.leaves(state.opt_state))
    n_base = sum(np.asarray(x).size for x in jax.tree.leaves(base))
    assert n_opt <= 2 * n_lora + 8  # two Adam moments + counters
    assert n_lora < n_base / 10


def test_merge_lora_matches_adapter_forward():
    """After training, merging deltas into the base weights reproduces the
    adapter forward to float tolerance, with no lora leaves left."""
    cfg = _cfg()
    params = init_talker(cfg, seed=0)
    cp_params = init_code_predictor(cfg, seed=1)
    adapted = add_lora(params, rank=4, seed=1)
    lora, base = split_lora(adapted)
    opt = default_optimizer(lr=5e-2)
    state = init_lora_train_state(lora, opt)
    step = make_lora_train_step(cfg, opt)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(cfg, batch_size=2, t_text=6, t_frames=5).items()
    }
    for _ in range(2):
        state, _ = step(state, base, cp_params, batch)

    trained = merge_trees(base, state.lora)
    merged = merge_lora(trained)
    assert not any(
        p[-1].key.startswith("lora_")
        for p, _ in jax.tree_util.tree_leaves_with_path(merged)
    )
    tok = jnp.asarray(np.random.default_rng(1).integers(0, 60, (2, 5)))
    np.testing.assert_allclose(
        np.asarray(_forward_logits(trained, cfg, tok)),
        np.asarray(_forward_logits(merged, cfg, tok)),
        atol=2e-4,
    )
    # and the delta is real: merged differs from the pre-training base
    assert not np.allclose(
        np.asarray(_forward_logits(merged, cfg, tok)),
        np.asarray(_forward_logits(params, cfg, tok)),
    )


def test_lora_state_checkpoint_roundtrip(tmp_path):
    """Adapter training checkpoints save/restore through the same orbax
    helpers as full fine-tunes (training/checkpoint.py is pytree-generic).
    Adapter checkpoints are KBs, so per-voice adapters are cheap to keep."""
    from qwen3_tts_tpu.training.checkpoint import (
        latest_checkpoint,
        restore_train_state,
        save_train_state,
    )

    cfg = _cfg()
    params = init_talker(cfg, seed=0)
    cp_params = init_code_predictor(cfg, seed=1)
    lora, base = split_lora(add_lora(params, rank=4, seed=1))
    opt = default_optimizer(lr=1e-2)
    state = init_lora_train_state(lora, opt)
    step = make_lora_train_step(cfg, opt)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(cfg, batch_size=2, t_text=6, t_frames=5).items()
    }
    state, _ = step(state, base, cp_params, batch)

    path = save_train_state(state, str(tmp_path))
    template = init_lora_train_state(lora, opt)
    restored = restore_train_state(latest_checkpoint(str(tmp_path)), template)
    assert int(restored.step) == 1
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_leaves_with_path(restored.lora),
        jax.tree_util.tree_leaves_with_path(state.lora),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    # and the restored adapters keep training
    restored, metrics = step(restored, base, cp_params, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_add_lora_rejects_quantized():
    cfg = configs.tiny("custom", quant=True)
    params = init_talker(cfg, seed=0)
    with pytest.raises(ValueError, match="dequantize"):
        add_lora(params, rank=4)


def test_mtp_head_grafting_and_training():
    """The imported-checkpoint MTP workflow: an fps=1 talker gains grafted
    MTP heads (models.talker.add_mtp_params), ONLY the heads train against
    the frozen base (split_subtree + the adapter train step), and the
    result decodes at frames_per_step=2."""
    from qwen3_tts_tpu.models.talker import add_mtp_params, mtp_logits
    from qwen3_tts_tpu.training import split_subtree

    cfg1 = _cfg()                                      # fps=1, like imports
    assert cfg1.talker.frames_per_step == 1
    params = init_talker(cfg1, seed=0)
    assert "mtp" not in params
    cfg2 = dataclasses.replace(
        configs.with_frames_per_step(cfg1, 2), dtype="float32"
    )
    with pytest.raises(ValueError, match="frames_per_step"):
        add_mtp_params(params, cfg1)
    grafted = add_mtp_params(params, cfg2, seed=3)
    assert "mtp" in grafted
    with pytest.raises(ValueError, match="already"):
        add_mtp_params(grafted, cfg2)

    # grafted heads must be DENSE even under a quant-enabled config: their
    # purpose is training, and gradients need real-valued leaves (the base
    # is dequantized separately — apply_compute_format)
    qcfg1 = dataclasses.replace(
        configs.tiny("custom", quant=True), dtype="float32"
    )  # fps=1, quant on: the shape of a real imported checkpoint
    qcfg2 = configs.with_frames_per_step(qcfg1, 2)
    from qwen3_tts_tpu.ops.quant import dequantize_tree

    qbase = dequantize_tree(init_talker(qcfg1, seed=0))
    qgraft = add_mtp_params(qbase, qcfg2, seed=3)
    assert "w" in qgraft["mtp"]["mlp"]["gate"], "grafted heads must be dense"

    heads, base = split_subtree(grafted, "mtp")
    cp_params = init_code_predictor(cfg2, seed=1)
    opt = default_optimizer(lr=1e-2)
    state = init_lora_train_state(heads, opt)
    step = make_lora_train_step(cfg2, opt)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(cfg2, batch_size=2, t_text=6, t_frames=6).items()
    }
    before = np.asarray(heads["mtp"]["mlp"]["gate"]["w"])
    for _ in range(2):
        state, metrics = step(state, base, cp_params, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.any(np.asarray(state.lora["mtp"]["mlp"]["gate"]["w"]) != before)
    # base frozen + merged tree decodes one MTP frame
    trained = merge_trees(base, state.lora)
    h = jnp.zeros((2, cfg2.talker.hidden), jnp.float32)
    prev = jnp.zeros((2,), jnp.int32)
    lg, h2 = mtp_logits(trained, cfg2.talker, h, prev)
    assert lg.shape == (2, cfg2.talker.codec_vocab)
    assert np.all(np.isfinite(np.asarray(lg)))
