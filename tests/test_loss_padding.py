"""Train/serve conditioning parity (ADVICE.md loss.py:68).

Inference left-pads prompts and masks the pad keys out of attention; the
training layout must match, or a fine-tuned model trains on a conditioning
geometry it never sees at serve time. These tests pin that: a right-padded
training batch must produce EXACTLY the hidden/logits of each example run
unpadded.
"""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from qwen3_tts_tpu.engine import configs  # noqa: E402
from qwen3_tts_tpu.models.talker import init_talker  # noqa: E402
from qwen3_tts_tpu.training.loss import (  # noqa: E402
    _talker_hidden_and_logits,
    talker_loss,
)


def _make_batch(cfg, lengths, Tt, Tf, seed=7):
    t = cfg.talker
    cc = cfg.codec
    rng = np.random.default_rng(seed)
    B = len(lengths)
    text = np.zeros((B, Tt), np.int32)
    mask = np.zeros((B, Tt), bool)
    for i, n in enumerate(lengths):
        text[i, :n] = rng.integers(1, t.vocab_size, n)
        mask[i, :n] = True
    codes = rng.integers(
        0, cc.residual_codebook_size, (B, cc.num_codebooks, Tf)
    ).astype(np.int32)
    codes[:, 0, :] = rng.integers(0, cc.codebook_size, (B, Tf))
    frame_mask = np.ones((B, Tf), bool)
    return {
        "text_tokens": jnp.asarray(text),
        "text_mask": jnp.asarray(mask),
        "codes": jnp.asarray(codes),
        "frame_mask": jnp.asarray(frame_mask),
    }


def test_training_layout_matches_unpadded_examples():
    """Padded-batch frame logits == per-example unpadded logits (the
    inference layout has no pad at all when the prompt fills the bucket)."""
    cfg = dataclasses.replace(configs.tiny("custom", quant=False),
                              dtype="float32")
    params = init_talker(cfg, seed=0)
    lengths, Tt, Tf = [8, 5, 2], 8, 6
    batch = _make_batch(cfg, lengths, Tt, Tf)

    _, logits_batched = _talker_hidden_and_logits(params, cfg, batch)

    for i, n in enumerate(lengths):
        single = {
            "text_tokens": batch["text_tokens"][i : i + 1, :n],
            "text_mask": batch["text_mask"][i : i + 1, :n],
            "codes": batch["codes"][i : i + 1],
            "frame_mask": batch["frame_mask"][i : i + 1],
        }
        _, logits_single = _talker_hidden_and_logits(params, cfg, single)
        np.testing.assert_allclose(
            np.asarray(logits_batched[i]),
            np.asarray(logits_single[0]),
            atol=2e-4,
            rtol=2e-4,
        )


def test_talker_loss_invariant_to_pad_token_content():
    """Whatever sits in the padded text slots must not influence the loss
    (it couldn't at inference: pad keys are masked)."""
    cfg = dataclasses.replace(configs.tiny("custom", quant=False),
                              dtype="float32")
    params = init_talker(cfg, seed=1)
    batch = _make_batch(cfg, [6, 3], 8, 5)
    loss_a = float(talker_loss(params, cfg, batch))

    garbage = np.asarray(batch["text_tokens"]).copy()
    mask = np.asarray(batch["text_mask"])
    garbage[~mask] = 42  # arbitrary non-pad ids in the padding slots
    batch_b = dict(batch, text_tokens=jnp.asarray(garbage))
    loss_b = float(talker_loss(params, cfg, batch_b))
    assert loss_a == pytest.approx(loss_b, abs=1e-6)
