"""Training data pipeline: codec-encoded examples -> bucketed batches ->
a train step that actually learns from them."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from qwen3_tts_tpu.engine import configs  # noqa: E402
from qwen3_tts_tpu.engine.api import Qwen3TTSModel  # noqa: E402
from qwen3_tts_tpu.training.data import (  # noqa: E402
    Example,
    batches_from_pairs,
    encode_example,
    pad_batch,
)
from qwen3_tts_tpu.training import init_train_state, make_train_step  # noqa: E402
from qwen3_tts_tpu.training.train import default_optimizer  # noqa: E402


@pytest.fixture(scope="module")
def model():
    return Qwen3TTSModel.synthetic(configs.tiny("custom"), seed=0)


def _tone(seconds, sr=24_000, freq=300.0):
    t = np.arange(int(sr * seconds)) / sr
    return (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_encode_example_shapes(model):
    ex = encode_example(model, "hello world", _tone(0.5), 24_000)
    q = model.cfg.codec.num_codebooks
    assert ex.codes.shape[0] == q
    # 0.5 s at 12 Hz -> 6 frames
    assert 5 <= ex.codes.shape[1] <= 7
    assert ex.text_tokens.dtype == np.int32


def test_encode_example_resamples(model):
    ex = encode_example(model, "hi", _tone(0.5, sr=16_000), 16_000)
    assert 5 <= ex.codes.shape[1] <= 7  # still ~0.5s worth of frames


def test_pad_batch_buckets_and_masks():
    q = 4
    exs = [
        Example(np.arange(5, dtype=np.int32), np.ones((q, 3), np.int32)),
        Example(np.arange(9, dtype=np.int32), np.ones((q, 7), np.int32)),
    ]
    b = pad_batch(exs)
    assert b["text_tokens"].shape == (2, 16)   # bucket 16
    assert b["codes"].shape == (2, q, 8)       # bucket 8
    assert b["text_mask"][0].sum() == 5 and b["text_mask"][1].sum() == 9
    assert b["frame_mask"][0].sum() == 3 and b["frame_mask"][1].sum() == 7


def test_pipeline_feeds_train_step(model):
    pairs = [
        (f"utterance number {i}", _tone(0.3 + 0.1 * (i % 3)), 24_000)
        for i in range(4)
    ]
    batches = list(batches_from_pairs(model, pairs, batch_size=2))
    assert len(batches) == 2

    cfg = model.cfg
    opt = default_optimizer(lr=3e-3)
    state = init_train_state(model.params, model.cp_params, opt)
    step = make_train_step(cfg, opt, remat=False)
    first_loss = last_loss = None
    for _ in range(4):
        for b in batches:
            state, m = step(state, {k: jnp.asarray(v) for k, v in b.items()})
            if first_loss is None:
                first_loss = float(m["loss"])
            last_loss = float(m["loss"])
    assert last_loss < first_loss  # it learns from real encoded data
