"""Training checkpoint save/restore round trip, including optimizer state."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from qwen3_tts_tpu.engine import configs  # noqa: E402
from qwen3_tts_tpu.engine.api import Qwen3TTSModel  # noqa: E402
from qwen3_tts_tpu.training import init_train_state, make_train_step  # noqa: E402
from qwen3_tts_tpu.training.checkpoint import (  # noqa: E402
    latest_checkpoint,
    restore_train_state,
    save_train_state,
)
from qwen3_tts_tpu.training.train import (  # noqa: E402
    default_optimizer,
    synthetic_batch,
)


def test_checkpoint_roundtrip_and_resume(temp_dir):
    cfg = configs.tiny("custom", quant=False)
    model = Qwen3TTSModel.synthetic(cfg, seed=0)
    opt = default_optimizer(lr=1e-3)
    state = init_train_state(model.params, model.cp_params, opt)
    step = make_train_step(cfg, opt, remat=False)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(cfg, 2, 4, 4, seed=0).items()
    }

    state, _ = step(state, batch)
    state, m2 = step(state, batch)
    path = save_train_state(state, temp_dir)
    assert latest_checkpoint(temp_dir) == path

    # fresh template (different values), restore, continue training
    fresh_model = Qwen3TTSModel.synthetic(cfg, seed=99)
    template = init_train_state(fresh_model.params, fresh_model.cp_params, opt)
    restored = restore_train_state(path, template)
    assert int(restored.step) == 2
    np.testing.assert_array_equal(
        np.asarray(restored.params["ln_f"]), np.asarray(state.params["ln_f"])
    )
    # optimizer moments restored exactly
    flat_a = jax.tree.leaves(restored.opt_state)
    flat_b = jax.tree.leaves(state.opt_state)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a further step from the restored state matches one from the original
    s1, m_orig = step(state, batch)
    s2, m_rest = step(restored, batch)
    assert float(m_orig["loss"]) == pytest.approx(float(m_rest["loss"]), rel=1e-5)
