"""Pipeline parallelism (parallel/pipeline.py) on the virtual 8-device CPU
mesh: the GPipe schedule over the talker block stack must reproduce the
plain full-sequence forward — loss, gradients, and whole train steps — while
composing with dp and tp (manual over pp only; dp/tp stay GSPMD-auto)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from qwen3_tts_tpu.engine import configs  # noqa: E402
from qwen3_tts_tpu.models.talker import init_talker  # noqa: E402
from qwen3_tts_tpu.models.code_predictor import init_code_predictor  # noqa: E402
from qwen3_tts_tpu.parallel import (  # noqa: E402
    MeshPlan,
    build_mesh,
    shard_params,
    talker_stack_fn,
)
from qwen3_tts_tpu.parallel.sharding import replicated_spec  # noqa: E402
from qwen3_tts_tpu.training import init_train_state, make_train_step  # noqa: E402
from qwen3_tts_tpu.training.loss import joint_loss  # noqa: E402
from qwen3_tts_tpu.training.train import (  # noqa: E402
    default_optimizer,
    synthetic_batch,
)


def _setup(pp=2, dp=2, tp=2, batch=8):
    cfg = configs.tiny("custom", quant=False)
    mesh = build_mesh(MeshPlan(dp=dp, tp=tp, pp=pp), jax.devices()[: pp * dp * tp])
    params = init_talker(cfg, seed=0)
    cp_params = init_code_predictor(cfg, seed=1)
    batch_h = synthetic_batch(cfg, batch_size=batch, t_text=6, t_frames=4, seed=3)
    return cfg, mesh, params, cp_params, batch_h


def _put_batch(batch, mesh):
    sh = NamedSharding(mesh, P("dp"))
    return {k: jax.device_put(jnp.asarray(v), sh) for k, v in batch.items()}


def test_pipelined_loss_and_grads_match_plain():
    cfg, mesh, params, cp_params, batch = _setup()
    stack = talker_stack_fn(cfg, mesh=mesh, microbatches=4)

    def loss_plain(p, cp):
        return joint_loss(p, cp, cfg, batch)[0]

    def loss_pp(p, cp):
        return joint_loss(p, cp, cfg, batch, stack_fn=stack)[0]

    l_ref, g_ref = jax.value_and_grad(loss_plain, argnums=(0, 1))(
        params, cp_params
    )

    params_s = shard_params(params, mesh)
    cp_s = shard_params(cp_params, mesh, replicated_spec(cp_params))
    batch_s = _put_batch(batch, mesh)

    def loss_pp_b(p, cp, b):
        return joint_loss(p, cp, cfg, b, stack_fn=stack)[0]

    l_pp, g_pp = jax.jit(jax.value_and_grad(loss_pp_b, argnums=(0, 1)))(
        params_s, cp_s, batch_s
    )

    np.testing.assert_allclose(float(l_ref), float(l_pp), rtol=2e-4)
    flat_ref = jax.tree.leaves(g_ref)
    flat_pp = jax.tree.leaves(g_pp)
    assert len(flat_ref) == len(flat_pp)
    for a, b in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=5e-2, atol=2e-3,
        )


def test_pp_train_step_matches_plain_step():
    cfg, mesh, params, cp_params, batch = _setup()
    opt = default_optimizer()

    state_ref = init_train_state(params, cp_params, opt)
    step_ref = make_train_step(cfg, opt, remat=False)
    _, m_ref = step_ref(state_ref, {k: jnp.asarray(v) for k, v in batch.items()})

    params_s = shard_params(params, mesh)
    cp_s = shard_params(cp_params, mesh, replicated_spec(cp_params))
    state_pp = init_train_state(params_s, cp_s, opt)
    step_pp = make_train_step(cfg, opt, remat=True, mesh=mesh, microbatches=4)
    state_pp, m_pp = step_pp(state_pp, _put_batch(batch, mesh))

    assert np.isfinite(float(m_pp["loss"]))
    np.testing.assert_allclose(
        float(m_ref["loss"]), float(m_pp["loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(m_ref["grad_norm"]), float(m_pp["grad_norm"]), rtol=2e-2
    )
    # a second step runs on the donated, updated state
    batch2 = synthetic_batch(cfg, batch_size=8, t_text=6, t_frames=4, seed=9)
    state_pp, m2 = step_pp(state_pp, _put_batch(batch2, mesh))
    assert np.isfinite(float(m2["loss"]))


def test_pp_only_mesh_without_dp_tp():
    cfg, _, params, cp_params, batch = _setup()
    mesh = build_mesh(MeshPlan(dp=1, tp=1, pp=2), jax.devices()[:2])
    stack = talker_stack_fn(cfg, mesh=mesh, microbatches=2)

    l_ref = joint_loss(params, cp_params, cfg, batch)[0]
    params_s = shard_params(params, mesh)
    l_pp = jax.jit(
        lambda p, cp, b: joint_loss(p, cp, cfg, b, stack_fn=stack)[0]
    )(params_s, cp_params, _put_batch(batch, mesh))
    np.testing.assert_allclose(float(l_ref), float(l_pp), rtol=2e-4)


def test_sequence_parallel_loss_matches_plain():
    cfg, _, params, cp_params, batch = _setup()
    mesh = build_mesh(MeshPlan(dp=2, tp=2, pp=1), jax.devices()[:4])
    opt = default_optimizer()

    state_ref = init_train_state(params, cp_params, opt)
    step_ref = make_train_step(cfg, opt, remat=False)
    _, m_ref = step_ref(state_ref, {k: jnp.asarray(v) for k, v in batch.items()})

    params_s = shard_params(params, mesh)
    cp_s = shard_params(cp_params, mesh, replicated_spec(cp_params))
    state_sp = init_train_state(params_s, cp_s, opt)
    step_sp = make_train_step(
        cfg, opt, remat=False, mesh=mesh, sequence_parallel=True
    )
    _, m_sp = step_sp(state_sp, _put_batch(batch, mesh))
    np.testing.assert_allclose(
        float(m_ref["loss"]), float(m_sp["loss"]), rtol=2e-4
    )


def test_sequence_parallel_composes_with_pipeline():
    cfg, mesh, params, cp_params, batch = _setup()  # pp=2, dp=2, tp=2
    opt = default_optimizer()
    l_ref = float(joint_loss(params, cp_params, cfg, batch)[0])

    params_s = shard_params(params, mesh)
    cp_s = shard_params(cp_params, mesh, replicated_spec(cp_params))
    state = init_train_state(params_s, cp_s, opt)
    step = make_train_step(
        cfg, opt, remat=True, mesh=mesh, microbatches=4,
        sequence_parallel=True,
    )
    _, m = step(state, _put_batch(batch, mesh))
    np.testing.assert_allclose(l_ref, float(m["loss"]), rtol=2e-4)


def test_sequence_parallel_requires_tp_mesh():
    cfg, _, *_ = _setup()
    opt = default_optimizer()
    with pytest.raises(ValueError, match="sequence_parallel"):
        make_train_step(cfg, opt, sequence_parallel=True)
    mesh = build_mesh(MeshPlan(dp=2, tp=1, pp=1), jax.devices()[:2])
    with pytest.raises(ValueError, match="tp > 1"):
        make_train_step(cfg, opt, mesh=mesh, sequence_parallel=True)


def test_pipeline_rejects_indivisible_shapes():
    cfg, mesh, params, cp_params, batch = _setup()
    stack = talker_stack_fn(cfg, mesh=mesh, microbatches=3)  # 8 % 3 != 0
    with pytest.raises(ValueError, match="not divisible"):
        joint_loss(params, cp_params, cfg, batch, stack_fn=stack)


def test_pp_train_state_checkpoint_roundtrip(tmp_path):
    """A pipeline-sharded TrainState survives orbax save -> restore into a
    fresh pp-sharded template (resume onto the same mesh), and the restored
    state steps identically to the uninterrupted run."""
    from qwen3_tts_tpu.training.checkpoint import (
        restore_train_state,
        save_train_state,
    )

    cfg, mesh, params, cp_params, batch = _setup()
    opt = default_optimizer()
    params_s = shard_params(params, mesh)
    cp_s = shard_params(cp_params, mesh, replicated_spec(cp_params))
    step = make_train_step(cfg, opt, remat=True, mesh=mesh, microbatches=4)

    state = init_train_state(params_s, cp_s, opt)
    state, _ = step(state, _put_batch(batch, mesh))
    path = save_train_state(state, str(tmp_path / "ckpts"))

    batch2 = synthetic_batch(cfg, batch_size=8, t_text=6, t_frames=4, seed=11)
    cont_state, m_cont = step(state, _put_batch(batch2, mesh))

    template = init_train_state(
        shard_params(params, mesh),
        shard_params(cp_params, mesh, replicated_spec(cp_params)),
        opt,
    )
    restored = restore_train_state(path, template)
    assert int(restored.step) == 1
    res_state, m_res = step(restored, _put_batch(batch2, mesh))
    np.testing.assert_allclose(
        float(m_cont["loss"]), float(m_res["loss"]), rtol=1e-5
    )


def test_pp_param_spec_shards_block_leaves():
    cfg = configs.tiny("custom", quant=False)
    params = init_talker(cfg, seed=0)
    from qwen3_tts_tpu.parallel.sharding import talker_param_spec

    spec = talker_param_spec(params, pp=True)
    # every stacked block leaf leads with the pp axis
    for path, s in jax.tree_util.tree_flatten_with_path(spec["blocks"])[0]:
        assert s[0] == "pp", (path, s)
    # non-block leaves stay pp-replicated
    assert spec["text_emb"] == P()
    assert spec["head"]["w"] == P()
