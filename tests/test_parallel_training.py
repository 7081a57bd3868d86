"""Mesh/sharding + train-step tests on the virtual 8-device CPU mesh
(conftest forces jax_num_cpu_devices=8 — the pattern SURVEY.md §2 calls for:
sharding code exercised without TPU hardware)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from qwen3_tts_tpu.engine import configs  # noqa: E402
from qwen3_tts_tpu.engine.api import Qwen3TTSModel  # noqa: E402
from qwen3_tts_tpu.parallel import (  # noqa: E402
    MeshPlan,
    build_mesh,
    shard_model,
)
from qwen3_tts_tpu.parallel.mesh import auto_plan, validate_tp  # noqa: E402
from qwen3_tts_tpu.parallel.sharding import talker_param_spec  # noqa: E402
from qwen3_tts_tpu.training import (  # noqa: E402
    init_train_state,
    make_train_step,
)
from qwen3_tts_tpu.training.train import (  # noqa: E402
    default_optimizer,
    synthetic_batch,
)


def shardable_tiny(mode="custom"):
    """Tiny config with tp=2-divisible head/ffn dims."""
    return configs.tiny(mode, quant=False)


def test_auto_plan_prefers_tp_that_divides_heads():
    plan = auto_plan(8, tp_divisors=8)
    assert plan.n_devices == 8
    assert 8 % plan.tp == 0
    plan2 = auto_plan(8, tp_divisors=2)
    assert plan2.tp == 2 and plan2.dp == 4


def test_validate_tp_rejects_indivisible():
    cfg = configs.tiny()  # n_kv_heads=2
    validate_tp(cfg, 2)
    with pytest.raises(ValueError):
        validate_tp(cfg, 4)


def test_talker_param_spec_shapes():
    cfg = shardable_tiny()
    model = Qwen3TTSModel.synthetic(cfg)
    specs = talker_param_spec(model.params)
    assert specs["blocks"]["attn"]["q"]["w"] == P(None, "tp", None)
    assert specs["blocks"]["attn"]["o"]["w"] == P(None, None, "tp")
    assert specs["blocks"]["mlp"]["down"]["w"] == P(None, None, "tp")
    assert specs["text_emb"] == P()
    assert specs["blocks"]["ln1"] == P()


def test_sharded_generation_matches_single_device():
    """The same jitted pipeline must produce identical codes on a (dp=1,tp=2)
    mesh as on one device (XLA collectives are exact for this graph)."""
    from qwen3_tts_tpu.runtime.prompts import PromptSpec

    cfg = shardable_tiny()
    prompt = PromptSpec(
        text_tokens=np.arange(5, dtype=np.int32), speaker_id=1
    )

    model1 = Qwen3TTSModel.synthetic(cfg, seed=7)
    r1 = model1.generator.synthesize(prompt, max_frames=6, seed=3)

    model2 = Qwen3TTSModel.synthetic(cfg, seed=7)
    mesh = build_mesh(MeshPlan(dp=1, tp=2), jax.devices()[:2])
    shard_model(model2, mesh)
    r2 = model2.generator.synthesize(prompt, max_frames=6, seed=3)

    assert r1.frames == r2.frames
    np.testing.assert_allclose(r1.wav, r2.wav, atol=0.02 * 32767)  # PCM units


def test_sharded_serving_matches_unsharded():
    """Production multi-chip serving: the continuous-batching engine over a
    tp=2-sharded model must serve the same greedy tokens as over an
    unsharded one (weights tp-sharded, per-slot state replicated — XLA
    inserts the ICI collectives inside the fused serve step)."""
    from qwen3_tts_tpu.runtime.prompts import PromptSpec
    from qwen3_tts_tpu.runtime.sampling import SamplingConfig
    from qwen3_tts_tpu.runtime.serving import ServingEngine

    cfg = shardable_tiny()
    greedy = SamplingConfig(greedy=True)
    prompts = [
        PromptSpec(text_tokens=np.arange(5, dtype=np.int32), speaker_id=1),
        PromptSpec(
            text_tokens=(np.arange(7) * 3 % 50).astype(np.int32),
            speaker_id=2,
        ),
    ]

    model1 = Qwen3TTSModel.synthetic(cfg, seed=7)
    e1 = ServingEngine(model1, max_streams=2, chunk=8, sampling=greedy)
    r1 = e1.run(prompts, max_frames=10)

    model2 = Qwen3TTSModel.synthetic(cfg, seed=7)
    mesh = build_mesh(MeshPlan(dp=1, tp=2), jax.devices()[:2])
    shard_model(model2, mesh)
    e2 = ServingEngine(model2, max_streams=2, chunk=8, sampling=greedy)
    r2 = e2.run(prompts, max_frames=10)

    for (w1, s1), (w2, s2) in zip(r1, r2):
        np.testing.assert_array_equal(
            np.concatenate(s1.codes, axis=1), np.concatenate(s2.codes, axis=1)
        )
        assert s1.frames == s2.frames


def test_quantized_model_shards():
    cfg = configs.tiny(quant=True)
    model = Qwen3TTSModel.synthetic(cfg, seed=1)
    mesh = build_mesh(MeshPlan(dp=1, tp=2), jax.devices()[:2])
    shard_model(model, mesh)
    # quantized q/scale leaves actually live sharded on two devices
    leaf = model.params["blocks"]["attn"]["q"]["q"]
    assert len(leaf.sharding.device_set) == 2


def test_train_step_runs_and_reduces_loss():
    cfg = shardable_tiny()
    model = Qwen3TTSModel.synthetic(cfg, seed=0)
    opt = default_optimizer(lr=3e-3)
    state = init_train_state(model.params, model.cp_params, opt)
    step = make_train_step(cfg, opt, remat=False)

    batch = synthetic_batch(cfg, batch_size=2, t_text=6, t_frames=5, seed=0)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    state, m0 = step(state, batch)
    for _ in range(8):
        state, m = step(state, batch)
    assert float(m["loss"]) < float(m0["loss"])
    assert int(state.step) == 9
    assert np.isfinite(float(m["grad_norm"]))


def test_train_step_sharded_dp_tp():
    """Full train step on a dp=2, tp=2 mesh: params tp-sharded, batch
    dp-sharded, one step executes and returns finite metrics."""
    from jax.sharding import NamedSharding

    cfg = shardable_tiny()
    model = Qwen3TTSModel.synthetic(cfg, seed=0)
    mesh = build_mesh(MeshPlan(dp=2, tp=2), jax.devices()[:4])
    shard_model(model, mesh)

    opt = default_optimizer()
    state = init_train_state(model.params, model.cp_params, opt)
    step = make_train_step(cfg, opt, remat=True)

    batch = synthetic_batch(cfg, batch_size=4, t_text=6, t_frames=5, seed=1)
    data_sharding = NamedSharding(mesh, P("dp"))
    batch = {
        k: jax.device_put(jnp.asarray(v), data_sharding) for k, v in batch.items()
    }
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # updated params keep their tp sharding
    leaf = state.params["blocks"]["attn"]["q"]["w"]
    assert len(leaf.sharding.device_set) == 4


def test_lora_step_on_sharded_base():
    """LoRA adapters train against a tp-sharded frozen base: the merged
    forward runs under the mesh, the base keeps its sharding, and only
    adapter-sized state updates."""
    from jax.sharding import NamedSharding

    from qwen3_tts_tpu.training import (
        add_lora,
        init_lora_train_state,
        make_lora_train_step,
        split_lora,
    )

    cfg = shardable_tiny()
    model = Qwen3TTSModel.synthetic(cfg, seed=0)
    mesh = build_mesh(MeshPlan(dp=2, tp=2), jax.devices()[:4])
    shard_model(model, mesh)

    lora, base = split_lora(add_lora(model.params, rank=2, seed=1))
    opt = default_optimizer(lr=1e-2)
    state = init_lora_train_state(lora, opt)
    step = make_lora_train_step(cfg, opt, remat=True)

    batch = synthetic_batch(cfg, batch_size=4, t_text=6, t_frames=5, seed=1)
    data_sharding = NamedSharding(mesh, P("dp"))
    batch = {
        k: jax.device_put(jnp.asarray(v), data_sharding)
        for k, v in batch.items()
    }
    for _ in range(2):
        state, metrics = step(state, base, model.cp_params, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.any(np.asarray(state.lora["blocks"]["attn"]["q"]["lora_b"]))
    # the frozen base kept its tp sharding (untouched by the step)
    assert len(base["blocks"]["attn"]["q"]["w"].sharding.device_set) == 4


def test_sharded_serving_matches_unsharded_feedback_protocol():
    """The published decode protocol under tensor parallelism: trailing
    buffers / feedback sums / per-frame code-predictor runs are replicated
    per-slot state, the talker weights shard over tp — the fused feedback
    serve step must produce identical greedy codes either way."""
    import dataclasses

    from qwen3_tts_tpu.runtime.prompts import PromptSpec
    from qwen3_tts_tpu.runtime.sampling import SamplingConfig
    from qwen3_tts_tpu.runtime.serving import ServingEngine

    base = configs.tiny_feedback("custom")
    # cp width must equal talker width under the protocol; the tiny
    # feedback config already satisfies tp=2 divisibility (kv_heads=2)
    cfg = dataclasses.replace(base, quant=dataclasses.replace(
        base.quant, enabled=False))
    greedy = SamplingConfig(greedy=True)
    prompts = [
        PromptSpec(text_tokens=np.arange(6, dtype=np.int32) + 4,
                   speaker_id=1),
        PromptSpec(text_tokens=(np.arange(9) * 3 % 50).astype(np.int32),
                   speaker_id=0),
    ]

    model1 = Qwen3TTSModel.synthetic(cfg, seed=7)
    e1 = ServingEngine(model1, max_streams=2, chunk=8, sampling=greedy)
    r1 = e1.run(prompts, max_frames=10)

    model2 = Qwen3TTSModel.synthetic(cfg, seed=7)
    mesh = build_mesh(MeshPlan(dp=1, tp=2), jax.devices()[:2])
    shard_model(model2, mesh)
    e2 = ServingEngine(model2, max_streams=2, chunk=8, sampling=greedy)
    r2 = e2.run(prompts, max_frames=10)

    for (w1, s1), (w2, s2) in zip(r1, r2):
        np.testing.assert_array_equal(
            np.concatenate(s1.codes, axis=1),
            np.concatenate(s2.codes, axis=1),
        )
        assert s1.frames == s2.frames
        np.testing.assert_array_equal(w1, w2)


def test_train_step_sharded_feedback_protocol():
    """Fine-tuning under the published protocol on a (dp=2, tp=2) mesh:
    the teacher-forced published layout (residual sums + trailing rows)
    runs sharded and returns finite metrics."""
    import dataclasses

    from jax.sharding import NamedSharding

    base = configs.tiny_feedback("custom")
    cfg = dataclasses.replace(
        base, quant=dataclasses.replace(base.quant, enabled=False)
    )
    model = Qwen3TTSModel.synthetic(cfg, seed=0)
    mesh = build_mesh(MeshPlan(dp=2, tp=2), jax.devices()[:4])
    shard_model(model, mesh)

    opt = default_optimizer()
    state = init_train_state(model.params, model.cp_params, opt)
    step = make_train_step(cfg, opt, remat=True)

    batch = synthetic_batch(cfg, batch_size=4, t_text=6, t_frames=5, seed=1)
    data_sharding = NamedSharding(mesh, P("dp"))
    batch = {
        k: jax.device_put(jnp.asarray(v), data_sharding)
        for k, v in batch.items()
    }
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_sharded_serving_matches_unsharded_grouped_mtp_protocol():
    """The full post-fine-tune fast path (feedback protocol + MTP fps=2 +
    depth_group=3) under tensor parallelism: the grouped cp's
    dynamic-sliced heads/tables and the MTP chain must serve identical
    greedy codes sharded and unsharded."""
    import dataclasses

    from qwen3_tts_tpu.runtime.prompts import PromptSpec
    from qwen3_tts_tpu.runtime.sampling import SamplingConfig
    from qwen3_tts_tpu.runtime.serving import ServingEngine

    base = configs.tiny_feedback("custom", frames_per_step=2, depth_group=3)
    cfg = dataclasses.replace(base, quant=dataclasses.replace(
        base.quant, enabled=False))
    greedy = SamplingConfig(greedy=True)
    prompts = [
        PromptSpec(text_tokens=np.arange(6, dtype=np.int32) + 4,
                   speaker_id=1),
        PromptSpec(text_tokens=(np.arange(9) * 3 % 50).astype(np.int32),
                   speaker_id=0),
    ]

    model1 = Qwen3TTSModel.synthetic(cfg, seed=7)
    e1 = ServingEngine(model1, max_streams=2, chunk=8, sampling=greedy)
    r1 = e1.run(prompts, max_frames=10)

    model2 = Qwen3TTSModel.synthetic(cfg, seed=7)
    mesh = build_mesh(MeshPlan(dp=1, tp=2), jax.devices()[:2])
    shard_model(model2, mesh)
    e2 = ServingEngine(model2, max_streams=2, chunk=8, sampling=greedy)
    r2 = e2.run(prompts, max_frames=10)

    for (w1, s1), (w2, s2) in zip(r1, r2):
        np.testing.assert_array_equal(
            np.concatenate(s1.codes, axis=1),
            np.concatenate(s2.codes, axis=1),
        )
        np.testing.assert_array_equal(w1, w2)
