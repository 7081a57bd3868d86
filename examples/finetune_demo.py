#!/usr/bin/env python3
"""Fine-tuning demo: sharded train step + checkpoint/resume.

Runs on CPU (8 virtual devices) with a tiny dense model and synthetic data;
the identical code drives real multi-chip fine-tunes — only the mesh plan
and the data pipeline change.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import jax  # noqa: E402

# must run before any backend initialisation to take effect. QWEN3_TTS_CPU
# forces the CPU backend via jax.config (the TPU plugin preloads through
# sitecustomize, so a plain JAX_PLATFORMS env var is too late).
if os.environ.get("QWEN3_TTS_CPU", "0") not in ("", "0") or os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from qwen3_tts_tpu.engine import configs  # noqa: E402
from qwen3_tts_tpu.engine.api import Qwen3TTSModel  # noqa: E402
from qwen3_tts_tpu.parallel import build_mesh, shard_model  # noqa: E402
from qwen3_tts_tpu.parallel.mesh import auto_plan  # noqa: E402
from qwen3_tts_tpu.training import init_train_state, make_train_step  # noqa: E402
from qwen3_tts_tpu.training.checkpoint import (  # noqa: E402
    latest_checkpoint,
    restore_train_state,
    save_train_state,
)
from qwen3_tts_tpu.training.train import default_optimizer, synthetic_batch  # noqa: E402

cfg = configs.tiny("custom", quant=False)
n_dev = len(jax.devices())
plan = auto_plan(n_dev, tp_divisors=cfg.talker.n_kv_heads)
mesh = build_mesh(plan, jax.devices())
print(f"mesh: dp={plan.dp} tp={plan.tp}")

model = Qwen3TTSModel.synthetic(cfg, seed=0)
shard_model(model, mesh)

opt = default_optimizer(lr=3e-3)
state = init_train_state(model.params, model.cp_params, opt)
step = make_train_step(cfg, opt)

batch = synthetic_batch(cfg, batch_size=2 * plan.dp, t_text=8, t_frames=6)
sharding = NamedSharding(mesh, P("dp"))
batch = {k: jax.device_put(jnp.asarray(v), sharding) for k, v in batch.items()}

ckpt_dir = tempfile.mkdtemp(prefix="q3tts_ckpt_")
for i in range(5):
    state, metrics = step(state, batch)
    print(f"step {int(state.step)}: loss={float(metrics['loss']):.4f} "
          f"(talker {float(metrics['talker_loss']):.4f}, "
          f"cp {float(metrics['cp_loss']):.4f})")
path = save_train_state(state, ckpt_dir)

restored = restore_train_state(latest_checkpoint(ckpt_dir), state)
state2, metrics = step(restored, batch)
print(f"resumed @ step {int(state2.step)}: loss={float(metrics['loss']):.4f}")

# --- LoRA: parameter-efficient voice adaptation ------------------------------
# Adapters ride the same sharded base (frozen); gradients and Adam moments
# are adapter-sized. merge_lora folds the deltas back for zero-overhead
# inference (training/lora.py).
from qwen3_tts_tpu.training import (  # noqa: E402
    add_lora,
    init_lora_train_state,
    make_lora_train_step,
    merge_lora,
    merge_trees,
    split_lora,
)

# note: the full train step DONATES its state, so model.params' original
# buffers are gone — adapt the live post-training weights instead
lora, base = split_lora(add_lora(state2.params, rank=4, seed=1))
lopt = default_optimizer(lr=1e-2)
lstate = init_lora_train_state(lora, lopt)
lstep = make_lora_train_step(cfg, lopt)
for i in range(3):
    lstate, lmetrics = lstep(lstate, base, state2.cp_params, batch)
    print(f"lora step {int(lstate.step)}: loss={float(lmetrics['loss']):.4f}")
adapted_params = merge_lora(merge_trees(base, lstate.lora))
n_adapter = sum(x.size for x in jax.tree.leaves(lstate.lora))
n_base = sum(x.size for x in jax.tree.leaves(base))
print(f"lora done: trained {n_adapter:,} adapter params "
      f"({100 * n_adapter / n_base:.2f}% of the talker); deltas merged")
