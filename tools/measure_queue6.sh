#!/bin/sh
# Per-arm serving captures: the TPU service crashed twice building the
# SECOND 8-slot serving engine in one ab_cp_batch process (kernel-fault
# restart, not the documented silent HBM wedge), so each serving aggregate
# gets its own process. Single-stream A/B medians stay from the
# same-process interleaved runs (mq4); these serving rows are one-arm-per-
# process and noted as such in PERF.md.
set -x
cd "$(dirname "$0")/.."

probe() {
    timeout 300 python -c "import jax, jax.numpy as jnp; print(float(jnp.arange(8.0).sum()))"
}

probe || { echo "DEVICE WEDGED before fps2 batched serving"; exit 1; }
timeout 3600 python tools/ab_cp_batch.py --reps 1 --fps 2 --dg 5 \
    --arms batched --serving 8 > /tmp/mq6_fps2_batched_serving.log 2>&1
echo "FPS2 BATCHED SERVING DONE rc=$?"

probe || { echo "DEVICE WEDGED before fps3 batched serving"; exit 1; }
timeout 3600 python tools/ab_cp_batch.py --reps 1 --fps 3 --dg 5 \
    --arms batched --serving 8 > /tmp/mq6_fps3_batched_serving.log 2>&1
echo "FPS3 BATCHED SERVING DONE rc=$?"

probe || { echo "DEVICE WEDGED before fps3 chain serving"; exit 1; }
timeout 3600 python tools/ab_cp_batch.py --reps 1 --fps 3 --dg 5 \
    --arms chain --serving 8 > /tmp/mq6_fps3_chain_serving.log 2>&1
echo "FPS3 CHAIN SERVING RERUN DONE rc=$?"
