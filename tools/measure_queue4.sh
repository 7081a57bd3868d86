#!/bin/sh
# Round-4 measurement queue: the cp-batch A/B on the two recovery shapes
# (VERDICT r3 #2a), single-stream + 8-stream serving per arm.
# Each step is its own process (one big-cache engine per process — see
# CLAUDE.md HBM gotcha) and logs to /tmp/mq4_*.log; a trivial-op probe
# precedes each step so a re-wedge aborts the queue instead of piling
# engines onto a hung service.
set -x
cd "$(dirname "$0")/.."

probe() {
    timeout 300 python -c "import jax, jax.numpy as jnp; print(float(jnp.arange(8.0).sum()))"
}

probe || { echo "DEVICE WEDGED before fps2"; exit 1; }
timeout 3600 python tools/ab_cp_batch.py --reps 3 --fps 2 --dg 5 --serving 8 \
    > /tmp/mq4_cpb_fps2.log 2>&1
echo "CPB FPS2 DONE rc=$?"

probe || { echo "DEVICE WEDGED before fps3"; exit 1; }
timeout 3600 python tools/ab_cp_batch.py --reps 3 --fps 3 --dg 5 --serving 8 \
    > /tmp/mq4_cpb_fps3.log 2>&1
echo "CPB FPS3 DONE rc=$?"
