#!/bin/sh
# Follow-up to measure_queue4.sh: recapture the fps=2 serving aggregate
# (the TPU worker crashed mid-warmup on the first attempt) with one rep of
# single-stream per arm (the 3-rep medians are already banked).
set -x
cd "$(dirname "$0")/.."

probe() {
    timeout 300 python -c "import jax, jax.numpy as jnp; print(float(jnp.arange(8.0).sum()))"
}

probe || { echo "DEVICE WEDGED before fps2 serving rerun"; exit 1; }
timeout 3600 python tools/ab_cp_batch.py --reps 1 --fps 2 --dg 5 --serving 8 \
    > /tmp/mq5_cpb_fps2_serving.log 2>&1
echo "CPB FPS2 SERVING DONE rc=$?"
