#!/bin/sh
# Measurement queue for when the device service recovers from a wedge.
# Each step is its own process (one big-cache engine per process — see
# CLAUDE.md HBM gotcha) and logs to /tmp/mq_*.log.
set -x
cd "$(dirname "$0")/.."

# wait for the device (bench.preflight pattern, standalone)
python - <<'EOF'
import subprocess, sys, time
start = time.time()
while time.time() - start < 12 * 3600:
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; print(float(jnp.arange(8.0).sum()))"],
            timeout=90, capture_output=True)
        if r.returncode == 0:
            print(f"device up after {time.time()-start:.0f}s", flush=True)
            sys.exit(0)
    except subprocess.TimeoutExpired:
        pass
    print("still wedged...", flush=True)
    time.sleep(120)
sys.exit(1)
EOF
[ $? -eq 0 ] || { echo "device never recovered"; exit 1; }

timeout 2400 python tools/ab_serving.py --reps 3 > /tmp/mq_ab_serving.log 2>&1
timeout 2400 python tools/ab_scale.py --reps 3 --streams 8 --chunks 8 16 32 > /tmp/mq_scale8.log 2>&1
timeout 2400 python tools/ab_scale.py --reps 3 --streams 16 --chunks 8 16 > /tmp/mq_scale16.log 2>&1
timeout 2400 python tools/probe_fetch.py --reps 3 > /tmp/mq_probe_fetch.log 2>&1
echo "MEASUREMENT QUEUE DONE"
timeout 3000 python bench.py > /tmp/mq_bench.log 2>&1
echo "BENCH DONE TOO"
