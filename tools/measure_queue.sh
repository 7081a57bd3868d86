#!/bin/sh
# Measurement queue for when the device service recovers from a wedge.
# Each step is its own process (one big-cache engine per process — see
# CLAUDE.md HBM gotcha) and logs to /tmp/mq_*.log.
#
# Ordering is risk-managed: bench.py (the headline number, proven-safe
# allocation) runs FIRST after recovery; the riskiest allocation
# (16-slot engine) runs LAST, and every step is preceded by a trivial-op
# probe so a re-wedge aborts the remaining queue instead of piling more
# engines onto a hung service (that's what extends wedges for hours).
set -x
cd "$(dirname "$0")/.."

# wait_device [budget_seconds]: bench.preflight pattern, standalone
wait_device() {
    python - "$1" <<'EOF'
import subprocess, sys, time
budget = float(sys.argv[1]) if len(sys.argv) > 1 else 12 * 3600
start = time.time()
while time.time() - start < budget:
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; print(float(jnp.arange(8.0).sum()))"],
            timeout=240, capture_output=True)
        if r.returncode == 0:
            print(f"device up after {time.time()-start:.0f}s", flush=True)
            sys.exit(0)
    except subprocess.TimeoutExpired:
        pass
    print("still wedged...", flush=True)
    time.sleep(120)
sys.exit(1)
EOF
}

wait_device || { echo "device never recovered"; exit 1; }

timeout 3000 python bench.py > /tmp/mq_bench.log 2>&1
echo "BENCH DONE rc=$?"

wait_device 1800 || { echo "wedged after bench; stopping"; exit 1; }
timeout 2400 python tools/ab_serving.py --reps 3 > /tmp/mq_ab_serving.log 2>&1
echo "AB_SERVING DONE rc=$?"

wait_device 1800 || { echo "wedged after ab_serving; stopping"; exit 1; }
timeout 2400 python tools/probe_fetch.py --reps 3 > /tmp/mq_probe_fetch.log 2>&1
echo "PROBE_FETCH DONE rc=$?"

wait_device 1800 || { echo "wedged after probe_fetch; stopping"; exit 1; }
timeout 2400 python tools/ab_scale.py --reps 3 --streams 8 --chunks 8 16 32 > /tmp/mq_scale8.log 2>&1
echo "SCALE8 DONE rc=$?"

wait_device 1800 || { echo "wedged after scale8; stopping"; exit 1; }
timeout 2400 python tools/ab_scale.py --reps 3 --streams 16 --chunks 8 16 > /tmp/mq_scale16.log 2>&1
echo "SCALE16 DONE rc=$?"

echo "MEASUREMENT QUEUE DONE"
