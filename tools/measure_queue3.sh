#!/bin/sh
# Follow-up measurement queue: waits for measure_queue2.sh (if running) to
# finish, then measures the REAL code2wav decoder's device cost
# (QWEN3_TTS_BENCH_CODEC=code2wav) against the rvq headline. Same
# discipline as queue2: one engine-owning process at a time (the tools
# take /tmp/qwen3_tts_device.lock themselves), trivial-op probes between
# steps, riskiest allocation last.
set -x
cd "$(dirname "$0")/.."

# wait for the primary battery's process to exit (arg 1 = its pid file)
if [ -f "${1:-/tmp/mq2.pid}" ]; then
    MQPID=$(cat "${1:-/tmp/mq2.pid}")
    while kill -0 "$MQPID" 2>/dev/null; do sleep 60; done
fi

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

wait_device "${2:-43200}" || { echo "device never recovered"; exit 1; }

QWEN3_TTS_BENCH_CODEC=code2wav timeout 3600 python bench.py \
    > /tmp/mq3_bench_c2w.log 2>&1
echo "BENCH_C2W DONE rc=$?"

wait_device 1800 || { echo "wedged after c2w bench; stopping"; exit 1; }
QWEN3_TTS_BENCH_CODEC=code2wav timeout 2400 python bench.py --serving 8 \
    > /tmp/mq3_serving_c2w.log 2>&1
echo "SERVING_C2W DONE rc=$?"

echo "MEASUREMENT QUEUE 3 DONE"
