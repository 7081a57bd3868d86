#!/bin/sh
# Continuation of measure_queue2.sh after bench.py already succeeded
# (/tmp/mq_bench.log): the remaining A/B battery, then the code2wav codec
# benches from measure_queue3.sh. Probe timeout is 240 s — device
# first-contact through the tunnel takes ~130 s per fresh process, so the
# old 90 s probe could never see a healthy device.
set -x
cd "$(dirname "$0")/.."

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

wait_device 1800 || { echo "wedged before ab_serving; stopping"; exit 1; }
timeout 2400 python tools/ab_serving.py --reps 3 > /tmp/mq_ab_serving.log 2>&1
echo "AB_SERVING DONE rc=$?"

wait_device 1800 || { echo "wedged after ab_serving; stopping"; exit 1; }
timeout 2400 python tools/ab_serving.py --reps 3 --kv int8 \
    > /tmp/mq_ab_kv_int8.log 2>&1
echo "AB_KV_INT8 DONE rc=$?"

wait_device 1800 || { echo "wedged after ab_kv_int8; stopping"; exit 1; }
timeout 2400 python tools/probe_fetch.py --reps 3 > /tmp/mq_probe_fetch.log 2>&1
echo "PROBE_FETCH DONE rc=$?"

wait_device 1800 || { echo "wedged after probe_fetch; stopping"; exit 1; }
timeout 2400 python tools/ab_fps.py --reps 3 > /tmp/mq_ab_fps.log 2>&1
echo "AB_FPS DONE rc=$?"

wait_device 1800 || { echo "wedged after ab_fps; stopping"; exit 1; }
timeout 2400 python tools/ab_scale.py --reps 3 --streams 8 --chunks 8 16 32 > /tmp/mq_scale8.log 2>&1
echo "SCALE8 DONE rc=$?"

wait_device 1800 || { echo "wedged after scale8; stopping"; exit 1; }
timeout 2400 python tools/ab_scale.py --reps 3 --streams 16 --chunks 8 16 > /tmp/mq_scale16.log 2>&1
echo "SCALE16 DONE rc=$?"

wait_device 1800 || { echo "wedged after scale16; stopping"; exit 1; }
timeout 2400 python tools/ab_scale.py --reps 3 --streams 16 --chunks 16 --kv int8 \
    > /tmp/mq_scale16_int8.log 2>&1
echo "SCALE16_INT8 DONE rc=$?"

wait_device 1800 || { echo "wedged before c2w bench; stopping"; exit 1; }
QWEN3_TTS_BENCH_CODEC=code2wav timeout 3600 python bench.py \
    > /tmp/mq3_bench_c2w.log 2>&1
echo "BENCH_C2W DONE rc=$?"

wait_device 1800 || { echo "wedged after c2w bench; stopping"; exit 1; }
QWEN3_TTS_BENCH_CODEC=code2wav timeout 2400 python bench.py --serving 8 \
    > /tmp/mq3_serving_c2w.log 2>&1
echo "SERVING_C2W DONE rc=$?"

echo "MEASUREMENT QUEUE 2B DONE"
