#!/bin/sh
# Round-4 queue, part 3: the raw-import audit row (VERDICT r3 #4's TTFA
# budget check) through bench's crash-contained --real-row path, then the
# remaining per-arm serving captures for the cp-batch decision. Every step
# is its own process; wait_device rides out the ~15-min post-crash wedges.
set -x
cd "$(dirname "$0")/.."

wait_device() {
    python - <<'EOF'
import subprocess, sys, time
start = time.time()
while time.time() - start < 2400:
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; print(float(jnp.arange(8.0).sum()))"],
            timeout=300, capture_output=True)
        if r.returncode == 0:
            print(f"device up after {time.time()-start:.0f}s", flush=True)
            sys.exit(0)
    except subprocess.TimeoutExpired:
        pass
    print("still wedged...", flush=True)
    time.sleep(90)
sys.exit(1)
EOF
}

wait_device || { echo "DEVICE NEVER RECOVERED (step1)"; exit 1; }
timeout 3600 python bench.py --real-row raw_import_fps1 \
    > /tmp/mq7_raw_import_row.log 2>&1
echo "RAW IMPORT ROW DONE rc=$?"

wait_device || { echo "DEVICE NEVER RECOVERED (step2)"; exit 1; }
timeout 3600 python tools/ab_cp_batch.py --fps 3 --dg 5 \
    --arms batched --serving 8 --serving-only \
    > /tmp/mq7_fps3_batched_serving.log 2>&1
echo "FPS3 BATCHED SERVING DONE rc=$?"

wait_device || { echo "DEVICE NEVER RECOVERED (step3)"; exit 1; }
timeout 3600 python tools/ab_cp_batch.py --fps 2 --dg 5 \
    --arms chain --serving 8 --serving-only \
    > /tmp/mq7_fps2_chain_serving.log 2>&1
echo "FPS2 CHAIN SERVING DONE rc=$?"

wait_device || { echo "DEVICE NEVER RECOVERED (step4)"; exit 1; }
timeout 3600 python tools/ab_cp_batch.py --fps 2 --dg 5 \
    --arms batched --serving 8 --serving-only \
    > /tmp/mq7_fps2_batched_serving.log 2>&1
echo "FPS2 BATCHED SERVING DONE rc=$?"

wait_device || { echo "DEVICE NEVER RECOVERED (step5)"; exit 1; }
timeout 3600 python tools/ab_cp_batch.py --fps 3 --dg 5 \
    --arms chain --serving 8 --serving-only \
    > /tmp/mq7_fps3_chain_serving.log 2>&1
echo "FPS3 CHAIN SERVING RERUN DONE rc=$?"
