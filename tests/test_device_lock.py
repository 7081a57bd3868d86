"""Advisory device lock (device_lock.py): one engine-owning process at a
time on the shared TPU service (CLAUDE.md HBM-wedge discipline)."""

import os
import subprocess
import sys
import time

from qwen3_tts_tpu.device_lock import device_lock


def _env(path):
    # pin the lock ON regardless of the developer's shell (QWEN3_TTS_CPU=1
    # would legitimately skip it and void the contention assertions)
    return dict(
        os.environ,
        PYTHONPATH=os.path.join(os.path.dirname(__file__), "..", "src"),
        QWEN3_TTS_DEVICE_LOCK="1",
        QWEN3_TTS_CPU="0",
    )


def test_lock_blocks_second_process_until_released(tmp_path):
    lock = str(tmp_path / "dev.lock")
    hold = subprocess.Popen(
        [sys.executable, "-c",
         "import sys; from qwen3_tts_tpu.device_lock import device_lock; "
         f"assert device_lock(path={lock!r}); "
         "print('held', flush=True); import time; time.sleep(4)"],
        env=_env(lock), stdout=subprocess.PIPE, text=True,
    )
    try:
        assert hold.stdout.readline().strip() == "held"
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-c",
             "import sys; from qwen3_tts_tpu.device_lock import device_lock; "
             f"sys.exit(0 if device_lock(wait_s=1, path={lock!r}) else 3)"],
            env=_env(lock), capture_output=True,
        )
        assert r.returncode == 3            # timed out while held
        assert time.time() - t0 < 3.5       # respected its wait budget
    finally:
        hold.wait()
    r2 = subprocess.run(
        [sys.executable, "-c",
         "import sys; from qwen3_tts_tpu.device_lock import device_lock; "
         f"sys.exit(0 if device_lock(wait_s=1, path={lock!r}) else 3)"],
        env=_env(lock), capture_output=True,
    )
    assert r2.returncode == 0               # free after the holder exits


def test_lock_env_disable(tmp_path, monkeypatch):
    monkeypatch.setenv("QWEN3_TTS_DEVICE_LOCK", "0")
    assert device_lock(wait_s=0, path=str(tmp_path / "x.lock"))
