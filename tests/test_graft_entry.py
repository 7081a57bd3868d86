"""Driver-contract tests for ``__graft_entry__``.

The driver imports the module and calls ``dryrun_multichip(n)`` directly —
on a host whose only real accelerator is one TPU chip. Round 1 failed that
call (MULTICHIP_r01 rc=1) because the virtual-CPU-mesh bootstrap lived only
in the CLI branch; these tests pin the self-bootstrapping behavior.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.slow
def test_dryrun_multichip_in_process():
    """Direct call in a process that already has >= 8 devices (this test
    process runs on the virtual 8-device CPU mesh) uses them as-is."""
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)
    g.dryrun_multichip(8)  # must not raise


def test_dryrun_multichip_driver_style_subprocess():
    """Exactly the driver's invocation: fresh interpreter, import the
    module, call dryrun_multichip(8). The process starts with the TPU
    plugin preloaded (sitecustomize) and no CPU-mesh env vars; the function
    must bootstrap the virtual mesh itself."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g\ng.dryrun_multichip(8)\n",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip ok" in proc.stdout
