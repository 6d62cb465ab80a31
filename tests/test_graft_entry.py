"""Driver-contract tests for __graft_entry__.py.

The driver validates multi-chip sharding by running ``dryrun_multichip(8)``
in a fresh process whose environment pins JAX to the single-chip TPU plugin
(VERDICT r1 item 1: round 1 crashed here with ok=false). Reproduce that exact
invocation: subprocess, conftest env overrides stripped, so the site hook's
platform pinning applies and the entry point must self-force the virtual CPU
mesh.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_driver_invocation():
    env = os.environ.copy()
    # Undo conftest.py's overrides so the subprocess sees the driver's world.
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(
        f for f in flags.split() if "xla_force_host_platform_device_count" not in f
    )
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)

    r = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=580,
    )
    assert r.returncode == 0, f"stdout={r.stdout}\nstderr={r.stderr}"
    assert "dryrun_multichip OK" in r.stdout
