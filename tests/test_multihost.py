"""Multi-process (multi-host analog) execution test: runs
scripts/multihost_dryrun.py, which spawns 2 CPU processes that form a
global (dp, rows) mesh via jax.distributed and execute a row-sharded
batched encrypted read with cross-process collectives (the DCN-axis
pattern of BASELINE configs 4-5)."""

import os
import subprocess
import sys


def test_multihost_dryrun():
    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "multihost_dryrun.py")
    env = dict(os.environ)
    # strip the conftest's 8-device flag; the workers set their own
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags)
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [sys.executable, script, "--port", "29531"],
        capture_output=True, text=True, timeout=560, env=env)
    assert res.returncode == 0, (res.stdout[-2000:], res.stderr[-2000:])
    assert "multihost dryrun: OK" in res.stdout
