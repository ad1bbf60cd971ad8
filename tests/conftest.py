"""Force CPU platform with 8 virtual devices for all tests.

The container's sitecustomize registers the remote-TPU "axon" PJRT
backend and force-sets jax_platforms="axon,cpu" via jax.config, so both
the env var AND a post-import config update are needed to keep tests on
the local CPU (eager per-op dispatch over the TPU tunnel would crawl).

The 8 virtual CPU devices let sharding tests exercise a real Mesh
without TPU pods (SURVEY.md §4 test plan item 5).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402  (after env setup)

jax.config.update("jax_platforms", "cpu")
