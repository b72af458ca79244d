"""Test configuration: force an 8-device virtual CPU mesh before JAX use.

The reference has no tests at all (SURVEY.md §4); this suite is the test
pyramid it lacked. Multi-chip sharding is exercised on virtual CPU devices
(`xla_force_host_platform_device_count`), which is the fake-backend mechanism
for testing collectives without a pod.

Environment quirks handled here:
* The session's sitecustomize registers the real-TPU "axon" backend and
  overrides ``jax_platforms`` to "axon,cpu" *programmatically*, so the
  JAX_PLATFORMS env var alone is not enough — every dispatch then pings the
  TPU relay and adds seconds per compile. We force the config back to pure
  CPU before any JAX use.
* XLA compiles are slow on this 2-vCPU box (~1-2s each), so a persistent JAX
  compilation cache makes re-runs cheap.
"""
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, _REPO)

import jax

jax.config.update("jax_platforms", "cpu")  # undo axon sitecustomize override
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
