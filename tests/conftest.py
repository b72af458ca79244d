"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

The reference has no tests at all (SURVEY.md §4); this suite is the test
pyramid it lacked. Multi-chip sharding is exercised on virtual CPU devices
(`xla_force_host_platform_device_count`), which is the fake-backend mechanism
for testing collectives without a pod.
"""
import os

# Force CPU: the session env pins JAX_PLATFORMS to the real TPU tunnel, which
# tests must never touch (single chip, slow first compile, shared with bench).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
