"""True multi-process distributed test (tools/multiprocess_check.py).

Everything else in the suite shards over 8 virtual devices inside one
process; this spawns REAL separate processes wired up with
``jax.distributed.initialize`` (the pod path, parallel.initialize_multihost)
and runs the sharded matcher with its top-mu merge collectives crossing
process boundaries over XLA's Gloo CPU transport — the single-machine
analog of multi-host DCN. Asserts every process computes the identical
replicated result.
"""
import os
import subprocess
import sys

TOOL = os.path.join(os.path.dirname(__file__), "..", "tools",
                    "multiprocess_check.py")


def test_two_process_sharded_match():
    env = dict(os.environ)
    # the child processes own their platform/device-count setup; drop the
    # conftest's in-process test settings
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.abspath(TOOL), "--procs", "2", "--devs", "2"],
        env=env, capture_output=True, text=True, timeout=560,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "OK: 2 processes" in out.stdout
    assert "disagree" not in out.stdout
