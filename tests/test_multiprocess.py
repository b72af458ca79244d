"""True multi-process distributed tests (tools/multiprocess_check.py).

Everything else in the suite shards over 8 virtual devices inside one
process; these spawn REAL separate processes wired up with
``jax.distributed.initialize`` (the pod path, parallel.initialize_multihost)
and run the sharded matcher with its top-mu merge collectives crossing
process boundaries over XLA's Gloo CPU transport — the single-machine
analog of multi-host DCN. Asserts every process computes the identical
replicated result.

Parametrised over process count and mesh rank (VERDICT r1 item 9):
2 and 4 processes on the 1-D pop mesh, plus a 2-D (pop x frame) mesh where
the framewise-fitness psum AND the top-mu all-gather both cross processes.
"""
import os
import subprocess
import sys

import pytest

TOOL = os.path.join(os.path.dirname(__file__), "..", "tools",
                    "multiprocess_check.py")


@pytest.mark.parametrize(
    "procs,devs,mesh2d",
    [(2, 2, False), (4, 2, False), (4, 2, True)],
    ids=["2proc-1d", "4proc-1d", "4proc-2d-pop-x-frame"],
)
def test_multi_process_sharded_match(procs, devs, mesh2d):
    env = dict(os.environ)
    # the child processes own their platform/device-count setup; drop the
    # conftest's in-process test settings
    env.pop("XLA_FLAGS", None)
    cmd = [sys.executable, os.path.abspath(TOOL),
           "--procs", str(procs), "--devs", str(devs)]
    if mesh2d:
        cmd.append("--mesh2d")
    out = subprocess.run(env=env, args=cmd, capture_output=True, text=True,
                         timeout=560)
    assert out.returncode == 0, out.stdout + out.stderr
    assert f"OK: {procs} processes" in out.stdout
    assert "disagree" not in out.stdout
