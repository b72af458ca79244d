"""Source fingerprints for hardware-validated artifacts.

The Pallas interpreter draws zero random bits, so the fused kernels' PRNG
distributions can only be validated on a real chip (tools/tpu_gen_check.py).
That validation is captured as ``benchmarks/gen_check.json``; to keep it
honest, the artifact embeds a fingerprint of every source that determines
the kernel PRNG streams, and a CI test (tests/test_misc.py) fails when the
sources change without the artifact being regenerated on hardware — the
class of regression that slipped through review in round 1 (commit ea801c8:
generation-index seed aliasing).
"""
from __future__ import annotations

import hashlib
import inspect
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]
GEN_CHECK_ARTIFACT = REPO_ROOT / "benchmarks" / "gen_check.json"


def seeding_fingerprint() -> str:
    """sha256 over every source that determines the fused kernels' PRNG
    streams: the offspring kernel module (in-kernel seeding + draws), the
    whole-run kernel's seeding, and the host-side seed derivation."""
    from ..es import pipeline
    from ..kernels import evolve, generation

    h = hashlib.sha256()
    for part in (
        Path(generation.__file__).read_text(),
        # evolve.py reuses generation's _offspring_block; only its own
        # prng_seed call matters — hash the kernel body that contains it
        inspect.getsource(evolve._evolve_kernel),
        inspect.getsource(pipeline.kernel_seed),
    ):
        h.update(part.encode())
        h.update(b"\x00")
    return h.hexdigest()
