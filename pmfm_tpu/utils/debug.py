"""Debug-mode numerical checking.

The reference's only correctness harness is Vulkan validation layers in
debug builds (SURVEY.md §5.2); races are impossible here by functional
purity, so the TPU-native debug harness checks *numerics* instead: NaN/Inf
detection on the fitness path via ``jax.experimental.checkify`` and a
jax-level nan-debug toggle. Enabled by the config ``general.isDebug`` flag
(parsed but never consulted in the reference, SURVEY.md §5.5 — live here).
"""
from __future__ import annotations

import contextlib

import jax
from jax.experimental import checkify


def checked_fitness(evaluate_fn):
    """Wrap an evaluate-like fn so NaN/Inf in its output raises with
    location info (debug builds only — adds a checkify pass)."""

    def wrapped(*args, **kw):
        def inner(*a, **k):
            out = evaluate_fn(*a, **k)
            checkify.check(
                jax.numpy.isfinite(out).all(), "non-finite fitness detected"
            )
            return out

        err, out = checkify.checkify(inner)(*args, **kw)
        err.throw()
        return out

    return wrapped


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped jax_debug_nans (catches NaNs at op granularity)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
