"""Device-side tracing — the TPU equivalent of the reference's profiling
hooks (SURVEY.md §5.1: OpenCL CL_QUEUE_PROFILING_ENABLE, Vulkan timestamp
query pools).

``trace(path)`` wraps a region in a ``jax.profiler`` trace viewable in
TensorBoard/Perfetto; ``annotate(name)`` labels sub-regions so per-stage
device time is attributable, like the reference's named per-kernel timers.
"""
from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def trace(log_dir: str | os.PathLike):
    """Capture a device trace for the enclosed region."""
    jax.profiler.start_trace(os.fspath(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-region context (TraceAnnotation) for stage attribution."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def maybe_trace(log_dir: str | None):
    if log_dir is None:
        yield
    else:
        with trace(log_dir):
            yield


def device_sync(x):
    """Reliable device synchronisation for timing loops.

    ``jax.block_until_ready`` on SCALAR outputs misbehaves under the axon
    dev-tunnel backend: it has been observed both returning before the
    device finished (bogus ~0 ms timings) and, since 2026-08-20, HANGING
    indefinitely on programs that execute fine (bench_suite population at
    pop 2^11 — the same program syncs instantly via np.asarray).
    Materialising every leaf on the host is the sync that actually works on
    every backend. Returns ``x`` unchanged (device values untouched).
    """
    import numpy as np

    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf)
    return x
