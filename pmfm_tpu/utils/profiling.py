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
