"""Persistent XLA compile-cache helper.

This environment's remote compile service occasionally hangs a compile for
many minutes (same program later compiles in ~1 min); a persistent on-disk
executable cache makes every retry and every repeated run instant.
"""
from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    if path is None:
        path = os.environ.get(
            "PMFM_COMPILE_CACHE",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                ".jax_tpu_cache",
            ),
        )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # cache is best-effort
