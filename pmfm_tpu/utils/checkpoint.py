"""Checkpoint / resume for the ES state.

The reference has no checkpointing (SURVEY.md §5.3/5.4 — its closest analog
is the readPopulationData full-state readback used only for final
inspection, Evolutionary_Strategy_OpenCL.hpp:417-430). ES state is tiny
(O(mu * D) once selection has run), so per-segment checkpointing is
essentially free; this is a deliberate capability upgrade.

Format: one ``.npz`` per checkpoint holding the ESState leaves plus the
chunk index and a config fingerprint; ``latest.npz`` is an atomic pointer.
"""
from __future__ import annotations

import dataclasses
import hashlib
import json
import os

import numpy as np

from ..es.config import ESConfig
from ..es.strategy import ESState


def config_fingerprint(cfg: ESConfig) -> str:
    payload = json.dumps(dataclasses.asdict(cfg), sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def save_checkpoint(
    directory: str | os.PathLike,
    state: ESState,
    cfg: ESConfig,
    chunk_index: int,
    tag: str = "latest",
    trajectory: np.ndarray | None = None,
) -> str:
    directory = os.fspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"{tag}.npz")
    tmp = path + ".tmp.npz"  # .npz suffix keeps np.savez from renaming it
    arrays = {f"state_{k}": np.asarray(v) for k, v in state._asdict().items()}
    if trajectory is not None:
        # best-ever-per-generation history up to state.generation, so a
        # resumed run keeps the full curve
        arrays["trajectory"] = np.asarray(trajectory, np.float32)
    np.savez(
        tmp,
        chunk_index=np.int64(chunk_index),
        fingerprint=np.bytes_(config_fingerprint(cfg).encode()),
        **arrays,
    )
    os.replace(tmp, path)
    return path


def load_checkpoint(
    directory: str | os.PathLike, cfg: ESConfig, tag: str = "latest"
) -> tuple[ESState, int, "np.ndarray | None"] | None:
    """Returns (state, chunk_index, trajectory-or-None), or None if the
    checkpoint is absent or was written with a different config."""
    path = os.path.join(os.fspath(directory), f"{tag}.npz")
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        if z["fingerprint"].item().decode() != config_fingerprint(cfg):
            return None
        fields = ESState._fields
        import jax.numpy as jnp

        state = ESState(*(jnp.asarray(z[f"state_{k}"]) for k in fields))
        traj = np.asarray(z["trajectory"]) if "trajectory" in z else None
        return state, int(z["chunk_index"]), traj
