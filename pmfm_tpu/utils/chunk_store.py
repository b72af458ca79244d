"""Per-chunk persistence for ``match_audio`` resume.

Each completed chunk writes ``chunk_NNNN.npz`` (best params, fitness,
trajectory, resynthesised audio, and the RNG key to continue from); a rerun
with the same ESConfig resumes after the last completed chunk. See
``utils.checkpoint`` for rationale — new capability over the reference
(SURVEY.md §5.3/5.4).
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..es.config import ESConfig
from .checkpoint import config_fingerprint


def _chunk_path(directory: str, i: int) -> str:
    return os.path.join(directory, f"chunk_{i:04d}.npz")


def save_chunk(directory, cfg: ESConfig, i: int, result, audio: np.ndarray, next_key) -> None:
    directory = os.fspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = _chunk_path(directory, i)
    tmp = path + ".tmp.npz"
    np.savez(
        tmp,
        fingerprint=np.bytes_(config_fingerprint(cfg).encode()),
        best_params_scaled=result.best_params_scaled,
        best_params_norm=result.best_params_norm,
        best_fitness=np.float32(result.best_fitness),
        generations_run=np.int64(result.generations_run),
        trajectory=(
            result.trajectory if result.trajectory is not None else np.zeros(0, np.float32)
        ),
        audio=audio,
        next_key=np.asarray(next_key),
    )
    os.replace(tmp, path)


def resume(directory, cfg: ESConfig, key):
    """Returns (start_chunk, results, out_audio, key) from saved chunks."""
    from ..es.pipeline import ChunkResult  # local import to avoid cycle

    directory = os.fspath(directory)
    fp = config_fingerprint(cfg)
    results, out_audio = [], []
    i = 0
    while os.path.exists(_chunk_path(directory, i)):
        with np.load(_chunk_path(directory, i)) as z:
            if z["fingerprint"].item().decode() != fp:
                break  # config changed: restart from scratch
            traj = z["trajectory"]
            results.append(
                ChunkResult(
                    best_params_scaled=z["best_params_scaled"],
                    best_params_norm=z["best_params_norm"],
                    best_fitness=float(z["best_fitness"]),
                    generations_run=int(z["generations_run"]),
                    trajectory=None if traj.size == 0 else traj,
                )
            )
            out_audio.append(z["audio"])
            key = jnp.asarray(z["next_key"])
        i += 1
    return i, results, out_audio, key
