"""Device mesh construction and multi-host initialisation.

The reference is strictly single-device (SURVEY.md §2.4 — no NCCL/MPI
anywhere; its only "transport" is PCIe staging copies). Scaling is therefore
a new TPU-native design: the population axis is the one parallelism axis, and
it shards over a 1-D ``jax.sharding.Mesh`` whose collectives ride ICI within
a slice and DCN across slices.
"""
from __future__ import annotations

import os
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

POP_AXIS = "pop"
FRAME_AXIS = "frame"  # optional second axis: STFT-frame sharding (SURVEY §5.7)


def make_mesh(
    shape: Sequence[int] | None = None,
    axis_names: Sequence[str] = (POP_AXIS,),
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build the population-sharding mesh.

    Default: all local devices on one ``pop`` axis. A multi-dim shape is
    accepted for future axes (e.g. ("pop", "frame") for frame-sharded long
    targets, SURVEY.md §5.7) — the ES only requires the ``pop`` axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None or len(shape) == 0:
        shape = (len(devices),)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {tuple(shape)} needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, tuple(axis_names[: arr.ndim]))


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """``jax.distributed.initialize`` wrapper (multi-host process groups).

    No-ops when the environment provides no coordination info and no explicit
    arguments (single-host case), so it is always safe to call from the CLI.
    """
    if coordinator_address is None and not (
        os.environ.get("COORDINATOR_ADDRESS")
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
    ):
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def pop_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec(POP_AXIS))
