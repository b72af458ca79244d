"""Distributed execution: device mesh, population sharding, ICI selection."""
from .mesh import (
    POP_AXIS,
    initialize_multihost,
    make_mesh,
    pop_sharding,
    replicated_sharding,
)
from .sharded import evolve_sharded, sharded_generation_step

__all__ = [
    "POP_AXIS",
    "evolve_sharded",
    "initialize_multihost",
    "make_mesh",
    "pop_sharding",
    "replicated_sharding",
    "sharded_generation_step",
]
