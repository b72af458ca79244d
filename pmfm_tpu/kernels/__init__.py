"""Pallas TPU kernels: the fused synthesis+DFT+fitness hot path."""
from .synth_fitness import DEFAULT_POP_BLOCK, TIME_BLOCK, fused_synth_fitness

__all__ = ["DEFAULT_POP_BLOCK", "TIME_BLOCK", "fused_synth_fitness"]
