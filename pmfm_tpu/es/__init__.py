"""Evolutionary-strategy engine: config, stage primitives, fused pipeline."""
from .config import ESConfig
from .pipeline import (
    ChunkResult,
    MatchResult,
    Population,
    evolve,
    generation_step,
    make_spectrum_ops,
    match_audio,
    match_audio_stft,
    match_many,
)
from .staged import PursuitResult, match_parallel_pursuit
from .strategy import ESState, evaluate, init_state, mutate, recombine, select

__all__ = [
    "ChunkResult",
    "ESConfig",
    "ESState",
    "MatchResult",
    "Population",
    "PursuitResult",
    "evaluate",
    "evolve",
    "generation_step",
    "init_state",
    "make_spectrum_ops",
    "match_audio",
    "match_audio_stft",
    "match_many",
    "match_parallel_pursuit",
    "mutate",
    "recombine",
    "select",
]
