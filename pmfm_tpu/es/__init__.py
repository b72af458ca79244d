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
from .strategy import ESState, evaluate, init_state, mutate, recombine, select

__all__ = [
    "ChunkResult",
    "ESConfig",
    "ESState",
    "MatchResult",
    "Population",
    "evaluate",
    "evolve",
    "generation_step",
    "init_state",
    "make_spectrum_ops",
    "match_audio",
    "match_audio_stft",
    "match_many",
    "mutate",
    "recombine",
    "select",
]
