"""PMFM-TPU — TPU-native evolutionary FM-synthesis parameter matcher.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
reference "Survival of the Synthesis" GPU-accelerated FM parameter matcher
(the "PMFM" program): a (mu+lambda) evolutionary strategy recovers FM
synthesizer parameters that reproduce a target sound, with the whole
per-generation pipeline fused into a single XLA computation and the
population shardable across a TPU mesh.
"""

__version__ = "0.1.0"

from . import models, ops
from .es import (
    ESConfig,
    MatchResult,
    match_audio,
    match_audio_stft,
    match_many,
)
from .io import load_config, read_wav, write_wav

__all__ = [
    "ESConfig",
    "MatchResult",
    "__version__",
    "load_config",
    "match_audio",
    "match_audio_stft",
    "match_many",
    "models",
    "ops",
    "read_wav",
    "write_wav",
]
