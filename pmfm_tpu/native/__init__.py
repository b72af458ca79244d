"""Native (C++) runtime components: WAV codec, CSV logger, timers."""
from . import runtime

__all__ = ["runtime"]
