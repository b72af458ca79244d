"""Wavetable oscillator primitives.

The reference synthesises with a 32768-entry sine wavetable
(``Evolutionary_Strategy.hpp:325-332``):

    wavetable[i] = sinf(i / (wavetableSize - 1) * 2 * pi)

and looks it up with a truncating ``(unsigned int)`` cast of a float phase
accumulator kept in "wavetable units" in ``[0, wavetableSize)``
(``kernels/ocl_program.cl:312-329``).

On TPU a dynamic gather from a 32K-entry table is VPU-hostile; the table is
itself just a sampled sine, so the TPU-native oscillator evaluates the sine
closed-form on the VPU:

* ``osc_mode="floor"``  — ``sin(floor(pos) * 2*pi / (size-1))``: bit-for-bit
  the same *function* the reference table lookup computes (up to libm
  rounding), used for parity tests against the CPU/FFTW oracle.
* ``osc_mode="exact"``  — ``sin(pos * 2*pi / (size-1))``: drops the staircase
  quantisation; strictly higher audio quality, same cost.
* ``osc_mode="table"``  — a real ``jnp.take`` gather from a device-resident
  table, kept for completeness/ablation (reference semantics incl. the
  ``wavetableSize`` config knob that the reference parses but ignores,
  SURVEY.md §5.6).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_WAVETABLE_SIZE = 32768  # Evolutionary_Strategy.hpp:197 (hardcoded)
DEFAULT_SAMPLE_RATE = 44100  # Evolutionary_Strategy.hpp:196

OSC_MODES = ("floor", "exact", "table")


def build_wavetable(size: int = DEFAULT_WAVETABLE_SIZE, dtype=np.float32) -> np.ndarray:
    """Host-side sine wavetable, identical to Objective::initWavetable
    (Evolutionary_Strategy.hpp:325-332)."""
    i = np.arange(size, dtype=np.float64)
    return np.sin(i / (size - 1.0) * 2.0 * math.pi).astype(dtype)


def wrap_pos(pos: jax.Array, size: float) -> jax.Array:
    """Wrap a phase accumulator that only grows: ``if (p >= size) p -= size``.

    Mirrors the positive-only wrap of the carrier-phase in the reference
    (kernels/ocl_program.cl:321-322). A single conditional subtract is
    sufficient because per-sample increments are < size for all in-range
    parameters.
    """
    return jnp.where(pos >= size, pos - size, pos)


def wrap_pos_both(pos: jax.Array, size: float) -> jax.Array:
    """Wrap a phase accumulator that can also go negative
    (kernels/ocl_program.cl:325-328)."""
    pos = jnp.where(pos >= size, pos - size, pos)
    return jnp.where(pos < 0.0, pos + size, pos)


def make_osc(osc_mode: str, wavetable_size: int, wavetable: jax.Array | None = None):
    """Return ``osc(pos) -> sample`` for phase in wavetable units [0, size)."""
    if osc_mode not in OSC_MODES:
        raise ValueError(f"osc_mode must be one of {OSC_MODES}, got {osc_mode!r}")
    scale = 2.0 * math.pi / (wavetable_size - 1.0)
    if osc_mode == "floor":

        def osc(pos):
            return jnp.sin(jnp.floor(pos) * scale)

    elif osc_mode == "exact":

        def osc(pos):
            return jnp.sin(pos * scale)

    else:  # table
        wt = wavetable if wavetable is not None else jnp.asarray(build_wavetable(wavetable_size))

        def osc(pos):
            idx = jnp.clip(pos.astype(jnp.int32), 0, wavetable_size - 1)
            return jnp.take(wt, idx)

    return osc
