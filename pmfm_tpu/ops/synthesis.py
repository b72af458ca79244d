"""FM synthesis topologies, TPU-native.

The reference evaluates one GPU thread per candidate, each running a
sequential per-sample phase recurrence (kernels/ocl_program.cl:280-443 and the
CPU ground truth Objective::synthesiseAudio* in
Evolutionary_Strategy.hpp:368-495). The loop-carried dependency
(``pos += k * cur_sample``) makes time inherently sequential, so the
TPU-native mapping is: ``lax.scan`` over time, with every per-step op
vectorised across the whole population on the VPU (population = lane axis).

Three topologies (model families), semantics = CPU ground truth:

* ``fm2``          — 2-operator FM, 4 params  [modFreq, modIdx, carrierFreq, amp]
                     (Evolutionary_Strategy.hpp:368-402)
* ``fm3_series``   — 3-operator serial chain, 6 params — the variant the
                     reference actually benchmarks (kernel list
                     Evolutionary_Strategy_OpenCL.hpp:117)
                     (Evolutionary_Strategy.hpp:403-449)
* ``fm3_parallel`` — 3 x 2-operator pairs averaged, 12 params
* ``fm{k}_series`` — generic k-operator serial chain (k >= 3), 2k params —
  capability extension; k=3 reduces to the reference variant
* ``fm{k}_parallel`` — generic bank of k 2-op pairs averaged (k >= 2),
  4k params — capability extension; k=3 reduces to the reference variant
                     (Evolutionary_Strategy.hpp:450-495)

Unlike the reference CPU Objective (whose phase accumulators are member
variables carried *across* candidates — a documented quirk, SURVEY.md §7.4),
every candidate starts at phase 0, matching the GPU kernels.

Audio is produced **time-major** ``(n_samples, pop)``: that is the natural
layout of a time scan, the Hann window broadcasts over lanes, and the
downstream spectrum matmul contracts over time without ever transposing the
largest array in the pipeline.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .wavetable import (
    DEFAULT_SAMPLE_RATE,
    DEFAULT_WAVETABLE_SIZE,
    make_osc,
    wrap_pos,
    wrap_pos_both,
)

TOPOLOGY_DIMS = {"fm2": 4, "fm3_series": 6, "fm3_parallel": 12}
_SERIES_RE = __import__("re").compile(r"^fm(\d+)_series$")


_PARALLEL_RE = __import__("re").compile(r"^fm(\d+)_parallel$")


def parallel_pairs(topology: str):
    """Pair count k for the generic parallel bank ``fm{k}_parallel``
    (k >= 2; ``fm3_parallel`` is the reference Triple variant,
    Evolutionary_Strategy.hpp:450-495 — k independent 2-op pairs, outputs
    averaged). Returns None for non-parallel topologies."""
    m = _PARALLEL_RE.match(topology)
    if m and int(m.group(1)) >= 2:
        return int(m.group(1))
    return None


def series_ops(topology: str):
    """Operator count k for the generic serial chain ``fm{k}_series``
    (k >= 3; ``fm3_series`` is the reference DoubleSeries,
    Evolutionary_Strategy.hpp:403-449 — larger k extends the same pattern:
    op j modulates op j+1, the last operator's freq*index is the output
    amplitude). Returns None for non-series topologies."""
    m = _SERIES_RE.match(topology)
    if m and int(m.group(1)) >= 3:
        return int(m.group(1))
    return None


def topology_dims(topology: str) -> int:
    """Parameter count for any supported topology (2 per series operator)."""
    if topology in TOPOLOGY_DIMS:
        return TOPOLOGY_DIMS[topology]
    k = series_ops(topology)
    if k is not None:
        return 2 * k
    k = parallel_pairs(topology)
    if k is not None:
        return 4 * k
    raise ValueError(
        f"unknown topology {topology!r}; options {list(TOPOLOGY_DIMS)} "
        f"or 'fm<k>_series' (k >= 3) / 'fm<k>_parallel' (k >= 2)"
    )


def scale_params(values: jax.Array, mins: jax.Array, maxs: jax.Array) -> jax.Array:
    """Map normalised genes in [0,1] to synthesis parameter ranges.

    Mirrors the per-kernel scaling (kernels/ocl_program.cl:295-298) and
    Objective::scaleParams (Evolutionary_Strategy.hpp:567-576).
    """
    return mins + values * (maxs - mins)


def _check_topology(topology: str, num_dims: int):
    want = topology_dims(topology)
    if num_dims != want:
        raise ValueError(f"topology {topology} needs {want} dims, got {num_dims}")


def synthesize(
    params_scaled: jax.Array,
    n_samples: int,
    topology: str = "fm3_series",
    *,
    wavetable_size: int = DEFAULT_WAVETABLE_SIZE,
    sample_rate: int = DEFAULT_SAMPLE_RATE,
    osc_mode: str = "floor",
    wavetable: jax.Array | None = None,
    unroll: int = 8,
    engine: str = "scan",
    out_dtype=jnp.float32,
) -> jax.Array:
    """Batched FM synthesis.

    Args:
      params_scaled: ``(pop, dims)`` already-scaled synth parameters.
      n_samples: samples per candidate (the reference's AUDIO_WAVE_FORM_SIZE).
      engine: ``"scan"`` (sequential recurrence, reference bit-parity) or
        ``"scanless"`` (blocked prefix-sum formulation, see ops/scanless.py —
        the fast TPU path; ignores ``osc_mode``/``wavetable``).

    Returns:
      ``(n_samples, pop)`` float32 audio (time-major; see module docstring).
    """
    _check_topology(topology, params_scaled.shape[-1])
    if engine == "scanless":
        from .scanless import synthesize_scanless

        return synthesize_scanless(
            params_scaled,
            n_samples,
            topology,
            wavetable_size=wavetable_size,
            sample_rate=sample_rate,
            out_dtype=out_dtype,
        )
    if engine != "scan":
        raise ValueError(f"engine must be 'scan' or 'scanless', got {engine!r}")
    p = params_scaled.astype(jnp.float32)
    osc = make_osc(osc_mode, wavetable_size, wavetable)
    w2sr = jnp.float32(wavetable_size / float(sample_rate))  # w2srRatio, Evolutionary_Strategy.hpp:203
    size = jnp.float32(wavetable_size)
    pop = p.shape[0]
    zeros = jnp.zeros((pop,), jnp.float32)

    if topology == "fm2":
        # Objective::synthesiseAudio (Evolutionary_Strategy.hpp:368-402)
        mod_depth = p[:, 0] * p[:, 1]
        carrier_freq = p[:, 2]
        amp = p[:, 3]
        inc1 = w2sr * p[:, 0]

        def step(carry, _):
            pos1, pos2 = carry
            cur = osc(pos1) * mod_depth + carrier_freq
            pos1 = wrap_pos(pos1 + inc1, size)
            out = osc(pos2) * amp
            pos2 = wrap_pos_both(pos2 + w2sr * cur, size)
            return (pos1, pos2), out

        init = (zeros, zeros)

    elif series_ops(topology):
        # generic k-operator serial chain; k=3 is the reference DoubleSeries
        # (Objective::synthesiseAudioDoubleSeries,
        # Evolutionary_Strategy.hpp:403-449) — op j's output modulates
        # op j+1's phase; the final operator's freq*index is the amplitude
        kn = series_ops(topology)
        ms = [p[:, 2 * j] * p[:, 2 * j + 1] for j in range(kn)]
        cs = [p[:, 2 * j + 3] for j in range(kn - 1)]
        inc1 = w2sr * p[:, 1]

        def step(carry, _):
            poss = list(carry)
            cur = osc(poss[0]) * ms[0] + cs[0]
            news = [wrap_pos(poss[0] + inc1, size)]
            for j in range(1, kn - 1):
                nxt_cur = osc(poss[j]) * ms[j] + cs[j]
                news.append(wrap_pos_both(poss[j] + w2sr * cur, size))
                cur = nxt_cur
            out = osc(poss[kn - 1]) * ms[kn - 1]
            news.append(wrap_pos_both(poss[kn - 1] + w2sr * cur, size))
            return tuple(news), out

        init = tuple(zeros for _ in range(kn))

    elif parallel_pairs(topology):  # fm{k}_parallel
        # Objective::synthesiseAudioTriple (Evolutionary_Strategy.hpp:450-495)
        # generalized to k pairs (k=3 = the reference Triple variant)
        kp = parallel_pairs(topology)
        p4 = p.reshape(pop, kp, 4)
        mod_depth = p4[:, :, 0] * p4[:, :, 1]  # (pop, k)
        carrier_freq = p4[:, :, 2]
        amp = p4[:, :, 3]
        inc1 = w2sr * p4[:, :, 0]
        zerosk = jnp.zeros((pop, kp), jnp.float32)

        def step(carry, _):
            pos1, pos2 = carry
            cur = osc(pos1) * mod_depth + carrier_freq
            pos1 = wrap_pos(pos1 + inc1, size)
            outs = osc(pos2) * amp
            pos2 = wrap_pos_both(pos2 + w2sr * cur, size)
            return (pos1, pos2), jnp.mean(outs, axis=-1)

        init = (zerosk, zerosk)

    else:
        raise ValueError(f"unknown topology {topology!r}")

    _, audio = jax.lax.scan(step, init, None, length=n_samples, unroll=unroll)
    return audio.astype(out_dtype)  # (n_samples, pop)


def synthesize_single(
    params_scaled: jax.Array, n_samples: int, topology: str = "fm3_series", **kw
) -> jax.Array:
    """Synthesize one candidate; returns ``(n_samples,)``. Host-resynthesis
    analog of main.cpp:270-275."""
    return synthesize(params_scaled[None, :], n_samples, topology, **kw)[:, 0]
