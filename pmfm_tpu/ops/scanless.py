"""Scanless FM synthesis: phase recurrences as blocked prefix sums.

The reference treats synthesis as inherently sequential — one GPU thread
walks all N samples because ``pos += k * cur_sample`` is a loop-carried
dependency (kernels/ocl_program.cl:312-329), and our ``lax.scan`` engine
mirrors that. But the recurrence is *linear in the phase*: every oscillator's
phase is an exclusive prefix sum of the previous oscillator's output,

    pos1[t] = t * inc1                          (no feedback at all)
    pos2[t] = w2sr * sum_{s<t} cur1[s]
    pos3[t] = w2sr * sum_{s<t} cur2[s]

so the whole synthesis is 2-3 rounds of (elementwise sine -> cumsum along
time), each fully parallel across time *and* population. On TPU the cumsum
is computed as a two-level blocked prefix sum whose inner step is a
(C x C) lower-triangular matmul on the MXU — no serial scan remains.

As a standalone XLA computation this matches the scan engine's speed
(both ~5.5ms at pop 2^15, N=1024: HBM traffic of the (N, pop)
intermediates dominates either way); its real payoff is that the
formulation maps into the fused Pallas kernel (kernels/synth_fitness.py)
where the intermediates never leave VMEM and the whole evaluate drops to
~1ms.

Because a phase only matters modulo the oscillator period, every
contribution is reduced mod ``wavetable_size`` *before* summation (mod is a
ring homomorphism, so blockwise ``mod``s commute with the prefix sum). All
intermediates then stay below ~128*WTS regardless of N, bounding the f32
phase error at ~5e-5 rad for any audio length.

Semantics note: the reference wraps phases by WAVETABLE_SIZE while its
wavetable's period is WAVETABLE_SIZE-1 samples (wavetable[i] =
sin(i/(WTS-1) * 2pi), Evolutionary_Strategy.hpp:325-332) — each wrap
therefore injects a 2pi/(WTS-1) phase glitch. The scanless engine uses a
periodic oscillator ``sin(2pi * pos / WTS)`` for which wrapping is the
identity, i.e. it computes the *intended* FM synthesis exactly; relative to
the reference this rescales all frequencies by WTS/(WTS-1) (= 1.00003, a
thirtieth of a cent — far below the spectral-fitness bin width). The scan
engine with ``osc_mode="floor"`` remains the bit-parity path
(SURVEY.md §7.4: implement the intended algorithm, keep a compat mode).
"""
from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .synthesis import parallel_pairs, series_ops
from .wavetable import DEFAULT_SAMPLE_RATE, DEFAULT_WAVETABLE_SIZE


@lru_cache(maxsize=16)
def _tri(n: int) -> np.ndarray:
    """Strictly-lower-triangular ones (exclusive-prefix matmul operand)."""
    return np.tril(np.ones((n, n), np.float32), k=-1)


def exclusive_cumsum_mod(x: jax.Array, modulus: float, block: int = 128) -> jax.Array:
    """Exclusive prefix sum along axis 0 of time-major ``(N, P)``, valid
    modulo ``modulus``; result in ``[0, modulus)``.

    Two-level blocked algorithm, MXU-friendly:
      * per element: reduce mod m;
      * intra-block: ``(C,C)`` strictly-lower-triangular matmul;
      * inter-block: block sums mod m -> tiny exclusive prefix -> broadcast.
    """
    n, p = x.shape
    if n % block:
        block = math.gcd(n, block) or 1
    nb = n // block
    m = jnp.float32(modulus)
    xm = jnp.mod(x, m)  # [0, m) per element
    xb = xm.reshape(nb, block, p)
    intra = jnp.einsum(
        "ct,btp->bcp", jnp.asarray(_tri(block)), xb,
        precision=jax.lax.Precision.HIGHEST,
    )  # < block*m
    sums = jnp.mod(jnp.sum(xb, axis=1), m)  # (nb, P), < m
    offsets = jnp.einsum(
        "bc,cp->bp", jnp.asarray(_tri(nb)), sums,
        precision=jax.lax.Precision.HIGHEST,
    )  # < nb*m
    return jnp.mod(intra + offsets[:, None, :], m).reshape(n, p)


def synthesize_scanless(
    params_scaled: jax.Array,
    n_samples: int,
    topology: str = "fm3_series",
    *,
    wavetable_size: int = DEFAULT_WAVETABLE_SIZE,
    sample_rate: int = DEFAULT_SAMPLE_RATE,
    cumsum_block: int = 128,
    out_dtype=jnp.float32,
) -> jax.Array:
    """Batched FM synthesis without a serial scan. Returns ``(N, pop)``.

    Same parameter semantics as ``synthesis.synthesize`` (CPU ground truth,
    Evolutionary_Strategy.hpp:368-495); oscillator period = wavetable_size
    (see module docstring).
    """
    p = params_scaled.astype(jnp.float32)
    pop = p.shape[0]
    w2sr = jnp.float32(wavetable_size / float(sample_rate))
    omega = jnp.float32(2.0 * math.pi / wavetable_size)
    wts = jnp.float32(wavetable_size)
    t = jnp.arange(n_samples, dtype=jnp.float32)[:, None]  # (N,1)

    def osc(pos):  # pos already in [0, wts)
        return jnp.sin(omega * pos)

    cumsum = partial(exclusive_cumsum_mod, modulus=wavetable_size, block=cumsum_block)

    def two_op(modf, modi, cf, amp):
        m = modf * modi
        pos1 = jnp.mod(t * jnp.mod(w2sr * modf, wts)[None, :], wts)
        cur = osc(pos1) * m[None, :] + cf[None, :]
        pos2 = cumsum(w2sr * cur)
        return osc(pos2) * amp[None, :]

    if topology == "fm2":
        return two_op(p[:, 0], p[:, 1], p[:, 2], p[:, 3]).astype(out_dtype)

    kn = series_ops(topology)
    if kn:
        # generic k-operator serial chain (k=3 = the reference DoubleSeries)
        ms = [p[:, 2 * j] * p[:, 2 * j + 1] for j in range(kn)]
        cs = [p[:, 2 * j + 3] for j in range(kn - 1)]
        pos = jnp.mod(t * jnp.mod(w2sr * p[:, 1], wts)[None, :], wts)
        cur = osc(pos) * ms[0][None, :] + cs[0][None, :]
        for j in range(1, kn - 1):
            pos = cumsum(w2sr * cur)
            cur = osc(pos) * ms[j][None, :] + cs[j][None, :]
        pos = cumsum(w2sr * cur)
        return (osc(pos) * ms[kn - 1][None, :]).astype(out_dtype)

    kp = parallel_pairs(topology)
    if kp:
        p4 = p.reshape(pop, kp, 4)
        outs = [
            two_op(p4[:, j, 0], p4[:, j, 1], p4[:, j, 2], p4[:, j, 3])
            for j in range(kp)
        ]
        return (sum(outs) / jnp.float32(kp)).astype(out_dtype)

    raise ValueError(f"unknown topology {topology!r}")
