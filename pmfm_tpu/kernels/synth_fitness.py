"""Fused Pallas kernel: FM synthesis + windowed DFT + spectral fitness.

The reference's stages 4-7 (synthesisePopulation* -> applyWindowPopulation ->
clFFT -> fitnessPopulation, SURVEY.md §2.2) with zero HBM traffic for the
intermediates: per population block, the candidate audio is synthesised into
VMEM scratch via the scanless prefix-sum formulation (ops/scanless.py),
pushed through the window-folded DFT matmuls on the MXU, and reduced to one
fitness scalar per candidate — candidate audio NEVER exists in HBM (the
reference's largest buffer, outputAudio at popLen*N*4B,
Evolutionary_Strategy_OpenCL.hpp:289).

Grid: one program per population block of ``PB`` candidates. The DFT cos/sin
matrices (bf16, window and 1/(N*windowFactor) normalisation folded in,
ops/spectral.py) and the target spectrum are VMEM-resident across the whole
grid (constant index map). Phase prefix sums run block-sequentially over
time inside the kernel: per time block, a strictly-lower-triangular (C,C)
MXU matmul gives intra-block exclusive phases and a (1,PB) register carries
the running offset — all three oscillators advance in the same time loop.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.wavetable import DEFAULT_SAMPLE_RATE, DEFAULT_WAVETABLE_SIZE

DEFAULT_POP_BLOCK = 512
TIME_BLOCK = 128


def _tri_strict(c: int) -> np.ndarray:
    return np.tril(np.ones((c, c), np.float32), k=-1)


def _kernel(
    params_ref,  # (D, PB) f32  — transposed: lanes = candidates
    dft_ref,  # (N, 2K) bf16 — [cos | sin] concatenated (one MXU pass)
    target_ref,  # (1, K) f32
    tri_ref,  # (C, C) f32 strictly lower triangular
    fitness_ref,  # (G, PB) f32 out — full array; program i writes row i
    audio_scratch,  # (N, PB) bf16 VMEM
    *,
    topology: str,
    n: int,
    pb: int,
    k: int,
    c: int,
    wts: float,
    w2sr: float,
):
    omega = jnp.float32(2.0 * math.pi / wts)
    wtsf = jnp.float32(wts)
    w2srf = jnp.float32(w2sr)
    nb = n // c
    tri = tri_ref[:]

    p = params_ref[:]  # (D, PB)

    def osc(pos):
        return jnp.sin(omega * pos)

    def row(i):  # (1, PB)
        return p[i : i + 1, :]

    # strictly-lower-triangular matmul: exclusive intra-block prefix sums
    def ex_prefix(xb):  # (C, PB) -> (C, PB)
        return jax.lax.dot_general(
            tri, xb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    # Mosaic iota must be integer-typed; cast after
    t_block = jax.lax.broadcasted_iota(jnp.int32, (c, pb), 0).astype(jnp.float32)

    if topology == "fm2":
        m1 = row(0) * row(1)
        cf, amp = row(2), row(3)
        inc1 = jnp.mod(w2srf * row(0), wtsf)
        chains = 1
    elif topology == "fm3_series":
        m1 = row(0) * row(1)
        m2 = row(2) * row(3)
        m3 = row(4) * row(5)
        c1, c2 = row(3), row(5)
        inc1 = jnp.mod(w2srf * row(1), wtsf)
        chains = 2
    else:
        raise NotImplementedError(topology)

    inc_blk = jnp.mod(jnp.float32(c) * inc1, wtsf)

    off1 = jnp.zeros((1, pb), jnp.float32)
    off2 = jnp.zeros((1, pb), jnp.float32)
    off3 = jnp.zeros((1, pb), jnp.float32)

    # Per-sample phase increments |w2sr*cur| < ~0.75*(fmax*imax+imax) stay far
    # below wts, and intra-block sums stay < C*wts in f32 exactly, so the
    # elementwise pre-mod of the scanless reference implementation is
    # unnecessary here — one mod after adding the block offset suffices.
    for b in range(nb):
        pos1 = jnp.mod(t_block * inc1 + off1, wtsf)  # (C, PB)
        if topology == "fm2":
            cur1 = osc(pos1) * m1 + cf
            x1 = w2srf * cur1
            pos2 = jnp.mod(ex_prefix(x1) + off2, wtsf)
            out = osc(pos2) * amp
            off2 = jnp.mod(off2 + jnp.sum(x1, axis=0, keepdims=True), wtsf)
        else:  # fm3_series
            cur1 = osc(pos1) * m1 + c1
            x1 = w2srf * cur1
            pos2 = jnp.mod(ex_prefix(x1) + off2, wtsf)
            off2 = jnp.mod(off2 + jnp.sum(x1, axis=0, keepdims=True), wtsf)
            cur2 = osc(pos2) * m2 + c2
            x2 = w2srf * cur2
            pos3 = jnp.mod(ex_prefix(x2) + off3, wtsf)
            off3 = jnp.mod(off3 + jnp.sum(x2, axis=0, keepdims=True), wtsf)
            out = osc(pos3) * m3
        audio_scratch[b * c : (b + 1) * c, :] = out.astype(jnp.bfloat16)
        off1 = jnp.mod(off1 + inc_blk, wtsf)

    audio = audio_scratch[:]
    dn = (((0,), (0,)), ((), ()))
    reim = jax.lax.dot_general(
        audio, dft_ref[:], dn, preferred_element_type=jnp.float32
    )  # (PB, 2K)
    re = reim[:, :k]
    im = reim[:, k:]
    mag = jnp.sqrt(re * re + im * im)  # (PB, K)
    d = mag - target_ref[:]
    # Mosaic needs >=(8,128) blocks, so the output block is the full (G, PB)
    # array and each program writes only its own row.
    fitness_ref[pl.ds(pl.program_id(0), 1), :] = jnp.sum(d * d, axis=1)[None, :]


@functools.partial(
    jax.jit,
    static_argnames=("topology", "n", "wavetable_size", "sample_rate", "pop_block", "interpret"),
)
def fused_synth_fitness(
    params_scaled: jax.Array,  # (P, D) f32
    dft_cos: jax.Array,  # (N, K)
    dft_sin: jax.Array,  # (N, K)
    target_spectrum: jax.Array,  # (K,) f32
    topology: str = "fm3_series",
    n: int = 1024,
    wavetable_size: int = DEFAULT_WAVETABLE_SIZE,
    sample_rate: int = DEFAULT_SAMPLE_RATE,
    pop_block: int = DEFAULT_POP_BLOCK,
    interpret: bool = False,
) -> jax.Array:
    """Fitness for the whole population; returns ``(P,)`` f32.

    Requirements: P % pop_block == 0, n % 128 == 0, K % 128 == 0.
    fm3_parallel falls back to three fused fm2-like passes upstream.
    """
    pop, d = params_scaled.shape
    k = dft_cos.shape[1]
    pb = min(pop_block, pop)
    if pop % pb:
        raise ValueError(f"population {pop} not divisible by pop_block {pb}")
    if n % TIME_BLOCK:
        raise ValueError(f"n={n} must be a multiple of {TIME_BLOCK}")
    params_t = params_scaled.T.astype(jnp.float32)  # (D, P)
    dft = jnp.concatenate([dft_cos, dft_sin], axis=1).astype(jnp.bfloat16)  # (N, 2K)
    tgt = target_spectrum.astype(jnp.float32)[None, :]  # (1, K)
    tri = jnp.asarray(_tri_strict(TIME_BLOCK))

    kernel = functools.partial(
        _kernel,
        topology=topology,
        n=n,
        pb=pb,
        k=k,
        c=TIME_BLOCK,
        wts=float(wavetable_size),
        w2sr=wavetable_size / float(sample_rate),
    )
    grid = (pop // pb,)
    chains = 2 if topology == "fm3_series" else 1
    cost = pl.CostEstimate(
        flops=pop * (2 * n * 2 * k + chains * 2 * TIME_BLOCK * n),
        bytes_accessed=pop * d * 4 + n * 2 * k * 2 + pop * 4,
        transcendentals=pop * n * (chains + 1),
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((pop // pb, pb), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, pb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 2 * k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TIME_BLOCK, TIME_BLOCK), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (pop // pb, pb), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((n, pb), jnp.bfloat16)],
        cost_estimate=cost,
        interpret=interpret,
        **kwargs,
    )(params_t, dft, tgt, tri)
    return out.reshape(pop)
