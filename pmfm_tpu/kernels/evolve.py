"""Whole-run fused ES: ALL generations in ONE Pallas program (opt-in,
``ESConfig.fused_evolve``).

The grid is ``(generations,)`` (sequential on the single TPU core), the
parent pool lives in VMEM scratch across grid steps, selection runs
in-kernel, and the offspring population never touches HBM at all (the
per-generation kernel writes O(P*D) offspring for the XLA-side top-k).

At the int8 bench config this is ~4.5% faster than the per-generation scan
(0.93 vs 0.99 ms/gen: the in-kernel merge replaces the XLA ``top_k`` and
per-generation dispatch), and it is the zero-HBM-traffic design point (only
parents/best/trajectory ever leave the core) — bench.py uses it. The scan
path remains the default elsewhere because it also supports restarts, early
stop and mesh sharding. ``gens_per_step`` folds several generations into one
grid step with bit-identical results (PRNG seeded by absolute generation
index); measured FLAT at gpg 1..25 (tools/tpu_gpg_probe.py) — the ~0.3 ms
fixed cost recurs per generation body, not per grid step.

In-kernel truncation selection (replaces sortPopulation,
kernels/ocl_program.cl:664-711, and the XLA ``lax.top_k``): a running
top-``mu`` pool is merged with each population block by EXACT rank
computation — for the (mu + PB) candidates, ``rank(j) = #{i : f_i < f_j or
(f_i == f_j and i < j)}`` via lane-chunked comparisons (the same enumeration
rank the reference's sort kernel computed, but over mu+PB candidates instead
of the whole population), then the ``mu`` survivors are extracted with a
rank-one-hot MXU matmul at HIGHEST precision (bit-exact copy).

Semantics match pipeline.generation_step with fused_generation=True: same
offspring construction (kernels/generation.py), same comma selection over
the full offspring population, same best-ever tracking. PRNG streams differ
(one stream per generation instead of per block) — parity is statistical,
as for the per-generation kernel (SURVEY.md §7.4).

Not supported here (the per-generation path remains for these): restarts,
fitness-threshold early stop, population sharding over a mesh.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.wavetable import DEFAULT_SAMPLE_RATE, DEFAULT_WAVETABLE_SIZE
from .generation import _offspring_block, _scale_rows
from .synth_fitness import (
    DEFAULT_POP_BLOCK,
    TIME_BLOCK,
    _evaluate_block,
    _tri_strict,
    f32_pop_block,
    resolve_pop_block,
)

_RANK_CHUNK = 256  # lanes per rank-comparison chunk (bounds the (M, chunk) transient)
# worst-possible fitness sentinel: must be FINITE — the survivors are
# extracted by a one-hot matmul and inf * 0.0 = NaN would poison every lane.
# Real fitness is bounded ~1e13 at the reference parameter ranges.
_BIG = 3.0e38


def _round8(x: int) -> int:
    return max(8, -(-x // 8) * 8)


def _merge_topmu(pool, block, mu: int):
    """Exact top-``mu`` of the union of ``pool`` and ``block``.

    Both are ``(R, *)`` stacks ``[values(d); steps(d); fitness(1)]`` with
    fitness in the LAST row. Plain jnp ops (kernel-compatible and unit-
    testable outside Pallas). Returns ``(R, mu)`` sorted best-first.
    """
    r = pool.shape[0]
    cat = jnp.concatenate([pool, block], axis=1)  # (R, M)
    m = cat.shape[1]
    f = cat[r - 1 : r, :]  # (1, M)
    # NaN/inf-proof the order (finite sentinel — see _BIG)
    f = jnp.where(f == f, jnp.minimum(f, jnp.float32(_BIG)), jnp.float32(_BIG))
    fc = f.reshape(m, 1)  # (M, 1) — lane->sublane relayout
    ic = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    ranks = []
    for j0 in range(0, m, _RANK_CHUNK):
        w = min(_RANK_CHUNK, m - j0)
        fj = f[:, j0 : j0 + w]  # (1, w)
        ij = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1) + j0
        # before[i, j]: candidate i strictly precedes candidate j
        before = (fc < fj) | ((fc == fj) & (ic < ij))  # (M, w)
        ranks.append(jnp.sum(before.astype(jnp.float32), axis=0, keepdims=True))
    rank = jnp.concatenate(ranks, axis=1)  # (1, M) in [0, M), unique
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (mu, m), 0).astype(jnp.float32)
    sel = (r_iota == rank).astype(jnp.float32)  # (mu, M): row r -> rank-r cand
    cat = jnp.concatenate([cat[: r - 1, :], f], axis=0)  # fitness NaN-cleaned
    # survivors extracted by matmul; HIGHEST keeps the f32 copy bit-exact
    return jax.lax.dot_general(
        cat, sel, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (R, mu)


def _evolve_kernel(
    seed_ref,  # (1, 1) int32 SMEM
    best_f0_ref,  # (1, 1) f32 SMEM — incoming best-ever fitness
    pv0_ref,  # (D, MU) f32 initial parent values
    ps0_ref,  # (D, MU) f32 initial parent steps
    bv0_ref,  # (VR, 128) f32 incoming best-ever values (col-broadcast)
    dft_ref,  # (2K, N/2) folded operand (bf16 or int8)
    target_ref,  # (K, F) f32
    tri_ref,  # (C+8, C) f32 (prefix rows + ones row)
    out_pv_ref,  # (D, MU) f32 out — final parent values
    out_ps_ref,  # (D, MU) f32 out
    out_pf_ref,  # (8, MU) f32 out — final parent fitness in row 0
    out_bv_ref,  # (VR, 128) f32 out — best-ever values in column 0
    out_bf_ref,  # (8, 128) f32 out — best-ever fitness at [0, 0]
    traj_ref,  # (G, 128) f32 out — best-ever fitness per generation (col 0)
    pool_scratch,  # (2*VR + 8, MU) f32 — parents (+fitness rows) across gens
    best_scratch,  # (VR + 8, 128) f32 — rows [0:VR) values, row VR fitness
    *audio_scratches,  # two (N/2, PB) folded a+/a- (int8, or bf16/f32-interpret)

    steps: int,
    gpg: int,
    blocks: int,
    mu: int,
    d: int,
    alpha: float,
    beta: float,
    beta_scale: float,
    root_two_over_pi: float,
    clamp_values: bool,
    min_step: float,
    **statics,
):
    pb = statics["pb"]
    vr = _round8(d)
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        zeros_pad = jnp.zeros((vr - d, mu), jnp.float32)
        pool_scratch[:] = jnp.concatenate(
            [pv0_ref[:], zeros_pad, ps0_ref[:], zeros_pad,
             jnp.zeros((8, mu), jnp.float32)], axis=0
        )
        best_scratch[:] = jnp.concatenate(
            [
                bv0_ref[:],
                jnp.zeros((8, 128), jnp.float32) + best_f0_ref[0, 0],
            ],
            axis=0,
        )

    mins = statics.pop("mins")
    maxs = statics.pop("maxs")
    off_kw = dict(
        mu=mu, d=d, pb=pb, alpha=alpha, beta=beta, beta_scale=beta_scale,
        root_two_over_pi=root_two_over_pi, clamp_values=clamp_values,
        min_step=min_step,
    )

    def gen_body(i, carry):
        # absolute generation index: gpg generations share one grid step so
        # the per-step VMEM/DMA base cost is paid once per gpg generations
        # (tools/tpu_buffer_probe.py); seeding by gg keeps results
        # bit-identical for any gpg.
        gg = g * gpg + i
        pltpu.prng_seed(seed_ref[0, 0] + gg * 0x1E3779B9)
        pool_sc = pool_scratch[:]
        pv = pool_sc[0:d, :]
        ps = pool_sc[vr : vr + d, :]

        def block_body(_, pool):
            new_x, new_s = _offspring_block(pv, ps, **off_kw)
            p_scaled = _scale_rows(new_x, mins, maxs, d)
            fit = _evaluate_block(
                p_scaled, dft_ref, target_ref, tri_ref[:], *audio_scratches,
                **statics
            )  # (1, PB)
            blockstk = jnp.concatenate([new_x, new_s, fit], axis=0)  # (2D+1, PB)
            return _merge_topmu(pool, blockstk, mu)

        pool0 = jnp.concatenate(
            [jnp.zeros((2 * d, mu), jnp.float32), jnp.full((1, mu), _BIG, jnp.float32)],
            axis=0,
        )
        pool = jax.lax.fori_loop(0, blocks, block_body, pool0)

        zeros_pad = jnp.zeros((vr - d, mu), jnp.float32)
        fit8 = pool[2 * d : 2 * d + 1, :] + jnp.zeros((8, mu), jnp.float32)
        pool_scratch[:] = jnp.concatenate(
            [pool[0:d, :], zeros_pad, pool[d : 2 * d, :], zeros_pad, fit8], axis=0
        )

        # best-ever tracking (comma selection: the pool resets every
        # generation). Mosaic cannot broadcast in sublanes and lanes at once,
        # and XLA fuses chained broadcast_to calls back into one — so every
        # 2-D broadcast here is an ADD against zeros (one axis at a time,
        # uncollapsible).
        gen_best_row = pool[2 * d : 2 * d + 1, 0:1] + jnp.zeros((1, 128), jnp.float32)
        prev = best_scratch[:]
        improved_row = gen_best_row < prev[vr : vr + 1, :]  # (1, 128) uniform
        gen_best_v = pool[0:d, 0:1] + jnp.zeros((d, 128), jnp.float32)
        gen_best_v = jnp.concatenate(
            [gen_best_v, jnp.zeros((vr - d, 128), jnp.float32)], axis=0
        )
        gen_best_f8 = gen_best_row + jnp.zeros((8, 128), jnp.float32)
        mask = improved_row & (jnp.zeros((vr + 8, 128), jnp.int32) == 0)
        new_best = jnp.where(
            mask,
            jnp.concatenate([gen_best_v, gen_best_f8], axis=0),
            prev,
        )
        best_scratch[:] = new_best
        traj_ref[pl.ds(gg, 1), :] = new_best[vr : vr + 1, :]
        return carry

    jax.lax.fori_loop(0, gpg, gen_body, 0)

    @pl.when(g == steps - 1)
    def _finish():
        pool_sc = pool_scratch[:]
        best = best_scratch[:]
        out_pv_ref[:] = pool_sc[0:d, :]
        out_ps_ref[:] = pool_sc[vr : vr + d, :]
        out_pf_ref[:] = pool_sc[2 * vr : 2 * vr + 8, :]
        out_bv_ref[:] = best[0:vr, :]
        out_bf_ref[:] = best[vr : vr + 8, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "gens", "pop", "param_mins", "param_maxs", "topology", "n",
        "wavetable_size", "sample_rate", "pop_block", "interpret",
        "time_block", "num_frames", "alpha", "beta", "beta_scale",
        "root_two_over_pi", "clamp_values", "min_step", "dft_scale",
        "gens_per_step", "sine_order",
    ),
)
def fused_evolve(
    seed: jax.Array,  # () int32
    parent_values: jax.Array,  # (mu, D) f32
    parent_steps: jax.Array,  # (mu, D) f32
    best_values: jax.Array,  # (D,) f32 incoming best-ever
    best_fitness: jax.Array,  # () f32 incoming best-ever
    dft_packed: jax.Array,  # (2K, N/2) folded (SpectrumOps.dft_packed)
    target_spectrum: jax.Array,  # (K,) or (F, K)
    *,
    gens: int,
    pop: int,
    param_mins: tuple,
    param_maxs: tuple,
    topology: str = "fm3_series",
    n: int = 1024,
    wavetable_size: int = DEFAULT_WAVETABLE_SIZE,
    sample_rate: int = DEFAULT_SAMPLE_RATE,
    pop_block: int = DEFAULT_POP_BLOCK,
    interpret: bool = False,
    time_block: int = TIME_BLOCK,
    num_frames: int = 1,
    alpha: float = 1.4,
    beta: float = math.sqrt(1.0 / 6.0),
    beta_scale: float = 1.0 / 6.0,
    root_two_over_pi: float = math.sqrt(2.0 / math.pi),
    clamp_values: bool = False,
    min_step: float = 0.0,
    dft_scale: float = 0.0,
    gens_per_step: int = 1,
    sine_order: int = 9,
):
    """Run ``gens`` complete ES generations in one kernel invocation.

    Returns ``(parent_values (mu, D), parent_steps (mu, D),
    parent_fitness (mu,), best_values (D,), best_fitness (),
    trajectory (gens,))`` — the trajectory is best-EVER per generation,
    matching ``pipeline.evolve(record_trajectory=True)``.

    ``gens_per_step`` folds that many generations into one grid step
    (rounded down to a divisor of ``gens``) to amortise the per-grid-step
    VMEM/DMA base cost; results are bit-identical for any value.
    """
    mu, d = parent_values.shape
    k = dft_packed.shape[0] // 2
    vr = _round8(d)
    pb = (
        f32_pop_block(pop, pop_block, topology)
        if dft_scale == 0.0 and dft_packed.dtype == jnp.float32
        else resolve_pop_block(pop, pop_block)
    )
    if n % (2 * time_block):
        raise ValueError(
            f"n={n} must be a multiple of {2 * time_block} (the folded DFT "
            f"pairs time blocks n <-> N-n)"
        )
    blocks = pop // pb
    if dft_scale > 0.0 and dft_packed.dtype != jnp.int8:
        raise ValueError("int8 engine needs the int8 SpectrumOps.dft_packed")
    if dft_packed.shape[1] != n // 2:
        raise ValueError(
            f"dft_packed must be the FOLDED (2K, N/2) operand, got "
            f"{dft_packed.shape} for n={n}"
        )
    # int8 operands stay int8 under interpret (CPU int8 dots are exact too);
    # bf16 upcasts to f32 (XLA:CPU has no bf16 dot kernel); an f32 operand
    # selects the TRUE-f32 engine (synth_fitness audio_f32 docstring)
    audio_f32 = dft_scale == 0.0 and dft_packed.dtype == jnp.float32
    dft = (
        dft_packed.astype(jnp.float32)
        if interpret and dft_packed.dtype == jnp.bfloat16
        else dft_packed
    )
    if target_spectrum.ndim == 1:
        tgt = target_spectrum.astype(jnp.float32)[:, None]
    else:
        tgt = target_spectrum.astype(jnp.float32).T
    tri = jnp.asarray(_tri_strict(time_block))
    bv0 = jnp.broadcast_to(
        jnp.concatenate(
            [best_values.astype(jnp.float32), jnp.zeros((vr - d,), jnp.float32)]
        )[:, None],
        (vr, 128),
    )

    gpg = max(1, min(gens_per_step, gens))
    while gens % gpg:
        gpg -= 1
    steps = gens // gpg

    kernel = functools.partial(
        _evolve_kernel,
        steps=steps,
        gpg=gpg,
        blocks=blocks,
        mu=mu,
        d=d,
        alpha=alpha,
        beta=beta,
        beta_scale=beta_scale,
        root_two_over_pi=root_two_over_pi,
        clamp_values=clamp_values,
        min_step=min_step,
        mins=param_mins,
        maxs=param_maxs,
        topology=topology,
        n=n,
        pb=pb,
        k=k,
        c=time_block,
        wts=float(wavetable_size),
        w2sr=wavetable_size / float(sample_rate),
        num_frames=num_frames,
        dft_scale=dft_scale,
        sine_order=sine_order,
        audio_f32=audio_f32,
    )
    kwargs = {}
    if interpret:
        kwargs["interpret"] = pltpu.InterpretParams(random_seed=1234)
    else:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential: scratch carries
        )
    full = lambda *_: (0, 0)  # noqa: E731
    out_pv, out_ps, out_pf, out_bv, out_bf, traj = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((d, mu), jnp.float32),
            jax.ShapeDtypeStruct((d, mu), jnp.float32),
            jax.ShapeDtypeStruct((8, mu), jnp.float32),
            jax.ShapeDtypeStruct((vr, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((gens, 128), jnp.float32),
        ),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),
            pl.BlockSpec((d, mu), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, mu), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((vr, 128), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * k, dft.shape[1]), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, num_frames), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((time_block + 8, time_block), full, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((d, mu), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, mu), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, mu), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((vr, 128), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((gens, 128), full, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * vr + 8, mu), jnp.float32),
            pltpu.VMEM((vr + 8, 128), jnp.float32),
        ] + [  # folded a+ / a-
            pltpu.VMEM(
                (n // 2, pb),
                jnp.int8
                if dft_scale > 0.0
                else (
                    jnp.float32
                    if (interpret or audio_f32)
                    else jnp.bfloat16
                ),
            )
            for _ in range(2)
        ],
        **kwargs,
    )(
        seed.astype(jnp.int32).reshape(1, 1),
        best_fitness.astype(jnp.float32).reshape(1, 1),
        parent_values.T.astype(jnp.float32),
        parent_steps.T.astype(jnp.float32),
        bv0,
        dft,
        tgt,
        tri,
    )
    return (
        out_pv.T,
        out_ps.T,
        out_pf[0],
        out_bv[:d, 0],
        out_bf[0, 0],
        traj[:, 0],
    )
