"""Fully-fused generation kernel: recombine + mutate + synthesise + DFT +
fitness in ONE Pallas program per population block.

Extends kernels/synth_fitness.py with an in-kernel offspring prologue:
per block, parent indices and mutation noise come from the on-core PRNG
(pltpu.prng_random_bits), parent genes are gathered with per-dimension
one-hot matmuls against the VMEM-resident (mu, D) parent arrays, and the
canonical mutation (Ek coin, retry-with-flipped-gauss, log-normal step
adaptation — kernels/ocl_program.cl:155-190) runs on registers. The offspring
(values, steps) are written back to HBM only because truncation selection
gathers the mu survivors afterwards — O(P*D) bytes, the only HBM traffic of
the whole generation besides the fitness vector.

Distribution parity with es/strategy.py is statistical (SURVEY.md §7.4): the
same gene-from-uniform-parent recombination and CLT-style sigma=1/6 gaussian,
drawn from the TPU PRNG instead of threefry.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.wavetable import DEFAULT_SAMPLE_RATE, DEFAULT_WAVETABLE_SIZE
from .synth_fitness import (
    DEFAULT_POP_BLOCK,
    TIME_BLOCK,
    _evaluate_block,
    _tri_strict,
    f32_pop_block,
    resolve_pop_block,
)


def _uniform01(shape):
    """U[0,1) from raw PRNG bits (24-bit mantissa path).

    prng_random_bits yields *signed* int32 — bitcast to uint32 before the
    shift or the arithmetic shift keeps the sign and skews the distribution.
    """
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # Mosaic has no uint32->f32 cast; bitcast the 24-bit value through int32
    u24 = pltpu.bitcast(bits >> 8, jnp.int32)
    return u24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


GATHER_LANES = 32  # hierarchical recombine: parents = (mu/32) groups x 32


def use_hier_gather(mu: int) -> bool:
    """Whether the hierarchical two-stage parent gather applies (see
    _recombine_hier). Below 128 parents the flat one-hot transient is small
    enough that the extra matmul stage isn't worth it."""
    return mu % GATHER_LANES == 0 and mu >= 128


def hier_parent_operand(parents: jax.Array) -> jax.Array:
    """Host-side relayout of ``(mu, D)`` parents into the hierarchical
    gather's ``(D*L, G)`` operand: row ``dim*L + l``, column ``g`` holds
    parent ``g*L + l``'s gene ``dim`` (L = GATHER_LANES, G = mu/L)."""
    mu, d = parents.shape
    g = mu // GATHER_LANES
    pt = parents.T.astype(jnp.float32)  # (D, mu)
    return pt.reshape(d, g, GATHER_LANES).transpose(0, 2, 1).reshape(
        d * GATHER_LANES, g
    )


def _recombine_flat(pv, ps, *, mu: int, d: int, pb: int):
    """Flat one-hot parent gather: one (MU, PB) one-hot per dimension.

    O(MU*PB) transient per dimension — fine for small parent pools (and the
    whole-run kernel, whose parents live in scratch in this layout); large
    MU uses _recombine_hier (hardware-measured: the flat gather is the
    mu=pop/128 scaling cliff, ~0.4 ms/gen of VPU one-hot construction at
    MU=1024, tools/tpu_offspring_probe.py)."""
    m_iota = jax.lax.broadcasted_iota(jnp.int32, (mu, pb), 0)

    # one-hot (mu, PB) per dimension -> (2, mu) @ (mu, PB) matmul carries
    # (value, step) together (recombinePopulation semantics,
    # kernels/ocl_program.cl:73-149 / CPU random-parent copy)
    val_rows = []
    step_rows = []
    for dim in range(d):
        r = pltpu.prng_random_bits((8, pb))  # >=8 sublanes for the VPU tile
        idx = (r[0:1, :].astype(jnp.int32) & 0x7FFFFFFF) % mu  # (1, PB)
        onehot = (m_iota == idx).astype(jnp.float32)  # (mu, PB)
        both = jnp.concatenate(
            [pv[dim : dim + 1, :], ps[dim : dim + 1, :]], axis=0
        )  # (2, MU)
        # HIGHEST precision: Mosaic's default f32 matmul multiplies in bf16,
        # which would round every copied gene; with multi-pass f32 the
        # products are by exactly 1.0/0.0, so the copy is bit-exact.
        got = jax.lax.dot_general(
            both, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (2, PB)
        val_rows.append(got[0:1, :])
        step_rows.append(got[1:2, :])
    return jnp.concatenate(val_rows, axis=0), jnp.concatenate(step_rows, axis=0)


def _recombine_hier(pv_lg, ps_lg, *, mu: int, d: int, pb: int):
    """Hierarchical two-stage parent gather (same distribution as
    _recombine_flat — identical index draw, decomposed idx = g*L + l):

      stage 1: group one-hot (G, PB) -> one (2L, G) @ (G, PB) MXU matmul
               copies the selected GROUP's L parents (values; steps) per lane
               (HIGHEST precision: products by exactly 1.0/0.0, bit-exact);
      stage 2: lane mask (L, PB) + sublane sum picks parent l within the
               group (adding zeros — also exact).

    Transients per dimension are O((G + 3L) * PB) instead of O(MU * PB):
    8x less VPU one-hot traffic at MU=1024. This removes the mu=pop/128
    population-scaling cliff (VERDICT r1 weak #2): the flat gather cost
    0.42 ms/gen at MU=1024 pop 2^15 (tools/tpu_offspring_probe.py).

    ``pv_lg`` / ``ps_lg`` are the (D*L, G) operands from
    hier_parent_operand.
    """
    lanes = GATHER_LANES
    g = mu // lanes
    shift = lanes.bit_length() - 1
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (g, pb), 0)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (lanes, pb), 0)
    val_rows = []
    step_rows = []
    for dim in range(d):
        r = pltpu.prng_random_bits((8, pb))  # same draw as _recombine_flat
        idx = (r[0:1, :].astype(jnp.int32) & 0x7FFFFFFF) % mu  # (1, PB)
        gi = idx >> shift
        li = idx & (lanes - 1)
        og = (g_iota == gi).astype(jnp.float32)  # (G, PB)
        both = jnp.concatenate(
            [
                pv_lg[dim * lanes : (dim + 1) * lanes, :],
                ps_lg[dim * lanes : (dim + 1) * lanes, :],
            ],
            axis=0,
        )  # (2L, G): selected dim's values; steps
        sel = jax.lax.dot_general(
            both, og, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (2L, PB)
        ol = l_iota == li  # (L, PB)
        zero = jnp.float32(0.0)
        val_rows.append(
            jnp.sum(jnp.where(ol, sel[:lanes], zero), axis=0, keepdims=True)
        )
        step_rows.append(
            jnp.sum(jnp.where(ol, sel[lanes:], zero), axis=0, keepdims=True)
        )
    return jnp.concatenate(val_rows, axis=0), jnp.concatenate(step_rows, axis=0)


def _offspring_block(
    pv,  # (D, MU) f32 parent values — or the (D*L, G) hier operand
    ps,  # (D, MU) f32 parent steps — or the (D*L, G) hier operand
    *,
    mu: int,
    d: int,
    pb: int,
    alpha: float,
    beta: float,
    beta_scale: float,
    root_two_over_pi: float,
    clamp_values: bool,
    min_step: float,
    hier: bool = False,
):
    """Recombine + mutate one population block from the on-core PRNG stream
    (caller seeds). Returns ``(new_x, new_s)``, each ``(D, PB)`` f32."""
    if hier:
        x, s = _recombine_hier(pv, ps, mu=mu, d=d, pb=pb)
    else:
        x, s = _recombine_flat(pv, ps, mu=mu, d=d, pb=pb)

    # --- mutate (kernels/ocl_program.cl:155-190) --------------------------
    coin = pltpu.prng_random_bits((d, pb)) & 1
    ek = jnp.where(coin == 0, jnp.float32(alpha), jnp.float32(1.0 / alpha))
    g = jnp.zeros((d, pb), jnp.float32)
    for _ in range(12):  # CLT gaussian: mean of 12 U(-1,1), sigma = 1/6
        g = g + (_uniform01((d, pb)) * 2.0 - 1.0)
    g = g * jnp.float32(1.0 / 12.0)

    new_x = x + ek * s * g
    out_of_range = (new_x < 0.0) | (new_x > 1.0)
    g = jnp.where(out_of_range, g * -0.5, g)
    new_x = jnp.where(out_of_range, x + ek * s * g, new_x)
    if clamp_values:
        new_x = jnp.clip(new_x, 0.0, 1.0)
    es = jnp.exp(jnp.abs(g) - jnp.float32(root_two_over_pi))
    new_s = s * (ek ** jnp.float32(beta)) * (es ** jnp.float32(beta_scale))
    if min_step > 0.0:
        new_s = jnp.maximum(new_s, jnp.float32(min_step))
    return new_x, new_s


def _scale_rows(new_x, mins, maxs, d):
    """Normalised genes -> scaled params, per-dim python-float constants
    (pallas kernels cannot capture vector constants; scalars are fine)."""
    return jnp.concatenate(
        [
            jnp.float32(mins[dim])
            + new_x[dim : dim + 1, :] * jnp.float32(maxs[dim] - mins[dim])
            for dim in range(d)
        ],
        axis=0,
    )


def _round8(x: int) -> int:
    return max(8, -(-x // 8) * 8)


def _gen_kernel(
    seed_ref,  # (1, 1) int32 SMEM
    pv_ref,  # (D, MU) f32 parent values — or (D*L, G) hier operand
    ps_ref,  # (D, MU) f32 parent steps — or (D*L, G) hier operand
    dft_ref,  # (2K, N/2) folded operand (bf16 or int8)
    target_ref,  # (K, F) f32
    tri_ref,  # (C+8, C) f32 (prefix rows + ones row)
    fitness_ref,  # (G, PB) f32 out
    values_ref,  # (VR, PB) f32 out block — this program's offspring values
    steps_ref,  # (VR, PB) f32 out block
    *scratches,  # two (N/2, PB) folded a+/a- (int8, or bf16/f32-interpret)
    mu: int,
    d: int,
    alpha: float,
    beta: float,
    beta_scale: float,
    root_two_over_pi: float,
    clamp_values: bool,
    min_step: float,
    hier: bool,
    vr: int,
    blocked_out: bool,
    **statics,
):
    pb = statics["pb"]
    i = pl.program_id(0)
    # large odd stride decorrelates per-program streams (consecutive seeds
    # may be correlated in counter-based PRNGs); 31-bit to stay in int32
    pltpu.prng_seed(seed_ref[0, 0] + i * 0x1E3779B9)

    new_x, new_s = _offspring_block(
        pv_ref[:], ps_ref[:],
        mu=mu, d=d, pb=pb, alpha=alpha, beta=beta, beta_scale=beta_scale,
        root_two_over_pi=root_two_over_pi, clamp_values=clamp_values,
        min_step=min_step, hier=hier,
    )
    # outputs are BLOCKED (VR, PB) per program (VR = D rounded up to the
    # sublane tile): only one block is VMEM-resident per grid step instead
    # of the whole (D, P) pair — ~1.5 MB less VMEM footprint at the bench
    # config, which the per-invocation base cost tracks
    # (tools/tpu_buffer_probe.py)
    if vr > d:
        pad = jnp.zeros((vr - d, pb), jnp.float32)
        new_x_out = jnp.concatenate([new_x, pad], axis=0)
        new_s_out = jnp.concatenate([new_s, pad], axis=0)
    else:
        new_x_out, new_s_out = new_x, new_s
    if blocked_out:
        values_ref[:] = new_x_out
        steps_ref[:] = new_s_out
    else:  # full-array VMEM outputs (ablation)
        values_ref[:, pl.ds(i * pb, pb)] = new_x_out
        steps_ref[:, pl.ds(i * pb, pb)] = new_s_out

    mins = statics.pop("mins")
    maxs = statics.pop("maxs")
    p_scaled = _scale_rows(new_x, mins, maxs, d)
    fit = _evaluate_block(p_scaled, dft_ref, target_ref, tri_ref[:], *scratches, **statics)
    fitness_ref[pl.ds(i, 1), :] = fit


@functools.partial(
    jax.jit,
    static_argnames=(
        "topology", "n", "wavetable_size", "sample_rate", "pop", "pop_block",
        "interpret", "time_block", "num_frames", "alpha", "beta", "beta_scale",
        "root_two_over_pi", "clamp_values", "param_mins", "param_maxs",
        "min_step", "dft_scale", "sine_order", "gather_mode", "blocked_out",
    ),
)
def fused_generation(
    seed: jax.Array,  # () int32
    parent_values: jax.Array,  # (mu, D) f32
    parent_steps: jax.Array,  # (mu, D) f32
    dft_cos: jax.Array,
    dft_sin: jax.Array,
    target_spectrum: jax.Array,  # (K,) or (F, K)
    *,
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
    dft_packed: jax.Array | None = None,
    dft_scale: float = 0.0,
    sine_order: int = 9,
    gather_mode: str = "auto",  # "auto" | "flat" (ablation: force flat)
    blocked_out: bool = True,  # ablation: full-array VMEM offspring outputs
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One whole generation's offspring + fitness.

    Returns ``(fitness (P,), values_t (VR, P), steps_t (VR, P))`` where
    ``VR = D`` rounded up to the sublane tile (8) — the kernel's native
    TRANSPOSED, row-padded offspring layout (rows D..VR-1 are zero). Feed to
    ``es.strategy.select_t`` for truncation selection; it slices the padding
    after the survivor gather, so the full population is never transposed.
    """
    mu, d = parent_values.shape
    k = dft_cos.shape[1]
    vr = _round8(d)
    hier = use_hier_gather(mu) and gather_mode != "flat"
    # the true-f32 engine caps the pop block (synth_fitness.F32_MAX_POP_BLOCK)
    _f32 = (
        dft_scale == 0.0
        and dft_packed is not None
        and dft_packed.dtype == jnp.float32
    )
    pb = f32_pop_block(pop, pop_block, topology) if _f32 else resolve_pop_block(pop, pop_block)
    if n % (2 * time_block):
        raise ValueError(
            f"n={n} must be a multiple of {2 * time_block} (the folded DFT "
            f"pairs time blocks n <-> N-n)"
        )
    if dft_scale > 0.0:
        if dft_packed is None or dft_packed.dtype != jnp.int8:
            raise ValueError("int8 engine needs the int8 SpectrumOps.dft_packed")
        dft = dft_packed  # int8 in BOTH modes: CPU int8 dots are exact too
    elif dft_packed is not None:
        # precomputed folded (2K, N/2) bf16 — XLA does not hoist the rebuild
        # below out of scan bodies (~0.3 ms/gen at the bench config)
        dft = dft_packed
    else:
        dft = (
            jnp.concatenate([dft_cos, dft_sin], axis=1)
            .T[:, : n // 2]
            .astype(jnp.bfloat16)
        )
    if dft.shape[1] != n // 2:
        raise ValueError(
            f"dft operand must be the FOLDED (2K, N/2) form, got "
            f"{dft.shape} for n={n}"
        )
    # checked BEFORE the interpret upcast: an f32 dft_packed selects the
    # TRUE-f32 engine (synth_fitness._evaluate_block audio_f32 docstring)
    audio_f32 = dft_scale == 0.0 and dft.dtype == jnp.float32
    if interpret and dft.dtype == jnp.bfloat16:
        # interpreter-mode dots run on XLA:CPU, which has no bf16 kernel;
        # quantise-then-upcast matches the TPU bf16 MXU numerics exactly
        dft = dft.astype(jnp.float32)
    if target_spectrum.ndim == 1:
        tgt = target_spectrum.astype(jnp.float32)[:, None]
    else:
        tgt = target_spectrum.astype(jnp.float32).T
    tri = jnp.asarray(_tri_strict(time_block))
    statics = dict(
        mu=mu,
        d=d,
        hier=hier,
        vr=vr,
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
    nblk = pop // pb
    kernel = functools.partial(_gen_kernel, blocked_out=blocked_out, **statics)
    kwargs = {}
    if interpret:
        # the TPU-flavoured interpreter accepts the pltpu PRNG primitives
        # but draws ZERO bits (hardware-only, CLAUDE.md): CPU interpret runs
        # test kernel STRUCTURE (layouts, exact gather copies, fitness
        # plumbing); distributions are validated on hardware
        # (tools/tpu_gen_check.py -> benchmarks/gen_check.json).
        kwargs["interpret"] = pltpu.InterpretParams(random_seed=1234)
    else:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        )
    if hier:
        pv_in = hier_parent_operand(parent_values)
        ps_in = hier_parent_operand(parent_steps)
    else:
        pv_in = parent_values.T.astype(jnp.float32)
        ps_in = parent_steps.T.astype(jnp.float32)
    full = lambda *_: (0, 0)  # noqa: E731
    sdtype = (
        jnp.int8
        if dft_scale > 0.0
        else (jnp.float32 if (interpret or audio_f32) else jnp.bfloat16)
    )
    grid = (nblk,)
    off_spec = pl.BlockSpec(
        (vr, pb) if blocked_out else (vr, pop),
        (lambda i: (0, i)) if blocked_out else full,
        memory_space=pltpu.VMEM,
    )
    scratch_shapes = [  # folded a+ / a-
        pltpu.VMEM((n // 2, pb), sdtype) for _ in range(2)
    ]
    fitness, values_t, steps_t = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nblk, pb), jnp.float32),
            jax.ShapeDtypeStruct((vr, pop), jnp.float32),
            jax.ShapeDtypeStruct((vr, pop), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),
            pl.BlockSpec(pv_in.shape, full, memory_space=pltpu.VMEM),
            pl.BlockSpec(ps_in.shape, full, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * k, dft.shape[1]), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, num_frames), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((time_block + 8, time_block), full, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nblk, pb), full, memory_space=pltpu.VMEM),
            # offspring blocked per program: (VR, PB) VMEM-resident per step
            off_spec,
            off_spec,
        ),
        scratch_shapes=scratch_shapes,
        **kwargs,
    )(
        seed.astype(jnp.int32).reshape(1, 1),
        pv_in,
        ps_in,
        dft,
        tgt,
        tri,
    )
    return fitness.reshape(pop), values_t, steps_t
