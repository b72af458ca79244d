"""Population-sharded ES generation via ``shard_map`` + ICI collectives.

TPU-native replacement for what the reference never had (SURVEY.md §2.4,
§5.8): the population axis is sharded across the mesh; selection is the only
stage needing communication and is done as a **sharded top-k merge**:

  1. each device evolves and evaluates its local population shard
     (``P/ndev`` candidates) entirely on-chip;
  2. each device computes its local top-``mu`` (fitness, values, steps);
  3. one ``all_gather`` over the ``pop`` axis moves ``mu*(2D+1)`` floats per
     device — **independent of P** (this is what makes >=85% weak scaling
     feasible, BASELINE.md north star);
  4. every device merges the gathered ``ndev*mu`` candidates to the same
     global top-``mu`` parent set (replicated compute, no second collective).

The reference analog of step 3-4 is the enumeration sort's global rank
computation (kernels/ocl_program.cl:664-711), which is all-to-all in the
population size; here collective bytes stay O(mu).

Parents, target spectrum and the DFT matrices are replicated per chip
(reference analog: __constant paramMins/Maxs/inputFFTTarget/wavetable
buffers, Evolutionary_Strategy_OpenCL.hpp:287-291).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..es.config import ESConfig
from ..es.strategy import (
    ESState, _fused_ok, evaluate, mutate, recombine, select, select_t,
)
from ..ops import spectral, synthesis
from .mesh import FRAME_AXIS, POP_AXIS


def _local_cfg(cfg: ESConfig, n_shards: int) -> ESConfig:
    if cfg.population_size % n_shards:
        raise ValueError(
            f"population {cfg.population_size} not divisible by mesh size {n_shards}"
        )
    local_pop = cfg.population_size // n_shards
    if local_pop < cfg.num_parents:
        raise ValueError(
            f"local population {local_pop} smaller than num_parents "
            f"{cfg.num_parents}; use fewer shards or more offspring"
        )
    # keep mu unchanged; only the per-shard offspring count shrinks
    return cfg.replace(num_offspring=local_pop - cfg.num_parents)


def _evaluate_frames_local(
    values: jax.Array,
    target_frames: jax.Array,  # (F, bins) replicated
    spectrum_ops: spectral.SpectrumOps,
    cfg: ESConfig,
    frames_local: int,
) -> jax.Array:
    """Partial fitness over this device's STFT-frame window.

    Frame-axis sharding (SURVEY.md §5.7): the synthesis phase recurrence is
    sequential across frames, so every frame-shard synthesises the candidate's
    FULL ``F*N`` waveform; only the windowed DFT + L2 error — the dominant
    cost for long targets (O(F*N*K) MXU work vs O(F*N) VPU synthesis) — is
    restricted to the local ``F/n_shards`` frame window. Summing the partials
    with ``psum`` over the frame axis reproduces the unsharded multi-frame
    fitness exactly (modulo float reassociation).

    The fused Pallas kernel is not used on the FRAME-sharded path (it is on
    the pure population-sharded one — see ``sharded_generation_step``): under
    SPMD every device runs the same program and the kernel's frame loop is
    unrolled at trace time, so a per-device frame window cannot be folded
    into it without predicating each DFT matmul — the XLA engines handle the
    dynamic slice natively.
    """
    mins = jnp.asarray(cfg.param_mins, jnp.float32)
    maxs = jnp.asarray(cfg.param_maxs, jnp.float32)
    scaled = synthesis.scale_params(values, mins, maxs)
    audio = synthesis.synthesize(
        scaled,
        cfg.n_samples * cfg.num_frames,
        cfg.topology,
        wavetable_size=cfg.wavetable_size,
        sample_rate=cfg.sample_rate,
        osc_mode=cfg.osc_mode,
        unroll=cfg.scan_unroll,
        engine=cfg.synthesis_engine,
        out_dtype=(
            jnp.bfloat16
            if cfg.dft_dtype in ("bfloat16", "int8")
            else jnp.float32
        ),
    )  # (F*N, pop_local)
    f0 = jax.lax.axis_index(FRAME_AXIS) * frames_local
    a = audio.reshape(cfg.num_frames, cfg.n_samples, audio.shape[-1])
    local = jax.lax.dynamic_slice_in_dim(a, f0, frames_local, axis=0)
    local = local.reshape(frames_local * cfg.n_samples, audio.shape[-1])
    tgt_local = jax.lax.dynamic_slice_in_dim(target_frames, f0, frames_local, axis=0)
    return spectral.stft_fitness(local, tgt_local, spectrum_ops)


def sharded_generation_step(
    state: ESState,
    target_spectrum: jax.Array,
    spectrum_ops: spectral.SpectrumOps,
    cfg: ESConfig,
    mesh: Mesh,
    interpret: bool = False,
) -> ESState:
    """One ES generation with the population sharded over ``mesh``.

    State (parents + best + key) is replicated; the offspring population only
    ever exists shard-local inside this function. The returned state is again
    replicated (all devices compute the identical merge).

    When the fused per-generation Pallas kernel applies (same conditions as
    the single-chip ``pipeline.generation_step``) and the mesh does not shard
    frames, each shard runs it on its local population slice — multi-chip
    keeps the single-chip kernel throughput; only the O(mu) selection merge
    is collective. ``interpret=True`` forces the kernel's interpreter mode so
    the sharded-fused plumbing is testable on a CPU virtual mesh (interpreter
    PRNG draws are degenerate — structure only, like the kernel unit tests).
    """
    n_shards = int(mesh.shape[POP_AXIS])
    lcfg = _local_cfg(cfg, n_shards)
    mu = cfg.num_parents
    n_frame_shards = (
        int(mesh.shape[FRAME_AXIS]) if FRAME_AXIS in mesh.axis_names else 1
    )
    if n_frame_shards > 1:
        if cfg.num_frames % n_frame_shards:
            raise ValueError(
                f"num_frames {cfg.num_frames} not divisible by frame-axis "
                f"size {n_frame_shards}"
            )
        frames_local = cfg.num_frames // n_frame_shards
    else:
        frames_local = cfg.num_frames

    # same gating as pipeline.generation_step (kernel PRNG is TPU-only; the
    # interpreter override exists for structural tests on the CPU mesh)
    use_fused = (
        n_frame_shards == 1
        and cfg.fused_generation
        and _fused_ok(lcfg, spectrum_ops)
        and cfg.gauss_sigma == 1.0 / 6.0
        and (interpret or jax.default_backend() != "cpu")
    )

    def step(state: ESState) -> ESState:
        ax = jax.lax.axis_index(POP_AXIS)
        k_next = state.key

        if use_fused:
            from ..es.pipeline import fused_generation_kwargs, kernel_seed
            from ..kernels.generation import fused_generation

            # generation- and shard-indexed kernel seed — ONE shared
            # definition with the single-chip path (pipeline.kernel_seed:
            # hashed generation index; a linear stride aliases the kernel's
            # per-block stride). Replaces the previous per-generation
            # split+fold_in+randint threefry chain (~6% of the steady
            # state); the key advances only in the restart branch.
            seed = kernel_seed(state.key, state.generation, shard=ax)
            fitness, values_t, steps_t = fused_generation(
                seed,
                state.parent_values,
                state.parent_steps,
                spectrum_ops.dft_cos,
                spectrum_ops.dft_sin,
                target_spectrum,
                **fused_generation_kwargs(
                    cfg, spectrum_ops,
                    pop=lcfg.population_size, interpret=interpret,
                ),
            )
        else:
            key, k_next = jax.random.split(state.key)
            k_rec, k_mut = jax.random.split(jax.random.fold_in(key, ax))
            values, steps = recombine(
                k_rec, state.parent_values, state.parent_steps, lcfg
            )
            values, steps = mutate(k_mut, values, steps, lcfg)
        if not use_fused and n_frame_shards > 1:
            # the key folds in only the pop index, so every frame-shard of a
            # pop shard generates identical offspring; each scores its own
            # frame window and the psum reassembles the full fitness
            fitness = jax.lax.psum(
                _evaluate_frames_local(
                    values, target_spectrum, spectrum_ops, lcfg, frames_local
                ),
                FRAME_AXIS,
            )
        elif not use_fused:
            fitness = evaluate(values, target_spectrum, spectrum_ops, lcfg)

        # local truncation, then O(mu) all-gather + replicated merge
        if use_fused:
            lv, ls, lf = select_t(values_t, steps_t, fitness, mu,
                                  cfg.num_dimensions)
        else:
            lv, ls, lf = select(values, steps, fitness, mu)
        gv = jax.lax.all_gather(lv, POP_AXIS)  # (ndev, mu, D)
        gs = jax.lax.all_gather(ls, POP_AXIS)
        gf = jax.lax.all_gather(lf, POP_AXIS)  # (ndev, mu)
        d = cfg.num_dimensions
        pv, ps, pf = select(
            gv.reshape(n_shards * mu, d), gs.reshape(n_shards * mu, d),
            gf.reshape(n_shards * mu), mu,
        )
        improved = pf[0] < state.best_fitness
        stall = jnp.where(improved, 0, state.stall + 1).astype(jnp.int32)
        if cfg.restart_patience > 0:
            # stall-triggered restart (replicated: same key on all shards)
            k_next, k_restart = jax.random.split(k_next)
            restart = stall >= cfg.restart_patience
            fresh_v = jax.random.uniform(k_restart, pv.shape, jnp.float32)
            pv = jnp.where(restart, fresh_v, pv)
            ps = jnp.where(restart, jnp.full_like(ps, 0.1), ps)
            pf = jnp.where(restart, jnp.full_like(pf, jnp.inf), pf)
            stall = jnp.where(restart, 0, stall)
        return ESState(
            parent_values=pv,
            parent_steps=ps,
            parent_fitness=pf,
            best_values=jnp.where(improved, pv[0], state.best_values),
            best_fitness=jnp.where(improved, pf[0], state.best_fitness),
            key=k_next,
            generation=state.generation + 1,
            stall=stall,
        )

    spec = ESState(*(P() for _ in ESState._fields))  # replicated state pytree
    return jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(spec,),
        out_specs=spec,
        check_vma=False,  # outputs are replicated by construction (merge of all_gather)
    )(state)


def evolve_sharded(
    state: ESState,
    target_spectrum: jax.Array,
    num_generations: int,
    spectrum_ops: spectral.SpectrumOps,
    cfg: ESConfig,
    mesh: Mesh,
    record_trajectory: bool = False,
    interpret: bool = False,
):
    """scan over sharded generations — the multi-chip executeAllGenerations."""
    step = partial(
        sharded_generation_step,
        target_spectrum=target_spectrum,
        spectrum_ops=spectrum_ops,
        cfg=cfg,
        mesh=mesh,
        interpret=interpret,
    )
    if cfg.fitness_threshold > 0.0 and not record_trajectory:
        # local iteration counter: num_generations is relative to the input
        # state (matters when resuming from a checkpointed state whose
        # .generation is already > 0)
        def cond(carry):
            s, i = carry
            return (i < num_generations) & (s.best_fitness > cfg.fitness_threshold)

        def body(carry):
            s, i = carry
            return step(s), i + 1

        final, _ = jax.lax.while_loop(
            cond, body, (state, jnp.asarray(0, jnp.int32))
        )
        return final, None

    def body(s, _):
        s = step(s)
        return s, (s.best_fitness if record_trajectory else None)

    final, traj = jax.lax.scan(body, state, None, length=num_generations)
    return final, (traj if record_trajectory else None)
