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
from ..es.strategy import ESState, evaluate, mutate, recombine, select
from ..ops import spectral
from .mesh import POP_AXIS


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


def sharded_generation_step(
    state: ESState,
    target_spectrum: jax.Array,
    spectrum_ops: spectral.SpectrumOps,
    cfg: ESConfig,
    mesh: Mesh,
) -> ESState:
    """One ES generation with the population sharded over ``mesh``.

    State (parents + best + key) is replicated; the offspring population only
    ever exists shard-local inside this function. The returned state is again
    replicated (all devices compute the identical merge).
    """
    n_shards = int(mesh.shape[POP_AXIS])
    lcfg = _local_cfg(cfg, n_shards)
    mu = cfg.num_parents

    def step(state: ESState) -> ESState:
        ax = jax.lax.axis_index(POP_AXIS)
        key, k_next = jax.random.split(state.key)
        k_local = jax.random.fold_in(key, ax)
        k_rec, k_mut = jax.random.split(k_local)

        values, steps = recombine(k_rec, state.parent_values, state.parent_steps, lcfg)
        values, steps = mutate(k_mut, values, steps, lcfg)
        fitness = evaluate(values, target_spectrum, spectrum_ops, lcfg)

        # local truncation, then O(mu) all-gather + replicated merge
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
):
    """scan over sharded generations — the multi-chip executeAllGenerations."""
    step = partial(
        sharded_generation_step,
        target_spectrum=target_spectrum,
        spectrum_ops=spectrum_ops,
        cfg=cfg,
        mesh=mesh,
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
