"""Block-coordinate matching-pursuit solver for ``fm{k}_parallel`` targets.

WHY THIS EXISTS. The parallel model families (three independent 2-op FM
pairs averaged — synthesisePopulationTripleParallel,
kernels/ocl_program.cl:388-443 / Objective::synthesiseAudioTriple,
Evolutionary_Strategy.hpp:450-495 — generalised here to k pairs) defeat the
direct joint ES at every engine precision: at 12 dimensions ALL engines,
including plain f32, stall at ~35-55% relative spectral error on 100% of
seeds (benchmarks/quality_gates_topologies.json, round 3). Diagnostics
(tools/pursuit_diag.py): the joint landscape's attractors are "compromise"
solutions whose dense FM combs partially explain all three target combs at
once; no local move reassigns a compromise pair to a true comb.

THE SOLVER exploits the family's separability instead:

* The model output is the MEAN of k independent pairs, so with all but one
  pair frozen, the joint objective restricted to one pair's 4 genes is an
  fm2-sized problem — and the 4-dim fm2 match converges on 100% of seeds
  (quality_gates_topologies.json).
* Measured key fact (tools/pursuit_diag.py): the single-pair restriction of
  the TRUE objective has the DOMINANT TRUE PAIR as its global optimum
  (fitting one pair against the full 3-pair target recovers pair 1 almost
  exactly; loss 0.0321 at the fit vs 0.0322 at the truth), so a greedy
  first sweep peels the mixture pair by pair.
* Each stage is a small ES over one pair's block with the others' audio
  frozen (block-coordinate descent on the true objective — residuals are
  EXACT in the time domain, no magnitude-additivity assumption), run
  ``pair_tries`` times from independent keys keeping the best (the stage
  landscape has folded-comb aliases that trap ~1/3 of single tries), and
  ELITIST: the incumbent block is evaluated into best-ever so a stage can
  never regress the estimate.
* A final joint polish seeds the full cfg engine (fused int8 kernels, step
  floor, restarts, refine tail — whatever the config carries) with parents
  perturbed around the assembled estimate.

The pair stages run the XLA evaluation path (the joint-model fitness
"candidate/k + frozen others" is not expressible in the fused synth+DFT
kernels, whose audio never exists unfolded); they are a few percent of the
budget at matcher scale, and the joint polish runs the configured engine.
"""
from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import spectral, synthesis
from ..ops.synthesis import parallel_pairs, scale_params
from .config import ESConfig
from .strategy import ESState, mutate, recombine, select
from .pipeline import _evolve_on_target, make_spectrum_ops


class PursuitResult(NamedTuple):
    best_values: np.ndarray  # (D,) normalised genes
    best_fitness: float  # under cfg's scoring engine (f32 if refine tail)
    stage_fitness: np.ndarray  # (sweeps, k) joint fitness after each stage
    generations_used: int  # total ES generations across stages + polish


def _pair_cfg(cfg: ESConfig, j: int, pair_population: int | None) -> ESConfig:
    lo = 4 * j
    pop = pair_population or cfg.population_size
    mu = max(16, pop // 32)
    return cfg.replace(
        topology="fm2",
        num_dimensions=4,
        param_mins=tuple(cfg.param_mins[lo : lo + 4]),
        param_maxs=tuple(cfg.param_maxs[lo : lo + 4]),
        num_parents=mu,
        num_offspring=pop - mu,
        # stage knobs: neutral-drift adaptation + step floor keep the
        # 4-dim search alive for the whole stage budget
        mutation_noise="clt12_neutral",
        min_step=1e-4,
        restart_patience=0,
        refine_generations=0,
        fused_kernel=False,
        fused_generation=False,
        fused_evolve=False,
    )


@lru_cache(maxsize=64)
def _stage_runner(cfg: ESConfig, pcfg: ESConfig, gens: int):
    """jit: (key, others_audio (N,), center (4,), tspec) -> (best4, fitness).

    ES over one pair's 4 genes; fitness = full-model spectral L2 with the
    other pairs' summed audio frozen (symmetric loss — the diag run showed
    over-penalty variants only harden the landscape)."""
    k = parallel_pairs(cfg.topology)
    so = make_spectrum_ops(cfg)
    mins = jnp.asarray(pcfg.param_mins, jnp.float32)
    maxs = jnp.asarray(pcfg.param_maxs, jnp.float32)
    mu = pcfg.num_parents

    def eval_fn(values, others, tspec):
        scaled = scale_params(values, mins, maxs)
        a = synthesis.synthesize(
            scaled,
            cfg.n_samples,
            "fm2",
            wavetable_size=cfg.wavetable_size,
            sample_rate=cfg.sample_rate,
            osc_mode=cfg.osc_mode,
            unroll=cfg.scan_unroll,
            engine=cfg.synthesis_engine,
        )
        return spectral.evaluate_fitness(a / k + others[:, None], tspec, so)

    @jax.jit
    def run(key, others, center, tspec):
        key, k0 = jax.random.split(key)
        pv = jax.random.uniform(k0, (mu, 4), jnp.float32)
        # TRUE elitism: the incumbent block occupies a parent slot AND its
        # fitness initialises best-ever — a stage can never regress
        pv = pv.at[0].set(center)
        center_fit = eval_fn(center[None], others, tspec)[0]
        st = ESState(
            parent_values=pv,
            parent_steps=jnp.full((mu, 4), 0.1, jnp.float32),
            parent_fitness=jnp.full((mu,), jnp.inf, jnp.float32),
            best_values=center,
            best_fitness=center_fit,
            key=key,
            generation=jnp.asarray(0, jnp.int32),
            stall=jnp.asarray(0, jnp.int32),
        )

        def body(s, _):
            key, k_rec, k_mut = jax.random.split(s.key, 3)
            v, stp = recombine(k_rec, s.parent_values, s.parent_steps, pcfg)
            v, stp = mutate(k_mut, v, stp, pcfg)
            fit = eval_fn(v, others, tspec)
            pv, ps, pf = select(v, stp, fit, mu)
            improved = pf[0] < s.best_fitness
            return ESState(
                parent_values=pv, parent_steps=ps, parent_fitness=pf,
                best_values=jnp.where(improved, pv[0], s.best_values),
                best_fitness=jnp.where(improved, pf[0], s.best_fitness),
                key=key, generation=s.generation + 1, stall=s.stall,
            ), None

        fin, _ = jax.lax.scan(body, st, None, length=gens)
        return fin.best_values, fin.best_fitness

    return run


@lru_cache(maxsize=32)
def _others_runner(cfg: ESConfig):
    """jit: (est (D,), j) -> (N,) audio of the full model with pair j's
    amplitude zeroed — i.e. (1/k) sum_{i != j} s_i, the exact time-domain
    contribution of the frozen pairs."""
    mins = jnp.asarray(cfg.param_mins, jnp.float32)
    maxs = jnp.asarray(cfg.param_maxs, jnp.float32)
    k = parallel_pairs(cfg.topology)

    @jax.jit
    def run(est, j):
        amp_slots = jnp.arange(cfg.num_dimensions) % 4 == 3
        zero_j = jnp.arange(cfg.num_dimensions) // 4 == j
        genes = jnp.where(amp_slots & zero_j, 0.0, est)
        scaled = scale_params(genes[None], mins, maxs)
        return synthesis.synthesize(
            scaled,
            cfg.n_samples,
            cfg.topology,
            wavetable_size=cfg.wavetable_size,
            sample_rate=cfg.sample_rate,
            osc_mode=cfg.osc_mode,
            unroll=cfg.scan_unroll,
            engine=cfg.synthesis_engine,
        )[:, 0]

    return run


def match_parallel_pursuit(
    target_audio,
    cfg: ESConfig,
    key: jax.Array | int = 0,
    *,
    sweeps: int = 2,
    pair_generations: int = 300,
    pair_tries: int = 2,
    pair_population: int | None = None,
    joint_generations: int = 500,
    joint_spread: float = 0.02,
    joint_step: float = 0.01,
) -> PursuitResult:
    """Recover ``fm{k}_parallel`` parameters for one target frame.

    Args:
      target_audio: ``(cfg.n_samples,)`` target frame.
      cfg: an ``fm{k}_parallel`` ESConfig — the joint polish runs exactly
        this engine (fused kernels, restarts, refine tail as configured);
        the pair stages derive their own 4-dim sub-config.
      sweeps: cyclic passes over the k pair blocks (sweep 0 is the greedy
        peel; later sweeps re-fit each pair against the improved residual).
      pair_tries: independent ES runs per stage, best kept (folded-comb
        aliases trap ~1/3 of single tries — tools/pursuit_diag.py).
      joint_generations: budget of the final full-dimensional polish
        (PLUS cfg.refine_generations if set, which ride inside it).

    Returns a PursuitResult; ``best_fitness`` is scored by the polish
    engine (the f32 refine engine when cfg.refine_generations > 0).
    """
    k = parallel_pairs(cfg.topology)
    if k is None:
        raise ValueError(
            f"match_parallel_pursuit needs an fm{{k}}_parallel topology, "
            f"got {cfg.topology!r}"
        )
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    target_audio = jnp.asarray(target_audio, jnp.float32)
    if target_audio.shape != (cfg.n_samples,):
        raise ValueError(
            f"target must be one frame of {cfg.n_samples} samples"
        )
    so = make_spectrum_ops(cfg)
    tspec = spectral.target_spectrum(target_audio, so)
    others_fn = _others_runner(cfg)

    est = np.zeros(cfg.num_dimensions, np.float32)  # amps 0: silent pairs
    stage_fit = np.zeros((sweeps, k), np.float32)
    gens_used = 0
    for sweep in range(sweeps):
        for j in range(k):
            pcfg = _pair_cfg(cfg, j, pair_population)
            # stage spectrum ops follow the PAIR config's frame (same n)
            runner = _stage_runner(cfg, pcfg, pair_generations)
            others = others_fn(est, jnp.asarray(j))
            center = jnp.asarray(est[4 * j : 4 * j + 4])
            best_bv, best_bf = None, np.inf
            for _ in range(pair_tries):
                key, sub = jax.random.split(key)
                bv, bf = runner(sub, others, center, tspec)
                gens_used += pair_generations
                if float(bf) < best_bf:
                    best_bv, best_bf = np.asarray(bv), float(bf)
            est[4 * j : 4 * j + 4] = best_bv
            stage_fit[sweep, j] = best_bf

    # joint polish: cfg's engine seeded around the assembled estimate
    key, k_noise, k_run = jax.random.split(key, 3)
    mu, d = cfg.num_parents, cfg.num_dimensions
    est_j = jnp.asarray(est)
    pv = jnp.clip(
        est_j[None] + joint_spread * jax.random.normal(k_noise, (mu, d)),
        0.0,
        1.0,
    ).astype(jnp.float32)
    pv = pv.at[0].set(est_j)
    state = ESState(
        parent_values=pv,
        parent_steps=jnp.full((mu, d), joint_step, jnp.float32),
        parent_fitness=jnp.full((mu,), jnp.inf, jnp.float32),
        best_values=est_j,
        best_fitness=jnp.asarray(stage_fit[-1, -1], jnp.float32),
        key=k_run,
        generation=jnp.asarray(0, jnp.int32),
        stall=jnp.asarray(0, jnp.int32),
    )
    final, _ = _evolve_on_target(
        state, target_audio, joint_generations, so, cfg, None, False, False
    )
    gens_used += joint_generations
    return PursuitResult(
        best_values=np.asarray(final.best_values),
        best_fitness=float(final.best_fitness),
        stage_fitness=stage_fit,
        generations_used=gens_used,
    )
