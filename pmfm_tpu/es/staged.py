"""Staged decomposition solver for ``fm{k}_parallel`` targets.

WHY THIS EXISTS. The parallel model families (k independent 2-op FM pairs
averaged — synthesisePopulationTripleParallel,
kernels/ocl_program.cl:388-443 / Objective::synthesiseAudioTriple,
Evolutionary_Strategy.hpp:450-495) defeat the direct joint ES at every
engine precision: at 12 dimensions ALL engines, including plain f32, stall
at ~35-55% relative spectral error on 100% of seeds
(benchmarks/quality_gates_topologies.json, round 3).

WHAT THE ROUND-4 DIAGNOSTICS ESTABLISHED (tools/pursuit_diag.py,
tools/pursuit_stage2_probe.py, tools/pursuit_alias_probe.py — all on the
known 12-dim target):

1. Fitting ONE pair against the full 3-comb target has the dominant TRUE
   pair as its optimum (loss 0.0321 at the fit vs 0.0322 at the truth) —
   the greedy peel of the first pair is reliable at population >= 2^13
   with a few independent tries.
2. Greedy does NOT extend: one pair vs the TWO remaining combs is won by a
   "compromise" pair (0.0156) that ties the pairs-{0,1}-true waypoint
   (0.0159) — so pairs after the first must be fit JOINTLY (the 8
   remaining genes, first pair frozen).
3. The joint tail converges onto FOLDED-COMB ALIASES: solutions whose
   carrier sits on a reflected line of the true comb (fc' = |fc - fm|,
   fc + fm, fc ± 2fm, or fm' = fm + 2fc — e.g. pair1 recovered at fc=250
   ~= |2182 - 1936| with a compensating index). These are deep local
   optima (~0.007) unreachable from each other by local moves.
4. ALIAS JUMPS fix it: propose the reflected (fm, fc) variants per pair,
   short-polish each, keep the best, iterate — from the measured alias
   attractor this reaches the global basin in one round and final-polishes
   to ~1e-8 fitness (0.04% relative spectral error; the direct ES stalls
   at 38%).

THE ALGORITHM (k pairs, D = 4k genes):

  peel stages    — for the first k-2 pairs: block-ES over that pair's 4
                   genes (others frozen, un-fit pairs silent), best of
                   ``peel_tries`` independent runs, elitist.
  joint tail     — block-ES over the last TWO pairs' 8 genes jointly
                   (with stall restarts), best of ``tail_tries``.
  repair rounds  — (k >= 4; ``repair_rounds``) every unordered PAIR of
                   pair blocks re-fit jointly (8 genes, random-init
                   elitist) with the others frozen; repeat while a round
                   improves. Fixes the k=4 failure mode where the first
                   peel merges two overlapping true combs into one
                   compromise pair — a joint attractor that single-block
                   backfit provably cannot leave (measured a strict
                   no-op) and single-pair alias proposals cannot reach.
  alias rounds   — reflected-comb jump proposals per pair, each
                   short-polished with the configured engine; repeat while
                   improving.
  final polish   — the full cfg engine (fused int8 kernels, restarts,
                   refine tail — whatever the config carries) seeded
                   around the assembled estimate.

The block stages run the XLA f32 evaluation path at their own population
(a few percent of matcher-scale budget); the alias polishes and the final
polish run the configured engine at cfg.population_size.
"""
from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import spectral
from ..ops.synthesis import parallel_pairs
from .config import ESConfig
from .strategy import ESState, evaluate, mutate, recombine, select
from .pipeline import _evolve_on_target, evolve, make_spectrum_ops


# "tpu"."pursuit" config block (camelCase, io/config.py) -> kwargs
CONFIG_KEY_MAP = {
    "stagePopulation": "stage_population",
    "peelGenerations": "peel_generations",
    "peelTries": "peel_tries",
    "tailGenerations": "tail_generations",
    "tailTries": "tail_tries",
    "aliasRounds": "alias_rounds",
    "aliasGenerations": "alias_generations",
    "jointGenerations": "joint_generations",
    "jointSpread": "joint_spread",
    "jointStep": "joint_step",
    "repairRounds": "repair_rounds",
    "repairGenerations": "repair_generations",
    "targetRel": "target_rel",
    "maxAttempts": "max_attempts",
}


def pursuit_kwargs_from_config(items) -> dict:
    """Map the config's camelCase pursuit block (RunConfig.pursuit, stored
    as sorted (key, value) tuples) to match_parallel_pursuit kwargs."""
    out = {}
    for k, v in dict(items).items():
        if k not in CONFIG_KEY_MAP:
            raise ValueError(
                f"unknown tpu.pursuit key {k!r}; options {list(CONFIG_KEY_MAP)}"
            )
        snake = CONFIG_KEY_MAP[k]
        is_float = snake in ("joint_spread", "joint_step", "target_rel")
        out[snake] = float(v) if is_float else int(v)
    return out


class PursuitResult(NamedTuple):
    best_values: np.ndarray  # (D,) normalised genes
    best_fitness: float  # under cfg's scoring engine (f32 if refine tail)
    stage_fitness: np.ndarray  # joint fitness after each block stage
    alias_fitness: np.ndarray  # joint fitness after each alias round
    generations_used: int  # total ES generations across all phases
    attempts: int = 1  # outer self-scored restarts consumed (target_rel)


def _block_topology(d: int) -> str:
    """ANY topology whose dimension count matches ``d`` — only the ES
    hyper-parameter scaling (beta = sqrt(1/D)) reads it; evaluation always
    embeds the block into the FULL model (see _block_runner)."""
    if d == 4:
        return "fm2"
    if d >= 6 and d % 2 == 0 and d % 4 != 0:
        return f"fm{d // 2}_series"
    if d >= 8 and d % 4 == 0:
        return f"fm{d // 4}_parallel"
    raise ValueError(f"no topology with {d} dimensions")


def _block_cfg(cfg: ESConfig, block: tuple, pop: int) -> ESConfig:
    """ES-hyperparameter config for a block stage (beta = sqrt(1/|block|)
    etc. follow the BLOCK dimension, the proper Schwefel scaling)."""
    mu = max(16, pop // 64)
    return cfg.replace(
        topology=_block_topology(len(block)),
        num_dimensions=len(block),
        param_mins=tuple(cfg.param_mins[i] for i in block),
        param_maxs=tuple(cfg.param_maxs[i] for i in block),
        num_parents=mu,
        num_offspring=pop - mu,
        mutation_noise="clt12_neutral",
        min_step=1e-4,
        restart_patience=100,
        refine_generations=0,
        fused_kernel=False,
        fused_generation=False,
        fused_evolve=False,
    )


def _eval_cfg(cfg: ESConfig) -> ESConfig:
    """The block stages' scoring engine: XLA f32 (any population size).

    Deliberately NOT the round-5 fused true-f32 kernel: its 2.9e-5 median
    fitness agreement sounds negligible, but on the chaotic series-chain
    landscape the sub-ULP scoring differences reshuffle near-equal
    survivors and measurably degraded the fm4_series staged recipe
    (median rel 2.9% -> 4.2% over the same 8 seeds). The block stages are
    a few percent of a match's budget; keep the exact scorer."""
    return cfg.replace(
        dft_dtype="float32", fused_kernel=False, fused_generation=False,
        fused_evolve=False, refine_generations=0,
    )


@lru_cache(maxsize=64)
def _block_runner(cfg: ESConfig, block: tuple, pop: int, gens: int):
    """jit: (key, frozen (D,), center (|block|,), tspec) -> (best, fitness).

    ES over ``block``'s genes of the FULL model; genes outside the block
    stay at ``frozen``. Elitist (the incumbent block is evaluated into
    best-ever) with stall restarts."""
    bcfg = _block_cfg(cfg, block, pop)
    ecfg = _eval_cfg(cfg)
    so = make_spectrum_ops(ecfg)
    mu = bcfg.num_parents
    idx = jnp.asarray(block)

    def eval_fn(values, frozen, tspec):
        full = jnp.broadcast_to(frozen, (values.shape[0], frozen.shape[0]))
        full = full.at[:, idx].set(values)
        return evaluate(full, tspec, so, ecfg)

    @jax.jit
    def run(key, frozen, center, tspec):
        key, k0 = jax.random.split(key)
        pv = jax.random.uniform(k0, (mu, len(block)), jnp.float32)
        # TRUE elitism: the incumbent block occupies a parent slot AND its
        # fitness initialises best-ever — a stage can never regress
        pv = pv.at[0].set(center)
        center_fit = eval_fn(center[None], frozen, tspec)[0]
        st = ESState(
            parent_values=pv,
            parent_steps=jnp.full((mu, len(block)), 0.1, jnp.float32),
            parent_fitness=jnp.full((mu,), jnp.inf, jnp.float32),
            best_values=center,
            best_fitness=center_fit,
            key=key,
            generation=jnp.asarray(0, jnp.int32),
            stall=jnp.asarray(0, jnp.int32),
        )

        def body(s, _):
            key, k_rec, k_mut, k_rst = jax.random.split(s.key, 4)
            v, stp = recombine(k_rec, s.parent_values, s.parent_steps, bcfg)
            v, stp = mutate(k_mut, v, stp, bcfg)
            fit = eval_fn(v, frozen, tspec)
            pv, ps, pf = select(v, stp, fit, mu)
            improved = pf[0] < s.best_fitness
            stall = jnp.where(improved, 0, s.stall + 1)
            restart = stall >= bcfg.restart_patience
            fresh = jax.random.uniform(k_rst, pv.shape, jnp.float32)
            pv = jnp.where(restart, fresh, pv)
            ps = jnp.where(restart, jnp.full_like(ps, 0.1), ps)
            stall = jnp.where(restart, 0, stall)
            return ESState(
                parent_values=pv, parent_steps=ps, parent_fitness=pf,
                best_values=jnp.where(improved, pv[0], s.best_values),
                best_fitness=jnp.where(improved, pf[0], s.best_fitness),
                key=key, generation=s.generation + 1,
                stall=stall.astype(jnp.int32),
            ), None

        fin, _ = jax.lax.scan(body, st, None, length=gens)
        return fin.best_values, fin.best_fitness

    return run


@lru_cache(maxsize=64)
def _block_runner_batch(cfg: ESConfig, block: tuple, pop: int, gens: int):
    """vmap of ``_block_runner`` over a leading keys axis — independent
    tries execute as ONE device program (round 5, VERDICT r4 weak #5:
    attempts/tries ran host-sequentially; the round-4 multi-target work
    proved vmap-of-runs is device-optimal, and each sequential call paid
    ~25 ms of axon dispatch). jit re-specialises per tries-count."""
    run = _block_runner(cfg, block, pop, gens)
    return jax.jit(jax.vmap(run, in_axes=(0, None, None, None)))


def _batch_width_cap(n_samples: int, pop: int) -> int:
    """Max vmapped whole-runs per device program. Each batched run keeps
    ~(f32 audio + spectra + engine temporaries) ≈ 12 bytes x n x pop live,
    so huge frames must not ride the full 8-wide bucket: the n=2^16 fm2
    pursuit crashed the TPU worker (HBM exhaustion inside one program)
    on an 8-wide alias-polish batch. Cap the aggregate at ~6 GB; at the
    bench shapes (n=1024-2048) this resolves to the old width 8."""
    per = 12 * n_samples * pop
    return max(1, min(8, (6 << 30) // per))


@lru_cache(maxsize=32)
def _polish_runner(cfg: ESConfig, gens: int, spread: float, step: float):
    """jit: (key, est (D,), tspec) -> (best, fitness) — joint ES with the
    CONFIGURED engine, parents seeded around ``est``."""
    so = make_spectrum_ops(cfg)
    mu, d = cfg.num_parents, cfg.num_dimensions

    @jax.jit
    def run(key, est, tspec):
        key, k_noise, k_run = jax.random.split(key, 3)
        pv = jnp.clip(
            est[None] + spread * jax.random.normal(k_noise, (mu, d)),
            0.0, 1.0,
        ).astype(jnp.float32)
        pv = pv.at[0].set(est)
        st = ESState(
            parent_values=pv,
            parent_steps=jnp.full((mu, d), step, jnp.float32),
            parent_fitness=jnp.full((mu,), jnp.inf, jnp.float32),
            best_values=est,
            best_fitness=evaluate(est[None], tspec, so, cfg)[0],
            key=k_run,
            generation=jnp.asarray(0, jnp.int32),
            stall=jnp.asarray(0, jnp.int32),
        )
        fin, _ = evolve(st, tspec, gens, so, cfg)
        return fin.best_values, fin.best_fitness

    return run


@lru_cache(maxsize=32)
def _polish_runner_batch(cfg: ESConfig, gens: int, spread: float, step: float):
    """vmap of ``_polish_runner`` over (keys, ests) — one device program
    polishes every alias proposal of a round (see _block_runner_batch)."""
    run = _polish_runner(cfg, gens, spread, step)
    return jax.jit(jax.vmap(run, in_axes=(0, 0, None)))


def alias_variants(est: np.ndarray, k: int, freq_scale: np.ndarray) -> list:
    """Reflected folded-comb proposals (diagnostics item 3): per pair,
    carrier moved by +-1/+-2 mod-freq multiples, the mod freq reflected
    through twice the carrier, and the (fm, fc) swap. ``freq_scale`` maps
    each gene to Hz (param_maxs for the fm/fc slots; mins assumed 0)."""
    out = []
    for j in range(k):
        fm_i, fc_i = 4 * j, 4 * j + 2
        fm = est[fm_i] * freq_scale[fm_i]
        fc = est[fc_i] * freq_scale[fc_i]
        cands = [
            (fm, fc + fm), (fm, abs(fc - fm)),
            (fm, fc + 2 * fm), (fm, abs(fc - 2 * fm)),
            (fm + 2 * fc, fc), (abs(fm - 2 * fc), fc),
            (fc, fm),  # swap
        ]
        seen = set()
        for fm2, fc2 in cands:
            if not (0.0 < fm2 <= freq_scale[fm_i]):
                continue
            if not (0.0 <= fc2 <= freq_scale[fc_i]):
                continue
            if abs(fm2 - fm) < 1.0 and abs(fc2 - fc) < 1.0:
                continue
            sig = (round(fm2, 1), round(fc2, 1))
            if sig in seen:
                continue
            seen.add(sig)
            v = est.copy()
            v[fm_i] = fm2 / freq_scale[fm_i]
            v[fc_i] = fc2 / freq_scale[fc_i]
            out.append(v)
    return out


def _pursuit_attempt(
    target_audio,
    cfg: ESConfig,
    key: jax.Array,
    *,
    stage_population: int = 1 << 13,
    peel_generations: int = 300,
    peel_tries: int = 3,
    tail_generations: int = 600,
    tail_tries: int = 2,
    alias_rounds: int = 4,
    alias_generations: int = 150,
    joint_generations: int = 500,
    joint_spread: float = 0.01,
    joint_step: float = 0.005,
    repair_rounds: int = 0,
    repair_generations: int = 400,
) -> PursuitResult:
    """One pursuit attempt (module docstring: peel -> joint tail ->
    pairwise repair -> alias jumps -> final polish). See
    ``match_parallel_pursuit`` for the public wrapper."""
    k = parallel_pairs(cfg.topology)
    if k is None and cfg.topology == "fm2":
        # the 2-op family IS a 1-pair bank (same gene layout: fm, index,
        # fc, amp): no peel, the "tail" is the whole problem, and the
        # alias-jump rounds are the point — at huge frames (n = 2^16) the
        # direct ES reliably locks onto the folded comb |fc - fm|
        # (examples/huge_frame_match.json's round-5 diagnosis) and the
        # (fm, |fc-fm|) proposal is exactly the escape move
        k = 1
    if k is None:
        raise ValueError(
            f"match_parallel_pursuit needs an fm{{k}}_parallel (or fm2) "
            f"topology, got {cfg.topology!r}"
        )
    target_audio = jnp.asarray(target_audio, jnp.float32)
    if target_audio.shape != (cfg.n_samples,):
        raise ValueError(f"target must be one frame of {cfg.n_samples} samples")

    ecfg = _eval_cfg(cfg)
    so_e = make_spectrum_ops(ecfg)
    tspec_e = spectral.target_spectrum(target_audio, so_e)
    so_p = make_spectrum_ops(cfg)
    tspec_p = spectral.target_spectrum(target_audio, so_p)

    d = cfg.num_dimensions
    est = np.zeros(d, np.float32)  # amps 0: un-fit pairs are silent
    gens_used = 0
    stage_fit = []

    def run_block(block, tries, gens, key):
        # all tries in ONE vmapped device program (VERDICT r4 weak #5);
        # ONE batched readback (per-scalar reads cost a ~25 ms axon round
        # trip each, match_many lesson). Huge frames chunk the batch to
        # the HBM width cap (_batch_width_cap) instead of crashing the
        # worker on one oversized program.
        nonlocal gens_used
        runner = _block_runner_batch(cfg, block, stage_population, gens)
        frozen = jnp.asarray(est)
        center = jnp.asarray(est[list(block)])
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, tries)
        cap = _batch_width_cap(cfg.n_samples, stage_population)
        bvs_l, bfs_l = [], []
        for s in range(0, tries, cap):
            bv, bf = runner(keys[s : s + cap], frozen, center, tspec_e)
            bvs_l.append(np.asarray(bv))
            bfs_l.append(np.asarray(bf))
        bvs, bfs = np.concatenate(bvs_l), np.concatenate(bfs_l)
        gens_used += gens * tries
        i = int(np.argmin(bfs))
        est[list(block)] = bvs[i]
        stage_fit.append(float(bfs[i]))
        return key

    # peel the first k-2 pairs one at a time (1-vs->=3 is won by the
    # dominant true pair; 1-vs-2 is NOT — diagnostics items 1-2)
    for j in range(max(k - 2, 0)):
        key = run_block(tuple(range(4 * j, 4 * j + 4)), peel_tries,
                        peel_generations, key)
    # joint tail over the last two pairs' 8 genes
    tail_block = tuple(range(4 * max(k - 2, 0), d))
    key = run_block(tail_block, tail_tries, tail_generations, key)

    # pairwise joint repair (k >= 4): with four overlapping combs the
    # FIRST peel can land on a compromise between two true pairs (measured
    # on the fm4 target: est pair 0 merged true pairs 1+2 while the second
    # peel then nailed true pair 0 exactly), leaving TWO pairs jointly
    # wrong. Single-block coordinate descent cannot fix that (backfit
    # cycles measured a strict no-op — the compromise IS the conditional
    # optimum), and alias proposals move one pair at a time. The k=3
    # design's own lesson ("coupled pairs must be fit jointly" — module
    # docstring item 2) generalises: re-fit every unordered PAIR of pair
    # blocks (8 genes, random-init elitist ES, others frozen) and keep
    # improvements; stop when a full round stalls.
    for _ in range(repair_rounds if k >= 4 else 0):
        # k <= 3 has at most one unordered pair of pair-blocks == the joint
        # tail it just ran: re-running it only advances the key stream and
        # burns repair_generations * k*(k-1)/2 per round (ADVICE r4)
        before = stage_fit[-1]
        for j1 in range(k):
            for j2 in range(j1 + 1, k):
                block = tuple(range(4 * j1, 4 * j1 + 4)) + tuple(
                    range(4 * j2, 4 * j2 + 4)
                )
                key = run_block(block, 1, repair_generations, key)
        if stage_fit[-1] >= before * (1.0 - 1e-3):
            break

    # alias-jump rounds with the configured engine; every candidate of a
    # round polishes in ONE vmapped device program. The batch width is
    # BUCKETED to the next multiple of 8 (pad slots re-polish the
    # incumbent): exact widths would compile one executable per distinct
    # candidate count, full 1+7k padding wastes up to ~3x device work on
    # late (deduped) rounds; buckets cost at most ceil(7k/8)+1 compiles
    # per (cfg, knobs) and <8 wasted runs per round.
    freq_scale = np.asarray(cfg.param_maxs, np.float32)
    polish_b = _polish_runner_batch(cfg, alias_generations, joint_spread,
                                    joint_step)
    cur = np.inf  # rescored under the cfg engine by the incumbent polish
    alias_fit = []
    for _ in range(alias_rounds):
        # the incumbent leads the candidate list so it gets the same
        # polish budget as the proposals (and converts cur onto the cfg
        # engine's fitness scale on the first round)
        cands = [est.copy()] + alias_variants(est, k, freq_scale)
        n_real = len(cands)
        cap = _batch_width_cap(cfg.n_samples, cfg.population_size)
        if cap == 1:
            # huge frames: sequential polishes (the unbatched runner —
            # skips even the width-1 vmap wrapper; vmap of the pallas
            # engines is structurally correct, the 8-wide crash was HBM)
            width = n_real
        else:
            width = -(-n_real // min(8, cap)) * min(8, cap)
        while len(cands) < width:
            cands.append(est.copy())
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, width)
        stack = jnp.asarray(np.stack(cands))
        bvs_l, bfs_l = [], []
        if cap == 1:
            polish_1 = _polish_runner(cfg, alias_generations, joint_spread,
                                      joint_step)
            for s in range(width):
                bv, bf = polish_1(keys[s], stack[s], tspec_p)
                bvs_l.append(np.asarray(bv)[None])
                bfs_l.append(np.asarray(bf)[None])
        else:
            for s in range(0, width, cap):
                bv, bf = polish_b(keys[s : s + cap], stack[s : s + cap],
                                  tspec_p)
                bvs_l.append(np.asarray(bv))
                bfs_l.append(np.asarray(bf))
        gens_used += alias_generations * n_real
        bvs, bfs = np.concatenate(bvs_l), np.concatenate(bfs_l)
        i = int(np.argmin(bfs))
        best_v, best_f = est, cur
        if float(bfs[i]) < best_f:
            best_v, best_f = bvs[i], float(bfs[i])
        improved = best_f < cur * (1.0 - 1e-4)
        est, cur = best_v, best_f
        alias_fit.append(cur)
        if not improved:
            break

    # final polish: cfg engine + optional refine tail around the estimate
    key, k_noise, k_run = jax.random.split(key, 3)
    mu = cfg.num_parents
    est_j = jnp.asarray(est)
    pv = jnp.clip(
        est_j[None] + joint_spread * jax.random.normal(k_noise, (mu, d)),
        0.0, 1.0,
    ).astype(jnp.float32)
    pv = pv.at[0].set(est_j)
    state = ESState(
        parent_values=pv,
        parent_steps=jnp.full((mu, d), joint_step, jnp.float32),
        parent_fitness=jnp.full((mu,), jnp.inf, jnp.float32),
        best_values=est_j,
        best_fitness=jnp.asarray(cur, jnp.float32),
        key=k_run,
        generation=jnp.asarray(0, jnp.int32),
        stall=jnp.asarray(0, jnp.int32),
    )
    final, _ = _evolve_on_target(
        state, target_audio, joint_generations, so_p, cfg, None, False, False
    )
    gens_used += joint_generations
    return PursuitResult(
        best_values=np.asarray(final.best_values),
        best_fitness=float(final.best_fitness),
        stage_fitness=np.asarray(stage_fit, np.float32),
        alias_fitness=np.asarray(alias_fit, np.float32),
        generations_used=gens_used,
    )


def match_parallel_pursuit(
    target_audio,
    cfg: ESConfig,
    key: jax.Array | int = 0,
    *,
    target_rel: float = 0.0,
    max_attempts: int = 1,
    **attempt_kwargs,
) -> PursuitResult:
    """Recover ``fm{k}_parallel`` parameters for one target frame (module
    docstring: peel -> joint tail -> pairwise repair -> alias jumps ->
    final polish), with optional SELF-SCORED multi-start.

    A single attempt's success is key-dependent (measured on the 16-dim
    family: ~60-75% of attempts reach the global basin; which keys fail
    even flips between recipes). The solver can judge its own outcome
    without ground truth — relative spectral error
    ``sqrt(best_fitness / ||target_spectrum||^2)`` under the f32 scoring
    engine — so with ``target_rel > 0`` it restarts with a fresh key
    (up to ``max_attempts`` total) until the estimate crosses the line,
    returning the best attempt either way. Attempt 0 consumes the caller's
    key unchanged, so single-attempt results are bit-identical to the
    pre-wrapper behaviour (benchmarks/pursuit_fm3_parallel.json).

    Args:
      target_audio: ``(cfg.n_samples,)`` target frame.
      cfg: an ``fm{k}_parallel`` ESConfig — alias polishes and the final
        polish run exactly this engine (fused kernels, restarts, refine
        tail as configured); block stages derive 4/8-gene sub-configs.
      target_rel: accept threshold on self-scored relative spectral error
        (0 disables multi-start). 0.03 pairs with the BASELINE-style gate.
      max_attempts: total attempt budget when ``target_rel > 0``.

    Returns a PursuitResult; ``best_fitness`` is scored by the polish
    engine (the f32 refine engine when cfg.refine_generations > 0);
    ``generations_used`` accumulates across attempts.
    """
    return _multi_start(
        _pursuit_attempt, target_audio, cfg, key,
        target_rel=target_rel, max_attempts=max_attempts, **attempt_kwargs,
    )


def _series_attempt(
    target_audio,
    cfg: ESConfig,
    key: jax.Array,
    *,
    stage_population: int = 1 << 13,
    core_generations: int = 600,
    core_tries: int = 2,
    grow_generations: int = 300,
    grow_tries: int = 2,
    repair_rounds: int = 3,
    repair_generations: int = 300,
    joint_generations: int = 500,
    joint_spread: float = 0.01,
    joint_step: float = 0.005,
) -> PursuitResult:
    """One staged attempt for ``fm{k}_series`` chains (k >= 4; the direct
    ES stalls at 12-26% relative spectral error on 100% of seeds for the
    8-dim chain — round-5 gate pilot).

    EXACT-REDUCTION HOMOTOPY. Zeroing genes (2j, 2j+1) silences operator
    ``j``'s modulation output exactly (oracle loop: op j+1's frequency
    input becomes the constant p[2j+3]), so freezing the first 2(k-3)
    genes at zero reduces the chain EXACTLY to fm3_series on the remaining
    six genes — the model family the direct ES demonstrably cracks
    (benchmarks/quality_gates.json). The solver therefore:

      core   — block-ES the LAST six genes against the full target with
               the inner genes frozen at zero (an fm3_series fit of the
               chain's outer three operators), best of ``core_tries``;
      grow   — unfreeze inward one operator at a time (j = k-4 .. 0): fit
               genes (2j .. 2j+3) — the new operator plus its immediate
               downstream neighbour, which must re-adjust once the inner
               modulation turns on — others frozen, elitist;
      repair — sliding-window joint re-fits over adjacent operator pairs
               (genes (2j .. 2j+3) for all j), repeated while a round
               improves: growing inward biases the outer genes (the core
               fit compensates for the then-missing inner modulation);
      polish — the configured engine (fused int8 kernels, restarts,
               refine tail) seeded around the assembled estimate.

    No alias-jump stage: chain spectra are chirp-like (sub-audio operator
    base frequencies sweep the instantaneous frequency through the frame),
    not folded combs, so the parallel solver's reflected-comb proposals
    have no analog here; multi-start (match_series_pursuit) covers the
    residual attempt-level failures.
    """
    from ..ops.synthesis import series_ops

    k = series_ops(cfg.topology)
    if k is None or k < 4:
        raise ValueError(
            f"match_series_pursuit needs an fm{{k}}_series topology with "
            f"k >= 4 (the direct ES handles k = 3), got {cfg.topology!r}"
        )
    target_audio = jnp.asarray(target_audio, jnp.float32)
    if target_audio.shape != (cfg.n_samples,):
        raise ValueError(f"target must be one frame of {cfg.n_samples} samples")

    ecfg = _eval_cfg(cfg)
    so_e = make_spectrum_ops(ecfg)
    tspec_e = spectral.target_spectrum(target_audio, so_e)
    so_p = make_spectrum_ops(cfg)

    d = cfg.num_dimensions
    est = np.zeros(d, np.float32)  # frozen-at-zero = exact chain reduction
    gens_used = 0
    stage_fit = []

    def run_block(block, tries, gens, key):
        # all tries in ONE vmapped device program (VERDICT r4 weak #5);
        # ONE batched readback (per-scalar reads cost a ~25 ms axon round
        # trip each, match_many lesson). Huge frames chunk the batch to
        # the HBM width cap (_batch_width_cap) instead of crashing the
        # worker on one oversized program.
        nonlocal gens_used
        runner = _block_runner_batch(cfg, block, stage_population, gens)
        frozen = jnp.asarray(est)
        center = jnp.asarray(est[list(block)])
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, tries)
        cap = _batch_width_cap(cfg.n_samples, stage_population)
        bvs_l, bfs_l = [], []
        for s in range(0, tries, cap):
            bv, bf = runner(keys[s : s + cap], frozen, center, tspec_e)
            bvs_l.append(np.asarray(bv))
            bfs_l.append(np.asarray(bf))
        bvs, bfs = np.concatenate(bvs_l), np.concatenate(bfs_l)
        gens_used += gens * tries
        i = int(np.argmin(bfs))
        est[list(block)] = bvs[i]
        stage_fit.append(float(bfs[i]))
        return key

    def repair_pass(first_gene, key):
        """Sliding-window joint re-fits over the ACTIVE suffix's adjacent
        operator pairs, repeated while a round improves."""
        for _ in range(repair_rounds):
            before = stage_fit[-1]
            for g0 in range(first_gene, d - 2, 2):
                key = run_block(tuple(range(g0, g0 + 4)), 1,
                                repair_generations, key)
            if stage_fit[-1] >= before * (1.0 - 1e-3):
                break
        return key

    # core: outer three operators (exact fm3_series reduction)
    key = run_block(tuple(range(2 * k - 6, 2 * k)), core_tries,
                    core_generations, key)
    # grow inward, one operator (+ its immediate downstream neighbour) at a
    # time — a 4-gene window. A 6-gene window (op + two downstream) was
    # measured WORSE (median rel 4.7% vs 2.9% on the fm4 gate target): the
    # extra freedom lets the grow stage drag the core off its basin into
    # the compromise valley instead of adapting to the new modulation.
    # After EVERY growth step the active suffix gets a full repair pass —
    # the homotopy is over chain LENGTH, and each intermediate chain must
    # be solved before the next operator's modulation switches on (k=5
    # measured 31-38% rel with a single end-phase repair: the core
    # explains only ~half the 5-chain target, so everything downstream of
    # an unrepaired intermediate is fit against the wrong context).
    for j in range(k - 4, -1, -1):
        key = run_block(tuple(range(2 * j, 2 * j + 4)), grow_tries,
                        grow_generations, key)
        key = repair_pass(2 * j, key)

    # final polish: cfg engine + optional refine tail around the estimate
    key, k_noise, k_run = jax.random.split(key, 3)
    mu = cfg.num_parents
    est_j = jnp.asarray(est)
    pv = jnp.clip(
        est_j[None] + joint_spread * jax.random.normal(k_noise, (mu, d)),
        0.0, 1.0,
    ).astype(jnp.float32)
    pv = pv.at[0].set(est_j)
    state = ESState(
        parent_values=pv,
        parent_steps=jnp.full((mu, d), joint_step, jnp.float32),
        parent_fitness=jnp.full((mu,), jnp.inf, jnp.float32),
        best_values=est_j,
        best_fitness=jnp.asarray(
            float(evaluate(est_j[None], tspec_e, so_e, ecfg)[0]), jnp.float32
        ),
        key=k_run,
        generation=jnp.asarray(0, jnp.int32),
        stall=jnp.asarray(0, jnp.int32),
    )
    final, _ = _evolve_on_target(
        state, target_audio, joint_generations, so_p, cfg, None, False, False
    )
    gens_used += joint_generations
    # f32-elitist guard: the polish runs the CONFIGURED engine, whose
    # self-scored fitness is on a different (optimistic, for quantised
    # engines) scale than the stages' f32 fitness — measured on the fm4
    # gate target: a 3617-fitness estimate polished under int8 came back
    # at 116k because the engine preferred a candidate that only looked
    # good to itself. Keep whichever of (polish output, staged estimate)
    # rescores better under f32.
    final_f32 = float(
        evaluate(final.best_values[None], tspec_e, so_e, ecfg)[0]
    )
    if final_f32 <= stage_fit[-1]:
        best_values, best_fitness = np.asarray(final.best_values), final_f32
    else:
        best_values, best_fitness = est.copy(), float(stage_fit[-1])
    return PursuitResult(
        best_values=best_values,
        best_fitness=best_fitness,
        stage_fitness=np.asarray(stage_fit, np.float32),
        alias_fitness=np.zeros(0, np.float32),
        generations_used=gens_used,
    )


# series pursuit config keys (tpu.pursuit block) -> kwargs
SERIES_CONFIG_KEY_MAP = {
    "stagePopulation": "stage_population",
    "coreGenerations": "core_generations",
    "coreTries": "core_tries",
    "growGenerations": "grow_generations",
    "growTries": "grow_tries",
    "repairRounds": "repair_rounds",
    "repairGenerations": "repair_generations",
    "jointGenerations": "joint_generations",
    "jointSpread": "joint_spread",
    "jointStep": "joint_step",
    "targetRel": "target_rel",
    "maxAttempts": "max_attempts",
}


def series_pursuit_kwargs_from_config(items) -> dict:
    """Map the config's camelCase pursuit block to match_series_pursuit
    kwargs (series-chain key set)."""
    out = {}
    for kname, v in dict(items).items():
        if kname not in SERIES_CONFIG_KEY_MAP:
            raise ValueError(
                f"unknown tpu.pursuit key {kname!r} for a series topology; "
                f"options {list(SERIES_CONFIG_KEY_MAP)}"
            )
        snake = SERIES_CONFIG_KEY_MAP[kname]
        is_float = snake in ("joint_spread", "joint_step", "target_rel")
        out[snake] = float(v) if is_float else int(v)
    return out


def match_series_pursuit(
    target_audio,
    cfg: ESConfig,
    key: jax.Array | int = 0,
    *,
    target_rel: float = 0.0,
    max_attempts: int = 1,
    **attempt_kwargs,
) -> PursuitResult:
    """Recover ``fm{k}_series`` (k >= 4) parameters for one target frame
    via the exact-reduction homotopy (_series_attempt docstring), with the
    same SELF-SCORED multi-start wrapper as match_parallel_pursuit: the
    relative spectral error under the f32 engine needs no ground truth, so
    ``target_rel > 0`` restarts failed attempts with fresh keys (up to
    ``max_attempts``)."""
    return _multi_start(
        _series_attempt, target_audio, cfg, key,
        target_rel=target_rel, max_attempts=max_attempts, **attempt_kwargs,
    )


def _multi_start(
    attempt_fn,
    target_audio,
    cfg: ESConfig,
    key,
    *,
    target_rel: float,
    max_attempts: int,
    **attempt_kwargs,
):
    """Shared self-scored multi-start wrapper (match_parallel_pursuit
    docstring: attempt 0 consumes the caller's key unchanged; acceptance
    and best-of-attempts comparison both run on the f32-rescored scale)."""
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    accept = None
    if target_rel > 0.0:
        ecfg = _eval_cfg(cfg)
        so_e = make_spectrum_ops(ecfg)
        tspec = spectral.target_spectrum(
            jnp.asarray(target_audio, jnp.float32), so_e
        )
        energy = float(np.sum(np.asarray(tspec, np.float64) ** 2))
        accept = target_rel * target_rel * energy

        def score(r):
            # the accept threshold lives on the f32 spectrum-energy scale,
            # so the attempt must be scored there too: with
            # refine_generations == 0 the polish engine can be int8/bf16,
            # whose SELF-REPORTED fitness is ~3.5x optimistic
            # (tools/convergence_check.py) and would accept bad attempts
            return float(
                evaluate(jnp.asarray(r.best_values)[None], tspec, so_e, ecfg)[0]
            )
    best = None
    best_score = np.inf
    gens = 0
    for attempt in range(max(1, max_attempts)):
        akey = key if attempt == 0 else jax.random.fold_in(key, attempt)
        r = attempt_fn(target_audio, cfg, akey, **attempt_kwargs)
        gens += r.generations_used
        s = score(r) if accept is not None else r.best_fitness
        if best is None or s < best_score:
            best, best_score = r, s
        if accept is None or best_score <= accept:
            break
    return best._replace(generations_used=gens, attempts=attempt + 1)
