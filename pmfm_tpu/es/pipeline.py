"""The fused per-generation step and the chunked audio matcher.

The reference drives nine kernels per generation with a host sync after each
(executeGeneration, Evolutionary_Strategy_OpenCL.hpp:471-541) and the Vulkan
backend even round-trips the full population audio over PCIe every generation
(Evolutionary_Strategy_Vulkan.hpp:1127-1154). On TPU the entire generation —
recombine, mutate, synthesise, window, FFT, fitness, select — is one jitted
pure function ``generation_step``; ``evolve`` rolls ``G`` generations into a
single ``lax.scan`` so an entire chunk match is one device program with zero
host round trips.

``match_audio`` reproduces parameterMatchAudio
(Evolutionary_Strategy_OpenCL.hpp:572-610): the target is processed in
chunks of ``2^audio_length_log2`` samples, a fresh population evolved per
chunk, best parameters reported per chunk, and the best candidate of each
chunk resynthesised into the output audio (main.cpp:270-275 resynthesises on
the host; here it is device-side).
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import spectral, synthesis
from .config import ESConfig
from .strategy import (
    ESState, evaluate, init_state, mutate, recombine, select, select_t,
)


def make_spectrum_ops(cfg: ESConfig) -> spectral.SpectrumOps:
    # all topologies support the int8 engine: fm2 and fm{k}_series factor
    # their single output amplitude out of the audio; fm{k}_parallel factors
    # the mean amplitude s and scales each pair by amp_j*63/(k*s) in-kernel
    # (63, not 127: the folded sums q[n] +- q[N-n] must stay within int8 —
    # kernels/synth_fitness.py _evaluate_block docstring)
    return spectral.make_spectrum_ops(
        cfg.n_samples,
        num_bins=cfg.num_bins,
        method=cfg.spectrum_method,
        dft_dtype=jnp.dtype(cfg.dft_dtype),
        cache_dir=cfg.operand_cache_dir,
    )


def kernel_seed(key: jax.Array, generation: jax.Array, shard=None) -> jax.Array:
    """Per-generation (and per-shard) seed for the fused kernels' in-kernel
    PRNG — one definition shared by the single-chip and sharded paths.

    Derivation: base word of the run's key + an integer HASH of the
    generation index (+ an odd-stride shard term). The hash (murmur-style
    multiply/xor-shift/multiply) is essential: the kernel reseeds each
    population block as ``seed + program_id * 0x1E3779B9``
    (kernels/generation.py), so any LINEAR generation stride g*C aliases
    the block stride whenever C ≡ 0x1E3779B9 modulo small factors — e.g.
    the golden-ratio constant 0x9E3779B9 differs from it by exactly 2^31,
    which made stream(gen g, block i) depend only on g+i and g's parity
    (~94% of per-block streams were replays). Hashing g removes all linear
    structure; residual collisions are birthday-scale (~32k slots in 2^31).

    Cheaper than the previous per-generation split+randint threefry chain
    (~2% of the steady-state generation at the bench config); the state key
    itself is not consumed here. Works with both raw ``(2,) uint32`` keys
    and new-style typed keys.
    """
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        key = jax.random.key_data(key)
    base = (
        jax.lax.bitcast_convert_type(key.reshape(-1)[0], jnp.int32)
        & jnp.int32(0x7FFFFFFF)
    )
    g = generation.astype(jnp.int32) * jnp.int32(-862048943)  # 0xCC9E2D51
    g = g ^ jax.lax.shift_right_logical(g, 15)
    g = g * jnp.int32(0x27D4EB2F)
    if shard is not None:
        g = g + shard.astype(jnp.int32) * jnp.int32(-1028477387)  # 0xC2B2AE35
    return base + g


def fused_generation_kwargs(cfg: ESConfig, spectrum_ops, *, pop=None, interpret=False) -> dict:
    """The static/operand kwargs for ``kernels.generation.fused_generation``,
    built from one (cfg, spectrum_ops) pair. The single source shared by the
    single-chip step below and the sharded per-shard step
    (parallel/sharded.py) so the two paths cannot drift."""
    return dict(
        pop=cfg.population_size if pop is None else pop,
        param_mins=cfg.param_mins,
        param_maxs=cfg.param_maxs,
        topology=cfg.topology,
        n=cfg.n_samples,
        wavetable_size=cfg.wavetable_size,
        sample_rate=cfg.sample_rate,
        pop_block=cfg.pop_block,
        interpret=interpret,
        num_frames=cfg.num_frames,
        alpha=cfg.alpha,
        beta=cfg.beta,
        beta_scale=cfg.beta_scale,
        root_two_over_pi=cfg.root_two_over_pi,
        clamp_values=cfg.clamp_values,
        min_step=cfg.min_step,
        dft_packed=spectrum_ops.dft_packed,
        dft_scale=spectrum_ops.dft_packed_scale,
        sine_order=cfg.sine_order,
    )


class Population(NamedTuple):
    """One generation's full evaluated offspring, sorted best-first — the
    ``readPopulationData`` analog (Evolutionary_Strategy_OpenCL.hpp:417-430
    returns the entire sorted population values/steps/fitness). The TPU
    build keeps only the mu parents between generations (strategy.ESState
    rationale), so this exists ONLY through the opt-in debug hook
    ``evolve(..., return_population=True)``."""

    values: jax.Array  # (P, D) in [0, 1]
    steps: jax.Array  # (P, D)
    fitness: jax.Array  # (P,) ascending (best first)


def generation_step(
    state: ESState,
    target_spectrum: jax.Array,
    spectrum_ops: spectral.SpectrumOps,
    cfg: ESConfig,
    *,
    want_population: bool = False,
):
    """One fused ES generation. Order matches executeGeneration
    (Evolutionary_Strategy_OpenCL.hpp:471-541): recombine -> mutate ->
    evaluate(synth/window/fft/fitness) -> select. No rotation stage: the
    ping-pong double-buffer is subsumed by functional updates.

    With ``want_population=True`` returns ``(new_state, Population)`` —
    the generation's full evaluated offspring sorted best-first (debug
    readback; adds a full-population argsort+gather, so keep it out of
    hot loops). Otherwise returns just the new state."""
    from .strategy import _fused_ok

    # The in-kernel PRNG only exists on real TPUs (the interpreter draws
    # zeros), so on CPU the flag falls back to the XLA path — the two are
    # statistically equivalent by design (tools/tpu_gen_check.py validates
    # the kernel's distributions on hardware).
    if (
        cfg.fused_generation
        and _fused_ok(cfg, spectrum_ops)
        and cfg.gauss_sigma == 1.0 / 6.0  # kernel noise is CLT sigma=1/6
        and jax.default_backend() != "cpu"
    ):
        from ..kernels.generation import fused_generation

        # Generation-indexed kernel seed (see kernel_seed — hashed, NOT a
        # linear stride, which would alias the kernel's per-block stride).
        # The state key advances only in the restart branch below
        # (unconditionally per generation when restart_patience > 0, never
        # otherwise). Distribution quality on hardware is re-validated by
        # tools/tpu_gen_check.py.
        key = state.key
        seed = kernel_seed(state.key, state.generation)
        fitness, values_t, steps_t = fused_generation(
            seed,
            state.parent_values,
            state.parent_steps,
            spectrum_ops.dft_cos,
            spectrum_ops.dft_sin,
            target_spectrum,
            **fused_generation_kwargs(
                cfg, spectrum_ops, interpret=jax.default_backend() == "cpu"
            ),
        )
        # selection on the kernel's transposed padded layout (no full-pop
        # transpose, strategy.select_t)
        pv, ps, pf = select_t(
            values_t, steps_t, fitness, cfg.num_parents, cfg.num_dimensions
        )
        if want_population:
            d = cfg.num_dimensions
            values, steps = values_t[:d].T, steps_t[:d].T
    else:
        key, k_rec, k_mut = jax.random.split(state.key, 3)
        values, steps = recombine(k_rec, state.parent_values, state.parent_steps, cfg)
        values, steps = mutate(k_mut, values, steps, cfg)
        fitness = evaluate(values, target_spectrum, spectrum_ops, cfg)
        pv, ps, pf = select(values, steps, fitness, cfg.num_parents)
    population = None
    if want_population:
        order = jnp.argsort(fitness)
        population = Population(
            values=values[order], steps=steps[order], fitness=fitness[order]
        )
    improved = pf[0] < state.best_fitness
    stall = jnp.where(improved, 0, state.stall + 1).astype(jnp.int32)
    if cfg.restart_patience > 0:
        # stall-triggered restart: fresh random parents (best-ever retained)
        key, k_restart = jax.random.split(key)
        restart = stall >= cfg.restart_patience
        fresh_v = jax.random.uniform(k_restart, pv.shape, jnp.float32)
        pv = jnp.where(restart, fresh_v, pv)
        ps = jnp.where(restart, jnp.full_like(ps, 0.1), ps)
        pf = jnp.where(restart, jnp.full_like(pf, jnp.inf), pf)
        stall = jnp.where(restart, 0, stall)
    new_state = ESState(
        parent_values=pv,
        parent_steps=ps,
        parent_fitness=pf,
        best_values=jnp.where(improved, pv[0], state.best_values),
        best_fitness=jnp.where(improved, pf[0], state.best_fitness),
        key=key,
        generation=state.generation + 1,
        stall=stall,
    )
    if want_population:
        return new_state, population
    return new_state


def _fused_evolve_ok(cfg: ESConfig, spectrum_ops) -> bool:
    """Whether the whole-run mega-kernel (kernels/evolve.py) applies."""
    from .strategy import _fused_ok

    return (
        cfg.fused_evolve
        and cfg.fused_generation
        and _fused_ok(cfg, spectrum_ops)
        and cfg.gauss_sigma == 1.0 / 6.0
        and cfg.restart_patience == 0
        and cfg.fitness_threshold <= 0.0
        and jax.default_backend() != "cpu"
    )


def _evolve_mega(
    state: ESState,
    target_spectrum: jax.Array,
    num_generations: int,
    spectrum_ops: spectral.SpectrumOps,
    cfg: ESConfig,
    record_trajectory: bool,
    interpret: bool = False,
):
    """evolve() via the whole-run kernel: one pallas invocation for ALL
    generations (kernels/evolve.py — per-invocation VMEM cost paid once)."""
    from ..kernels.evolve import fused_evolve

    if num_generations == 0:  # match the scan path's no-op behaviour
        traj0 = jnp.zeros((0,), jnp.float32) if record_trajectory else None
        return state, traj0

    key, k_seed = jax.random.split(state.key)
    seed = jax.random.randint(k_seed, (), 0, 2**31 - 1)
    from ..kernels.synth_fitness import resolve_pop_block

    pb = resolve_pop_block(cfg.population_size, cfg.pop_block)
    pv, ps, pf, bv, bf, traj = fused_evolve(
        seed,
        state.parent_values,
        state.parent_steps,
        state.best_values,
        state.best_fitness,
        spectrum_ops.dft_packed,
        target_spectrum,
        gens=num_generations,
        pop=cfg.population_size,
        param_mins=cfg.param_mins,
        param_maxs=cfg.param_maxs,
        topology=cfg.topology,
        n=cfg.n_samples,
        wavetable_size=cfg.wavetable_size,
        sample_rate=cfg.sample_rate,
        pop_block=pb,
        interpret=interpret,
        num_frames=cfg.num_frames,
        alpha=cfg.alpha,
        beta=cfg.beta,
        beta_scale=cfg.beta_scale,
        root_two_over_pi=cfg.root_two_over_pi,
        clamp_values=cfg.clamp_values,
        min_step=cfg.min_step,
        dft_scale=spectrum_ops.dft_packed_scale,
        gens_per_step=cfg.gens_per_step,
        sine_order=cfg.sine_order,
    )
    # stall = generations since the best improved, recovered from the
    # best-ever trajectory the kernel always emits
    prev = jnp.concatenate([state.best_fitness[None], traj[:-1]])
    improved = traj < prev
    idx = jnp.arange(num_generations)
    last = jnp.max(jnp.where(improved, idx, -1))
    stall = jnp.where(
        last < 0,
        state.stall + num_generations,
        num_generations - 1 - last,
    ).astype(jnp.int32)
    final = ESState(
        parent_values=pv,
        parent_steps=ps,
        parent_fitness=pf,
        best_values=bv,
        best_fitness=bf,
        key=key,
        generation=state.generation + num_generations,
        stall=stall,
    )
    return final, (traj if record_trajectory else None)


def evolve(
    state: ESState,
    target_spectrum: jax.Array,
    num_generations: int,
    spectrum_ops: spectral.SpectrumOps,
    cfg: ESConfig,
    record_trajectory: bool = False,
    return_population: bool = False,
):
    """Run ``num_generations`` generations in one ``lax.scan``
    (executeAllGenerations, Evolutionary_Strategy_OpenCL.hpp:542-554).

    If ``cfg.fitness_threshold > 0`` a ``lax.while_loop`` stops early once the
    best fitness drops below it — the reference parses this knob but never
    uses it (SURVEY.md §5.6); here it is live. Early stop and trajectory
    recording are mutually exclusive (scan needs a static length).

    Returns ``(final_state, trajectory)`` where trajectory is
    ``(best_fitness_per_gen,)`` or ``None``.

    ``return_population=True`` (debug readback, the ``readPopulationData``
    analog — Evolutionary_Strategy_OpenCL.hpp:417-430) appends a third
    element: the LAST generation's full evaluated offspring as a
    ``Population`` (values/steps/fitness sorted best-first). It threads the
    population through the scan carry, so it costs O(P*D) carry bytes plus
    one argsort+gather per generation; single-chip scan path only (the
    mega-kernel ablation and the early-stop while_loop don't support it).
    """
    if return_population:
        if _fused_evolve_ok(cfg, spectrum_ops):
            raise ValueError(
                "return_population is not supported with fused_evolve "
                "(the mega-kernel keeps offspring in VMEM scratch)"
            )
        if cfg.fitness_threshold > 0.0 and not record_trajectory:
            raise ValueError(
                "return_population requires a static-length run "
                "(disable fitness_threshold early stop)"
            )
        if num_generations == 0:
            raise ValueError("return_population needs num_generations >= 1")

        def body_pop(carry, _):
            s, _pop = carry
            s, pop = generation_step(
                s, target_spectrum, spectrum_ops, cfg, want_population=True
            )
            return (s, pop), (s.best_fitness if record_trajectory else None)

        p, d = cfg.population_size, cfg.num_dimensions
        dummy = Population(
            values=jnp.zeros((p, d), jnp.float32),
            steps=jnp.zeros((p, d), jnp.float32),
            fitness=jnp.full((p,), jnp.inf, jnp.float32),
        )
        (final, pop), traj = jax.lax.scan(
            body_pop, (state, dummy), None, length=num_generations
        )
        return final, (traj if record_trajectory else None), pop
    if _fused_evolve_ok(cfg, spectrum_ops):
        return _evolve_mega(
            state, target_spectrum, num_generations, spectrum_ops, cfg,
            record_trajectory,
        )
    step = partial(generation_step, target_spectrum=target_spectrum,
                   spectrum_ops=spectrum_ops, cfg=cfg)
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


def refine_boundary(
    final: ESState,
    tspec_r: jax.Array,
    so_r: spectral.SpectrumOps,
    cfg: ESConfig,
    cfg_r: ESConfig,
) -> ESState:
    """The fast-engine -> f32 phase transition of the refine tail, shared by
    ``_evolve_on_target`` and tools/convergence_check.py so the two cannot
    drift:

    * best-ever is RESCORED under the refine engine (cross-engine fitness
      scales must not mask/fake improvements);
    * the best-ever candidate is INJECTED into parent slot 0 — round-3
      audit: 35/64 holdout seeds were bit-unchanged by the tail because the
      refine population only contained the final generation's parents
      (ranked by quantised fitness, possibly drifted off the best basin),
      so 100 f32 generations around THEIR neighbourhood never beat the
      separately-tracked best-ever. Polishing around the actual output
      point engages the tail on every seed that has any f32-downhill
      neighbour (VERDICT r3 #4);
    * frozen steps re-open to ``refine_step_floor`` (they re-adapt from
      there; ESConfig.refine_step_floor rationale).
    """
    bf = evaluate(final.best_values[None], tspec_r, so_r, cfg_r)[0]
    pv = final.parent_values.at[0].set(final.best_values)
    ps = final.parent_steps
    if cfg.refine_step_floor > 0.0:
        ps = jnp.maximum(ps, jnp.float32(cfg.refine_step_floor))
    return final._replace(best_fitness=bf, parent_values=pv, parent_steps=ps)


def _evolve_on_target(
    state: ESState,
    target_audio: jax.Array,
    num_generations: int,
    spectrum_ops: spectral.SpectrumOps,
    cfg: ESConfig,
    mesh,
    record_trajectory: bool,
    stft: bool,
):
    """evolve (sharded if ``mesh``) against ``target_audio``, with the
    optional PRECISION-ANNEALING tail: the last ``cfg.refine_generations``
    run under the f32/jnp.sin XLA engine against a freshly-computed f32
    target spectrum (ESConfig.refine_generations rationale), seeded at the
    best-ever candidate (refine_boundary)."""

    def tspec_for(so_):
        if stft:
            t = spectral.target_spectrum_frames(target_audio, so_)
            return t[0] if cfg.num_frames == 1 else t
        return spectral.target_spectrum(target_audio, so_)

    def ev(s, t, n, so_, cfg_):
        if mesh is not None:
            from ..parallel.sharded import evolve_sharded

            return evolve_sharded(s, t, n, so_, cfg_, mesh, record_trajectory)
        return evolve(s, t, n, so_, cfg_, record_trajectory)

    refine = (
        min(cfg.refine_generations, num_generations)
        if cfg.refine_generations > 0
        else 0
    )
    final, traj = ev(state, tspec_for(spectrum_ops), num_generations - refine,
                     spectrum_ops, cfg)
    if refine:
        cfg_r = cfg.refine_config()
        so_r = make_spectrum_ops(cfg_r)
        tspec_r = tspec_for(so_r)
        final = refine_boundary(final, tspec_r, so_r, cfg, cfg_r)
        final, traj_r = ev(final, tspec_r, refine, so_r, cfg_r)
        if traj is not None and traj_r is not None:
            traj = jnp.concatenate([traj, traj_r])
    return final, traj


@lru_cache(maxsize=32)
def _compiled_chunk_matcher(
    cfg: ESConfig, num_generations: int, record_trajectory: bool, mesh=None
):
    """jit-compiled: (key, target_audio_chunk) -> (final_state, trajectory,
    best_scaled_params, resynthesised_best_audio). With ``mesh`` the evolve
    loop runs population-sharded (parallel/sharded.py)."""
    so = make_spectrum_ops(cfg)
    mins = jnp.asarray(cfg.param_mins, jnp.float32)
    maxs = jnp.asarray(cfg.param_maxs, jnp.float32)

    @jax.jit
    def run(key, target_audio):
        state = init_state(key, cfg)
        final, traj = _evolve_on_target(
            state, target_audio, num_generations, so, cfg, mesh,
            record_trajectory, stft=False,
        )
        best_scaled = synthesis.scale_params(final.best_values, mins, maxs)
        best_audio = synthesis.synthesize(
            best_scaled[None, :],
            cfg.n_samples,
            cfg.topology,
            wavetable_size=cfg.wavetable_size,
            sample_rate=cfg.sample_rate,
            osc_mode=cfg.osc_mode,
            unroll=cfg.scan_unroll,
            engine=cfg.synthesis_engine,
        )[:, 0]
        return final, traj, best_scaled, best_audio

    return run


@lru_cache(maxsize=32)
def _compiled_many_matcher(cfg: ESConfig, num_generations: int, mesh=None):
    """jit of the VMAPPED stft matcher — match_many's engine. Cached so
    repeated calls at one (cfg, gens) reuse the compiled executable
    instead of re-tracing the batched G-generation scan per call."""
    run = _compiled_stft_matcher(cfg, num_generations, False, mesh)
    return jax.jit(jax.vmap(run))


@lru_cache(maxsize=32)
def _compiled_stft_matcher(cfg: ESConfig, num_generations: int, record_trajectory: bool, mesh=None):
    """jit: (key, target_audio (F*N,)) -> (final_state, traj, best_scaled,
    best_audio (F*N,)) — one ES run scored over all STFT frames."""
    so = make_spectrum_ops(cfg)
    mins = jnp.asarray(cfg.param_mins, jnp.float32)
    maxs = jnp.asarray(cfg.param_maxs, jnp.float32)

    @jax.jit
    def run(key, target_audio):
        state = init_state(key, cfg)
        final, traj = _evolve_on_target(
            state, target_audio, num_generations, so, cfg, mesh,
            record_trajectory, stft=True,
        )
        best_scaled = synthesis.scale_params(final.best_values, mins, maxs)
        best_audio = synthesis.synthesize(
            best_scaled[None, :],
            cfg.n_samples * cfg.num_frames,
            cfg.topology,
            wavetable_size=cfg.wavetable_size,
            sample_rate=cfg.sample_rate,
            osc_mode=cfg.osc_mode,
            unroll=cfg.scan_unroll,
            engine=cfg.synthesis_engine,
        )[:, 0]
        return final, traj, best_scaled, best_audio

    return run


def match_audio_stft(
    target_audio: np.ndarray,
    cfg: ESConfig,
    key: jax.Array | int = 0,
    num_generations: int = 1000,
    record_trajectory: bool = False,
    mesh: Any | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
) -> MatchResult:
    """Match one parameter set against ALL frames of the target at once
    (multi-frame STFT fitness, BASELINE.json config 2) — contrast with
    ``match_audio``'s reference-style fresh-population-per-chunk loop.

    With ``checkpoint_dir`` + ``checkpoint_every`` the evolve is segmented
    and resumable at generation granularity (evolve_checkpointed)."""
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    frames = len(target_audio) // cfg.n_samples
    if frames == 0:
        raise ValueError("target shorter than one frame")
    cfg = cfg.replace(num_frames=frames)
    frame_audio = jnp.asarray(
        target_audio[: frames * cfg.n_samples], jnp.float32
    )
    if checkpoint_dir is not None and checkpoint_every > 0:
        so = make_spectrum_ops(cfg)
        tframes = spectral.target_spectrum_frames(frame_audio, so)
        if cfg.num_frames == 1:
            tframes = tframes[0]
        state = init_state(key, cfg)
        final, traj = evolve_checkpointed(
            state, tframes, num_generations, so, cfg, checkpoint_dir,
            every=checkpoint_every, mesh=mesh,
            record_trajectory=record_trajectory,
        )
        mins = jnp.asarray(cfg.param_mins, jnp.float32)
        maxs = jnp.asarray(cfg.param_maxs, jnp.float32)
        best_scaled = synthesis.scale_params(final.best_values, mins, maxs)
        best_audio = synthesis.synthesize(
            best_scaled[None, :], cfg.n_samples * cfg.num_frames, cfg.topology,
            wavetable_size=cfg.wavetable_size, sample_rate=cfg.sample_rate,
            osc_mode=cfg.osc_mode, unroll=cfg.scan_unroll,
            engine=cfg.synthesis_engine,
        )[:, 0]
    else:
        run = _compiled_stft_matcher(cfg, num_generations, record_trajectory, mesh)
        final, traj, best_scaled, best_audio = run(key, frame_audio)
    jax.block_until_ready(best_audio)
    result = ChunkResult(
        best_params_scaled=np.asarray(best_scaled),
        best_params_norm=np.asarray(final.best_values),
        best_fitness=float(final.best_fitness),
        generations_run=int(final.generation),
        trajectory=None if traj is None else np.asarray(traj),
    )
    return MatchResult(chunks=[result], output_audio=np.asarray(best_audio), config=cfg)


def match_many(
    targets: np.ndarray,
    cfg: ESConfig,
    key: jax.Array | int = 0,
    num_generations: int = 1000,
    mesh: Any | None = None,
) -> list["MatchResult"]:
    """Batched multi-target matching (BASELINE.json config 5): B independent
    ES runs — one per target sound — execute concurrently in a single device
    program via ``vmap`` over (key, target). With ``mesh``, each run's
    population is additionally sharded over the device mesh (vmap composes
    over the shard_map collectives) — the full "batched multi-target,
    multi-host" shape."""
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    targets = np.asarray(targets, np.float32)
    if targets.ndim != 2:
        raise ValueError("targets must be (batch, samples)")
    frames = targets.shape[1] // cfg.n_samples
    if frames == 0:
        raise ValueError("targets shorter than one frame")
    cfg = cfg.replace(num_frames=frames)
    keys = jax.random.split(key, targets.shape[0])
    t = jnp.asarray(targets[:, : frames * cfg.n_samples])
    # jit the vmapped matcher ONCE per (cfg, gens, mesh): a bare
    # jax.vmap(run) re-traces the whole G-generation scan on EVERY call
    # (~0.3-0.9 s host time here), which depressed the round-4
    # multi_target artifact by ~2x. The batched pallas lowering itself is
    # optimal — a hand-written segmented kernel grid (per-segment operand
    # BlockSpecs) measured IDENTICAL device time (59.3 vs 59.5M aggregate
    # evals/s at B=4 pop 2^13; 67.0M both at B=32 pop 2^11), so vmap is
    # the whole multi-target mechanism (tools/tpu_multitarget_probe.py).
    run = _compiled_many_matcher(cfg, num_generations, mesh)
    finals, _, best_scaled, best_audio = run(keys, t)
    # ONE batched device->host transfer per output array: per-result
    # np.asarray/float() calls each cost a full axon round trip (~25 ms
    # apiece on the dev tunnel), which at B=4 doubled the measured
    # multi-target wall time. np.asarray is also the reliable sync here
    # (axon block_until_ready returns early / hangs on scalars — utils
    # device_sync rationale).
    bs = np.asarray(best_scaled)
    bv = np.asarray(finals.best_values)
    bf = np.asarray(finals.best_fitness)
    gen = np.asarray(finals.generation)
    ba = np.asarray(best_audio)
    results = []
    for b in range(targets.shape[0]):
        chunk = ChunkResult(
            best_params_scaled=bs[b],
            best_params_norm=bv[b],
            best_fitness=float(bf[b]),
            generations_run=int(gen[b]),
            trajectory=None,
        )
        results.append(
            MatchResult(chunks=[chunk], output_audio=ba[b], config=cfg)
        )
    return results


class ChunkResult(NamedTuple):
    best_params_scaled: np.ndarray  # (D,)
    best_params_norm: np.ndarray  # (D,) in [0,1]
    best_fitness: float
    generations_run: int
    trajectory: np.ndarray | None  # (G,) best fitness per generation


@dataclasses.dataclass
class MatchResult:
    """Full output of one parameterMatchAudio run."""

    chunks: list[ChunkResult]
    output_audio: np.ndarray  # resynthesised best candidate per chunk, concat
    config: ESConfig

    @property
    def best_chunk(self) -> ChunkResult:
        return min(self.chunks, key=lambda c: c.best_fitness)


def match_audio(
    target_audio: np.ndarray,
    cfg: ESConfig,
    key: jax.Array | int = 0,
    num_generations: int = 1000,
    record_trajectory: bool = False,
    benchmarker: Any | None = None,
    checkpoint_dir: str | None = None,
    mesh: Any | None = None,
) -> MatchResult:
    """Match FM parameters chunk-by-chunk over a target waveform.

    Mirrors Evolutionary_Strategy_OpenCL::parameterMatchAudio
    (Evolutionary_Strategy_OpenCL.hpp:572-610): ``numChunks =
    len(target)//chunk`` (remainder ignored, as in the reference), fresh
    population per chunk.

    Args:
      benchmarker: optional ``utils.benchmarker.Benchmarker``; per-chunk
        wall time is recorded under "chunk" and the total under
        "Total Audio Analysis Time" (CSV-compatible with the reference's
        Benchmarker.hpp:132-162 schema).
      checkpoint_dir: if set, per-chunk results are persisted there and a
        rerun with the same config resumes after the last completed chunk
        (capability upgrade over the reference, SURVEY.md §5.3).
    """
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    chunk = cfg.n_samples
    num_chunks = len(target_audio) // chunk
    if num_chunks == 0:
        raise ValueError(
            f"target audio ({len(target_audio)} samples) shorter than one "
            f"chunk ({chunk})"
        )
    run = _compiled_chunk_matcher(cfg, num_generations, record_trajectory, mesh)

    results = []
    out_audio = []
    start_chunk = 0
    if checkpoint_dir is not None:
        from ..utils import chunk_store

        start_chunk, results, out_audio, key = chunk_store.resume(
            checkpoint_dir, cfg, key
        )
        # a previous run may have matched a longer target
        start_chunk = min(start_chunk, num_chunks)
        results = results[:num_chunks]
        out_audio = out_audio[:num_chunks]
    if benchmarker is not None:
        benchmarker.start_timer("Total Audio Analysis Time")
    for i in range(start_chunk, num_chunks):
        if benchmarker is not None:
            benchmarker.start_timer("chunk")
        key, sub = jax.random.split(key)
        frame = jnp.asarray(
            target_audio[i * chunk : (i + 1) * chunk], jnp.float32
        )
        final, traj, best_scaled, best_audio = run(sub, frame)
        jax.block_until_ready(best_audio)
        if benchmarker is not None:
            benchmarker.pause_timer("chunk")
        result = ChunkResult(
            best_params_scaled=np.asarray(best_scaled),
            best_params_norm=np.asarray(final.best_values),
            best_fitness=float(final.best_fitness),
            generations_run=int(final.generation),
            trajectory=None if traj is None else np.asarray(traj),
        )
        results.append(result)
        out_audio.append(np.asarray(best_audio))
        if checkpoint_dir is not None:
            chunk_store.save_chunk(checkpoint_dir, cfg, i, result, out_audio[-1], key)
    if benchmarker is not None:
        benchmarker.pause_timer("Total Audio Analysis Time")
    return MatchResult(
        chunks=results,
        output_audio=np.concatenate(out_audio),
        config=cfg,
    )


def evolve_checkpointed(
    state: ESState,
    target_spectrum: jax.Array,
    num_generations: int,
    spectrum_ops: spectral.SpectrumOps,
    cfg: ESConfig,
    checkpoint_dir: str,
    every: int = 100,
    chunk_index: int = 0,
    mesh: Any | None = None,
    record_trajectory: bool = False,
):
    """``evolve`` with a generation-granularity checkpoint every ``every``
    generations (SURVEY.md §5.3: per-generation checkpointing is essentially
    free because ES state is O(mu*D)). A rerun with the same config resumes
    from the last saved segment.

    Unlike ``match_audio``'s chunk-level resume, this protects long
    single-chunk/STFT runs (thousands of generations) against preemption.
    """
    from ..utils.checkpoint import load_checkpoint, save_checkpoint

    loaded = load_checkpoint(checkpoint_dir, cfg, tag=f"gen_chunk{chunk_index}")
    traj_parts: list[np.ndarray] = []
    if loaded is not None:
        state = loaded[0]
        if record_trajectory and loaded[2] is not None:
            traj_parts.append(loaded[2])
    start = int(state.generation)
    if mesh is not None:
        from ..parallel.sharded import evolve_sharded as _evolve

        def seg(s, n):
            return _evolve(s, target_spectrum, n, spectrum_ops, cfg, mesh,
                           record_trajectory=record_trajectory)
    else:

        def seg(s, n):
            return evolve(s, target_spectrum, n, spectrum_ops, cfg,
                          record_trajectory=record_trajectory)

    done = start
    while done < num_generations:
        n = min(every, num_generations - done)
        state, traj = seg(state, n)
        np.asarray(state.best_fitness)  # axon-safe sync (scalar: see
        # utils.device_sync)
        done += n
        if record_trajectory:
            traj_parts.append(np.asarray(traj))
        full_traj = np.concatenate(traj_parts) if traj_parts else None
        save_checkpoint(checkpoint_dir, state, cfg, chunk_index,
                        tag=f"gen_chunk{chunk_index}", trajectory=full_traj)
    if record_trajectory:
        return state, (np.concatenate(traj_parts) if traj_parts else np.zeros(0, np.float32))
    return state, None
