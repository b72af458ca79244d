"""Per-pipeline-stage timing rows for the production driver.

The reference ends every ``parameterMatchAudio`` run by flushing one CSV row
per pipeline kernel (Evolutionary_Strategy_OpenCL.hpp:601-609), with the
kernel names from its enum (``Evolutionary_Strategy_OpenCL.hpp:117``):
``recombinePopulation, mutatePopulation, synthesisePopulationDoubleSeries,
applyWindowPopulation, openCLFFT, fitnessPopulation, sortPopulation,
rotatePopulation`` followed by ``Total Audio Analysis Time``.

On TPU the production generation is ONE fused program (that is the point of
the design), so per-stage times cannot be collected live from the run the
way a host-sequenced queue can. Instead, when ``isBenchmarking`` is on, the
driver calls :func:`record_stage_rows` once after the match: each stage is
re-run standalone (separately jitted, same config/engine as the run, inside
a fused on-device loop so dispatch overhead does not pollute the number)
and its per-invocation milliseconds are fed to the Benchmarker — giving a
CSV diffable row-for-row against the reference's.

Stage mapping notes (PARITY.md):

* ``applyWindowPopulation`` is timed as the explicit ``audio * window``
  multiply the reference dispatches; the production TPU path folds the
  window into the DFT operand, so this row reports what the stage would
  cost if dispatched standalone.
* ``openCLFFT`` keeps the reference row name for diffability; it times this
  config's spectrum engine (DFT-as-matmul or ``jnp.fft.rfft``).
* ``sortPopulation`` times truncation selection (top-k + survivor gathers),
  which replaces the reference's enumeration sort.
* ``rotatePopulation`` is flushed as an empty row: the ping-pong rotation is
  eliminated by functional updates (SURVEY.md §7.1) — the row exists so the
  CSVs stay row-aligned.
"""
from __future__ import annotations

import time
from typing import Callable


def synthesis_stage_name(topology: str) -> str:
    """The reference kernel-enum name for this topology's synthesis stage
    (Evolutionary_Strategy_OpenCL.hpp:117,132; kernels/ocl_program.cl:280,
    332, 388)."""
    return {
        "fm2": "synthesisePopulation",
        "fm3_series": "synthesisePopulationDoubleSeries",
        "fm3_parallel": "synthesisePopulationTripleParallel",
    }.get(topology, f"synthesisePopulation_{topology}")


def timed_loop(stage_fn: Callable, x, iters: int = 20) -> float:
    """Per-invocation milliseconds of ``stage_fn`` measured inside one jitted
    ``fori_loop`` (device-fused: no per-iteration dispatch in the number).
    A data dependency through the carry stops XLA hoisting the stage out of
    the loop (CLAUDE.md: loop-invariant pallas_call/top_k calls get hoisted
    and time as ~0)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x0):
        def body(i, carry):
            xp, acc = carry
            out = stage_fn(xp + acc * 1e-30)
            return xp, acc + jnp.sum(out).astype(jnp.float32) * 1e-30

        _, acc = jax.lax.fori_loop(0, iters, body, (x0, jnp.float32(0.0)))
        return acc

    from .profiling import device_sync  # axon-safe sync (not
    # block_until_ready: early-return/hang on scalar outputs)

    device_sync(run(x))  # compile
    t0 = time.perf_counter()
    device_sync(run(x))
    return (time.perf_counter() - t0) / iters * 1e3


def record_stage_rows(bm, cfg, *, reps: int = 5, iters: int = 20) -> None:
    """Measure every reference pipeline stage under this run's config and
    flush one Benchmarker row per stage, reference names and order
    (Evolutionary_Strategy_OpenCL.hpp:601-609).

    ``reps`` timed repetitions per stage populate the Max/Min/jitter columns
    of the reference CSV schema (Benchmarker.hpp:132-162).
    """
    import jax
    import jax.numpy as jnp

    from ..es.pipeline import make_spectrum_ops
    from ..es.strategy import evaluate, mutate, recombine, select
    from ..ops import synthesize
    from ..ops.spectral import magnitude_spectrum, spectral_fitness

    so = make_spectrum_ops(cfg)
    pop, d, mu = cfg.population_size, cfg.num_dimensions, cfg.num_parents
    n = cfg.n_samples * cfg.num_frames
    key = jax.random.PRNGKey(0)
    values = jax.random.uniform(key, (pop, d), jnp.float32)
    steps = jnp.full_like(values, 0.1)
    scaled = values * (jnp.asarray(cfg.param_maxs, jnp.float32)
                       - jnp.asarray(cfg.param_mins, jnp.float32)) \
        + jnp.asarray(cfg.param_mins, jnp.float32)
    audio = jax.random.normal(key, (cfg.n_samples, pop), jnp.float32)
    fitness = jax.random.uniform(key, (pop,), jnp.float32)
    spectra = jax.random.uniform(key, (pop, so.num_bins), jnp.float32)
    tspec = jnp.ones((so.num_bins,), jnp.float32)
    if cfg.num_frames > 1:
        tspec = jnp.ones((cfg.num_frames, so.num_bins), jnp.float32)

    stages = [
        ("recombinePopulation",
         lambda v: recombine(key, v[:mu], steps[:mu], cfg)[0], values),
        ("mutatePopulation",
         lambda v: mutate(key, v, steps, cfg)[0], values),
        (synthesis_stage_name(cfg.topology),
         lambda p: synthesize(p, n, cfg.topology,
                              wavetable_size=cfg.wavetable_size,
                              sample_rate=cfg.sample_rate,
                              engine=cfg.synthesis_engine), scaled),
        ("applyWindowPopulation",
         lambda a: a * so.window[:, None], audio),
        ("openCLFFT",
         lambda a: magnitude_spectrum(a, so), audio),
        ("fitnessPopulation",
         lambda s: spectral_fitness(s, tspec[0] if cfg.num_frames > 1 else tspec),
         spectra),
        ("sortPopulation",
         lambda f: select(values, steps, f, mu)[2], fitness),
    ]
    # the production path runs stages 4-7 as ONE fused kernel; report the
    # fused cost too so the CSV carries both views (extra row, TPU-only name)
    if cfg.fused_kernel or cfg.fused_generation:
        stages.append(
            ("evaluateFused(synth+window+FFT+fitness)",
             lambda v: evaluate(v, tspec, so, cfg), values)
        )

    for name, fn, x in stages:
        for _ in range(reps):
            bm.add_timer(name, timed_loop(fn, x, iters=iters))
        bm.elapsed_timer(name)
    # rotation is eliminated by functional updates — flush the empty row so
    # reference and TPU CSVs stay row-aligned (see module docstring)
    bm.elapsed_timer("rotatePopulation")
