"""Benchmark suite.

Implements the reference's PLANNED benchmark list, which its code sketches
but never implements (main.cpp:291-301):

  1 OverallExecution      — end-to-end match wall time
  2 ProgramStageExecution — per-stage device time
  3 AudioAnalysisChunkSize— sweep audioLengthLog2
  4 PopulationScaling     — sweep population size
  5 Optimizations on/off  — engine ablations (scan vs scanless, dft vs rfft,
                            f32 vs bf16, fused Pallas kernel on/off)
  (6 Discrete-vs-integrated GPU has no TPU analog; the nearest equivalent,
   single-chip vs sharded mesh, is covered by tools/ + parallel/.)

Every suite writes the reference's 7-column CSV schema
(Benchmarker.hpp:132-162) via utils.Benchmarker for direct comparability.

Usage: python -m pmfm_tpu.bench_suite [--suite all] [--pop 32768] ...
"""
from __future__ import annotations

import argparse
import sys
import time


def _steady_time(fn, *args, reps=3):
    from .utils import device_sync  # NOT block_until_ready: it can return
    # early or hang on scalar outputs under the axon backend (device_sync
    # docstring)

    device_sync(fn(*args))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        device_sync(fn(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def _make_runner(cfg, gens, so=None):
    import jax
    import jax.numpy as jnp

    from .es import init_state, make_spectrum_ops
    from .es.pipeline import evolve

    if so is None:
        so = make_spectrum_ops(cfg)
    tspec = jnp.ones((so.num_bins,), jnp.float32)
    # the (N, K)-scale DFT operands ride as jit ARGUMENTS, not closure
    # constants: closure arrays are inlined into the HLO, and at n >= 16384
    # the serialized program exceeds the remote compile service's request
    # body limit (HTTP 413) on the axon dev tunnel
    big = {
        f: getattr(so, f)
        for f in ("dft_cos", "dft_sin", "dft_packed")
        if getattr(so, f) is not None
    }

    @jax.jit
    def run(key, big):
        state = init_state(key, cfg)
        final, _ = evolve(state, tspec, gens, so._replace(**big), cfg)
        return final.best_fitness

    import jax.random as jr

    return lambda: run(jr.PRNGKey(0), big)


# --engine presets: "default" = bf16 + --fused flag; "flagship" = the
# bench.py engine (folded int8, fully-fused generation, order-7 sine)
ENGINES = {
    "default": {},
    "flagship": dict(synthesis_engine="scanless", spectrum_method="dft",
                     dft_dtype="int8", fused_kernel=True,
                     fused_generation=True, sine_order=7),
}


def _base_cfg(args, **over):
    from .es import ESConfig

    kw = dict(
        num_parents=args.parents,
        num_offspring=args.pop - args.parents,
        num_dimensions=6,
        topology="fm3_series",
        audio_length_log2=args.log2,
        synthesis_engine="scanless",
        spectrum_method="dft",
        dft_dtype="bfloat16",
        fused_kernel=args.fused,
        pop_block=1024,  # tuned bench value (CLAUDE.md perf notes)
        # large-frame rows (chunk_size n>=16384): the O(N^2) operand build
        # is ~2 min of host f64 trig per (n, bins, dtype) — cache on disk
        operand_cache_dir=getattr(args, "operand_cache", None),
    )
    kw.update(ENGINES[getattr(args, "engine", "default")])
    kw.update(over)
    return ESConfig(**kw)


def suite_overall(args, bm):
    cfg = _base_cfg(args)
    dt = _steady_time(_make_runner(cfg, args.gens))
    bm.add_timer("OverallExecution", dt * 1e3)
    evals = cfg.population_size * args.gens / dt
    print(f"OverallExecution: {dt*1e3:.1f}ms for {args.gens} gens "
          f"({evals/1e6:.2f}M evals/s)")
    bm.elapsed_timer("OverallExecution")


def suite_stages(args, bm):
    """Per-stage timing inside a compiled loop (tools/tpu_stage_profile.py
    logic, recorded to CSV)."""
    import jax
    import jax.numpy as jnp

    from .es import make_spectrum_ops
    from .es.strategy import evaluate, mutate, recombine, select
    from .ops import magnitude_spectrum, synthesize

    cfg = _base_cfg(args)
    so = make_spectrum_ops(cfg)
    P, N, MU = cfg.population_size, cfg.n_samples, cfg.num_parents
    key = jax.random.PRNGKey(0)
    tspec = jnp.ones((so.num_bins,), jnp.float32)
    values = jax.random.uniform(key, (P, cfg.num_dimensions))
    steps = jnp.full_like(values, 0.1)
    audio = jax.random.normal(key, (N, P), jnp.float32)
    fitness = jax.random.uniform(key, (P,), jnp.float32)
    scaled = values * 3000.0

    def timed_loop(stage_fn, x, iters=30):
        @jax.jit
        def run(x0):
            def body(i, carry):
                xp, acc = carry
                out = stage_fn(xp + acc * 1e-30)
                return xp, acc + jnp.sum(out).astype(jnp.float32) * 1e-30
            _, acc = jax.lax.fori_loop(0, iters, body, (x0, jnp.float32(0.0)))
            return acc
        from .utils import device_sync

        device_sync(run(x))
        t0 = time.perf_counter()
        device_sync(run(x))
        return (time.perf_counter() - t0) / iters * 1e3

    stages = [
        ("recombinePopulation", lambda v: recombine(key, v[:MU], steps[:MU], cfg)[0], values),
        ("mutatePopulation", lambda v: mutate(key, v, steps, cfg)[0], values),
        ("synthesisePopulation", lambda p: synthesize(p, N, cfg.topology, engine=cfg.synthesis_engine), scaled),
        ("applyWindow+FFT", lambda a: magnitude_spectrum(a, so), audio),
        ("fitness+sort(topk)", lambda f: select(values, steps, f, MU)[2], fitness),
        ("evaluateFused", lambda v: evaluate(v, tspec, so, cfg), values),
    ]
    for name, fn, x in stages:
        ms = timed_loop(fn, x)
        bm.add_timer(name, ms)
        print(f"{name:24s} {ms:8.3f} ms")
        bm.elapsed_timer(name)


def suite_chunk_size(args, bm):
    """AudioAnalysisChunkSize sweep, 2^9..2^16, engine-annotated rows.

    The engine gates auto-degrade with n (strategy.active_engine):
    fused Pallas kernels while the folded operand fits VMEM, then the
    synth_fold hybrid (Pallas synthesis+fold, XLA DFT) to n=32768, then
    XLA rfft (the O(N^2) DFT operand exceeds HBM past
    spectral.DFT_MAX_MATERIALIZE_N). 2^13..2^15 add an `rfft` comparison
    row — the whole-generation dft-vs-rfft crossover
    (spectrum-only crossover: tools/tpu_spectrum_probe.py). 2^16 shrinks
    the population (annotated) to keep the audio + spectra in HBM —
    reference analog: parameters.json:13 accepts arbitrary
    audioLengthLog2 at its default pop 32."""
    import jax  # the rfft-comparison except clause below names jax.errors

    from .es import make_spectrum_ops
    from .es.strategy import active_engine

    def row(log2, name, **over):
        pop_l2 = 15 if log2 <= 15 else (13 if log2 == 16 else 12)
        over.setdefault("num_parents", args.parents)
        over.setdefault("num_offspring", (1 << pop_l2) - args.parents)
        cfg = _base_cfg(args, audio_length_log2=log2, **over)
        gens = args.gens if log2 <= 12 else max(5, args.gens // 10)
        # ONE spectrum-ops build serves both the annotation and the runner
        # (the ~2-min host trig build at n=32768 must not run twice)
        so = make_spectrum_ops(cfg)
        eng = active_engine(cfg, so)
        if pop_l2 != 15:
            eng += f",pop=2^{pop_l2}"
        dt = _steady_time(_make_runner(cfg, gens, so))
        name = f"{name}_{1<<log2}[{eng}]"
        bm.add_timer(name, dt * 1e3)
        bm.set_workload(name, cfg.population_size, gens)
        print(f"{name}: {dt*1e3:.1f}ms "
              f"({cfg.population_size*gens/dt/1e6:.2f}M evals/s)")
        bm.elapsed_timer(name)

    # 2^16/2^17 run the four-step FACTORED DFT (spectral.FactoredOps; the
    # round-3 rfft fallback measured 918 ms/gen at 2^16 pop 2^13)
    for log2 in (9, 10, 11, 12, 13, 14, 15, 16, 17):
        row(log2, "AudioAnalysisChunkSize")
    for log2 in (13, 14, 15, 16):  # whole-generation rfft comparison
        try:
            row(log2, "AudioAnalysisChunkSize", spectrum_method="rfft",
                fused_kernel=False, fused_generation=False)
        except (jax.errors.JaxRuntimeError, RuntimeError, MemoryError) as e:
            # rfft at 2^15/pop 2^15 may exceed HBM — anything else
            # (shape/typo regressions) must propagate, not read as a skip
            print(f"AudioAnalysisChunkSize_{1<<log2}[rfft]: SKIP ({e})",
                  flush=True)


def suite_population(args, bm):
    # 2^18 = BASELINE.json config 4's total population (sharded over v5e-8
    # in the target deployment; this row is the single-chip capacity proof)
    for pop_log2 in (11, 13, 15, 17, 18):
        pop = 1 << pop_log2
        mu = max(args.parents, pop // 128)
        cfg = _base_cfg(args, num_parents=mu, num_offspring=pop - mu)
        dt = _steady_time(_make_runner(cfg, args.gens))
        name = f"PopulationScaling_2^{pop_log2}"
        bm.add_timer(name, dt * 1e3)
        bm.set_workload(name, pop, args.gens)
        print(f"{name}: {dt*1e3:.1f}ms ({pop*args.gens/dt/1e6:.2f}M evals/s)")
        bm.elapsed_timer(name)


def suite_multi_target(args, bm):
    """Batched multi-target matching (BASELINE.json config 5 shape at
    single-chip scale): ``match_many`` vmaps B independent ES runs — one
    per target sound — into one device program. Rows give aggregate
    candidate-evals/s for B=1 vs B=4 (the vmap's batching efficiency)."""
    import jax
    import numpy as np

    from .es import ESConfig
    from .es.pipeline import match_many
    from .ops import synthesize_single

    pop = 1 << 13  # per-target population (B targets run concurrently)
    cfg = _base_cfg(args, num_parents=max(64, pop // 128),
                    num_offspring=pop - max(64, pop // 128))
    import jax.numpy as jnp

    true_sets = [
        [3078.0, 2.0, 3015.0, 1.5, 3141.0, 1.0],
        [2400.0, 3.0, 1800.0, 2.0, 900.0, 4.0],
        [440.0, 6.0, 880.0, 1.2, 1760.0, 2.5],
        [3520.0, 1.0, 2637.0, 3.3, 1975.0, 0.8],
    ]
    targets = np.stack([
        np.asarray(synthesize_single(jnp.asarray(p), cfg.n_samples,
                                     cfg.topology))
        for p in true_sets
    ])
    gens = args.gens
    for b in (1, 4, 32):
        # B=32 at pop 2^11 per target: batching many small runs amortises
        # the per-generation base across the whole batch (67M aggregate vs
        # ~30M for ONE 2^11 run — tools/tpu_multitarget_probe.py findings)
        cfg_b = cfg
        if b == 32:
            small_mu = max(16, (1 << 11) // 128)
            cfg_b = cfg.replace(num_parents=small_mu,
                                num_offspring=(1 << 11) - small_mu)
        tgts = targets[:b] if b <= len(targets) else np.tile(
            targets, (-(-b // len(targets)), 1))[:b]
        t0 = time.time()
        match_many(tgts, cfg_b, key=0, num_generations=gens)
        warm = time.time() - t0  # includes compile
        t0 = time.time()
        match_many(tgts, cfg_b, key=1, num_generations=gens)
        dt = time.time() - t0
        name = f"MultiTarget_B{b}" + ("[pop=2^11]" if b == 32 else "")
        bm.add_timer(name, dt * 1e3)
        bm.set_workload(name, b * cfg_b.population_size, gens)
        print(f"{name}: {dt*1e3:.1f}ms for {gens} gens x {b} targets "
              f"({b*cfg_b.population_size*gens/dt/1e6:.2f}M evals/s aggregate; "
              f"first call {warm:.1f}s incl compile)")
        bm.elapsed_timer(name)


def suite_optimizations(args, bm):
    variants = {
        "scan+rfft+f32": dict(synthesis_engine="scan", spectrum_method="rfft",
                              dft_dtype="float32", fused_kernel=False),
        "scan+dft+f32": dict(synthesis_engine="scan", spectrum_method="dft",
                             dft_dtype="float32", fused_kernel=False),
        "scanless+dft+f32": dict(synthesis_engine="scanless", spectrum_method="dft",
                                 dft_dtype="float32", fused_kernel=False),
        "scanless+dft+bf16": dict(synthesis_engine="scanless", spectrum_method="dft",
                                  dft_dtype="bfloat16", fused_kernel=False),
        "fused-pallas": dict(synthesis_engine="scanless", spectrum_method="dft",
                             dft_dtype="bfloat16", fused_kernel=True),
        "fused-generation": dict(synthesis_engine="scanless", spectrum_method="dft",
                                 dft_dtype="bfloat16", fused_kernel=True,
                                 fused_generation=True),
        "fused-generation+int8": dict(synthesis_engine="scanless",
                                      spectrum_method="dft", dft_dtype="int8",
                                      fused_kernel=True, fused_generation=True),
        "whole-run+int8": dict(synthesis_engine="scanless", spectrum_method="dft",
                               dft_dtype="int8", fused_kernel=True,
                               fused_generation=True, fused_evolve=True),
        # the bench.py config: scan-of-fused-generations + order-7 sine
        # (quality-neutral under tools/convergence_check.py's f32 rescoring)
        "fused-generation+int8+sin7": dict(
            synthesis_engine="scanless", spectrum_method="dft",
            dft_dtype="int8", fused_kernel=True, fused_generation=True,
            sine_order=7),
    }
    for name, over in variants.items():
        cfg = _base_cfg(args, **over)
        dt = _steady_time(_make_runner(cfg, args.gens))
        bm.add_timer(f"Opt_{name}", dt * 1e3)
        print(f"Opt_{name:22s}: {dt*1e3:8.1f}ms "
              f"({cfg.population_size*args.gens/dt/1e6:.2f}M evals/s)")
        bm.elapsed_timer(f"Opt_{name}")


def suite_topologies(args, bm):
    """Steady-state generation throughput for every model family through
    the flagship engine path (folded int8 fused generation; fm{k}_parallel
    factors the mean amplitude in-kernel). The README per-topology table's
    source. Dims: 2 params per serial operator, 4 per parallel pair."""
    from .ops.synthesis import parallel_pairs, series_ops

    for topo in ("fm2", "fm3_series", "fm3_parallel", "fm4_series",
                 "fm5_series", "fm4_parallel"):
        if topo == "fm2":
            d = 4
        elif parallel_pairs(topo):
            d = 4 * parallel_pairs(topo)
        else:
            d = 2 * series_ops(topo)
        cfg = _base_cfg(
            args,
            topology=topo,
            num_dimensions=d,
            param_mins=(0.0,) * d,
            param_maxs=tuple([3520.0, 8.0] * (d // 2)),
        )
        dt = _steady_time(_make_runner(cfg, args.gens))
        name = f"Topology_{topo}"
        bm.add_timer(name, dt * 1e3)
        print(f"{name}: {dt*1e3:.1f}ms "
              f"({cfg.population_size*args.gens/dt/1e6:.2f}M evals/s)")
        bm.elapsed_timer(name)


def suite_stft_frames(args, bm):
    """Multi-frame STFT fitness scaling (new capability, SURVEY.md §5.7):
    each candidate synthesises F*N continuous samples and sums framewise
    spectral errors — cost should scale ~linearly in F inside one kernel."""
    import jax
    import jax.numpy as jnp

    from .es import init_state, make_spectrum_ops
    from .es.pipeline import evolve

    for frames in (1, 2, 4, 8):
        cfg = _base_cfg(
            args,
            num_parents=256,
            num_offspring=(1 << 13) - 256,  # smaller pop: F*N samples each
            num_frames=frames,
            dft_dtype="int8",
            fused_kernel=True,
            fused_generation=True,
        )
        so = make_spectrum_ops(cfg)
        tgt = jnp.ones((frames, so.num_bins), jnp.float32)

        @jax.jit
        def run(key, cfg=cfg, so=so, tgt=tgt):
            state = init_state(key, cfg)
            final, _ = evolve(state, tgt, args.gens, so, cfg)
            return final.best_fitness

        dt = _steady_time(lambda: run(jax.random.PRNGKey(0)))
        name = f"STFTFrames_{frames}"
        bm.add_timer(name, dt * 1e3)
        bm.set_workload(name, cfg.population_size, args.gens)
        pop = cfg.population_size
        print(f"{name}: {dt*1e3:.1f}ms ({pop*args.gens/dt/1e6:.2f}M cand/s, "
              f"{pop*frames*args.gens/dt/1e6:.2f}M frame-evals/s)")
        bm.elapsed_timer(name)


SUITES = {
    "overall": suite_overall,
    "stages": suite_stages,
    "chunk_size": suite_chunk_size,
    "population": suite_population,
    "optimizations": suite_optimizations,
    "topologies": suite_topologies,
    "stft_frames": suite_stft_frames,
    "multi_target": suite_multi_target,
}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--suite", default="all", choices=[*SUITES, "all"],
                    help=f"one of {list(SUITES)} or 'all'")
    ap.add_argument("--pop", type=int, default=1 << 15)
    ap.add_argument("--parents", type=int, default=256)
    ap.add_argument("--log2", type=int, default=10)
    ap.add_argument("--gens", type=int, default=50)
    ap.add_argument("--fused", action="store_true", default=False)
    ap.add_argument("--engine", default="default", choices=list(ENGINES),
                    help="engine preset: 'flagship' = the bench.py config "
                         "(folded int8 + fused generation + order-7 sine)")
    ap.add_argument("--csv", default=None, help="CSV output path")
    ap.add_argument("--operand-cache", default=None, metavar="DIR",
                    help="disk cache for large-frame DFT operands "
                         "(ESConfig.operand_cache_dir)")
    args = ap.parse_args(argv)

    from .utils import Benchmarker
    from .utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    csv = args.csv or Benchmarker.log_filename("tpu_suite", args.pop, args.gens, 1 << args.log2)
    bm = Benchmarker(csv_path=csv, quiet=True,
                     population=args.pop, generations=args.gens)
    names = list(SUITES) if args.suite == "all" else [args.suite]
    for name in names:
        print(f"=== {name} ===")
        SUITES[name](args, bm)
    bm.close()
    print(f"wrote {csv}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
