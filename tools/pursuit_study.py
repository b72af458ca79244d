"""Study harness for the staged solvers (pmfm_tpu/es/staged.py) on the
known-parameter target: fm{k}_parallel -> match_parallel_pursuit,
fm{k}_series (k >= 4) -> match_series_pursuit (the round-5
exact-reduction homotopy).

Per seed: run the solver, rescore the recovered genes under the
independent f32/jnp.sin engine, report frac_converged at relative spectral
error thresholds (BASELINE-style rel = sqrt(fitness / target_energy)).

    python tools/pursuit_study.py --seeds 8 --verbose          # quick look
    python tools/pursuit_study.py --seeds 32 --seed-offset 64  # holdout
    python tools/pursuit_study.py --topology fm4_series --seeds 8

Writes --json (default benchmarks/pursuit_<topology>.json).
"""
import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--seed-offset", type=int, default=0)
    ap.add_argument("--topology", default="fm3_parallel")
    ap.add_argument("--pop-log2", type=int, default=13)
    ap.add_argument("--stage-pop-log2", type=int, default=13)
    ap.add_argument("--peel-gens", type=int, default=300)
    ap.add_argument("--peel-tries", type=int, default=3)
    ap.add_argument("--tail-gens", type=int, default=600)
    ap.add_argument("--tail-tries", type=int, default=2)
    ap.add_argument("--alias-rounds", type=int, default=4)
    ap.add_argument("--alias-gens", type=int, default=150)
    ap.add_argument("--joint-gens", type=int, default=500)
    ap.add_argument("--repair-rounds", type=int, default=0)
    ap.add_argument("--repair-gens", type=int, default=400)
    # series-chain solver knobs (fm{k}_series topologies)
    ap.add_argument("--core-gens", type=int, default=600)
    ap.add_argument("--core-tries", type=int, default=2)
    ap.add_argument("--grow-gens", type=int, default=300)
    ap.add_argument("--grow-tries", type=int, default=2)
    ap.add_argument("--target-rel", type=float, default=0.0,
                    help="self-scored accept threshold (enables multi-start)")
    ap.add_argument("--max-attempts", type=int, default=1)
    ap.add_argument("--refine-gens", type=int, default=100)
    ap.add_argument("--thresholds-rel", type=float, nargs="+",
                    default=[0.03, 0.01, 0.001])
    ap.add_argument("--platform", default=None,
                    help="force a JAX platform (e.g. cpu) in-process")
    ap.add_argument("--engine", default="int8",
                    choices=("int8", "f32"),
                    help="joint-polish engine")
    ap.add_argument("--target-engine", default="scan",
                    choices=("scan", "scanless"),
                    help="engine that renders the known-params target. "
                    "'scan' (wavetable-floor reference parity) is the "
                    "historic choice and is fine for the parallel families "
                    "(shallow modulation), but DEEP SERIAL CHAINS are "
                    "chaotic in the scan/scanless engine difference: the "
                    "TRUTH genes themselves rescore at ~7.7%% relative "
                    "spectral error against a scan-rendered fm4_series "
                    "target (round-5 diagnostic). Series gates use "
                    "'scanless' so the gate measures the solver, not the "
                    "engine-parity floor.")
    ap.add_argument("--truth-key", default=None,
                    help="TRUE_GENES_BY_TOPOLOGY key to use as the target "
                    "genes (default: the topology name). E.g. "
                    "'fm5_series_mild' — the matchable moderate-modulation "
                    "5-chain gate target (the aggressive fm5_series truth "
                    "is chaos-walled, benchmarks/series_chaos.json).")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--json", default=None,
                    help="output path (default benchmarks/pursuit_<topology>.json)")
    args = ap.parse_args(argv)
    if args.json is None:
        args.json = f"benchmarks/pursuit_{args.topology}.json"

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if not jax.config.jax_compilation_cache_dir:
        from pmfm_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache()

    import jax.numpy as jnp

    from pmfm_tpu.es import ESConfig, make_spectrum_ops
    from pmfm_tpu.es.staged import match_parallel_pursuit, match_series_pursuit
    from pmfm_tpu.es.strategy import evaluate
    from pmfm_tpu.ops.synthesis import series_ops
    from pmfm_tpu.models import get_topology
    from pmfm_tpu.ops import synthesize_single
    from pmfm_tpu.ops.spectral import target_spectrum
    from pmfm_tpu.ops.synthesis import scale_params
    from tools.convergence_check import TRUE_GENES_BY_TOPOLOGY

    topo = get_topology(args.topology)
    pop = 1 << args.pop_log2
    mu = max(64, pop // 128)
    engine = (
        dict(dft_dtype="int8", fused_kernel=True, fused_generation=True)
        if args.engine == "int8"
        # round 5: float32 + fused flags = the TRUE-f32 fused kernel
        # (2.1 ms/gen at 2^15 vs ~8 unfused) — the f32 polish is affordable
        else dict(dft_dtype="float32", fused_kernel=True,
                  fused_generation=True)
    )
    cfg = ESConfig(
        num_parents=mu, num_offspring=pop - mu,
        num_dimensions=topo.num_dimensions, topology=args.topology,
        param_mins=topo.default_param_mins,
        param_maxs=topo.default_param_maxs, audio_length_log2=10,
        synthesis_engine="scanless", spectrum_method="dft", pop_block=1024,
        mutation_noise="clt12_neutral", min_step=1e-4,
        restart_patience=100, refine_generations=args.refine_gens,
        **engine,
    )
    truth = jnp.asarray(
        TRUE_GENES_BY_TOPOLOGY[args.truth_key or args.topology]
    )
    scaled = scale_params(
        truth[None], jnp.asarray(cfg.param_mins), jnp.asarray(cfg.param_maxs)
    )[0]
    audio = synthesize_single(scaled, cfg.n_samples, cfg.topology,
                              engine=args.target_engine)

    cfg32 = cfg.replace(dft_dtype="float32", fused_kernel=False,
                        fused_generation=False, refine_generations=0)
    so32 = make_spectrum_ops(cfg32)
    tspec32 = target_spectrum(audio, so32)
    tgt_energy = float(np.sum(np.asarray(tspec32, np.float64) ** 2))
    thr = {f"rel{r:g}": r * r * tgt_energy for r in args.thresholds_rel}
    print(f"target energy {tgt_energy:.6g}; thresholds "
          + ", ".join(f"{k}={v:.4g}" for k, v in thr.items()), flush=True)

    is_series = series_ops(args.topology) is not None

    def solve(key):
        if is_series:
            return match_series_pursuit(
                audio, cfg, key=key,
                stage_population=1 << args.stage_pop_log2,
                core_generations=args.core_gens, core_tries=args.core_tries,
                grow_generations=args.grow_gens, grow_tries=args.grow_tries,
                repair_rounds=args.repair_rounds,
                repair_generations=args.repair_gens,
                joint_generations=args.joint_gens,
                target_rel=args.target_rel, max_attempts=args.max_attempts,
            )
        return match_parallel_pursuit(
            audio, cfg, key=key,
            stage_population=1 << args.stage_pop_log2,
            peel_generations=args.peel_gens, peel_tries=args.peel_tries,
            tail_generations=args.tail_gens, tail_tries=args.tail_tries,
            alias_rounds=args.alias_rounds,
            alias_generations=args.alias_gens,
            joint_generations=args.joint_gens,
            repair_rounds=args.repair_rounds,
            repair_generations=args.repair_gens,
            target_rel=args.target_rel,
            max_attempts=args.max_attempts,
        )

    fits, rels, gens_used, attempts, seed_secs = [], [], [], [], []
    t_all = time.time()
    for s in range(args.seed_offset, args.seed_offset + args.seeds):
        t0 = time.time()
        r = solve(jax.random.PRNGKey(s))
        f32_fit = float(
            evaluate(jnp.asarray(r.best_values)[None], tspec32, so32, cfg32)[0]
        )
        rel = float(np.sqrt(max(f32_fit, 0.0) / tgt_energy))
        fits.append(f32_fit)
        rels.append(rel)
        gens_used.append(r.generations_used)
        attempts.append(r.attempts)
        seed_secs.append(round(time.time() - t0, 1))
        if args.verbose:
            print(f"  stage_fitness {np.array2string(r.stage_fitness, precision=5)} "
                  f"alias_fitness {np.array2string(r.alias_fitness, precision=5)}")
        print(f"seed {s}: f32 {f32_fit:.4g} rel {rel:.4f} "
              f"({'PASS' if f32_fit <= list(thr.values())[0] else 'no'}) "
              f"{r.generations_used}g {r.attempts}att "
              f"{time.time()-t0:.0f}s", flush=True)

    fits = np.asarray(fits)
    out = {
        "meta": dict(
            topology=args.topology, pop=pop, mu=mu,
            stage_pop=1 << args.stage_pop_log2,
            peel_gens=args.peel_gens, peel_tries=args.peel_tries,
            tail_gens=args.tail_gens, tail_tries=args.tail_tries,
            alias_rounds=args.alias_rounds, alias_gens=args.alias_gens,
            joint_gens=args.joint_gens, refine_gens=args.refine_gens,
            repair_rounds=args.repair_rounds,
            repair_gens=args.repair_gens,
            core_gens=args.core_gens, core_tries=args.core_tries,
            grow_gens=args.grow_gens, grow_tries=args.grow_tries,
            solver="match_series_pursuit" if is_series
                   else "match_parallel_pursuit",
            target_rel=args.target_rel, max_attempts=args.max_attempts,
            engine=args.engine, target_engine=args.target_engine,
            seed_offset=args.seed_offset,
            seeds=args.seeds, tgt_energy=tgt_energy,
            true_genes=list(map(
                float, TRUE_GENES_BY_TOPOLOGY[args.truth_key or args.topology]
            )),
            truth_key=args.truth_key or args.topology,
            scoring="f32/jnp.sin rescore",
        ),
        "fits": fits.tolist(),
        "rel_errors": [round(r, 6) for r in rels],
        "generations_used": gens_used,
        "attempts": attempts,
        # per-seed wall seconds (first seed carries the compiles) —
        # VERDICT r4 weak #5's measured s/seed
        "seed_seconds": seed_secs,
        "frac_converged": {
            k: float(np.mean(fits <= v)) for k, v in thr.items()
        },
        "median_fit": float(np.median(fits)),
        "median_rel": float(np.median(rels)),
    }
    for k, v in out["frac_converged"].items():
        print(f"{k}: frac_converged {v:.2f}")
    print(f"median rel {out['median_rel']:.4f}  "
          f"total {time.time()-t_all:.0f}s")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
