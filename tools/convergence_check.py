"""Convergence-quality gate: do the throughput engines degrade real matching?

Runs known-parameter recovery (the reference's de-facto integration test,
main.cpp:204-227) at bench scale over several seeds, for a set of engine
variants, and reports the best-fitness distribution per variant — with the
recovered parameters RE-SCORED under the f32/jnp.sin XLA engine: an engine
must not be allowed to grade its own (quantised/approximated) homework. The
mu sweep set the precedent (mu=128 is 8% faster but converges 4x worse);
the sine-order sweep proved the rescoring necessary (order 5 self-reports
neutral but rescores 3.5x worse — its distorted spectrum misleads the
search toward solutions that only look good to itself).

    python tools/convergence_check.py --seeds 16 --gens 1000
    python tools/convergence_check.py --variants f32 int8+sin7 --json out.json

A variant only graduates to the bench/default config if its median
f32-rescored best-fitness is statistically indistinguishable from f32's.
"""
import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

# respect an already-configured cache (tests set their own); otherwise
# point at the shared persistent cache (remote-compile-hang mitigation)
if not jax.config.jax_compilation_cache_dir:
    from pmfm_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

from pmfm_tpu.es import ESConfig, init_state, make_spectrum_ops  # noqa: E402
from pmfm_tpu.es.pipeline import evaluate, evolve  # noqa: E402
from pmfm_tpu.ops import synthesize_single  # noqa: E402
from pmfm_tpu.ops.spectral import target_spectrum  # noqa: E402
from pmfm_tpu.ops.synthesis import scale_params  # noqa: E402

TRUE_GENES = (0.874, 0.25, 0.857, 0.1875, 0.892, 0.125)

# engine ladders (throughput rungs of README's progression table)
VARIANTS = {
    "f32": dict(dft_dtype="float32", fused_kernel=False,
                fused_generation=False),
    "bf16-fused": dict(dft_dtype="bfloat16", fused_kernel=True,
                       fused_generation=True),
    "int8": dict(dft_dtype="int8", fused_kernel=True, fused_generation=True),
    "int8+sin7": dict(dft_dtype="int8", fused_kernel=True,
                      fused_generation=True, sine_order=7),
    "int8+sin5": dict(dft_dtype="int8", fused_kernel=True,
                      fused_generation=True, sine_order=5),
}
# sine-order sweep aliases (same configs, shorter names)
VARIANTS["sin9"] = VARIANTS["int8"]
VARIANTS["sin7"] = VARIANTS["int8+sin7"]
VARIANTS["sin5"] = VARIANTS["int8+sin5"]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="+",
                    default=["f32", "bf16-fused", "int8", "int8+sin7"],
                    choices=list(VARIANTS))
    ap.add_argument("--seeds", type=int, default=16)
    ap.add_argument("--gens", type=int, default=1000)
    ap.add_argument("--pop-log2", type=int, default=15)
    ap.add_argument("--mu", type=int, default=256)
    ap.add_argument("--mutation-noise", default="clt12",
                    help="clt12 (bench/reference parity) or clt12_neutral "
                         "(quality-first configs)")
    ap.add_argument("--json", default=None, help="write results JSON here")
    args = ap.parse_args(argv)

    pop = 1 << args.pop_log2
    base = ESConfig(
        num_parents=args.mu, num_offspring=pop - args.mu, num_dimensions=6,
        topology="fm3_series", audio_length_log2=10,
        synthesis_engine="scanless", spectrum_method="dft",
        mutation_noise=args.mutation_noise, pop_block=1024,
    )
    truth = jnp.asarray(TRUE_GENES)
    scaled = scale_params(
        truth[None], jnp.asarray(base.param_mins), jnp.asarray(base.param_maxs)
    )[0]
    audio = synthesize_single(scaled, base.n_samples, base.topology)

    # the independent scorer: f32 XLA engine
    cfg32 = base.replace(dft_dtype="float32", fused_kernel=False,
                         fused_generation=False)
    so32 = make_spectrum_ops(cfg32)
    tspec32 = target_spectrum(audio, so32)
    rescore = jax.jit(lambda v: evaluate(v[None, :], tspec32, so32, cfg32)[0])

    results = {}
    for name in args.variants:
        cfg = base.replace(**VARIANTS[name])
        so = make_spectrum_ops(cfg)
        tspec = target_spectrum(audio, so)

        @jax.jit
        def run(key, cfg=cfg, so=so, tspec=tspec):
            state = init_state(key, cfg)
            final, _ = evolve(state, tspec, args.gens, so, cfg)
            return final.best_values

        fits = []
        t0 = time.time()
        for s in range(args.seeds):
            bv = jax.block_until_ready(run(jax.random.PRNGKey(s)))
            fits.append(float(rescore(bv)))
        fits = np.asarray(fits)
        results[name] = {
            "median": float(np.median(fits)),
            "mean": float(fits.mean()),
            "min": float(fits.min()),
            "max": float(fits.max()),
            "fits": fits.tolist(),
        }
        print(
            "%-12s median=%.1f  mean=%.1f  min=%.1f  max=%.1f  (%d seeds, "
            "%.1fs; f32-rescored)" % (name, np.median(fits), fits.mean(),
                                      fits.min(), fits.max(), args.seeds,
                                      time.time() - t0),
            flush=True,
        )
    if args.json:
        meta = dict(seeds=args.seeds, gens=args.gens, pop=pop, mu=args.mu,
                    mutation_noise=args.mutation_noise,
                    true_genes=list(TRUE_GENES),
                    scoring="recovered params re-evaluated under f32/jnp.sin")
        with open(args.json, "w") as f:
            json.dump({"meta": meta, "results": results}, f, indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
