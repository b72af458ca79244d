"""Convergence-quality gate: does an engine knob change real matching?

Runs known-parameter recovery (the reference's de-facto integration test,
main.cpp:204-227) at the bench scale over several seeds and reports the
median/mean best-fitness per knob setting. Use this before trading accuracy
for throughput (the mu sweep precedent: mu=128 is 8% faster but converges
4x worse — CLAUDE.md): a knob only graduates to the bench/default config if
its median best-fitness is statistically indistinguishable from the
baseline's.

    python tools/convergence_check.py --orders 9 7 5 --seeds 5 --gens 1000
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")

from pmfm_tpu.es import ESConfig, init_state, make_spectrum_ops  # noqa: E402
from pmfm_tpu.es.pipeline import evolve  # noqa: E402
from pmfm_tpu.ops import synthesize_single  # noqa: E402
from pmfm_tpu.ops.spectral import target_spectrum  # noqa: E402
from pmfm_tpu.ops.synthesis import scale_params  # noqa: E402

TRUE_GENES = (0.874, 0.25, 0.857, 0.1875, 0.892, 0.125)  # ~ the known-params
# targets used for the convergence artifact (benchmarks/convergence_*.json)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--orders", type=int, nargs="+", default=[9, 7])
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--gens", type=int, default=1000)
    ap.add_argument("--pop-log2", type=int, default=15)
    ap.add_argument("--mu", type=int, default=256)
    args = ap.parse_args(argv)

    pop = 1 << args.pop_log2
    base = ESConfig(
        num_parents=args.mu, num_offspring=pop - args.mu, num_dimensions=6,
        topology="fm3_series", audio_length_log2=10,
        synthesis_engine="scanless", spectrum_method="dft", dft_dtype="int8",
        mutation_noise="clt12", fused_kernel=True, fused_generation=True,
        pop_block=1024,
    )
    truth = jnp.asarray(TRUE_GENES)
    scaled = scale_params(
        truth[None], jnp.asarray(base.param_mins), jnp.asarray(base.param_maxs)
    )[0]
    audio = synthesize_single(scaled, base.n_samples, base.topology)

    # score recovered params under the f32/jnp.sin engine — an engine must
    # not be allowed to grade its own (quantised) homework
    cfg32 = base.replace(dft_dtype="float32", fused_kernel=False,
                         fused_generation=False)
    so32 = make_spectrum_ops(cfg32)
    tspec32 = target_spectrum(audio, so32)
    from pmfm_tpu.es.pipeline import evaluate

    rescore = jax.jit(lambda v: evaluate(v[None, :], tspec32, so32, cfg32)[0])

    for order in args.orders:
        cfg = base.replace(sine_order=order)
        so = make_spectrum_ops(cfg)
        tspec = target_spectrum(audio, so)

        @jax.jit
        def run(key):
            state = init_state(key, cfg)
            final, _ = evolve(state, tspec, args.gens, so, cfg)
            return final.best_values, final.best_fitness

        fits = []
        t0 = time.time()
        for s in range(args.seeds):
            bv, _ = jax.block_until_ready(run(jax.random.PRNGKey(s)))
            fits.append(float(rescore(bv)))
        fits = np.asarray(fits)
        print(
            "order=%d  median=%.1f  mean=%.1f  min=%.1f  max=%.1f  (%d seeds, "
            "%.1fs; f32-rescored)" % (order, np.median(fits), fits.mean(),
                                      fits.min(), fits.max(), args.seeds,
                                      time.time() - t0),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
