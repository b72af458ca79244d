"""Probe: per-generation cost of the XLA-only pipeline on the real chip.

Usage: python tools/tpu_probe.py [--pop 32768] [--log2 10] [--gens 20]
Compares spectrum engines and oscillator modes; prints ms/gen and
candidate-evals/sec.
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pop", type=int, default=32768)
    ap.add_argument("--log2", type=int, default=10)
    ap.add_argument("--gens", type=int, default=20)
    ap.add_argument("--parents", type=int, default=256)
    ap.add_argument(
        "--variants",
        default="dft:floor,rfft:floor,dft:exact,dft_bf16:floor",
        help="comma list of method:osc; prefix 'sl_' on method = scanless engine",
    )
    args = ap.parse_args()

    from pmfm_tpu.es import ESConfig, init_state, make_spectrum_ops
    from pmfm_tpu.es.pipeline import evolve

    print("devices:", jax.devices())
    for variant in args.variants.split(","):
        method, osc = variant.split(":")
        engine = "scan"
        if method.startswith("sl_"):
            engine, method = "scanless", method[3:]
        dft_dtype = "float32"
        if method == "dft_bf16":
            method, dft_dtype = "dft", "bfloat16"
        cfg = ESConfig(
            synthesis_engine=engine,
            num_parents=args.parents,
            num_offspring=args.pop - args.parents,
            num_dimensions=6,
            topology="fm3_series",
            audio_length_log2=args.log2,
            spectrum_method=method,
            dft_dtype=dft_dtype,
            osc_mode=osc,
        )
        so = make_spectrum_ops(cfg)
        tspec = jnp.ones((so.num_bins,), jnp.float32)

        @jax.jit
        def run(key):
            state = init_state(key, cfg)
            final, _ = evolve(state, tspec, args.gens, so, cfg)
            return final.best_fitness, final.generation

        t0 = time.time()
        out = jax.block_until_ready(run(jax.random.PRNGKey(0)))
        compile_and_first = time.time() - t0
        t0 = time.time()
        out = jax.block_until_ready(run(jax.random.PRNGKey(1)))
        steady = time.time() - t0
        ms_per_gen = steady / args.gens * 1e3
        evals_per_sec = args.pop * args.gens / steady
        print(
            f"{variant:16s} pop=2^{args.pop.bit_length()-1} N={1<<args.log2}: "
            f"first={compile_and_first:.1f}s steady={steady:.3f}s "
            f"{ms_per_gen:.2f}ms/gen {evals_per_sec/1e6:.2f}M evals/s"
        )


if __name__ == "__main__":
    main()
