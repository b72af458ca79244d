"""Stage attribution for the huge-frame engine (n > 32768, four-step
factored DFT): where do the 726.9 ms/gen at n=65536 / pop 2^13
(benchmarks/chunk_size_flagship.csv) actually go?

Times, in separate compiled loops on the real chip:
  1. scanless synthesis alone (bf16 out — the generation's audio source)
  2. magnitude_spectrum_factored alone (bf16-family = DEFAULT-precision
     matmuls) and the f32/HIGHEST variant
  3. window+spectrum+fitness (the evaluate tail)
  4. one full generation (reference composition)

plus (round 5) the streamed hybrid kernels/synth_stream.py — Pallas
synthesis+window feeding the factored DFT — timed standalone, as the
full fitness pipeline, and as the full generation against the round-4
XLA composition, with a spectra parity check on shared candidates.

Usage: JAX_COMPILATION_CACHE_DIR=.jax_tpu_cache timeout 590 \
    python tools/tpu_factored_probe.py [--log2 16] [--pop-log2 13]
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

if not jax.config.jax_compilation_cache_dir:
    from pmfm_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

from pmfm_tpu.es import ESConfig, init_state, make_spectrum_ops  # noqa: E402
from pmfm_tpu.es.pipeline import evolve  # noqa: E402
from pmfm_tpu.ops import synthesize  # noqa: E402
from pmfm_tpu.ops.spectral import (  # noqa: E402
    magnitude_spectrum_factored, spectral_fitness,
)
from pmfm_tpu.utils import device_sync  # noqa: E402


def timed_loop(fn, x, iters=5, reps=3):
    @jax.jit
    def run(x0):
        def body(i, carry):
            xp, acc = carry
            out = fn(xp + acc * 1e-30)
            return xp, acc + jnp.sum(out).astype(jnp.float32) * 1e-30

        _, acc = jax.lax.fori_loop(0, iters, body, (x0, jnp.float32(0.0)))
        return acc

    device_sync(run(x))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        device_sync(run(x))
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2", type=int, default=16)
    ap.add_argument("--pop-log2", type=int, default=13)
    ap.add_argument("--gens", type=int, default=5)
    args = ap.parse_args(argv)
    n, pop = 1 << args.log2, 1 << args.pop_log2
    mu = max(64, pop // 128)
    print(f"n={n} pop={pop}", flush=True)

    cfg = ESConfig(
        num_parents=mu, num_offspring=pop - mu, num_dimensions=6,
        topology="fm3_series", audio_length_log2=args.log2,
        synthesis_engine="scanless", spectrum_method="dft",
        dft_dtype="int8", fused_kernel=True, fused_generation=True,
        sine_order=7, pop_block=1024,
    )
    so = make_spectrum_ops(cfg)
    print("spectrum method:", so.method, flush=True)
    key = jax.random.PRNGKey(0)
    params = jax.random.uniform(key, (pop, 6), jnp.float32) * 3000.0

    # 1. synthesis alone (both out dtypes)
    for dt_name, odt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        ms = timed_loop(
            lambda p, odt=odt: synthesize(
                p, n, cfg.topology, engine="scanless", out_dtype=odt
            ),
            params,
        ) * 1e3
        print(f"synthesis scanless ({dt_name} out): {ms:8.1f} ms", flush=True)

    # jit the build: the eager form keeps every (N, pop) scanless
    # intermediate alive as its own buffer and OOMs HBM at n=65536/2^13
    audio = jax.jit(
        lambda p: synthesize(p, n, cfg.topology, engine="scanless",
                             out_dtype=jnp.float32)
    )(params)

    # 2. factored spectrum alone, DEFAULT vs HIGHEST matmul precision
    so_f32 = make_spectrum_ops(cfg.replace(dft_dtype="float32"))
    for name, ops_ in (("default-prec (bf16 family)", so),
                       ("HIGHEST (f32 family)", so_f32)):
        ms = timed_loop(
            lambda a, ops_=ops_: magnitude_spectrum_factored(a, ops_), audio
        ) * 1e3
        print(f"factored spectrum [{name}]: {ms:8.1f} ms", flush=True)

    # 3. spectrum + fitness tail
    tspec = jnp.ones((so.num_bins,), jnp.float32)
    ms = timed_loop(
        lambda a: spectral_fitness(magnitude_spectrum_factored(a, so), tspec),
        audio,
    ) * 1e3
    print(f"spectrum+fitness: {ms:8.1f} ms", flush=True)

    # 3b. the round-5 streamed hybrid (kernels/synth_stream.py): Pallas
    # synthesis+window, then the factored DFT on the prewindowed audio
    from pmfm_tpu.kernels.synth_stream import fused_synth_stream

    def stream(p, audio_f32=False):
        return fused_synth_stream(
            p, so.window, topology=cfg.topology, n=n, pop_block=cfg.pop_block,
            sine_order=cfg.sine_order, audio_f32=audio_f32,
        )

    ms = timed_loop(stream, params) * 1e3
    print(f"stream synthesis (bf16): {ms:8.1f} ms", flush=True)
    ms = timed_loop(
        lambda p: spectral_fitness(
            magnitude_spectrum_factored(stream(p), so, prewindowed=True),
            tspec,
        ),
        params,
    ) * 1e3
    print(f"stream synth+spectrum+fitness: {ms:8.1f} ms", flush=True)

    # parity: streamed engine vs the XLA path on the same candidates
    sub = params[:1024]
    got = np.asarray(
        magnitude_spectrum_factored(stream(sub), so, prewindowed=True)
    )
    ref = np.asarray(
        magnitude_spectrum_factored(
            synthesize(sub, n, cfg.topology, engine="scanless",
                       out_dtype=jnp.float32),
            so,
        )
    )
    rel = np.linalg.norm(got - ref, axis=1) / (
        np.linalg.norm(ref, axis=1) + 1e-30
    )
    print(f"stream-vs-XLA spectra rel err: median {np.median(rel):.2e} "
          f"p95 {np.percentile(rel, 95):.2e}", flush=True)

    # 4. full generation — the gate now routes to synth_stream; the fused
    # flags off give the round-4 XLA composition for comparison
    from pmfm_tpu.es.strategy import active_engine

    for label, c in (
        ("full generation [" + active_engine(cfg, so) + "]", cfg),
        ("full generation [xla]",
         cfg.replace(fused_kernel=False, fused_generation=False)),
    ):
        @jax.jit
        def run(k, c=c):
            st = init_state(k, c)
            fin, _ = evolve(st, tspec, args.gens, so, c)
            return fin.best_fitness

        device_sync(run(key))
        t0 = time.perf_counter()
        device_sync(run(key))
        per_gen = (time.perf_counter() - t0) / args.gens * 1e3
        print(f"{label}: {per_gen:8.1f} ms/gen "
              f"({pop / per_gen / 1e3:.2f}M evals/s)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
