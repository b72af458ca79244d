"""Per-stage timing of the ES pipeline on the real chip.

Separately jits each stage (the reference's per-kernel timing mode,
SURVEY.md §5.1) to find the per-generation bottleneck.
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def bench(fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.time() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pop", type=int, default=32768)
    ap.add_argument("--log2", type=int, default=10)
    ap.add_argument("--parents", type=int, default=256)
    args = ap.parse_args()

    from pmfm_tpu.es import ESConfig, init_state, make_spectrum_ops
    from pmfm_tpu.es.strategy import evaluate, mutate, recombine, select
    from pmfm_tpu.ops import magnitude_spectrum, spectral_fitness, synthesize

    P, N, MU = args.pop, 1 << args.log2, args.parents
    cfg = ESConfig(
        num_parents=MU, num_offspring=P - MU, num_dimensions=6,
        topology="fm3_series", audio_length_log2=args.log2,
    )
    so = make_spectrum_ops(cfg)
    so_bf16 = make_spectrum_ops(cfg.replace(dft_dtype="bfloat16"))
    key = jax.random.PRNGKey(0)
    state = init_state(key, cfg)
    tspec = jnp.ones((so.num_bins,), jnp.float32)
    values = jax.random.uniform(key, (P, 6))
    steps = jnp.full((P, 6), 0.1)
    audio = jax.random.normal(key, (N, P), jnp.float32)
    spectra = jax.random.uniform(key, (P, so.num_bins), jnp.float32)
    fitness = jax.random.uniform(key, (P,), jnp.float32)
    scaled = values * 3000.0

    jrec = jax.jit(lambda k, v, s: recombine(k, v, s, cfg))
    jmut = jax.jit(lambda k, v, s: mutate(k, v, s, cfg))
    jmut_n = jax.jit(lambda k, v, s: mutate(k, v, s, cfg.replace(mutation_noise="normal")))
    jsyn_scan = jax.jit(lambda p: synthesize(p, N, "fm3_series", engine="scan"))
    jsyn_sl = jax.jit(lambda p: synthesize(p, N, "fm3_series", engine="scanless"))
    jspec = jax.jit(lambda a: magnitude_spectrum(a, so))
    jspec16 = jax.jit(lambda a: magnitude_spectrum(a, so_bf16))
    jfit = jax.jit(lambda s: spectral_fitness(s, tspec))
    jsel = jax.jit(lambda v, s, f: select(v, s, f, MU))
    jtopk = jax.jit(lambda f: jax.lax.top_k(-f, MU))
    jargmin = jax.jit(lambda f: jnp.argmin(f))
    jeval = jax.jit(lambda v: evaluate(v, tspec, so, cfg))

    pv, ps = state.parent_values, state.parent_steps
    print(f"pop=2^{P.bit_length()-1} N={N} mu={MU}")
    print(f"recombine gather    {bench(jrec, key, pv, ps):8.3f} ms")
    print(f"mutate clt12        {bench(jmut, key, values, steps):8.3f} ms")
    print(f"mutate normal       {bench(jmut_n, key, values, steps):8.3f} ms")
    print(f"synth scan          {bench(jsyn_scan, scaled):8.3f} ms")
    print(f"synth scanless      {bench(jsyn_sl, scaled):8.3f} ms")
    print(f"spectrum dft f32    {bench(jspec, audio):8.3f} ms")
    print(f"spectrum dft bf16   {bench(jspec16, audio):8.3f} ms")
    print(f"fitness L2          {bench(jfit, spectra):8.3f} ms")
    print(f"top_k mu            {bench(jtopk, fitness):8.3f} ms")
    print(f"argmin              {bench(jargmin, fitness):8.3f} ms")
    print(f"select (topk+gather){bench(jsel, values, steps, fitness):8.3f} ms")
    print(f"evaluate fused      {bench(jeval, values):8.3f} ms")


if __name__ == "__main__":
    main()
