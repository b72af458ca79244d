"""Per-stage timing of the ES pipeline on the real chip.

Each stage is timed INSIDE one compiled fori_loop (100 iterations, with a
data dependency threaded through to prevent CSE/hoisting) so per-dispatch
tunnel latency doesn't pollute the numbers. This is the honest equivalent of
the reference's per-kernel timing mode (SURVEY.md §5.1).
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def timed_loop(stage_fn, x, iters=50):
    """stage_fn: array -> array (any shape). Returns ms per iteration."""

    @jax.jit
    def run(x0):
        def body(i, carry):
            x_prev, acc = carry
            out = stage_fn(x_prev + acc * 1e-30)
            return x_prev, acc + jnp.sum(out).astype(jnp.float32) * 1e-30
        _, acc = jax.lax.fori_loop(0, iters, body, (x0, jnp.float32(0.0)))
        return acc

    jax.block_until_ready(run(x))  # compile + warm
    t0 = time.time()
    jax.block_until_ready(run(x))
    return (time.time() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pop", type=int, default=32768)
    ap.add_argument("--log2", type=int, default=10)
    ap.add_argument("--parents", type=int, default=256)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    from pmfm_tpu.es import ESConfig, init_state, make_spectrum_ops
    from pmfm_tpu.es.pipeline import generation_step
    from pmfm_tpu.es.strategy import evaluate, mutate, recombine, select
    from pmfm_tpu.ops import magnitude_spectrum, spectral_fitness, synthesize

    P, N, MU = args.pop, 1 << args.log2, args.parents
    cfg = ESConfig(
        num_parents=MU, num_offspring=P - MU, num_dimensions=6,
        topology="fm3_series", audio_length_log2=args.log2,
    )
    so = make_spectrum_ops(cfg)
    so16 = make_spectrum_ops(cfg.replace(dft_dtype="bfloat16"))
    so_rfft = make_spectrum_ops(cfg.replace(spectrum_method="rfft"))
    key = jax.random.PRNGKey(0)
    tspec = jnp.ones((so.num_bins,), jnp.float32)
    values = jax.random.uniform(key, (P, 6))
    steps = jnp.full((P, 6), 0.1)
    audio = jax.random.normal(key, (N, P), jnp.float32)
    spectra = jax.random.uniform(key, (P, so.num_bins), jnp.float32)
    fitness = jax.random.uniform(key, (P,), jnp.float32)
    scaled = values * 3000.0
    it = args.iters

    rows = [
        ("mutate clt12", lambda v: mutate(key, v, steps, cfg)[0], values),
        ("recombine+mutate", lambda v: mutate(key, *recombine(key, v[:MU], steps[:MU], cfg), cfg)[0], values),
        ("synth scan", lambda p: synthesize(p, N, "fm3_series", engine="scan"), scaled),
        ("synth scanless", lambda p: synthesize(p, N, "fm3_series", engine="scanless"), scaled),
        ("spectrum dft f32", lambda a: magnitude_spectrum(a, so), audio),
        ("spectrum dft bf16", lambda a: magnitude_spectrum(a, so16), audio),
        ("spectrum rfft", lambda a: magnitude_spectrum(a, so_rfft), audio),
        ("fitness L2", lambda s: spectral_fitness(s, tspec), spectra),
        ("top_k mu", lambda f: jax.lax.top_k(-(f), MU)[0], fitness),
        ("select", lambda f: select(values, steps, f, MU)[2], fitness),
        ("evaluate fused", lambda v: evaluate(v, tspec, so, cfg), values),
    ]
    print(f"pop=2^{P.bit_length()-1} N={N} mu={MU} iters={it}")
    for name, fn, x in rows:
        try:
            print(f"{name:20s} {timed_loop(fn, x, it):8.3f} ms")
        except Exception as e:  # keep going if a stage can't be loop-timed
            print(f"{name:20s} FAILED: {type(e).__name__}: {e}")

    # full generation step via evolve-scan (ground truth)
    state = init_state(key, cfg)

    @jax.jit
    def gens(s):
        def body(s, _):
            return generation_step(s, tspec, so, cfg), None
        s, _ = jax.lax.scan(body, s, None, length=it)
        return s.best_fitness

    jax.block_until_ready(gens(state))
    t0 = time.time()
    jax.block_until_ready(gens(state))
    print(f"{'full generation':20s} {(time.time()-t0)/it*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
