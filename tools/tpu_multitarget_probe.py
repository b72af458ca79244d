"""Attribute the vmapped multi-target throughput loss (round 4).

VERDICT (measured 2026-08-21): the device side was NEVER the problem.
vmap(fused_generation) at B=4 pop 2^13 runs 57.0M aggregate evals/s,
+select_t 52.1M, full vmap(evolve) 50.4M, the jitted vmapped matcher
62.7M on real targets — and a hand-written segmented kernel grid
(per-segment operand BlockSpecs in ONE pallas grid) measured IDENTICAL
device time (59.3 vs 59.5M at B=4/2^13; 67.0M both at B=32/2^11), so it
was deleted. match_many's observed ~29M came from two HOST sinks, both
fixed in es/pipeline.py: a bare jax.vmap(run) re-traced the whole
G-generation scan per call (now jit-cached, _compiled_many_matcher), and
per-result np.asarray/float() readbacks cost ~25 ms each on the axon dev
tunnel (now one batched transfer per output array). Re-recorded artifact:
benchmarks/multi_target.csv (52.3M at B=4, 60.9M at B=32 x 2^11).

  vkernel  — vmap(fused_generation) only, B runs (consume fitness)
  vstep    — vkernel + vmap(select_t)                 (the full hot path)
  flat     — ONE fused_generation at pop B*P          (upper bound)

    python tools/tpu_multitarget_probe.py [B] [pop_log2] [iters]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from pmfm_tpu.es import ESConfig, make_spectrum_ops
from pmfm_tpu.es.pipeline import fused_generation_kwargs, kernel_seed
from pmfm_tpu.es.strategy import select_t
from pmfm_tpu.kernels.generation import fused_generation

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
POP_LOG2 = int(sys.argv[2]) if len(sys.argv) > 2 else 13
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 200
D = 6
pop = 1 << POP_LOG2
MU = max(64, pop // 128)


def build(p, mu):
    cfg = ESConfig(
        num_parents=mu, num_offspring=p - mu, num_dimensions=D,
        topology="fm3_series", audio_length_log2=10,
        synthesis_engine="scanless", spectrum_method="dft",
        dft_dtype="int8", fused_kernel=True, fused_generation=True,
        sine_order=7, pop_block=1024,
    )
    so = make_spectrum_ops(cfg)
    return cfg, so, fused_generation_kwargs(cfg, so)


print(f"backend={jax.default_backend()} B={B} pop=2^{POP_LOG2} mu={MU}",
      flush=True)
key0 = jax.random.PRNGKey(0)


def timeit(name, fn, *args):
    print(f"compiling {name} ...", flush=True)
    float(np.asarray(fn(*args)))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(fn(*args)))
        best = min(best, (time.time() - t0) / ITERS * 1e3)
    total = B * pop if name.startswith("v") else bpop
    print(f"{name:8s} {best:8.4f} ms/iter ({total/(best*1e-3)/1e6:.2f}M "
          f"evals/s aggregate)", flush=True)


cfg, so, kw = build(pop, MU)
tspec = jnp.ones((B, so.num_bins), jnp.float32)


def one_gen(pv, ps, tsp, g):
    seed = kernel_seed(key0, g)
    return fused_generation(
        seed, pv, ps, so.dft_cos, so.dft_sin, tsp, **kw
    )


@jax.jit
def run_vkernel(pvb, psb):
    def body(carry, g):
        pvb, psb = carry
        fit, vt, st = jax.vmap(one_gen, in_axes=(0, 0, 0, None))(
            pvb, psb, tspec, g
        )
        dep = fit[:, 0].sum() * 1e-30
        return (pvb + dep, psb), None

    (pvb, psb), _ = jax.lax.scan(
        body, (pvb, psb), jnp.arange(ITERS, dtype=jnp.int32)
    )
    return pvb[0, 0, 0]


@jax.jit
def run_vstep(pvb, psb):
    def body(carry, g):
        pvb, psb = carry
        fit, vt, st = jax.vmap(one_gen, in_axes=(0, 0, 0, None))(
            pvb, psb, tspec, g
        )
        npv, nps, npf = jax.vmap(
            lambda v, s, f: select_t(v, s, f, MU, D)
        )(vt, st, fit)
        return (npv, nps), None

    (pvb, psb), _ = jax.lax.scan(
        body, (pvb, psb), jnp.arange(ITERS, dtype=jnp.int32)
    )
    return pvb[0, 0, 0]


pvb = jax.random.uniform(key0, (B, MU, D), jnp.float32)
psb = jnp.full((B, MU, D), 0.1, jnp.float32)
timeit("vkernel", run_vkernel, pvb, psb)
timeit("vstep", run_vstep, pvb, psb)

# flat upper bound: one run at B*pop
bpop = B * pop
bmu = max(64, bpop // 128)
cfg_f, so_f, kw_f = build(bpop, bmu)
tspec_f = jnp.ones((so_f.num_bins,), jnp.float32)


@jax.jit
def run_flat(pv, ps):
    def body(carry, g):
        pv, ps = carry
        seed = kernel_seed(key0, g)
        fit, vt, st = fused_generation(
            seed, pv, ps, so_f.dft_cos, so_f.dft_sin, tspec_f, **kw_f
        )
        npv, nps, npf = select_t(vt, st, fit, bmu, D)
        return (npv, nps), None

    (pv, ps), _ = jax.lax.scan(
        body, (pv, ps), jnp.arange(ITERS, dtype=jnp.int32)
    )
    return pv[0, 0]


pv = jax.random.uniform(key0, (bmu, D), jnp.float32)
ps = jnp.full((bmu, D), 0.1, jnp.float32)
timeit("flat", run_flat, pv, ps)
