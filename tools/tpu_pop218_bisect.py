"""Bisect the 2^18 evolve-vs-probe gap (round 4).

tpu_pop218_probe measured a faithful kernel+select_t scan at 5.27 ms/gen
(pop 2^18), but bench_suite's evolve runner measured 7.97 (mu=256) /
13.2 (mu=2048) ms/gen. Candidates for the difference: evolve's
generation_step extras (best/stall tracking), the suite's
operands-as-jit-args plumbing, or gens-length amortisation. Time, same
process, same cfg:

  suite   — bench_suite._make_runner verbatim (operands as jit args)
  closure — evolve scan with spectrum ops closed over
  probe   — kernel + select_t body only (tpu_pop218_probe 'sel' variant)

    python tools/tpu_pop218_bisect.py [pop_log2] [mu] [gens]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from pmfm_tpu.es import ESConfig, init_state, make_spectrum_ops
from pmfm_tpu.es.pipeline import (
    evolve,
    fused_generation_kwargs,
    kernel_seed,
)
from pmfm_tpu.es.strategy import select_t
from pmfm_tpu.kernels.generation import fused_generation
from pmfm_tpu.utils import device_sync

POP_LOG2 = int(sys.argv[1]) if len(sys.argv) > 1 else 18
MU = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
GENS = int(sys.argv[3]) if len(sys.argv) > 3 else 200
D = 6
pop = 1 << POP_LOG2

cfg = ESConfig(
    num_parents=MU, num_offspring=pop - MU, num_dimensions=D,
    topology="fm3_series", audio_length_log2=10,
    synthesis_engine="scanless", spectrum_method="dft", dft_dtype="int8",
    fused_kernel=True, fused_generation=True, sine_order=7, pop_block=1024,
)
so = make_spectrum_ops(cfg)
tspec = jnp.ones((so.num_bins,), jnp.float32)
print(f"backend={jax.default_backend()} pop=2^{POP_LOG2} mu={MU} gens={GENS}",
      flush=True)


def timeit(name, fn, *args):
    print(f"compiling {name} ...", flush=True)
    device_sync(fn(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        device_sync(fn(*args))
        best = min(best, (time.time() - t0) / GENS * 1e3)
    print(f"{name:10s} {best:8.4f} ms/gen "
          f"({pop*GENS/(best*1e-3*GENS)/1e6:.2f}M evals/s)", flush=True)


# 1. the suite's exact runner (operands as jit args)
big = {
    f: getattr(so, f)
    for f in ("dft_cos", "dft_sin", "dft_packed")
    if getattr(so, f) is not None
}


@jax.jit
def run_suite(key, big):
    state = init_state(key, cfg)
    final, _ = evolve(state, tspec, GENS, so._replace(**big), cfg)
    return final.best_fitness


timeit("suite", run_suite, jax.random.PRNGKey(0), big)


# 2. evolve with everything closed over
@jax.jit
def run_closure(key):
    state = init_state(key, cfg)
    final, _ = evolve(state, tspec, GENS, so, cfg)
    return final.best_fitness


timeit("closure", run_closure, jax.random.PRNGKey(0))

# 3. the probe body (kernel + select_t, no state tracking)
kw = fused_generation_kwargs(cfg, so)
key0 = jax.random.PRNGKey(0)


@jax.jit
def run_probe(pv, ps):
    def body(carry, g):
        pv, ps = carry
        seed = kernel_seed(key0, g)
        fit, vt, st = fused_generation(
            seed, pv, ps, so.dft_cos, so.dft_sin, tspec, **kw
        )
        npv, nps, npf = select_t(vt, st, fit, MU, D)
        return (npv, nps), None

    (pv, ps), _ = jax.lax.scan(
        body, (pv, ps), jnp.arange(GENS, dtype=jnp.int32)
    )
    return pv[0, 0] + ps[0, 0]


pv = jax.random.uniform(key0, (MU, D), jnp.float32)
ps = jnp.full((MU, D), 0.1, jnp.float32)
timeit("probe", run_probe, pv, ps)
