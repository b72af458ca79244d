"""Attribute the pop=2^18 per-eval slowdown (round 4).

population_scaling_flagship.csv round-4 row: 2^18 runs 13.2 ms/gen at
mu=2048 (19.9M evals/s) and 7.97 ms at mu=256 — vs 2.23 ms at 2^17
(58.7M). The select probe (tools/tpu_select_probe.py) shows XLA top_k is
FLAT (~0.5 ms at 2^18, any mu), so the excess lives in the kernel or the
select_t survivor gather. This probe times, inside one lax.scan with a
data dependency:

  kernel        — fused_generation only (consume fitness[0])
  kernel+select — plus select_t (the full offspring->parents path)
  select_t      — select_t alone on a precomputed (VR, P) layout

    python tools/tpu_pop218_probe.py [pops=18,17] [mus=2048,256] [iters=50]
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
from pmfm_tpu.kernels.generation import fused_generation, hier_parent_operand, use_hier_gather

POPS = (1 << 18, 1 << 17)
MUS = (2048, 256)
ITERS = 50
for a in sys.argv[1:]:
    if a.startswith("pops="):
        POPS = tuple(1 << int(x) for x in a[5:].split(","))
    elif a.startswith("mus="):
        MUS = tuple(int(x) for x in a[4:].split(","))
    elif a.startswith("iters="):
        ITERS = int(a[6:])

D = 6
print(f"backend={jax.default_backend()}", flush=True)

for pop in POPS:
    for mu in MUS:
        cfg = ESConfig(
            num_parents=mu, num_offspring=pop - mu, num_dimensions=D,
            topology="fm3_series", audio_length_log2=10,
            synthesis_engine="scanless", spectrum_method="dft",
            dft_dtype="int8", fused_kernel=True, fused_generation=True,
            sine_order=7, pop_block=1024,
        )
        so = make_spectrum_ops(cfg)
        key = jax.random.PRNGKey(0)
        pv = jax.random.uniform(key, (mu, D), jnp.float32)
        ps = jnp.full((mu, D), 0.1, jnp.float32)
        tspec = jnp.ones((so.num_bins,), jnp.float32)
        kw = fused_generation_kwargs(cfg, so)
        vr = 8

        def mk(variant):
            @jax.jit
            def run(pv, ps, tspec):
                def body(carry, g):
                    pv, ps = carry
                    seed = kernel_seed(key, g)
                    fit, vt, st = fused_generation(
                        seed, pv, ps, so.dft_cos, so.dft_sin, tspec, **kw
                    )
                    if variant == "kernel":
                        dep = fit[0] * 1e-30
                        return (pv + dep, ps), None
                    npv, nps, npf = select_t(vt, st, fit, mu, D)
                    return (npv, nps), None

                (pv, ps), _ = jax.lax.scan(
                    body, (pv, ps), jnp.arange(ITERS, dtype=jnp.int32)
                )
                return pv[0, 0] + ps[0, 0]

            return run

        @jax.jit
        def run_sel(vt, st, fit):
            def body(carry, _):
                acc = carry
                npv, nps, npf = select_t(
                    vt + acc * 1e-30, st, fit, mu, D
                )
                return acc + npf[0] * 1e-30, None

            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0), None, length=ITERS
            )
            return acc

        vt = jax.random.uniform(key, (vr, pop), jnp.float32)
        st = jnp.full((vr, pop), 0.1, jnp.float32)
        fit = jax.random.uniform(key, (pop,), jnp.float32) * 1e6

        for name, fn, args in (
            ("kernel", mk("kernel"), (pv, ps, tspec)),
            ("kernel+select", mk("sel"), (pv, ps, tspec)),
            ("select_t", run_sel, (vt, st, fit)),
        ):
            print(f"compiling pop=2^{pop.bit_length()-1} mu={mu} {name} ...",
                  flush=True)
            float(np.asarray(fn(*args)))
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                float(np.asarray(fn(*args)))
                best = min(best, (time.time() - t0) / ITERS * 1e3)
            print(f"pop=2^{pop.bit_length()-1} mu={mu:5d} {name:14s} "
                  f"{best:8.4f} ms/iter", flush=True)
