"""Sine-polynomial order sweep on the fused int8 engine (real chip).

The oscillator polynomial is ~0.17 ms of the ~0.63 ms/gen steady state
(docs/KERNELS.md breakdown). Lower orders trade accuracy for VPU FLOPs
(ESConfig.sine_order): order 9 ~2e-6 max err, 7 ~1.1e-4, 5 ~7e-3 — but
modulator errors feed forward through the FM chain's phase accumulation,
so the fitness impact is larger than the raw polynomial error.

Measured 2026-08-19 (pop 2^15, N=1024, fm3_series, 1000-gen steady state):
  order=9  0.6292 ms/gen (52.1M evals/s)  med_rel=1.53e-03  overlap 254/256
  order=7  0.6057 ms/gen (54.1M evals/s)  med_rel=1.98e-03  overlap 255/256
  order=5  0.5732 ms/gen (57.2M evals/s)  med_rel=1.36e-02  overlap 252/256
(med_rel/overlap vs the XLA f32 jnp.sin path; order 9's 1.5e-3 IS the int8
quantisation noise floor. tools/convergence_check.py gates any default
change on real matching quality.)
"""
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
from pmfm_tpu.es.pipeline import evaluate, evolve  # noqa: E402

P, MU, GENS = 1 << 15, 256, 1000

base = ESConfig(
    num_parents=MU, num_offspring=P - MU, num_dimensions=6,
    topology="fm3_series", audio_length_log2=10,
    synthesis_engine="scanless", spectrum_method="dft", dft_dtype="int8",
    mutation_noise="clt12", fused_kernel=True, fused_generation=True,
    fused_evolve=False, pop_block=1024,
)
cfg32 = base.replace(dft_dtype="float32", fused_kernel=False,
                     fused_generation=False)
so32 = make_spectrum_ops(cfg32)
tspec = jnp.ones((so32.num_bins,), jnp.float32)
vals = jax.random.uniform(jax.random.PRNGKey(7), (P, 6))

f32_ref = np.asarray(evaluate(vals, tspec, so32, cfg32))
top32 = np.argsort(f32_ref)[:MU]

for order in (9, 7, 5):
    cfg8 = base.replace(sine_order=order)
    so8 = make_spectrum_ops(cfg8)

    # -- ranking agreement vs f32/jnp.sin ---------------------------------
    f8 = np.asarray(jax.jit(
        lambda v: evaluate(v, tspec, so8, cfg8))(vals))
    rel = np.abs(f8 - f32_ref) / (np.abs(f32_ref) + 1e-9)
    top8 = np.argsort(f8)[:MU]
    overlap = len(set(top8.tolist()) & set(top32.tolist()))

    # -- steady-state timing (bench config) --------------------------------
    @jax.jit
    def run(key):
        state = init_state(key, cfg8)
        final, _ = evolve(state, tspec, GENS, so8, cfg8)
        return final.best_fitness

    jax.block_until_ready(run(jax.random.PRNGKey(0)))
    best = None
    for i in range(3):
        t0 = time.time()
        jax.block_until_ready(run(jax.random.PRNGKey(i)))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(
        "order=%d  %.4f ms/gen  (%.1fM evals/s)  med_rel=%.2e max_rel=%.2e "
        "top1=%s overlap=%d/%d"
        % (order, best / GENS * 1e3, P * GENS / best / 1e6,
           float(np.median(rel)), float(rel.max()),
           top8[0] == top32[0], overlap, MU),
        flush=True,
    )
