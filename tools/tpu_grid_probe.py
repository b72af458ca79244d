"""(pop_block, time_block) re-sweep of the bench engine (real chip).

The pre-fold sweep (CLAUDE.md probe notes) found PB=1024, C=128 optimal.
The folded DFT halved the scratch and changed the matmul shapes, and the
order-7 sine cut the VPU share — this probe re-checks the grid at the
CURRENT engine (folded int8 + sin7, scan-of-fused-generations, steady
state) in case the optimum moved.
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

if not jax.config.jax_compilation_cache_dir:
    from pmfm_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

from pmfm_tpu.es import ESConfig, init_state, make_spectrum_ops  # noqa: E402
from pmfm_tpu.es.strategy import select  # noqa: E402
from pmfm_tpu.kernels.generation import fused_generation  # noqa: E402
from pmfm_tpu.es.pipeline import fused_generation_kwargs  # noqa: E402

P, MU, GENS = 1 << 15, 256, 1000

cfg = ESConfig(
    num_parents=MU, num_offspring=P - MU, num_dimensions=6,
    topology="fm3_series", audio_length_log2=10,
    synthesis_engine="scanless", spectrum_method="dft", dft_dtype="int8",
    mutation_noise="clt12", fused_kernel=True, fused_generation=True,
    pop_block=1024, sine_order=7,
)
so = make_spectrum_ops(cfg)
tspec = jnp.ones((so.num_bins,), jnp.float32)

for pb, c in ((1024, 128), (1024, 64), (1024, 256), (512, 128), (2048, 128)):
    kwd = fused_generation_kwargs(cfg, so)
    kwd["pop_block"] = pb
    kwd["time_block"] = c

    @jax.jit
    def run(key, kwd=kwd):
        state = init_state(key, cfg)

        def body(carry, _):
            pv, ps, seed = carry
            fit, vals, steps = fused_generation(seed, pv, ps, so.dft_cos,
                                                so.dft_sin, tspec, **kwd)
            pv, ps, pf = select(vals, steps, fit, MU)
            return (pv, ps, seed + 1), pf[0]

        (_, _, _), traj = jax.lax.scan(
            body, (state.parent_values, state.parent_steps, jnp.int32(1)),
            None, length=GENS)
        return traj[-1]

    try:
        jax.block_until_ready(run(jax.random.PRNGKey(0)))
        best = None
        for i in range(3):
            t0 = time.time()
            jax.block_until_ready(run(jax.random.PRNGKey(i)))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print("PB=%4d C=%3d  %.4f ms/gen  (%.1fM evals/s)"
              % (pb, c, best / GENS * 1e3, P * GENS / best / 1e6), flush=True)
    except Exception as e:
        print("PB=%4d C=%3d  FAILED %s" % (pb, c, str(e)[:150]), flush=True)
