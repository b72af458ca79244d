"""Isolate the pop-independent per-generation fixed cost (~0.55ms).

Times, per scan iteration on the real chip:
  A) fused_generation kernel only (fixed parents, result reduced into carry)
  B) select(top_k + gather) only on fixed arrays
  C) full generation_step (ground truth)
at pop 2^15 and 2^11.
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from pmfm_tpu.es import ESConfig, init_state, make_spectrum_ops
from pmfm_tpu.es.pipeline import generation_step
from pmfm_tpu.es.strategy import select
from pmfm_tpu.kernels.generation import fused_generation

MU, D, N = 256, 6, 1024
ITERS = 100


def timed_scan(body, carry0):
    @jax.jit
    def run(c0):
        c, _ = jax.lax.scan(body, c0, None, length=ITERS)
        return c

    jax.block_until_ready(run(carry0))
    t0 = time.time()
    jax.block_until_ready(run(carry0))
    return (time.time() - t0) / ITERS * 1e3


for pop in (1 << 15, 1 << 11):
    cfg = ESConfig(
        num_parents=MU, num_offspring=pop - MU, num_dimensions=D,
        topology="fm3_series", audio_length_log2=10, spectrum_method="dft",
        dft_dtype="bfloat16", fused_kernel=True, fused_generation=True,
        pop_block=1024,
    )
    so = make_spectrum_ops(cfg)
    tspec = jnp.ones((so.num_bins,), jnp.float32)
    key = jax.random.PRNGKey(0)
    pv = jax.random.uniform(key, (MU, D))
    ps = jnp.full((MU, D), 0.1)

    def body_kernel(carry, _):
        seed, acc = carry
        f, v, s = fused_generation(
            seed, pv, ps, so.dft_cos, so.dft_sin, tspec,
            pop=pop, param_mins=cfg.param_mins, param_maxs=cfg.param_maxs,
            topology="fm3_series", n=N, pop_block=1024,
        )
        return (seed + 1, acc + f[0] * 1e-30 + v[0, 0] * 1e-30 + s[0, 0] * 1e-30), None

    t = timed_scan(body_kernel, (jnp.int32(1), jnp.float32(0)))
    print(f"pop=2^{pop.bit_length()-1} kernel-only/gen   {t:7.3f} ms", flush=True)

    values = jax.random.uniform(key, (pop, D))
    steps = jnp.full((pop, D), 0.1)

    def body_select(carry, _):
        fit, acc = carry
        nv, ns, nf = select(values, steps, fit + acc * 1e-30, MU)
        return (fit, acc + nf[0] * 1e-30 + nv[0, 0] * 1e-30), None

    fit0 = jax.random.uniform(key, (pop,))
    t = timed_scan(body_select, (fit0, jnp.float32(0)))
    print(f"pop=2^{pop.bit_length()-1} select-only/gen   {t:7.3f} ms", flush=True)

    state = init_state(key, cfg)

    def body_full(s, _):
        return generation_step(s, tspec, so, cfg), None

    t = timed_scan(body_full, state)
    print(f"pop=2^{pop.bit_length()-1} full-step/gen     {t:7.3f} ms", flush=True)
