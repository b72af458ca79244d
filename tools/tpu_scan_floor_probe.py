"""Is there a fixed per-scan-iteration floor (dispatch/sync) on this system,
and does lax.scan(unroll=k) amortise it?"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from pmfm_tpu.es import ESConfig, init_state, make_spectrum_ops
from pmfm_tpu.es.pipeline import generation_step

ITERS = 100


def timed(run, c0):
    jax.block_until_ready(run(c0))
    t0 = time.time()
    jax.block_until_ready(run(c0))
    return (time.time() - t0) / ITERS * 1e3


# 1) trivial scan body
for unroll in (1, 4, 16):
    @jax.jit
    def run(x, unroll=unroll):
        def body(c, _):
            return c * 1.000001 + 1e-9, None
        c, _ = jax.lax.scan(body, x, None, length=ITERS, unroll=unroll)
        return c

    print(f"trivial scan unroll={unroll:2d}  {timed(run, jnp.float32(1.0)):7.3f} ms/iter",
          flush=True)

# 2) full generation step with scan unroll
MU, D = 256, 6
cfg = ESConfig(num_parents=MU, num_offspring=(1 << 15) - MU, num_dimensions=D,
               topology="fm3_series", audio_length_log2=10,
               spectrum_method="dft", dft_dtype="bfloat16",
               fused_kernel=True, fused_generation=True, pop_block=1024)
so = make_spectrum_ops(cfg)
tspec = jnp.ones((so.num_bins,), jnp.float32)
state = init_state(jax.random.PRNGKey(0), cfg)

for unroll in (1, 2, 4, 8):
    @jax.jit
    def run(s, unroll=unroll):
        def body(c, _):
            return generation_step(c, tspec, so, cfg), None
        c, _ = jax.lax.scan(body, s, None, length=ITERS, unroll=unroll)
        return c.best_fitness

    print(f"full gen 2^15 unroll={unroll:2d}  {timed(run, state):7.3f} ms/gen",
          flush=True)
