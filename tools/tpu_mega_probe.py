"""Time fused_evolve directly: amortisation across gens and pop scaling."""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from pmfm_tpu.ops.spectral import make_spectrum_ops
from pmfm_tpu.kernels.evolve import fused_evolve

MU, D, N = 256, 6, 1024
so = make_spectrum_ops(N, method="dft", dft_dtype=jnp.bfloat16)
tgt = jnp.ones((so.num_bins,), jnp.float32)
key = jax.random.PRNGKey(0)
pv = jax.random.uniform(key, (MU, D))
ps = jnp.full((MU, D), 0.1)
MAXS = (3520.0, 8.0, 3520.0, 8.0, 3520.0, 8.0)


def run_once(pop, gens):
    out = fused_evolve(
        jnp.int32(3), pv, ps, pv[0], jnp.float32(np.inf), so.dft_packed, tgt,
        gens=gens, pop=pop, param_mins=(0.0,) * D, param_maxs=MAXS,
        topology="fm3_series", n=N, pop_block=1024)
    jax.block_until_ready(out)


for pop, gens in ((1 << 15, 1), (1 << 15, 10), (1 << 15, 100), (1 << 11, 100)):
    run_once(pop, gens)  # compile+warm
    t0 = time.time()
    run_once(pop, gens)
    dt = (time.time() - t0) * 1e3
    print(f"pop=2^{pop.bit_length()-1} gens={gens:3d}  total {dt:8.2f} ms  "
          f"per-gen {dt/gens:7.3f} ms", flush=True)
