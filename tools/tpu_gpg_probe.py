"""Probe: gens_per_step amortisation of the per-grid-step VMEM base cost.

fused_evolve with grid=(gens,) pays the ~0.3-0.5ms per-grid-step DMA/alloc
base (tools/tpu_buffer_probe.py) every generation. gens_per_step folds gpg
generations into one grid step; if the base is per grid step, per-gen time
drops by base*(1-1/gpg). Seeding is by absolute generation index, so results
must be bit-identical across gpg — checked first.
"""
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
POP = 1 << 15
so = make_spectrum_ops(N, method="dft", dft_dtype=jnp.int8)
tgt = jnp.ones((so.num_bins,), jnp.float32)
key = jax.random.PRNGKey(0)
pv = jax.random.uniform(key, (MU, D))
ps = jnp.full((MU, D), 0.1)
MAXS = (3520.0, 8.0, 3520.0, 8.0, 3520.0, 8.0)


def run(gens, gpg):
    out = fused_evolve(
        jnp.int32(3), pv, ps, pv[0], jnp.float32(np.inf), so.dft_packed, tgt,
        gens=gens, pop=POP, param_mins=(0.0,) * D, param_maxs=MAXS,
        topology="fm3_series", n=N, pop_block=1024,
        dft_scale=so.dft_packed_scale, gens_per_step=gpg)
    return out


# --- bit-exactness: gpg=1 vs gpg=4 over 8 generations
a = jax.tree.map(np.asarray, run(8, 1))
b = jax.tree.map(np.asarray, run(8, 4))
names = ("pv", "ps", "pf", "bv", "bf", "traj")
for nm, x, y in zip(names, a, b):
    ok = np.array_equal(x, y)
    print(f"exact[{nm}]: {ok}", flush=True)
    if not ok:
        print("  max |diff|:", np.max(np.abs(x - y)), flush=True)

# --- timing sweep
GENS = 100
for gpg in (1, 2, 4, 10, 25):
    run(GENS, gpg)  # compile + warm
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(run(GENS, gpg)[4])  # true sync
        best = min(best, time.time() - t0)
    print(f"gpg={gpg:3d}  total {best*1e3:8.2f} ms  per-gen {best*1e3/GENS:7.3f} ms",
          flush=True)
