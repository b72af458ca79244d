"""Probe: where does the ~1.12ms/gen at bench config go?

Times (a) the fused generation kernel alone, (b) kernel + top-k select,
(c) kernel variants with time_block 128/256/512 — on the real chip.
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from pmfm_tpu.es import ESConfig, make_spectrum_ops
from pmfm_tpu.es.strategy import select
from pmfm_tpu.kernels.generation import fused_generation

POP, MU, N, D = 1 << 15, 256, 1024, 6
ITERS = 50

cfg = ESConfig(
    num_parents=MU, num_offspring=POP - MU, num_dimensions=6,
    topology="fm3_series", audio_length_log2=10, spectrum_method="dft",
    dft_dtype="bfloat16", pop_block=1024,
)
so = make_spectrum_ops(cfg)
tspec = jnp.ones((so.num_bins,), jnp.float32)
key = jax.random.PRNGKey(0)
pv = jax.random.uniform(key, (MU, D))
ps = jnp.full((MU, D), 0.1)


def timed(fn, *args):
    @jax.jit
    def run(seed0, *a):
        def body(i, carry):
            seed, acc = carry
            out = fn(seed + i, *a)
            return seed, acc + out * 1e-30
        _, acc = jax.lax.fori_loop(
            0, ITERS, body, (seed0, jnp.float32(0.0)))
        return acc

    jax.block_until_ready(run(jnp.int32(1), *args))
    t0 = time.time()
    jax.block_until_ready(run(jnp.int32(1), *args))
    return (time.time() - t0) / ITERS * 1e3


def kern_only(seed, pv, ps, tb):
    f, v, s = fused_generation(
        seed, pv, ps, so.dft_cos, so.dft_sin, tspec,
        pop=POP, param_mins=cfg.param_mins, param_maxs=cfg.param_maxs,
        topology="fm3_series", n=N, pop_block=1024, time_block=tb,
    )
    return jnp.sum(f) + jnp.sum(v) * 0 + jnp.sum(s) * 0


def kern_select(seed, pv, ps, tb):
    f, v, s = fused_generation(
        seed, pv, ps, so.dft_cos, so.dft_sin, tspec,
        pop=POP, param_mins=cfg.param_mins, param_maxs=cfg.param_maxs,
        topology="fm3_series", n=N, pop_block=1024, time_block=tb,
    )
    nv, ns, nf = select(v, s, f, MU)
    return jnp.sum(nv) + jnp.sum(ns) * 0 + jnp.sum(nf)


for tb in (128, 256, 512):
    try:
        t = timed(lambda seed, a, b, _tb=tb: kern_only(seed, a, b, _tb), pv, ps)
        print(f"kernel only  tb={_tb if (_tb:=tb) else tb:4d}  {t:7.3f} ms")
    except Exception as e:
        print(f"kernel only  tb={tb:4d}  FAILED {type(e).__name__}: {e}")
for tb in (128,):
    t = timed(lambda seed, a, b, _tb=tb: kern_select(seed, a, b, _tb), pv, ps)
    print(f"kernel+select tb={tb:4d}  {t:7.3f} ms")
