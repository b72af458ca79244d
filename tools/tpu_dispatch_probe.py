"""Definitive test: per-custom-call cost inside a compiled scan on axon.

Tiny noop pallas kernel with a CHANGING scalar operand (cannot be hoisted),
1x and 2x per scan iteration, plus a pure-HLO body of similar size.
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

ITERS = 200
full = lambda *_: (0, 0)  # noqa: E731


def _k(s_ref, o_ref):
    o_ref[:] = jnp.zeros((8, 128), jnp.float32) + s_ref[0, 0]


@jax.jit
def tiny(seed):
    return pl.pallas_call(
        _k,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        grid=(1,),
        in_specs=[pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((8, 128), full, memory_space=pltpu.VMEM),
    )(seed.reshape(1, 1))


def timed(body, c0):
    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(body, c, None, length=ITERS)
        return c

    jax.block_until_ready(run(c0))
    t0 = time.time()
    jax.block_until_ready(run(c0))
    return (time.time() - t0) / ITERS * 1e3


def b1(c, _):
    s, acc = c
    y = tiny(s)
    return (s + 1, acc + y[0, 0] * 1e-30), None


def b2(c, _):
    s, acc = c
    y = tiny(s)
    z = tiny(s + 7)
    return (s + 1, acc + y[0, 0] * 1e-30 + z[0, 0] * 1e-30), None


def b_hlo(c, _):
    s, acc = c
    y = jnp.zeros((8, 128), jnp.float32) + s
    return (s + 1, acc + jnp.sum(y) * 1e-30), None


print(f"tiny pallas x1/iter   {timed(b1, (jnp.int32(1), jnp.float32(0))):7.3f} ms", flush=True)
print(f"tiny pallas x2/iter   {timed(b2, (jnp.int32(1), jnp.float32(0))):7.3f} ms", flush=True)
print(f"pure HLO same shape   {timed(b_hlo, (jnp.int32(1), jnp.float32(0))):7.3f} ms", flush=True)
