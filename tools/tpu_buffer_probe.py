"""Which buffer causes the ~0.3ms/invocation: the 2MB VMEM input block or
the 2MB VMEM scratch? Tiny kernel + changing scalar + one factor at a time."""
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
big = jnp.ones((1024, 1024), jnp.bfloat16)


def timed(body, c0):
    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(body, c, None, length=ITERS)
        return c

    jax.block_until_ready(run(c0))
    t0 = time.time()
    jax.block_until_ready(run(c0))
    return (time.time() - t0) / ITERS * 1e3


def make(with_input: bool, with_scratch: bool, read_input: bool = False):
    def _k(s_ref, *rest):
        if with_input and read_input:
            d_ref = rest[0]
            o_ref = rest[1]
            o_ref[:] = (
                jnp.zeros((8, 128), jnp.float32)
                + s_ref[0, 0]
                + d_ref[0:8, 0:128].astype(jnp.float32)
            )
        else:
            o_ref = rest[1] if with_input else rest[0]
            o_ref[:] = jnp.zeros((8, 128), jnp.float32) + s_ref[0, 0]

    in_specs = [pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM)]
    args = []
    if with_input:
        in_specs.append(pl.BlockSpec((1024, 1024), full, memory_space=pltpu.VMEM))
        args.append(big)
    scratch = [pltpu.VMEM((1024, 1024), jnp.bfloat16)] if with_scratch else []

    @jax.jit
    def call(seed):
        return pl.pallas_call(
            _k,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            grid=(1,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((8, 128), full, memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        )(seed.reshape(1, 1), *args)

    def body(c, _):
        s, acc = c
        y = call(s)
        return (s + 1, acc + y[0, 0] * 1e-30), None

    return body


c0 = (jnp.int32(1), jnp.float32(0))
print(f"input=N scratch=N   {timed(make(False, False), c0):7.3f} ms", flush=True)
print(f"input=Y scratch=N   {timed(make(True, False), c0):7.3f} ms", flush=True)
print(f"input=Y(read) s=N   {timed(make(True, False, True), c0):7.3f} ms", flush=True)
print(f"input=N scratch=Y   {timed(make(False, True), c0):7.3f} ms", flush=True)
print(f"input=Y scratch=Y   {timed(make(True, True), c0):7.3f} ms", flush=True)
