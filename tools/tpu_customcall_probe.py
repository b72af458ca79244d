"""Pin the ~0.3ms per-invocation cost: program size? buffers? custom call?

Scan bodies (100 iters each):
  noop pallas, big buffers, x1 and x2 per iteration
  noop pallas, tiny buffers, x1 and x2
  bare top_k(32768) / top_k(2048)
  argmin only (no sort)
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

ITERS = 100
key = jax.random.PRNGKey(0)


def timed(run, c0):
    jax.block_until_ready(run(c0))
    t0 = time.time()
    jax.block_until_ready(run(c0))
    return (time.time() - t0) / ITERS * 1e3


def report(label, body, c0):
    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(body, c, None, length=ITERS)
        return c
    try:
        print(f"{label:40s} {timed(run, c0):7.3f} ms/iter", flush=True)
    except Exception as e:
        print(f"{label:40s} FAILED {type(e).__name__}: {e}", flush=True)


def make_noop(big: bool):
    rows = 1024 if big else 8
    full = lambda *_: (0, 0)  # noqa: E731

    def _k(x_ref, o_ref, scratch):
        o_ref[:8, :] = x_ref[:8, :] * 2.0

    def call(x):
        return pl.pallas_call(
            _k,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            grid=(1,),
            in_specs=[pl.BlockSpec((rows, 128), full, memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, 128), full, memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((1024, 1024) if big else (8, 128), jnp.bfloat16)
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(x)
    return call, jnp.ones((rows, 128), jnp.float32)


for big in (True, False):
    call, x0 = make_noop(big)

    def body1(c, _, call=call):
        x, acc = c
        y = call(x)
        return (x, acc + y[0, 0] * 1e-30), None

    def body2(c, _, call=call):
        x, acc = c
        y = call(x)
        z = call(x + acc * 1e-30)
        return (x, acc + y[0, 0] * 1e-30 + z[0, 0] * 1e-30), None

    report(f"noop pallas big={big} x1", body1, (x0, jnp.float32(0)))
    report(f"noop pallas big={big} x2", body2, (x0, jnp.float32(0)))


for n in (1 << 15, 1 << 11):
    f0 = jax.random.uniform(key, (n,))

    def body_topk(c, _):
        f, acc = c
        v, i = jax.lax.top_k(-(f + acc * 1e-30), 256)
        return (f, acc + v[0] * 1e-30), None

    report(f"bare top_k(n={n}, k=256)", body_topk, (f0, jnp.float32(0)))

    def body_argmin(c, _):
        f, acc = c
        return (f, acc + jnp.min(f + acc * 1e-30) * 1e-30), None

    report(f"bare min(n={n})", body_argmin, (f0, jnp.float32(0)))
