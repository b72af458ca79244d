"""Isolate the ~0.3ms per-invocation fixed cost of the fused kernels.

Candidates: pure pallas_call dispatch, first-program DMAs (dft copy),
the PRNG/recombine prologue, output transposes.
"""
import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from pmfm_tpu.es import ESConfig, make_spectrum_ops
from pmfm_tpu.kernels.generation import fused_generation
from pmfm_tpu.kernels.synth_fitness import fused_synth_fitness

MU, D, N = 256, 6, 1024
ITERS = 100
key = jax.random.PRNGKey(0)
cfg = ESConfig(num_parents=MU, num_offspring=(1 << 15) - MU, num_dimensions=D,
               topology="fm3_series", audio_length_log2=10,
               spectrum_method="dft", dft_dtype="bfloat16")
so = make_spectrum_ops(cfg)
tspec = jnp.ones((so.num_bins,), jnp.float32)
pv = jax.random.uniform(key, (MU, D))
ps = jnp.full((MU, D), 0.1)


def timed_scan(body, carry0):
    @jax.jit
    def run(c0):
        c, _ = jax.lax.scan(body, c0, None, length=ITERS)
        return c

    jax.block_until_ready(run(carry0))
    t0 = time.time()
    jax.block_until_ready(run(carry0))
    return (time.time() - t0) / ITERS * 1e3


def report(label, body, carry0):
    try:
        print(f"{label:44s} {timed_scan(body, carry0):7.3f} ms", flush=True)
    except Exception as e:
        print(f"{label:44s} FAILED {type(e).__name__}: {e}", flush=True)


# 1) gen-kernel at 1 program
def body_gen(pop):
    def body(carry, _):
        seed, acc = carry
        f, v, s = fused_generation(
            seed, pv, ps, so.dft_cos, so.dft_sin, tspec,
            pop=pop, param_mins=cfg.param_mins, param_maxs=cfg.param_maxs,
            topology="fm3_series", n=N, pop_block=1024)
        return (seed + 1, acc + f[0] * 1e-30 + v[0, 0] * 1e-30), None
    return body


for pop in (1024, 2048, 4096):
    report(f"gen-kernel pop={pop} ({pop//1024} prog)", body_gen(pop),
           (jnp.int32(1), jnp.float32(0)))

# 2) eval-only kernel (no PRNG prologue) at 1 and 32 programs
params = jax.random.uniform(key, (1 << 15, D)) * 3000.0


def body_eval(pop):
    p = params[:pop]

    def body(carry, _):
        x, acc = carry
        f = fused_synth_fitness(
            p + acc * 1e-30, so.dft_cos, so.dft_sin, tspec,
            topology="fm3_series", n=N, pop_block=1024)
        return (x, acc + f[0] * 1e-30), None
    return body


for pop in (1024, 1 << 15):
    report(f"eval-kernel pop={pop} ({pop//1024} prog)", body_eval(pop),
           (jnp.float32(0), jnp.float32(0)))


# 3) trivial kernel: same in/out block layout, no compute
def _noop_kernel(seed_ref, pv_ref, ps_ref, dft_ref, tgt_ref, tri_ref,
                 fit_ref, v_ref, s_ref, scratch):
    i = pl.program_id(0)
    fit_ref[pl.ds(i, 1), :] = jnp.zeros((1, 1024), jnp.float32) + seed_ref[0, 0]
    v_ref[:, pl.ds(i * 1024, 1024)] = pv_ref[0, 0] + jnp.zeros((D, 1024), jnp.float32)
    s_ref[:, pl.ds(i * 1024, 1024)] = ps_ref[0, 0] + jnp.zeros((D, 1024), jnp.float32)


def noop(pop):
    k = so.num_bins
    dft = jnp.zeros((2 * k, N), jnp.bfloat16)
    tri = jnp.zeros((128, 128), jnp.float32)
    full = lambda *_: (0, 0)  # noqa: E731

    @jax.jit
    def call(seed):
        return pl.pallas_call(
            _noop_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((pop // 1024, 1024), jnp.float32),
                jax.ShapeDtypeStruct((D, pop), jnp.float32),
                jax.ShapeDtypeStruct((D, pop), jnp.float32),
            ),
            grid=(pop // 1024,),
            in_specs=[
                pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),
                pl.BlockSpec((D, MU), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((D, MU), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * k, N), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((k, 1), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), full, memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((pop // 1024, 1024), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((D, pop), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((D, pop), full, memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[pltpu.VMEM((N, 1024), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(seed.reshape(1, 1), pv.T, ps.T, dft, tspec[:, None], tri)

    def body(carry, _):
        seed, acc = carry
        f, v, s = call(seed)
        return (seed + 1, acc + f[0, 0] * 1e-30 + v[0, 0] * 1e-30), None
    return body


for pop in (1024, 1 << 15):
    report(f"noop-kernel pop={pop} ({pop//1024} prog)", noop(pop),
           (jnp.int32(1), jnp.float32(0)))
