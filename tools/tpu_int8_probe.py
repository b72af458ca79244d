"""Is an int8 DFT matmul worth it vs bf16?

The fused kernel's measured breakdown (tools/tpu_ablate_probe.py): DFT
matmuls ~0.33ms/gen (at MXU bf16 peak), plus a per-invocation base that
scales with VMEM footprint (~0.15ms per 2MB). v5e int8 MXU rate is 2x bf16,
and int8 operands halve both the (2K,N) DFT operand and the (N,PB) audio
scratch. Upper bound if both materialise: ~0.17 + ~0.15 = ~0.3ms/gen off a
~1.1ms generation.

This probe times, at the bench shape (2K=1024, N=1024, PB=1024, 32 blocks):
  A. bf16 dft @ bf16 audio   (current kernel's DFT stage)
  B. int8 dft @ int8 audio   (preferred_element_type=int32)
  C. B + in-kernel f32->int8 quantisation of the audio (the extra cast the
     real kernel would pay when writing scratch)
Each variant runs inside a scan so per-invocation base is included.
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

K2, N, PB, BLOCKS = 1024, 1024, 1024, 32
ITERS = 100


def timed(call, *args):
    @jax.jit
    def run(s, a):
        def body(c, _):
            y = call(c[0], a)
            return (c[0] + 1, c[1] + y), None

        (_, acc), _ = jax.lax.scan(body, (s, jnp.float32(0)), None, length=ITERS)
        return acc

    jax.block_until_ready(run(jnp.int32(0), *args))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(run(jnp.int32(0), *args))  # true sync
        best = min(best, time.time() - t0)
    return best / ITERS * 1e3


full = lambda *_: (0, 0)  # noqa: E731


def make(mode):
    dt = jnp.bfloat16 if mode == "bf16" else jnp.int8

    def _k(s_ref, dft_ref, audio_ref, o_ref):
        a = audio_ref[:]
        if mode == "int8_quant":
            # what the real kernel pays: audio arrives f32, quantise in kernel
            a = jnp.round(a.astype(jnp.float32) * 127.0).astype(jnp.int8)
        acc = jnp.int32 if dt == jnp.int8 else jnp.float32
        spec = jax.lax.dot_general(
            dft_ref[:], a, (((1,), (0,)), ((), ())), preferred_element_type=acc
        ).astype(jnp.float32)
        re = spec[: K2 // 2] + s_ref[0, 0]
        im = spec[K2 // 2 :]
        mag = jnp.sqrt(re * re + im * im)
        o_ref[pl.ds(pl.program_id(0), 1), :] = jnp.sum(mag, axis=0)[None, :]

    audio_dt = dt if mode != "int8_quant" else jnp.int8
    dft = jnp.ones((K2, N), audio_dt if mode != "int8_quant" else jnp.int8)
    audio = jnp.ones((N, PB * BLOCKS), dt if mode != "int8_quant" else jnp.bfloat16)
    if mode == "int8_quant":
        dft = jnp.ones((K2, N), jnp.int8)
        audio = jnp.ones((N, PB * BLOCKS), jnp.bfloat16)

    @jax.jit
    def call(seed, a):
        out = pl.pallas_call(
            _k,
            out_shape=jax.ShapeDtypeStruct((BLOCKS, PB), jnp.float32),
            grid=(BLOCKS,),
            in_specs=[
                pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),
                pl.BlockSpec((K2, N), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((N, PB), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLOCKS, PB), full, memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        )(seed.astype(jnp.float32).reshape(1, 1), dft, a)
        return out[0, 0]

    return call, (audio,)


for mode in ("bf16", "int8", "int8_quant"):
    try:
        call, args = make(mode)
        print(f"{mode:12s} {timed(call, *args):7.3f} ms/invocation", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{mode:12s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
