"""Hardware ablation of the fused evaluate kernel (fm3_series, bench shape).

Variants attribute the ~1.12 ms/gen:
  full        — synthesis + DFT + fitness (reference structure)
  no_dft      — synthesis only (audio written to scratch, fitness = sum)
  no_synth    — DFT + fitness only (audio = iota constant)
  no_osc      — synthesis structure with osc() replaced by identity
  no_prefix   — synthesis without the tri matmuls (pos2/pos3 = x directly)
"""
import functools
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

from pmfm_tpu.ops.spectral import make_spectrum_ops
from pmfm_tpu.kernels.synth_fitness import _sin_turns, _tri_strict

POP, PB, N, C, K = 1 << 15, 1024, 1024, 128, 512
ITERS = 50
so = make_spectrum_ops(N, method="dft", dft_dtype=jnp.bfloat16)
# this probe's private kernel predates the folded DFT (it ablates the
# unfolded structure, which is still the right shape for attributing
# synthesis/VPU vs matmul cost) — build the unfolded (2K, N) operand
# explicitly; SpectrumOps.dft_packed is now the folded (2K, N/2) form
import jax.numpy as _jnp

DFT_UNFOLDED = _jnp.concatenate([so.dft_cos, so.dft_sin], axis=1).T.astype(
    _jnp.bfloat16
)


def _kernel(p_ref, dft_ref, tgt_ref, tri_ref, fit_ref, audio, *, variant):
    i = pl.program_id(0)
    p = p_ref[:]
    inv_sr = jnp.float32(1.0 / 44100.0)
    tri = tri_ref[:]

    def osc(x):
        if variant == "no_osc":
            return x
        return _sin_turns(x - jnp.floor(x + 0.5))

    def frac(x):
        return x - jnp.floor(x)

    def ex_prefix(xb):
        if variant == "no_prefix":
            return xb, xb[0:1]
        ps = jax.lax.dot_general(
            tri, xb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return ps[0:C], ps[C:C + 1]

    def row(j):
        return p[j:j + 1, :]

    t_blk = jax.lax.broadcasted_iota(jnp.int32, (C, PB), 0).astype(jnp.float32)
    im1 = inv_sr * (row(0) * row(1))
    im2 = inv_sr * (row(2) * row(3))
    m3 = row(4) * row(5)
    ic1, ic2 = inv_sr * row(3), inv_sr * row(5)
    inc1 = frac(inv_sr * row(1))
    inc_blk = frac(jnp.float32(C) * inc1)
    z = jnp.zeros((1, PB), jnp.float32)
    off1, off2, off3 = z, z, z
    fit = jnp.zeros((1, PB), jnp.float32)
    for b in range(N // C):
        if variant == "no_synth":
            out = t_blk * jnp.float32(1e-4)
        else:
            pos1 = t_blk * inc1 + off1
            x1 = osc(pos1) * im1 + ic1
            pre1, tot1 = ex_prefix(x1)
            pos2 = pre1 + off2
            off2 = frac(off2 + tot1)
            x2 = osc(pos2) * im2 + ic2
            pre2, tot2 = ex_prefix(x2)
            pos3 = pre2 + off3
            off3 = frac(off3 + tot2)
            out = osc(pos3) * m3
            off1 = frac(off1 + inc_blk)
        audio[pl.ds(b * C, C), :] = out.astype(jnp.bfloat16)
    if variant == "no_dft":
        fit = jnp.sum(audio[:].astype(jnp.float32), axis=0)[None, :] * 1e-30
    else:
        spec = jax.lax.dot_general(
            dft_ref[:], audio[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        re, im = spec[:K], spec[K:]
        mag = jnp.sqrt(re * re + im * im)
        dlt = mag - tgt_ref[:, 0:1]
        fit = jnp.sum(dlt * dlt, axis=0)[None, :]
    fit_ref[pl.ds(i, 1), :] = fit


def build(variant):
    full = lambda *_: (0, 0)  # noqa: E731
    tri = jnp.asarray(_tri_strict(C))

    @jax.jit
    def run(params, tgt):
        return pl.pallas_call(
            functools.partial(_kernel, variant=variant),
            out_shape=jax.ShapeDtypeStruct((POP // PB, PB), jnp.float32),
            grid=(POP // PB,),
            in_specs=[
                pl.BlockSpec((6, PB), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * K, N), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((K, 1), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((C + 8, C), full, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((POP // PB, PB), full, memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((N, PB), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(params, DFT_UNFOLDED, tgt, tri)

    return run


key = jax.random.PRNGKey(0)
params = (jax.random.uniform(key, (6, POP)) *
          jnp.asarray([3520, 8, 3520, 8, 3520, 8], jnp.float32)[:, None])
tgt = jnp.ones((K, 1), jnp.float32)

for variant in ("full", "no_dft", "no_synth", "no_osc", "no_prefix"):
    run = build(variant)
    out = run(params, tgt)
    float(np.asarray(out)[0, 0])  # true sync
    t0 = time.time()
    for _ in range(ITERS):
        out = run(params, tgt)
    float(np.asarray(out)[0, 0])
    dt = (time.time() - t0) / ITERS * 1e3
    print(f"{variant:10s} {dt:7.3f} ms", flush=True)
