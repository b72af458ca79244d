"""What bounds the fused kernel? Vary K (MXU rows), pop_block, topology (VPU).

If halving K halves the time, the kernel is MXU/DFT-bound and a DFT
factorisation pays; if topology (chain count) dominates, it is VPU-bound.
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from pmfm_tpu.ops.spectral import make_spectrum_ops
from pmfm_tpu.kernels.synth_fitness import fused_synth_fitness

POP, N, D = 1 << 15, 1024, 6
ITERS = 50
key = jax.random.PRNGKey(0)
params = jax.random.uniform(key, (POP, D)) * jnp.asarray(
    [3520.0, 8.0, 3520.0, 8.0, 3520.0, 1.0])


def timed(fn):
    @jax.jit
    def run(p0):
        def body(i, carry):
            p, acc = carry
            out = fn(p + acc * 1e-30)
            return p, acc + jnp.sum(out) * 1e-30
        _, acc = jax.lax.fori_loop(0, ITERS, body, (p0, jnp.float32(0.0)))
        return acc

    jax.block_until_ready(run(params))
    t0 = time.time()
    jax.block_until_ready(run(params))
    return (time.time() - t0) / ITERS * 1e3


def report(label, fn):
    try:
        print(f"{label:42s} {timed(fn):7.3f} ms", flush=True)
    except Exception as e:
        print(f"{label:42s} FAILED {type(e).__name__}", flush=True)


for k in (512, 256, 128):
    so = make_spectrum_ops(N, num_bins=k, method="dft", dft_dtype=jnp.bfloat16)
    tgt = jnp.ones((k,), jnp.float32)
    report(f"eval-only K={k} topo=fm3_series pb=1024",
           lambda p, so=so, tgt=tgt: fused_synth_fitness(
               p, so.dft_cos, so.dft_sin, tgt, topology="fm3_series", n=N,
               pop_block=1024))

so = make_spectrum_ops(N, num_bins=512, method="dft", dft_dtype=jnp.bfloat16)
tgt = jnp.ones((512,), jnp.float32)
report("eval-only K=512 topo=fm3_series pb=512",
       lambda p: fused_synth_fitness(
           p, so.dft_cos, so.dft_sin, tgt, topology="fm3_series", n=N,
           pop_block=512))
report("eval-only K=512 topo=fm2 pb=1024",
       lambda p: fused_synth_fitness(
           p[:, :4], so.dft_cos, so.dft_sin, tgt, topology="fm2", n=N,
           pop_block=1024))
report("eval-only K=512 topo=fm3_parallel pb=1024",
       lambda p: fused_synth_fitness(
           jnp.tile(p, (1, 2)), so.dft_cos, so.dft_sin, tgt,
           topology="fm3_parallel", n=N, pop_block=1024))
