"""Fused kernel per-generation timing on the real chip (PB x C sweep)."""
import sys, time
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import jax, jax.numpy as jnp
from pmfm_tpu.es import ESConfig, init_state, make_spectrum_ops
from pmfm_tpu.es.pipeline import generation_step
from pmfm_tpu.kernels.synth_fitness import fused_synth_fitness

P, N, MU = 1 << 15, 1024, 256
key = jax.random.PRNGKey(0)

def timed_loop(stage_fn, x, iters=30):
    @jax.jit
    def run(x0):
        def body(i, carry):
            xp, acc = carry
            out = stage_fn(xp + acc * 1e-30)
            return xp, acc + jnp.sum(out).astype(jnp.float32) * 1e-30
        _, acc = jax.lax.fori_loop(0, iters, body, (x0, jnp.float32(0.0)))
        return acc
    jax.block_until_ready(run(x))
    t0 = time.time(); jax.block_until_ready(run(x))
    return (time.time() - t0) / iters * 1e3

cfg = ESConfig(num_parents=MU, num_offspring=P - MU, num_dimensions=6,
               topology="fm3_series", audio_length_log2=10,
               synthesis_engine="scanless", dft_dtype="bfloat16",
               fused_kernel=True, pop_block=512)
so = make_spectrum_ops(cfg)
tspec = jnp.ones((so.num_bins,), jnp.float32)
scaled = jax.random.uniform(key, (P, 6)) * 3000.0

for pb in (256, 512, 1024):
    for tb in (64, 128, 256):
        try:
            ms = timed_loop(lambda v: fused_synth_fitness(
                v, so.dft_cos, so.dft_sin, tspec, topology="fm3_series", n=N,
                pop_block=pb, time_block=tb), scaled)
            print("PB=%4d C=%3d  %7.3f ms" % (pb, tb, ms), flush=True)
        except Exception as e:
            print("PB=%4d C=%3d  FAILED %s" % (pb, tb, str(e)[:120]), flush=True)

state = init_state(key, cfg)
@jax.jit
def gens(s):
    def body(s, _):
        return generation_step(s, tspec, so, cfg), None
    s, _ = jax.lax.scan(body, s, None, length=30)
    return s.best_fitness
jax.block_until_ready(gens(state))
t0 = time.time(); out = jax.block_until_ready(gens(state))
print("full gen (PB=512,C=128) %7.3f ms  best=%.3e" % ((time.time() - t0) / 30 * 1e3, float(out)), flush=True)
