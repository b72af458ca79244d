"""Hardware validation of the fused-generation kernel's PRNG distributions
(the Pallas interpreter draws zero bits, so this must run on a real chip).
Also times the fully-fused generation."""
import sys, time
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import numpy as np
import jax, jax.numpy as jnp
from pmfm_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
from pmfm_tpu.es import ESConfig, init_state, make_spectrum_ops
from pmfm_tpu.es.pipeline import generation_step
from pmfm_tpu.kernels.generation import fused_generation

assert jax.default_backend() != "cpu", "needs real TPU"

CFG = ESConfig(num_parents=256, num_offspring=(1 << 15) - 256, num_dimensions=6,
               topology="fm3_series", audio_length_log2=10,
               synthesis_engine="scanless", dft_dtype="bfloat16",
               fused_generation=True, pop_block=512)
so = make_spectrum_ops(CFG)
tgt = jnp.ones((so.num_bins,), jnp.float32)

def call(cfg, pv, ps, seed):
    return fused_generation(
        jnp.asarray(seed, jnp.int32), pv, ps, so.dft_cos, so.dft_sin, tgt,
        pop=cfg.population_size, param_mins=cfg.param_mins,
        param_maxs=cfg.param_maxs, topology=cfg.topology, n=cfg.n_samples,
        pop_block=cfg.pop_block, alpha=cfg.alpha, beta=cfg.beta,
        beta_scale=cfg.beta_scale, root_two_over_pi=cfg.root_two_over_pi,
        clamp_values=cfg.clamp_values)

# 1. distribution moments
mu = 4
cfg = CFG.replace(num_parents=mu, num_offspring=4096 - mu)
pv = jnp.full((mu, 6), 0.5); step = 1e-3; ps = jnp.full((mu, 6), step)
_, values, steps = call(cfg, pv, ps, 7)
moves = (np.asarray(values, np.float64) - 0.5) / step
expect = (cfg.alpha**2 + cfg.alpha**-2) / 2 * (1 / 36)
got = float(np.mean(moves**2))
print("E[(move/s)^2] = %.5f (expect %.5f, ratio %.3f)" % (got, expect, got / expect), flush=True)
lr = np.log(np.asarray(steps, np.float64) / step)
elr = (1 / 6) * (np.sqrt(2 / np.pi) / 6 - np.sqrt(2 / np.pi))
print("E[ln s'/s]    = %.5f (expect %.5f)" % (lr.mean(), elr), flush=True)

# 2. seed sensitivity + parent-index uniformity
pv2 = jnp.asarray(np.linspace(0.1, 0.9, mu * 6, dtype=np.float32).reshape(mu, 6))
_, v1, _ = call(cfg, pv2, jnp.zeros((mu, 6)), 1)
_, v2, _ = call(cfg, pv2, jnp.zeros((mu, 6)), 2)
print("seeds differ:", not np.allclose(np.asarray(v1), np.asarray(v2)), flush=True)
vn = np.asarray(v1); pvn = np.asarray(pv2)
counts = [np.mean(vn[:, 0] == pvn[m, 0]) for m in range(mu)]
print("parent-0..3 pick rates (expect ~0.25):", np.round(counts, 3), flush=True)

# 3. timing: fully fused generation vs fused-evaluate path
for name, c in (("fused_generation", CFG),
                ("fused_kernel", CFG.replace(fused_generation=False, fused_kernel=True))):
    state = init_state(jax.random.PRNGKey(0), c)
    @jax.jit
    def gens(s, c=c):
        def body(s, _):
            return generation_step(s, tgt, so, c), None
        s, _ = jax.lax.scan(body, s, None, length=50)
        return s.best_fitness
    jax.block_until_ready(gens(state))
    t0 = time.time(); out = jax.block_until_ready(gens(state))
    print("%s: %.3f ms/gen  best=%.4e" % (name, (time.time() - t0) / 50 * 1e3, float(out)), flush=True)
