"""Probe: after peeling true pair0, does a JOINT 8-gene ES (pairs 1+2,
pair0 frozen) recover the remaining two pairs? (The 1-pair-at-a-time greedy
stage provably hits a compromise at the 1-vs-2 stage: 0.0156 < the
pairs{0,1}-true waypoint.)"""
import sys, time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from pmfm_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from pmfm_tpu.es import ESConfig, make_spectrum_ops
from pmfm_tpu.es.strategy import ESState, evaluate, mutate, recombine, select
from pmfm_tpu.ops import synthesize_single
from pmfm_tpu.ops.spectral import target_spectrum
from pmfm_tpu.ops.synthesis import scale_params

TRUE = np.array([0.874, 0.25, 0.857, 0.9,
                 0.55, 0.30, 0.62, 0.8,
                 0.71, 0.20, 0.45, 0.7], np.float32)
POP, MU, GENS = 8192, 128, 600

cfg = ESConfig(
    num_parents=MU, num_offspring=POP - MU, num_dimensions=12,
    topology="fm3_parallel",
    param_mins=(0.0,) * 12, param_maxs=(3520.0, 8.0, 3520.0, 1.0) * 3,
    audio_length_log2=10, synthesis_engine="scanless",
    spectrum_method="dft", dft_dtype="float32", pop_block=1024,
    mutation_noise="clt12_neutral", min_step=1e-4,
)
mins = jnp.zeros(12)
maxs = jnp.asarray(cfg.param_maxs)
audio = synthesize_single(
    scale_params(jnp.asarray(TRUE)[None], mins, maxs)[0], cfg.n_samples,
    cfg.topology)
so = make_spectrum_ops(cfg)
tspec = target_spectrum(audio, so)

# waypoints
def fit_at(g):
    return float(evaluate(jnp.asarray(g, jnp.float32)[None], tspec, so, cfg)[0])

w0 = TRUE.copy(); w0[7] = 0; w0[11] = 0
w01 = TRUE.copy(); w01[11] = 0
print(f"waypoints: pair0-only {fit_at(w0):.4g}  pairs01 {fit_at(w01):.4g}  "
      f"true {fit_at(TRUE):.3g}")

PAIR0 = jnp.asarray(TRUE[:4])  # assume stage-0 peel succeeded (measured)


@jax.jit
def joint8(key):
    def eval_fn(v8):
        full = jnp.concatenate(
            [jnp.broadcast_to(PAIR0, (v8.shape[0], 4)), v8], axis=1)
        return evaluate(full, tspec, so, cfg)

    key, k0 = jax.random.split(key)
    pv = jax.random.uniform(k0, (MU, 8), jnp.float32)
    st = ESState(
        parent_values=pv, parent_steps=jnp.full((MU, 8), 0.1, jnp.float32),
        parent_fitness=jnp.full((MU,), jnp.inf, jnp.float32),
        best_values=pv[0], best_fitness=jnp.asarray(jnp.inf, jnp.float32),
        key=key, generation=jnp.asarray(0, jnp.int32),
        stall=jnp.asarray(0, jnp.int32),
    )
    cfg8 = cfg.replace(num_dimensions=8, topology="fm2_parallel",
                       param_mins=(0.0,) * 8,
                       param_maxs=(3520.0, 8.0, 3520.0, 1.0) * 2)

    def body(s, _):
        key, k_rec, k_mut, k_restart = jax.random.split(s.key, 4)
        v, stp = recombine(k_rec, s.parent_values, s.parent_steps, cfg8)
        v, stp = mutate(k_mut, v, stp, cfg8)
        f = eval_fn(v)
        pv, ps, pf = select(v, stp, f, MU)
        improved = pf[0] < s.best_fitness
        stall = jnp.where(improved, 0, s.stall + 1)
        restart = stall >= 100
        fresh = jax.random.uniform(k_restart, pv.shape, jnp.float32)
        pv = jnp.where(restart, fresh, pv)
        ps = jnp.where(restart, jnp.full_like(ps, 0.1), ps)
        stall = jnp.where(restart, 0, stall)
        return ESState(
            parent_values=pv, parent_steps=ps, parent_fitness=pf,
            best_values=jnp.where(improved, pv[0], s.best_values),
            best_fitness=jnp.where(improved, pf[0], s.best_fitness),
            key=key, generation=s.generation + 1,
            stall=stall.astype(jnp.int32),
        ), None

    fin, _ = jax.lax.scan(body, st, None, length=GENS)
    return fin.best_values, fin.best_fitness


for seed in range(6):
    t0 = time.time()
    bv, bf = joint8(jax.random.PRNGKey(seed))
    bv = np.asarray(bv)
    full = np.concatenate([TRUE[:4], bv])
    s = bv.reshape(2, 4) * np.array([3520.0, 8.0, 3520.0, 1.0])
    print(f"seed {seed}: fit {float(bf):.4g} rescore {fit_at(full):.4g} "
          f"({time.time()-t0:.0f}s)")
    for j in range(2):
        print(f"    pair{j+1}: fm={s[j,0]:7.1f} I={s[j,1]:5.2f} "
              f"fc={s[j,2]:7.1f} A={s[j,3]:5.2f}")
print("true pair1: fm=1936.0 I=2.40 fc=2182.4 A=0.80 | "
      "true pair2: fm=2499.2 I=1.60 fc=1584.0 A=0.70")
