"""Probe: alias-jump refinement. Folded-comb aliases (carrier reflected
through 0/Nyquist by multiples of the mod freq) are the deep local optima
that trap the joint search (tools/pursuit_stage2_probe.py: pair1 recovered
at fc=250 ~= |fc_true - fm_true| with compensating I). Jump proposals
fc' in {fc+fm, |fc-fm|, fc+2fm, |fc-2fm|} per pair + short local polish
should hop between alias basins and find the global one."""
import sys, time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from pmfm_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from pmfm_tpu.es import ESConfig, make_spectrum_ops
from pmfm_tpu.es.pipeline import evolve
from pmfm_tpu.es.strategy import ESState, evaluate
from pmfm_tpu.ops import synthesize_single
from pmfm_tpu.ops.spectral import target_spectrum
from pmfm_tpu.ops.synthesis import scale_params

TRUE = np.array([0.874, 0.25, 0.857, 0.9,
                 0.55, 0.30, 0.62, 0.8,
                 0.71, 0.20, 0.45, 0.7], np.float32)
POP, MU = 8192, 128
K = 3
FREQ_MAX = 3520.0

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
tgt_energy = float(np.sum(np.asarray(tspec, np.float64) ** 2))


def rescore(g):
    return float(evaluate(jnp.asarray(g, jnp.float32)[None], tspec, so, cfg)[0])


from functools import partial


@partial(jax.jit, static_argnums=(2,))
def polish(key, est, gens):
    key, k_noise, k_run = jax.random.split(key, 3)
    pv = jnp.clip(est[None] + 0.01 * jax.random.normal(k_noise, (MU, 12)),
                  0.0, 1.0).astype(jnp.float32)
    pv = pv.at[0].set(est)
    st = ESState(
        parent_values=pv, parent_steps=jnp.full((MU, 12), 0.005, jnp.float32),
        parent_fitness=jnp.full((MU,), jnp.inf, jnp.float32),
        best_values=est, best_fitness=evaluate(est[None], tspec, so, cfg)[0],
        key=k_run, generation=jnp.asarray(0, jnp.int32),
        stall=jnp.asarray(0, jnp.int32),
    )
    fin, _ = evolve(st, tspec, gens, so, cfg)
    return fin.best_values, fin.best_fitness


def alias_variants(est):
    """All single-pair carrier reflections (gene space)."""
    out = []
    for j in range(K):
        fm = est[4 * j] * FREQ_MAX
        fc = est[4 * j + 2] * FREQ_MAX
        for fc2 in (fc + fm, abs(fc - fm), fc + 2 * fm, abs(fc - 2 * fm),
                    2 * fm - fc):
            if fc2 < 0 or fc2 > FREQ_MAX or abs(fc2 - fc) < 1.0:
                continue
            v = est.copy()
            v[4 * j + 2] = fc2 / FREQ_MAX
            out.append(v)
    return out


# start from the stage-2 probe's alias attractor (pair0 true, pair2 true,
# pair1 aliased at fc~250)
start = np.concatenate([
    TRUE[:4],
    np.array([1943.5 / 3520, 0.94 / 8, 250.0 / 3520, 0.50], np.float32),
    np.array([2499.6 / 3520, 1.55 / 8, 1584.7 / 3520, 0.60], np.float32),
])

for seed in range(3):
    key = jax.random.PRNGKey(seed)
    est = start.copy()
    cur = rescore(est)
    t0 = time.time()
    for rnd in range(4):
        cands = alias_variants(est)
        best_v, best_f = est, cur
        for v in cands:
            key, sub = jax.random.split(key)
            bv, bf = polish(sub, jnp.asarray(v), 150)
            if float(bf) < best_f:
                best_v, best_f = np.asarray(bv), float(bf)
        if best_f >= cur - 1e-12:
            print(f"  seed {seed} round {rnd}: no alias improves ({cur:.4g})")
            break
        est, cur = best_v, best_f
        print(f"  seed {seed} round {rnd}: {cur:.4g} "
              f"(rel {np.sqrt(cur/tgt_energy):.4f})")
    key, sub = jax.random.split(key)
    bv, bf = polish(sub, jnp.asarray(est), 500)
    rel = np.sqrt(float(bf) / tgt_energy)
    print(f"seed {seed}: final {float(bf):.4g} rel {rel:.4f} "
          f"{'PASS' if rel <= 0.03 else 'no'} ({time.time()-t0:.0f}s)")
