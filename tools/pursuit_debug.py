"""Debug the pursuit prototype: idealized single-pair fits."""
import sys, time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from pmfm_tpu.es import ESConfig, init_state, make_spectrum_ops
from pmfm_tpu.es.pipeline import evaluate, evolve
from pmfm_tpu.ops import synthesize_single
from pmfm_tpu.ops.spectral import target_spectrum
from pmfm_tpu.ops.synthesis import scale_params, synthesize

TRUE = np.array([0.874, 0.25, 0.857, 0.9,
                 0.55, 0.30, 0.62, 0.8,
                 0.71, 0.20, 0.45, 0.7], np.float32)
K = 3
POP = 2048
MU = 64

base = ESConfig(
    num_parents=MU, num_offspring=POP - MU, num_dimensions=12,
    topology="fm3_parallel",
    param_mins=(0.0,) * 12, param_maxs=(3520.0, 8.0, 3520.0, 1.0) * 3,
    audio_length_log2=10, synthesis_engine="scanless",
    spectrum_method="dft", dft_dtype="float32", pop_block=1024,
)
pair_cfg = base.replace(
    num_dimensions=4, topology="fm2",
    param_mins=(0.0,) * 4, param_maxs=(3520.0, 8.0, 3520.0, 1.0),
)
pair_cfg_q = pair_cfg.replace(  # quality knobs (shipped-config style)
    mutation_noise="clt12_neutral", min_step=1e-4, restart_patience=100,
)

mins = jnp.zeros(12)
maxs = jnp.asarray(base.param_maxs)
truth_scaled = scale_params(jnp.asarray(TRUE)[None], mins, maxs)[0]
audio = synthesize_single(truth_scaled, base.n_samples, base.topology)
so = make_spectrum_ops(base)
so_pair = make_spectrum_ops(pair_cfg)
tspec = target_spectrum(audio, so)
tgt_energy = float(np.sum(np.asarray(tspec, np.float64) ** 2))
print(f"target energy {tgt_energy:.6g}")
print(f"TRUE fitness: {float(evaluate(jnp.asarray(TRUE)[None], tspec, so, base)[0]):.4g}")


def model_minus_pair(est, skip_j):
    genes = est.copy()
    genes[skip_j * 4 + 3] = 0.0
    scaled = scale_params(jnp.asarray(genes)[None], mins, maxs)
    return synthesize(scaled, base.n_samples, base.topology, engine="scanless")[:, 0]


# --- sanity: does fm2(amp=a/K) == parallel pair alone? -----------------------
pair0 = TRUE[:4].copy()
fm2_genes = pair0.copy()
fm2_genes[3] = pair0[3] / K
s_fm2 = synthesize(scale_params(jnp.asarray(fm2_genes)[None], mins[:4], maxs[:4]),
                   base.n_samples, "fm2", engine="scanless")[:, 0]
resid0_ideal = np.asarray(audio) - np.asarray(model_minus_pair(TRUE, 0))
print("max |fm2(amp/K) - ideal resid pair0|:",
      float(np.max(np.abs(np.asarray(s_fm2) - resid0_ideal))))

# --- idealized pair fits ----------------------------------------------------
for cfg_name, pcfg in (("clt12", pair_cfg), ("quality", pair_cfg_q)):
    for j in range(K):
        resid = np.asarray(audio) - np.asarray(model_minus_pair(TRUE, j))
        t = target_spectrum(jnp.asarray(resid), so_pair)
        res_energy = float(np.sum(np.asarray(t, np.float64) ** 2))
        fits = []
        recs = []
        for seed in range(3):
            st = init_state(jax.random.PRNGKey(100 * j + seed), pcfg)
            fin, _ = evolve(st, t, 300, so_pair, pcfg)
            fits.append(float(fin.best_fitness))
            recs.append(np.asarray(fin.best_values))
        best = int(np.argmin(fits))
        want = TRUE[j * 4: j * 4 + 4].copy()
        want[3] /= K
        print(f"[{cfg_name}] pair {j}: res_energy {res_energy:.4g} "
              f"fits {['%.3g' % f for f in fits]} "
              f"rec {np.round(recs[best], 4)} want {np.round(want, 4)}")
