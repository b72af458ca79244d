"""Diagnose the fm3_parallel attractor: what do converged solutions and
stage-0 single-pair fits actually recover vs the true pairs?"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_platforms", "cpu")

from functools import partial

import jax.numpy as jnp
import numpy as np

from pmfm_tpu.es import ESConfig, init_state, make_spectrum_ops
from pmfm_tpu.es.pipeline import evaluate, evolve
from pmfm_tpu.es.strategy import ESState, mutate, recombine, select
from pmfm_tpu.ops import synthesize_single
from pmfm_tpu.ops.spectral import magnitude_spectrum, target_spectrum
from pmfm_tpu.ops.synthesis import scale_params, synthesize

TRUE = np.array([0.874, 0.25, 0.857, 0.9,
                 0.55, 0.30, 0.62, 0.8,
                 0.71, 0.20, 0.45, 0.7], np.float32)
K = 3
POP = 4096
MU = 128

base = ESConfig(
    num_parents=MU, num_offspring=POP - MU, num_dimensions=12,
    topology="fm3_parallel",
    param_mins=(0.0,) * 12, param_maxs=(3520.0, 8.0, 3520.0, 1.0) * 3,
    audio_length_log2=10, synthesis_engine="scanless",
    spectrum_method="dft", dft_dtype="float32", pop_block=1024,
    mutation_noise="clt12_neutral", min_step=1e-4, restart_patience=100,
)
mins = jnp.zeros(12)
maxs = jnp.asarray(base.param_maxs)
mins4, maxs4 = mins[:4], maxs[:4]
truth_scaled = np.asarray(scale_params(jnp.asarray(TRUE)[None], mins, maxs)[0])
audio = synthesize_single(jnp.asarray(truth_scaled), base.n_samples, base.topology)
so = make_spectrum_ops(base)
tspec = target_spectrum(audio, so)
T = np.asarray(tspec)
tgt_energy = float(np.sum(T.astype(np.float64) ** 2))


def show_pairs(tag, genes):
    g = np.asarray(genes).reshape(K, 4)
    s = g * np.array([3520.0, 8.0, 3520.0, 1.0])
    for j in range(K):
        print(f"    {tag} pair{j}: fm={s[j,0]:7.1f} I={s[j,1]:5.2f} "
              f"fc={s[j,2]:7.1f} A={s[j,3]:5.2f}")


print("TRUE pairs:")
show_pairs("true", TRUE)
print(f"target energy {tgt_energy:.6g}")

# --- 1) what does the direct 12-dim ES converge to? -------------------------
for seed in (0, 1):
    st = init_state(jax.random.PRNGKey(seed), base)
    fin, _ = evolve(st, tspec, 500, so, base)
    bf = float(evaluate(fin.best_values[None], tspec, so, base)[0])
    print(f"direct seed {seed}: fitness {bf:.4g} (rel {np.sqrt(bf/tgt_energy):.3f})")
    show_pairs("got", fin.best_values)

# --- 2) stage-0 single-pair fits (asym loss, various W_OVER) ----------------


@partial(jax.jit, static_argnums=(1, 2))
def stage0_fit(key, w_over, gens):
    def eval_fn(values):
        scaled = scale_params(values, mins4, maxs4)
        a = synthesize(scaled, base.n_samples, "fm2", engine="scanless")
        spec = magnitude_spectrum(a / K, so)
        d = spec - tspec[None]
        return jnp.sum(jnp.where(d > 0, w_over * d * d, d * d), axis=-1)

    pair_cfg = base.replace(
        num_dimensions=4, topology="fm2",
        param_mins=(0.0,) * 4, param_maxs=(3520.0, 8.0, 3520.0, 1.0),
        restart_patience=0,
    )
    st = init_state(key, pair_cfg)

    def body(s, _):
        key, k_rec, k_mut = jax.random.split(s.key, 3)
        v, stp = recombine(k_rec, s.parent_values, s.parent_steps, pair_cfg)
        v, stp = mutate(k_mut, v, stp, pair_cfg)
        fit = eval_fn(v)
        pv, ps, pf = select(v, stp, fit, MU)
        improved = pf[0] < s.best_fitness
        return ESState(
            parent_values=pv, parent_steps=ps, parent_fitness=pf,
            best_values=jnp.where(improved, pv[0], s.best_values),
            best_fitness=jnp.where(improved, pf[0], s.best_fitness),
            key=key, generation=s.generation + 1, stall=s.stall,
        ), None

    fin, _ = jax.lax.scan(body, st, None, length=gens)
    return fin.best_values, fin.best_fitness


# reference stage losses AT the true pairs (amp/K as the fm2 candidate)
for w in (1.0, 8.0, 64.0):
    losses = []
    for j in range(K):
        tp = TRUE[j * 4: j * 4 + 4].copy()
        scaled = scale_params(jnp.asarray(tp)[None], mins4, maxs4)
        a = synthesize(scaled, base.n_samples, "fm2", engine="scanless")
        spec = np.asarray(magnitude_spectrum(a / K, so))[0]
        d = spec - T
        losses.append(float(np.sum(np.where(d > 0, w * d * d, d * d))))
    print(f"W={w:4g}: stage-0 loss at TRUE pairs: "
          + " ".join(f"{x:.4g}" for x in losses))

for w in (1.0, 8.0, 64.0):
    for seed in range(4):
        bv, bf = stage0_fit(jax.random.PRNGKey(10 + seed), w, 300)
        bvn = np.asarray(bv)
        print(f"W={w:4g} seed {seed}: loss {float(bf):.4g}")
        show_pairs("fit", np.concatenate([bvn, np.zeros(8, np.float32)]))
