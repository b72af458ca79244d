"""Hardware validation of the fused-generation kernel's PRNG — captured as
``benchmarks/gen_check.json`` (VERDICT r1 weak #4: the check used to be a
hand-run script whose result lived in a CLAUDE.md sentence; a seeding
regression — the class of bug actually found in round-1 review, commit
ea801c8 — would not have been caught by CI).

The Pallas interpreter draws ZERO bits, so this must run on a real chip.
Checks:

1. mutation moments — E[(move/step)^2] and E[ln s'/s] vs the closed-form
   CLT-gaussian expectations (kernels/ocl_program.cl:21-31 semantics);
2. parent-pick uniformity — chi-square across parents, for BOTH recombine
   paths: flat one-hot (mu < 128) and hierarchical two-stage (mu >= 128);
3. seed sensitivity — different seeds give different offspring;
4. stream-collision census — offspring of G generations (seeded exactly as
   the production scan: pipeline.kernel_seed) are hashed per candidate;
   duplicate gene-rows within or across generations reveal replayed PRNG
   streams (the ea801c8 aliasing bug made ~94% of per-block streams
   replays; birthday-scale collisions are ~0 at this sample size).

The artifact embeds utils.provenance.seeding_fingerprint(); CI
(tests/test_misc.py) fails when any seeding-relevant source changes without
this being re-run on hardware.

    python tools/tpu_gen_check.py          # writes benchmarks/gen_check.json
"""
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import jax
import jax.numpy as jnp

from pmfm_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from pmfm_tpu.es import ESConfig, init_state, make_spectrum_ops  # noqa: E402
from pmfm_tpu.es.pipeline import generation_step, kernel_seed  # noqa: E402
from pmfm_tpu.kernels.generation import fused_generation  # noqa: E402
from pmfm_tpu.utils.provenance import (  # noqa: E402
    GEN_CHECK_ARTIFACT,
    seeding_fingerprint,
)

assert jax.default_backend() != "cpu", "needs real TPU"

CFG = ESConfig(num_parents=256, num_offspring=(1 << 15) - 256, num_dimensions=6,
               topology="fm3_series", audio_length_log2=10,
               synthesis_engine="scanless", dft_dtype="bfloat16",
               fused_generation=True, pop_block=512)
so = make_spectrum_ops(CFG)
tgt = jnp.ones((so.num_bins,), jnp.float32)
report = {"fingerprint": seeding_fingerprint(),
          "backend": jax.default_backend(),
          "date": time.strftime("%Y-%m-%d"),
          "checks": {}}


def call(cfg, pv, ps, seed):
    fit, vt, st = fused_generation(
        jnp.asarray(seed, jnp.int32), pv, ps, so.dft_cos, so.dft_sin, tgt,
        pop=cfg.population_size, param_mins=cfg.param_mins,
        param_maxs=cfg.param_maxs, topology=cfg.topology, n=cfg.n_samples,
        pop_block=cfg.pop_block, alpha=cfg.alpha, beta=cfg.beta,
        beta_scale=cfg.beta_scale, root_two_over_pi=cfg.root_two_over_pi,
        clamp_values=cfg.clamp_values)
    d = cfg.num_dimensions
    return fit, vt[:d].T, st[:d].T


# --- 1. mutation moments ----------------------------------------------------
mu = 4
cfg = CFG.replace(num_parents=mu, num_offspring=4096 - mu)
pv = jnp.full((mu, 6), 0.5)
step = 1e-3
ps = jnp.full((mu, 6), step)
_, values, steps = call(cfg, pv, ps, 7)
moves = (np.asarray(values, np.float64) - 0.5) / step
expect = (cfg.alpha**2 + cfg.alpha**-2) / 2 * (1 / 36)
got = float(np.mean(moves**2))
lr = np.log(np.asarray(steps, np.float64) / step)
elr = (1 / 6) * (np.sqrt(2 / np.pi) / 6 - np.sqrt(2 / np.pi))
report["checks"]["moments"] = {
    "move_sq_ratio": got / expect,
    "log_step_drift": float(lr.mean()),
    "log_step_drift_expect": float(elr),
    "ok": bool(abs(got / expect - 1) < 0.1 and abs(lr.mean() - elr) < 0.02),
}
print("E[(move/s)^2] ratio = %.4f; E[ln s'/s] = %.5f (expect %.5f)"
      % (got / expect, lr.mean(), elr), flush=True)

# --- 2. parent-pick uniformity (flat mu=4 AND hierarchical mu=128) ----------
for label, mu in (("flat", 4), ("hier", 128)):
    cfg = CFG.replace(num_parents=mu, num_offspring=8192 - mu)
    pv2 = jnp.asarray(
        np.linspace(0.05, 0.95, mu * 6, dtype=np.float32).reshape(mu, 6)
    )
    _, v1, _ = call(cfg, pv2, jnp.zeros((mu, 6)), 1)
    vn = np.asarray(v1)
    pvn = np.asarray(pv2)
    counts = np.array([np.sum(vn[:, 0] == pvn[m, 0]) for m in range(mu)])
    n = counts.sum()
    chi2 = float(np.sum((counts - n / mu) ** 2 / (n / mu)))
    # dof = mu-1; mean dof, sd sqrt(2*dof): flag beyond ~5 sigma
    ok = bool(
        n == vn.shape[0]  # every gene is an exact parent copy
        and abs(chi2 - (mu - 1)) < 5 * np.sqrt(2 * (mu - 1))
    )
    report["checks"][f"pick_uniformity_{label}"] = {
        "mu": mu, "chi2": chi2, "dof": mu - 1, "exact_copies": int(n),
        "of": int(vn.shape[0]), "ok": ok,
    }
    print(f"parent-pick {label} (mu={mu}): chi2={chi2:.1f} (dof {mu-1}), "
          f"exact copies {n}/{vn.shape[0]}", flush=True)

# --- 3. seed sensitivity -----------------------------------------------------
cfg = CFG.replace(num_parents=16, num_offspring=4096 - 16)
pv3 = jax.random.uniform(jax.random.PRNGKey(0), (16, 6))
ps3 = jnp.full((16, 6), 0.1)
_, s1, _ = call(cfg, pv3, ps3, 1)
_, s2, _ = call(cfg, pv3, ps3, 2)
differ = bool(not np.allclose(np.asarray(s1), np.asarray(s2)))
report["checks"]["seed_sensitivity"] = {"ok": differ}
print("seeds differ:", differ, flush=True)

# --- 4. stream-collision census (production seeding) ------------------------
# identical parents + tiny steps: each offspring's (D,) move vector is a
# fingerprint of its PRNG stream. Production seeds: kernel_seed(key, g).
GENS, POP = 32, 8192
cfg = CFG.replace(num_parents=4, num_offspring=POP - 4)
pvc = jnp.full((4, 6), 0.5)
psc = jnp.full((4, 6), 1e-3)
key = jax.random.PRNGKey(123)
rows = []
for g in range(GENS):
    seed = kernel_seed(key, jnp.asarray(g, jnp.int32))
    _, v, _ = call(cfg, pvc, psc, seed)
    rows.append(np.asarray(v, np.float32))
allv = np.ascontiguousarray(np.concatenate(rows))  # (GENS*POP, 6)
uniq = len(np.unique(allv.view([("", allv.dtype)] * allv.shape[1])))
dups = allv.shape[0] - uniq
# zero-step draws could collide only if two streams emit identical 6-dim
# (parent-pick, 12xCLT, coin, retry) sequences — birthday bound ~1e-8 here
report["checks"]["stream_collisions"] = {
    "generations": GENS, "pop": POP, "rows": int(allv.shape[0]),
    "duplicate_rows": int(dups), "ok": bool(dups == 0),
}
print(f"stream census: {allv.shape[0]} offspring rows, {dups} duplicates",
      flush=True)

# --- 5. per-generation timing (context, not a gate) --------------------------
state = init_state(jax.random.PRNGKey(0), CFG)


@jax.jit
def gens(s):
    def body(s, _):
        return generation_step(s, tgt, so, CFG), None

    s, _ = jax.lax.scan(body, s, None, length=50)
    return s.best_fitness


float(np.asarray(gens(state)))
t0 = time.time()
out = gens(state)
float(np.asarray(out))
report["ms_per_gen_bf16_pop2^15"] = round((time.time() - t0) / 50 * 1e3, 4)
print("timing: %.3f ms/gen (bf16, pop 2^15)" % report["ms_per_gen_bf16_pop2^15"],
      flush=True)

report["ok"] = all(c["ok"] for c in report["checks"].values())
GEN_CHECK_ARTIFACT.parent.mkdir(exist_ok=True)
GEN_CHECK_ARTIFACT.write_text(json.dumps(report, indent=1))
print(f"{'PASS' if report['ok'] else 'FAIL'} -> {GEN_CHECK_ARTIFACT}")
sys.exit(0 if report["ok"] else 1)
