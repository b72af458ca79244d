"""Decompose the selection cost (XLA top_k + survivor gathers) on hardware.

Round-1 finding (VERDICT weak #2): mu=pop/128 scaling drops pop 2^17 from
57.8M to 37.2M evals/s — ~1.26 ms/gen of "gather+merge" at mu=1024. This
probe attributes that to top_k vs gather and measures candidate fixes:

  full       — select() as shipped: top_k(pop->mu) + values[idx] + steps[idx]
  topk       — top_k only (consume fitness + indices, no gathers)
  gather     — two (mu, D) row gathers from (pop, D) with computed indices
  two_stage  — reshape (R, C); per-row top_k(mu); flatten; top_k(R*mu -> mu);
               single final gather from the original arrays (EXACT: any row
               holds at most mu global winners, and we keep mu per row)
  neg_only   — top_k(-f) without the index consumption (lower bound)

Each variant runs inside one lax.scan of ITERS bodies with a data dependency
through the carry (no hoisting); timing is min-of-repeats with a true
np.asarray sync (axon block_until_ready returns early on scalars).
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

D = 6
ITERS = 100
REPEATS = 3


def build(pop, mu, variant):
    @jax.jit
    def run(values, steps, fitness):
        def body(carry, _):
            v, s, f = carry
            if variant == "full":
                nf, idx = jax.lax.top_k(-f, mu)
                pv, ps, pf = v[idx], s[idx], -nf
                dep = pf[0] + pv[0, 0] + ps[0, 0]
            elif variant == "topk":
                nf, idx = jax.lax.top_k(-f, mu)
                dep = -nf[0] + idx[0].astype(jnp.float32) * 1e-20
            elif variant == "neg_only":
                nf, _ = jax.lax.top_k(-f, mu)
                dep = -nf[0]
            elif variant == "gather":
                base = (f[0] * 0.0).astype(jnp.int32)  # data-dep, always 0
                idx = (jnp.arange(mu, dtype=jnp.int32) * 97 + base) % pop
                pv, ps = v[idx], s[idx]
                dep = pv[0, 0] + ps[0, 0]
            elif variant == "two_stage":
                c = 4096 if pop > 4096 else pop
                r = pop // c
                f2 = f.reshape(r, c)
                nf1, i1 = jax.lax.top_k(-f2, min(mu, c))  # (r, mu)
                gidx = (i1 + (jnp.arange(r, dtype=jnp.int32) * c)[:, None]).reshape(-1)
                nf2, i2 = jax.lax.top_k(nf1.reshape(-1), mu)
                idx = gidx[i2]
                pv, ps, pf = v[idx], s[idx], -nf2
                dep = pf[0] + pv[0, 0] + ps[0, 0]
            else:
                raise ValueError(variant)
            f = f * jnp.float32(1.0000001) + dep * jnp.float32(1e-30)
            return (v, s, f), None

        (v, s, f), _ = jax.lax.scan(body, (values, steps, fitness), None, length=ITERS)
        return f[0]

    return run


key = jax.random.PRNGKey(0)
print(f"backend={jax.default_backend()}", flush=True)
POPS = (1 << 17, 1 << 15)
MUS = (1024, 256)
VARIANTS = ("full", "topk", "neg_only", "gather", "two_stage")
# optional overrides: tpu_select_probe.py [pops=18,17] [mus=2048,256]
# [variants=full,two_stage] or two ints to slice the case list
argv = sys.argv[1:]
slice_args = [a for a in argv if a.isdigit()]
for a in argv:
    if a.startswith("pops="):
        POPS = tuple(1 << int(x) for x in a[5:].split(","))
    elif a.startswith("mus="):
        MUS = tuple(int(x) for x in a[4:].split(","))
    elif a.startswith("variants="):
        VARIANTS = tuple(a[9:].split(","))
cases = [(p, m, v) for p in POPS for m in MUS for v in VARIANTS]
if slice_args:  # optional slice for incremental runs
    cases = cases[int(slice_args[0]):int(slice_args[1])]
data = {}
for pop, mu, variant in cases:
    if pop not in data:
        kv, ks, kf = jax.random.split(jax.random.fold_in(key, pop), 3)
        data[pop] = (
            jax.random.uniform(kv, (pop, D), jnp.float32),
            jax.random.uniform(ks, (pop, D), jnp.float32),
            jax.random.uniform(kf, (pop,), jnp.float32) * 1e6,
        )
    values, steps, fitness = data[pop]
    run = build(pop, mu, variant)
    print(f"compiling pop=2^{pop.bit_length()-1} mu={mu} {variant} ...", flush=True)
    float(np.asarray(run(values, steps, fitness)))  # compile+sync
    best = 1e9
    for _ in range(REPEATS):
        t0 = time.time()
        float(np.asarray(run(values, steps, fitness)))
        best = min(best, (time.time() - t0) / ITERS * 1e3)
    print(f"pop=2^{pop.bit_length()-1} mu={mu:5d} {variant:10s} {best:7.4f} ms/iter", flush=True)
