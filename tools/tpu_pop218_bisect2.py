"""Bisect INSIDE generation_step for the 2^18 slowdown (round 4, stage 2).

tpu_pop218_bisect: evolve/generation_step 13.31 ms/gen vs minimal
kernel+select_t scan 4.84 ms/gen (pop 2^18, mu 2048) — the gap is in
generation_step's residue. Legs re-add its pieces one at a time to the
minimal loop:

  step      — scan over the real generation_step (expect ~13.3)
  state     — minimal loop but carrying a full ESState incl. key/generation
              seeding and pf in the carry
  track     — state + best/stall tracking (the jnp.where residue)

    python tools/tpu_pop218_bisect2.py [pop_log2] [mu] [gens]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from pmfm_tpu.es import ESConfig, init_state, make_spectrum_ops
from pmfm_tpu.es.pipeline import (
    fused_generation_kwargs,
    generation_step,
    kernel_seed,
)
from pmfm_tpu.es.strategy import ESState, select_t
from pmfm_tpu.kernels.generation import fused_generation
from pmfm_tpu.utils import device_sync

POP_LOG2 = int(sys.argv[1]) if len(sys.argv) > 1 else 18
MU = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
GENS = int(sys.argv[3]) if len(sys.argv) > 3 else 200
D = 6
pop = 1 << POP_LOG2

cfg = ESConfig(
    num_parents=MU, num_offspring=pop - MU, num_dimensions=D,
    topology="fm3_series", audio_length_log2=10,
    synthesis_engine="scanless", spectrum_method="dft", dft_dtype="int8",
    fused_kernel=True, fused_generation=True, sine_order=7, pop_block=1024,
)
so = make_spectrum_ops(cfg)
tspec = jnp.ones((so.num_bins,), jnp.float32)
kw = fused_generation_kwargs(cfg, so)
print(f"backend={jax.default_backend()} pop=2^{POP_LOG2} mu={MU} gens={GENS}",
      flush=True)


def timeit(name, fn, *args):
    print(f"compiling {name} ...", flush=True)
    device_sync(fn(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        device_sync(fn(*args))
        best = min(best, (time.time() - t0) / GENS * 1e3)
    print(f"{name:8s} {best:8.4f} ms/gen", flush=True)


@jax.jit
def run_step(key):
    state = init_state(key, cfg)

    def body(s, _):
        return generation_step(s, tspec, so, cfg), None

    s, _ = jax.lax.scan(body, state, None, length=GENS)
    return s.best_fitness


def make(track):
    @jax.jit
    def run(key):
        state = init_state(key, cfg)

        def body(s, _):
            seed = kernel_seed(s.key, s.generation)
            fit, vt, st = fused_generation(
                seed, s.parent_values, s.parent_steps,
                so.dft_cos, so.dft_sin, tspec, **kw
            )
            pv, ps, pf = select_t(vt, st, fit, MU, D)
            if track:
                improved = pf[0] < s.best_fitness
                stall = jnp.where(improved, 0, s.stall + 1).astype(jnp.int32)
                bv = jnp.where(improved, pv[0], s.best_values)
                bf = jnp.where(improved, pf[0], s.best_fitness)
            else:
                stall, bv, bf = s.stall, s.best_values, s.best_fitness
            return ESState(
                parent_values=pv, parent_steps=ps, parent_fitness=pf,
                best_values=bv, best_fitness=bf, key=s.key,
                generation=s.generation + 1, stall=stall,
            ), None

        s, _ = jax.lax.scan(body, state, None, length=GENS)
        return s.best_fitness if track else s.parent_fitness[0]

    return run


timeit("step", run_step, jax.random.PRNGKey(0))
timeit("state", make(False), jax.random.PRNGKey(0))
timeit("track", make(True), jax.random.PRNGKey(0))
