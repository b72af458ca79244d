"""Attribute the in-kernel offspring prologue (recombine one-hot gather +
CLT mutate) cost of the fused-generation kernel on hardware.

Round-1 left the prologue unablated (tools/tpu_ablate_probe.py covers the
evaluate-only kernel); the 2^17 mu=pop/128 cliff (README: 37.2M vs 57.8M at
fixed mu=256) is attributed to "in-kernel parent gather + top-k merge", and
tools/tpu_select_probe.py shows the XLA top-k merge is FLAT in mu — so the
gather is the suspect. Measures, per (pop, mu):

  gen    — scan of fused_generation (offspring in-kernel) + select
  eval   — scan of fused_synth_fitness (params fixed per block) + select
           (the difference is the offspring prologue + (D,P)x2 HBM outputs)

Usage: python tools/tpu_offspring_probe.py [gens]
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
from pmfm_tpu.es.pipeline import evolve, fused_generation_kwargs, kernel_seed
from pmfm_tpu.es.strategy import select
from pmfm_tpu.kernels.generation import fused_generation
from pmfm_tpu.kernels.synth_fitness import fused_synth_fitness

GENS = int(sys.argv[1]) if len(sys.argv) > 1 else 200


def cfg_for(pop, mu):
    return ESConfig(
        num_parents=mu, num_offspring=pop - mu, num_dimensions=6,
        topology="fm3_series", audio_length_log2=10,
        synthesis_engine="scanless", spectrum_method="dft", dft_dtype="int8",
        fused_kernel=True, fused_generation=True, sine_order=7, pop_block=1024,
    )


def build_gen(cfg, so, tgt):
    @jax.jit
    def run(key):
        state = init_state(key, cfg)
        final, _ = evolve(state, tgt, GENS, so, cfg)
        return final.best_fitness

    return run


def build_eval(cfg, so, tgt):
    """Same scan shape, but the evaluate-only kernel: offspring = parents
    re-scaled through a cheap XLA broadcast (NOT equivalent ES semantics —
    this is a cost ablation, the offspring prologue and the (D,P) outputs
    are simply absent)."""
    kw = fused_generation_kwargs(cfg, so)
    pop = cfg.population_size

    @jax.jit
    def run(key):
        state = init_state(key, cfg)

        def body(s, _):
            reps = pop // cfg.num_parents
            values = jnp.tile(s.parent_values, (reps, 1))
            scaled = values * 3000.0 + s.best_fitness * 1e-30
            fitness = fused_synth_fitness(
                scaled, so.dft_cos, so.dft_sin, tgt,
                topology=cfg.topology, n=cfg.n_samples,
                pop_block=cfg.pop_block, num_frames=cfg.num_frames,
                dft_packed=so.dft_packed, dft_scale=so.dft_packed_scale,
                sine_order=cfg.sine_order,
            )
            pv, ps, pf = select(values, jnp.ones_like(values), fitness,
                                cfg.num_parents)
            return s._replace(parent_values=pv, best_fitness=pf[0]), None

        s, _ = jax.lax.scan(body, state, None, length=GENS)
        return s.best_fitness

    return run


for pop, mu in ((1 << 15, 256), (1 << 15, 1024), (1 << 17, 256), (1 << 17, 1024)):
    cfg = cfg_for(pop, mu)
    so = make_spectrum_ops(cfg)
    tgt = jnp.ones((so.num_bins,), jnp.float32)
    for name, builder in (("gen", build_gen), ("eval", build_eval)):
        run = builder(cfg, so, tgt)
        print(f"compiling pop=2^{pop.bit_length()-1} mu={mu} {name} ...", flush=True)
        float(np.asarray(run(jax.random.PRNGKey(0))))
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            float(np.asarray(run(jax.random.PRNGKey(0))))
            best = min(best, (time.time() - t0) / GENS * 1e3)
        print(f"pop=2^{pop.bit_length()-1} mu={mu:5d} {name:5s} {best:7.4f} ms/gen "
              f"({pop/best/1e3:.1f}M evals/s)", flush=True)
