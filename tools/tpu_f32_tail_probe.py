"""Hardware probe: the TRUE-f32 fused engine (round 5) as the refine tail.

Measures, on the real chip at the bench shape (pop 2^15, n=1024, mu=256,
fm3_series):

  1. steady ms/gen of the f32 fused generation kernel (the new refine-tail
     engine) vs the unfused XLA f32 path it replaces (~13 ms/gen, VERDICT
     r4 weak #2) and vs the int8/bf16 fused kernels for context;
  2. fitness agreement of the f32 fused kernel vs the XLA f32 path on the
     SAME candidates (the CPU-interpret test bounds this at ~1e-4 median —
     confirm Mosaic's Precision.HIGHEST matches);
  3. (--pb2048) whether the bf16 pop_block=2048 config still Mosaic-OOMs
     post-fold (ADVICE r4: the VMEM gate approves it at 6.45 MB estimated;
     the CLAUDE.md OOM note predates the folded scratch).

Usage: JAX_COMPILATION_CACHE_DIR=.jax_tpu_cache timeout 590 \
    python tools/tpu_f32_tail_probe.py [--pb2048]
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def steady(fn, *args, reps=3):
    from pmfm_tpu.utils import device_sync

    device_sync(fn(*args))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        device_sync(fn(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pb2048", action="store_true")
    ap.add_argument("--gens", type=int, default=200)
    args = ap.parse_args()

    from pmfm_tpu.es import ESConfig, init_state, make_spectrum_ops
    from pmfm_tpu.es.pipeline import evolve
    from pmfm_tpu.es.strategy import active_engine, evaluate
    from pmfm_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          flush=True)

    POP, MU, GENS = 1 << 15, 256, args.gens
    base = dict(
        num_parents=MU, num_offspring=POP - MU, num_dimensions=6,
        topology="fm3_series", audio_length_log2=10,
        synthesis_engine="scanless", spectrum_method="dft", pop_block=1024,
        mutation_noise="clt12_neutral", min_step=1e-4,
    )

    variants = [
        ("f32_fused", dict(dft_dtype="float32", fused_kernel=True,
                           fused_generation=True)),
        ("f32_xla", dict(dft_dtype="float32")),
        ("bf16_fused", dict(dft_dtype="bfloat16", fused_kernel=True,
                            fused_generation=True)),
        ("int8_fused", dict(dft_dtype="int8", fused_kernel=True,
                            fused_generation=True)),
    ]
    results = {}
    for name, over in variants:
        cfg = ESConfig(**{**base, **over})
        so = make_spectrum_ops(cfg)
        tspec = jnp.ones((so.num_bins,), jnp.float32)
        eng = active_engine(cfg, so)

        @jax.jit
        def run(key, cfg=cfg, so=so, tspec=tspec):
            state = init_state(key, cfg)
            final, _ = evolve(state, tspec, GENS, so, cfg)
            return final.best_fitness

        dt = steady(run, jax.random.PRNGKey(0))
        ms = dt / GENS * 1e3
        results[name] = ms
        print(f"{name:12s} [{eng:18s}] {ms:7.3f} ms/gen "
              f"({POP*GENS/dt/1e6:6.1f}M evals/s)", flush=True)

    # --- agreement: f32 fused vs XLA f32 on the same candidates ----------
    cfg_f = ESConfig(**{**base, "dft_dtype": "float32", "fused_kernel": True})
    cfg_x = ESConfig(**{**base, "dft_dtype": "float32"})
    so_f, so_x = make_spectrum_ops(cfg_f), make_spectrum_ops(cfg_x)
    vals = jax.random.uniform(jax.random.PRNGKey(1), (4096, 6))
    tgt = jnp.ones((so_f.num_bins,), jnp.float32)
    ff = np.asarray(evaluate(vals, tgt, so_f, cfg_f))
    fx = np.asarray(evaluate(vals, tgt, so_x, cfg_x))
    rel = np.abs(ff - fx) / (np.abs(fx) + 1e-9)
    k = 256
    overlap = len(set(np.argsort(ff)[:k]) & set(np.argsort(fx)[:k]))
    print(f"f32 fused vs XLA f32: median rel {np.median(rel):.2e} "
          f"max {rel.max():.2e} top-{k} overlap {overlap}/{k}", flush=True)

    if args.pb2048:
        print("compiling bf16 pop_block=2048 (historic OOM config)...",
              flush=True)
        from pmfm_tpu.kernels.synth_fitness import fused_synth_fitness

        cfg2 = ESConfig(**{**base, "dft_dtype": "bfloat16",
                           "fused_kernel": True, "pop_block": 2048})
        so2 = make_spectrum_ops(cfg2)
        scaled = vals * 3000.0
        try:
            out = fused_synth_fitness(
                scaled[: 1 << 15].repeat(8, 0)[: 1 << 15], so2.dft_cos,
                so2.dft_sin, tgt, topology=cfg2.topology, n=cfg2.n_samples,
                pop_block=2048, dft_packed=so2.dft_packed,
                dft_scale=so2.dft_packed_scale,
            )
            np.asarray(out)
            print("bf16 PB=2048: COMPILES AND RUNS (OOM note is stale)",
                  flush=True)
        except Exception as e:
            print(f"bf16 PB=2048: FAILS ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]})", flush=True)


if __name__ == "__main__":
    main()
