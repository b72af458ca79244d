"""Weak-scaling sweep of the population-sharded ES (BASELINE.md north star:
>=85% weak-scaling efficiency).

On CPU (forced virtual devices) this validates the collective structure and
reports *relative* numbers only; run on a real multi-chip slice for true
scaling. Per mesh size n: population = n * POP_PER_SHARD, measure
generations/sec; weak-scaling efficiency = t(1) / t(n).

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_bench.py --pop-per-shard 2048
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pop-per-shard", type=int, default=2048)
    ap.add_argument("--parents", type=int, default=64)
    ap.add_argument("--log2", type=int, default=9)
    ap.add_argument("--gens", type=int, default=10)
    ap.add_argument("--csv", default=None)
    ap.add_argument(
        "--fused", action="store_true",
        help="per-shard fused generation kernel (int8 engine) — the "
        "single-chip bench engine; TPU only",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if not jax.config.jax_compilation_cache_dir:
        from pmfm_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache()

    from pmfm_tpu.es import ESConfig, init_state, make_spectrum_ops
    from pmfm_tpu.parallel import make_mesh
    from pmfm_tpu.parallel.sharded import evolve_sharded
    from pmfm_tpu.utils import Benchmarker, device_sync

    ndev = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= ndev]
    bm = Benchmarker(csv_path=args.csv, quiet=True) if args.csv else None
    base_time = None
    print(f"devices: {ndev} x {jax.devices()[0].device_kind}")
    for n in sizes:
        pop = n * args.pop_per_shard
        cfg = ESConfig(
            num_parents=args.parents,
            num_offspring=pop - args.parents,
            num_dimensions=6,
            topology="fm3_series",
            audio_length_log2=args.log2,
            synthesis_engine="scanless",
            dft_dtype="int8" if args.fused else "bfloat16",
            fused_kernel=args.fused,
            fused_generation=args.fused,
            pop_block=1024,
        )
        so = make_spectrum_ops(cfg)
        tspec = jnp.ones((so.num_bins,), jnp.float32)
        mesh = make_mesh(shape=(n,))

        @jax.jit
        def run(key, cfg=cfg, so=so, mesh=mesh):
            state = init_state(key, cfg)
            final, _ = evolve_sharded(state, tspec, args.gens, so, cfg, mesh)
            return final.best_fitness

        device_sync(run(jax.random.PRNGKey(0)))
        best = None
        for i in range(3):
            t0 = time.perf_counter()
            device_sync(run(jax.random.PRNGKey(i)))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        if base_time is None:
            base_time = best
        eff = base_time / best
        evals = pop * args.gens / best
        print(
            f"mesh={n:3d}  pop=2^{pop.bit_length()-1:<3d} {best*1e3:8.1f}ms "
            f"{evals/1e6:7.2f}M evals/s  weak-scaling eff={eff*100:5.1f}%"
        )
        if bm is not None:
            bm.add_timer(f"WeakScaling_mesh{n}", best * 1e3)
            bm.set_workload(f"WeakScaling_mesh{n}", pop, args.gens)
            bm.elapsed_timer(f"WeakScaling_mesh{n}")
    if bm is not None:
        bm.close()


if __name__ == "__main__":
    main()
