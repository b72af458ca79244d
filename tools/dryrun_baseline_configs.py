"""Dry-run the BASELINE.json large-scale configs on a virtual device mesh.

Configs 4-5 need a v5e-8 / multi-host pod (population 2^18 and 2^20 sharded
with ICI top-k selection). Real hardware here is one chip, so this proves the
*programs* — full ES generation, population sharded over the mesh, O(mu)
all-gather selection — compile and execute at those population sizes on
virtual CPU devices with tiny audio frames. Throughput numbers require real
chips (tools/scaling_bench.py).

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/dryrun_baseline_configs.py
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax

    if jax.default_backend() != "cpu":
        print("run with JAX_PLATFORMS=cpu + xla_force_host_platform_device_count")
        return 1
    import jax.numpy as jnp

    from pmfm_tpu.es import ESConfig, init_state, make_spectrum_ops
    from pmfm_tpu.parallel import make_mesh
    from pmfm_tpu.parallel.sharded import evolve_sharded

    ndev = len(jax.devices())
    mesh = make_mesh()
    print(f"virtual mesh: {ndev} devices")

    configs = [
        ("config-4: pop 2^18 sharded, ICI top-k selection", 1 << 18, 1024),
        ("config-5: pop 2^20 multi-host scale", 1 << 20, 1024),
    ]
    for name, pop, mu in configs:
        cfg = ESConfig(
            num_parents=mu,
            num_offspring=pop - mu,
            num_dimensions=6,
            topology="fm3_series",
            audio_length_log2=6,  # tiny frames: validating program structure
            synthesis_engine="scanless",
        )
        so = make_spectrum_ops(cfg)
        tspec = jnp.ones((so.num_bins,), jnp.float32)

        @jax.jit
        def run(key, cfg=cfg, so=so, tspec=tspec):
            state = init_state(key, cfg)
            final, _ = evolve_sharded(state, tspec, 2, so, cfg, mesh)
            return final.best_fitness, final.generation

        t0 = time.time()
        best, gen = jax.block_until_ready(run(jax.random.PRNGKey(0)))
        print(
            f"{name}: OK — {int(gen)} sharded generations "
            f"({pop//ndev} candidates/device), best={float(best):.4g} "
            f"[{time.time()-t0:.1f}s on CPU]"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
