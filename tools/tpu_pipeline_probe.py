"""Hardware probe: the software-pipelined fused-generation kernel
(kernels/generation.py pipeline_dft) vs the serialised kernel.

Validates on a real chip (the interpreter PRNG draws zeros, so CPU runs are
structural only):
  1. BIT-IDENTITY — same seeds, same per-block streams => fitness, values
     and steps must match exactly;
  2. steady-state throughput at the bench config (scan over generations,
     min over repeats, np.asarray sync — axon block_until_ready can return
     early on scalar outputs, CLAUDE.md).

Usage: python tools/tpu_pipeline_probe.py [--pop 32768] [--gens 200]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pmfm_tpu.kernels.generation import fused_generation  # noqa: E402
from pmfm_tpu.ops.spectral import make_spectrum_ops  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pop", type=int, default=1 << 15)
    ap.add_argument("--mu", type=int, default=256)
    ap.add_argument("--gens", type=int, default=200)
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--pop-block", type=int, default=1024)
    ap.add_argument("--sine-order", type=int, default=7)
    ap.add_argument("--dtype", default="int8", choices=["int8", "bfloat16"])
    args = ap.parse_args()

    if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_tpu_cache"),
        )
    print("backend:", jax.default_backend(), jax.devices())

    so = make_spectrum_ops(args.n, dft_dtype=jnp.dtype(args.dtype))
    key = jax.random.PRNGKey(0)
    pv = jax.random.uniform(key, (args.mu, 6))
    ps = jnp.full((args.mu, 6), 0.1)
    tgt = jnp.abs(jax.random.normal(key, (so.num_bins,), jnp.float32)) * 10

    kw = dict(
        pop=args.pop, param_mins=(0.0,) * 6,
        param_maxs=(3520.0, 8.0, 3520.0, 8.0, 3520.0, 8.0),
        topology="fm3_series", n=args.n, pop_block=args.pop_block,
        dft_packed=so.dft_packed, dft_scale=so.dft_packed_scale,
        sine_order=args.sine_order,
    )

    # --- 1. bit-identity on real PRNG draws -----------------------------
    f0, v0, s0 = fused_generation(
        jnp.int32(12345), pv, ps, so.dft_cos, so.dft_sin, tgt, **kw)
    f1, v1, s1 = fused_generation(
        jnp.int32(12345), pv, ps, so.dft_cos, so.dft_sin, tgt,
        **kw, pipeline_dft=True)
    eq = (
        bool(jnp.array_equal(f0, f1)),
        bool(jnp.array_equal(v0, v1)),
        bool(jnp.array_equal(s0, s1)),
    )
    print(f"bit-identity (fitness, values, steps): {eq}")
    if not all(eq):
        bad = np.nonzero(np.asarray(f0) != np.asarray(f1))[0]
        print("  first diffs:", bad[:8],
              np.asarray(f0)[bad[:4]], np.asarray(f1)[bad[:4]])
        sys.exit(1)

    # --- 2. steady-state timing (scan over generations) -----------------
    def make_run(pipe):
        @jax.jit
        def run(seed0):
            def body(c, g):
                fit, _, _ = fused_generation(
                    seed0 + g, pv, ps, so.dft_cos, so.dft_sin, tgt,
                    **kw, pipeline_dft=pipe)
                return c + jnp.min(fit), None
            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0), jnp.arange(args.gens, dtype=jnp.int32))
            return acc
        return run

    for pipe in (False, True):
        run = make_run(pipe)
        float(np.asarray(run(jnp.int32(1))))  # compile + warm
        best = 1e9
        for r in range(3):
            t0 = time.perf_counter()
            float(np.asarray(run(jnp.int32(2 + r))))
            best = min(best, time.perf_counter() - t0)
        ms = best / args.gens * 1e3
        print(f"pipeline={pipe}: {ms:.3f} ms/gen  "
              f"({args.pop / ms * 1e3 / 1e6:.1f}M evals/s)")


if __name__ == "__main__":
    main()
