"""Spectrum-only crossover probe: folded DFT matmul vs rfft over frame size.

VERDICT r2 item 4: the chunk-size suite measures whole generations, where
synthesis dominates at large n; this probe isolates the SPECTRUM stage to
locate the n where XLA's rfft overtakes the folded-DFT-as-matmul engine
(spectral.magnitude_spectrum_folded vs magnitude_spectrum) at a fixed
batch. The reference's analogous decision point is clFFT-vs-naive
(Evolutionary_Strategy_OpenCL.hpp:156-192 picks a batched FFT library
unconditionally); on the MXU the O(N^2) matmul wins short transforms
(spectral.AUTO_DFT_MAX_N rationale) and this probe pins the boundary.

    python tools/tpu_spectrum_probe.py [--batch 8192] [--csv out.csv]

Writes benchmarks/spectrum_crossover.csv by default (7-column schema).
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

if not jax.config.jax_compilation_cache_dir:
    from pmfm_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

from pmfm_tpu.ops import spectral  # noqa: E402
from pmfm_tpu.utils import Benchmarker, device_sync  # noqa: E402


def steady(fn, *a, reps=5):
    device_sync(fn(*a))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        device_sync(fn(*a))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--csv", default="benchmarks/spectrum_crossover.csv")
    ap.add_argument("--max-log2", type=int, default=15)
    args = ap.parse_args(argv)
    b = args.batch
    bm = Benchmarker(csv_path=args.csv, quiet=True)
    print(f"batch={b} (time-major audio), best of 5, ms per batch")
    rows = []
    for log2 in range(10, args.max_log2 + 1):
        n = 1 << log2
        key = jax.random.PRNGKey(log2)
        audio32 = jax.random.normal(key, (n, b), jnp.float32) * 100.0
        variants = {}
        if n <= spectral.DFT_MAX_MATERIALIZE_N:
            so_d = spectral.make_spectrum_ops(
                n, method="dft", dft_dtype=jnp.bfloat16
            )
            # reduce to a scalar INSIDE the jit: syncing the (B, K) spectra
            # would pull tens of MB through the axon dev tunnel per rep and
            # swamp the compute being measured
            variants["folded_dft_bf16"] = (
                jax.jit(
                    lambda a, so=so_d: spectral.magnitude_spectrum_folded(
                        a.astype(jnp.bfloat16), so
                    ).sum()
                ),
                audio32,
            )
        so_r = spectral.make_spectrum_ops(n, method="rfft")
        variants["rfft_f32"] = (
            jax.jit(
                lambda a, so=so_r: spectral.magnitude_spectrum(a, so).sum()
            ),
            audio32,
        )
        line = [f"n={n:6d}"]
        for name, (fn, a) in variants.items():
            try:
                dt = steady(fn, a)
            except Exception as e:  # HBM limits at the top sizes
                print(f"n={n} {name}: SKIP ({type(e).__name__}: "
                      f"{str(e).splitlines()[0][:200]})")
                continue
            tn = f"Spectrum_{n}_{name}"
            bm.add_timer(tn, dt * 1e3)
            bm.elapsed_timer(tn)
            line.append(f"{name}={dt*1e3:8.3f}ms")
            rows.append((n, name, dt))
        print("  ".join(line), flush=True)
    # crossover summary
    by_n = {}
    for n, name, dt in rows:
        by_n.setdefault(n, {})[name] = dt
    prev = None
    for n in sorted(by_n):
        d = by_n[n]
        if "folded_dft_bf16" in d and "rfft_f32" in d:
            ratio = d["folded_dft_bf16"] / d["rfft_f32"]
            flag = "dft wins" if ratio < 1 else "rfft wins"
            print(f"n={n}: dft/rfft = {ratio:.2f} ({flag})")
            if prev is not None and prev < 1 <= ratio:
                print(f"--> spectrum-only crossover between n={n//2} and n={n}")
            prev = ratio
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
