"""Spectrum-only crossover probe: folded DFT matmul vs rfft over frame size.

VERDICT r2 item 4: the chunk-size suite measures whole generations, where
synthesis dominates at large n; this probe isolates the SPECTRUM stage to
locate the n where XLA's rfft overtakes the folded-DFT-as-matmul engine
(spectral.magnitude_spectrum_folded vs magnitude_spectrum) at a fixed
batch. The reference's analogous decision point is clFFT-vs-naive
(Evolutionary_Strategy_OpenCL.hpp:156-192 picks a batched FFT library
unconditionally); on the MXU the O(N^2) matmul wins short transforms
(spectral.AUTO_DFT_MAX_N rationale) and this probe pins the boundary.

Measurement notes (axon dev tunnel — each cost a failed run to learn):
* ~25 ms fixed dispatch per run swamps sub-ms spectra, so the spectrum is
  looped ITERS times inside one jit, each iteration on a rolled copy of
  the audio (real data dependence defeats loop-invariant hoisting), and
  the per-iteration time is reported.
* The DFT operands ride as jit ARGUMENTS: inlined-as-constants they blow
  the remote compile service's request-body limit at n >= 16384
  (HTTP 413).
* Only a scalar is synced (a full-array sync pulls tens of MB through the
  tunnel per rep and dominates the measurement).
* n = 32768 is gated behind --max-log2 15: the batch-8192 rfft at that
  shape hung the remote compile service past a 40-min timeout twice.

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

ITERS = 20
_OP_FIELDS = ("window", "dft_cos", "dft_sin", "dft_packed")


def _split_ops(so):
    """(big-array dict, array-free ops) so operands ride as jit args."""
    big = {f: getattr(so, f) for f in _OP_FIELDS if getattr(so, f) is not None}
    return big, so._replace(**{f: None for f in big})


def _timed(fn, audio, big, reps=3):
    device_sync(fn(audio, big))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        device_sync(fn(audio, big))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / ITERS


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--csv", default="benchmarks/spectrum_crossover.csv")
    ap.add_argument("--max-log2", type=int, default=14)
    args = ap.parse_args(argv)
    b = args.batch
    bm = Benchmarker(csv_path=args.csv, quiet=True)
    print(f"batch={b} (time-major audio), {ITERS} iters inside one jit, "
          f"best of 3 runs, ms per spectrum batch")
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
            big_d, lean_d = _split_ops(so_d)

            @jax.jit
            def run_folded(a, big, lean=lean_d):
                so = lean._replace(**big)

                def body(i, carry):
                    a, acc = carry
                    s = spectral.magnitude_spectrum_folded(
                        a.astype(jnp.bfloat16), so
                    ).sum()
                    # roll = real data dependence; per-iter compute identical
                    return jnp.roll(a, 1, axis=0), acc + s

                _, acc = jax.lax.fori_loop(
                    0, ITERS, body, (a, jnp.float32(0.0))
                )
                return acc

            variants["folded_dft_bf16"] = (run_folded, big_d)
        so_r = spectral.make_spectrum_ops(n, method="rfft")
        big_r, lean_r = _split_ops(so_r)

        @jax.jit
        def run_rfft(a, big, lean=lean_r):
            so = lean._replace(**big)

            def body(i, carry):
                a, acc = carry
                s = spectral.magnitude_spectrum(a, so).sum()
                return jnp.roll(a, 1, axis=0), acc + s

            _, acc = jax.lax.fori_loop(0, ITERS, body, (a, jnp.float32(0.0)))
            return acc

        variants["rfft_f32"] = (run_rfft, big_r)
        line = [f"n={n:6d}"]
        for name, (fn, big) in variants.items():
            try:
                dt = _timed(fn, audio32, big)
            except Exception as e:  # HBM/compile limits at the top sizes
                print(f"n={n} {name}: SKIP ({type(e).__name__}: "
                      f"{str(e).splitlines()[0][:160]})")
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
