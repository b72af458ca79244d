"""Large-frame spectrum engines on hardware (VERDICT r1 missing #2).

At audioLengthLog2 >= 13 the fused Pallas engines are VMEM-gated off; this
probe times one full evaluate (synthesis + spectrum + fitness, the XLA
non-fused path) per engine at n = 8192 (and optionally larger):

  unfolded-bf16 — round-1's fallback: magnitude_spectrum, (N, K) bf16 dots
  folded-bf16   — magnitude_spectrum_folded, (N/2, K) bf16 dots
  folded-int8   — magnitude_spectrum_folded, per-candidate int8 quant
  rfft          — jnp.fft.rfft engine
  synth-fold    — the round-2 hybrid (kernels/synth_fold.py): Pallas
                  synthesis+fold emits int8 a+/- straight to HBM; XLA does
                  the (2K, N/2) int8 dots. Finding (2026-08-20): at n=8192
                  ALL pure-XLA engines tie at ~62 ms/gen — synthesis, not
                  the DFT, dominates (XLA materialises (N, pop) float
                  intermediates); the hybrid removes exactly that.

Usage: python tools/tpu_largeframe_probe.py [log2 ...]  (default 13)
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from pmfm_tpu.ops import spectral, synthesis

POP = 1 << 15
GENS = 20
LOG2S = [int(a) for a in sys.argv[1:] if a.isdigit()] or [13]


def build(n, engine):
    dtype = jnp.int8 if engine in ("folded-int8", "synth-fold") else jnp.bfloat16
    method = "rfft" if engine == "rfft" else "dft"
    so = spectral.make_spectrum_ops(n, method=method, dft_dtype=dtype)
    tgt = jnp.ones((so.num_bins,), jnp.float32)
    mins = jnp.zeros((6,), jnp.float32)
    maxs = jnp.asarray([3520, 8, 3520, 8, 3520, 8], jnp.float32)
    key = jax.random.PRNGKey(0)
    genes0 = jax.random.uniform(key, (POP, 6), jnp.float32)

    @jax.jit
    def run():
        def body(g, i):
            scaled = synthesis.scale_params(g, mins, maxs)
            if engine == "synth-fold":
                from pmfm_tpu.kernels.synth_fold import fused_synth_fold

                ap, am, edge, ms = fused_synth_fold(
                    scaled, topology="fm3_series", n=n,
                    dft_scale=so.dft_packed_scale, sine_order=7,
                )
                spectra = spectral.magnitude_spectrum_prefolded(
                    ap, am, edge, ms, so
                )
                fit = spectral.spectral_fitness(spectra, tgt)
            else:
                audio = synthesis.synthesize(
                    scaled, n, "fm3_series", engine="scanless",
                    out_dtype=jnp.bfloat16,
                )
                if engine == "unfolded-bf16" or engine == "rfft":
                    fit = spectral.evaluate_fitness(audio, tgt, so)
                else:
                    spectra = spectral.magnitude_spectrum_folded(audio, so)
                    fit = spectral.spectral_fitness(spectra, tgt)
            # data dependency: nudge one gene by the best fitness
            g = g + (fit[0] * 1e-30).astype(jnp.float32)
            return g, None

        g, _ = jax.lax.scan(body, genes0, jnp.arange(GENS, dtype=jnp.int32))
        return g[0, 0]

    return run


print(f"backend={jax.default_backend()} pop=2^15 gens={GENS}", flush=True)
for log2 in LOG2S:
    n = 1 << log2
    engines = ("unfolded-bf16", "folded-bf16", "folded-int8", "rfft",
               "synth-fold")
    if len(LOG2S) > 1 or "--fold-only" in sys.argv:
        engines = ("synth-fold",)  # the XLA baselines take minutes to even
        # COMPILE at n >= 2^14; n=2^13 already establishes the 6x ratio
    for engine in engines:
        run = build(n, engine)
        print(f"compiling n=2^{log2} {engine} ...", flush=True)
        try:
            float(np.asarray(run()))
        except Exception as e:  # noqa: BLE001 — report per-engine OOM etc.
            print(f"n=2^{log2} {engine:14s} FAILED: {type(e).__name__}: {e}",
                  flush=True)
            continue
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            float(np.asarray(run()))
            best = min(best, (time.time() - t0) / GENS * 1e3)
        print(f"n=2^{log2} {engine:14s} {best:8.3f} ms/gen "
              f"({POP/best/1e3:.1f}M evals/s)", flush=True)
