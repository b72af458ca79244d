"""Measure BASELINE.json configs 1-3 on real hardware.

The driver's north-star configs (BASELINE.json "configs"):
  1. 2-op FM tone match, pop 512, 512-pt FFT, single frame (CPU-reference
     quality bound: <=1e-3 relative spectral error vs the FFTW/oracle path)
  2. 2-op FM, pop 2^13, 1024-pt FFT, multi-frame STFT fitness on the
     input_audio target (input_audio/input.wav)
  3. pop 2^15 full fused ES loop on one chip (= bench.py headline config)
Configs 4-5 need a v5e-8 / multi-host pod — program structure is validated
on a virtual mesh by tools/dryrun_baseline_configs.py and the sharded
throughput path by tools/scaling_bench.py.

Writes benchmarks/baseline_configs.csv (reference 7-column schema) and
prints one line per config.
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

if not jax.config.jax_compilation_cache_dir:
    from pmfm_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

from pmfm_tpu.es import ESConfig, init_state, make_spectrum_ops  # noqa: E402
from pmfm_tpu.es.pipeline import evolve  # noqa: E402
from pmfm_tpu.io.wav import read_wav  # noqa: E402
from pmfm_tpu.ops import synthesize_single  # noqa: E402
from pmfm_tpu.ops.oracle import OracleObjective  # noqa: E402
from pmfm_tpu.ops.spectral import (  # noqa: E402
    target_spectrum, target_spectrum_frames,
)
from pmfm_tpu.ops.synthesis import scale_params  # noqa: E402
from pmfm_tpu.utils import Benchmarker  # noqa: E402

GENS = 1000
FM2 = dict(topology="fm2", num_dimensions=4, param_mins=(0.0,) * 4,
           param_maxs=(3520.0, 8.0, 3520.0, 1.0))  # struct defaults
ENGINE = dict(synthesis_engine="scanless", spectrum_method="dft",
              dft_dtype="int8", fused_kernel=True, fused_generation=True,
              pop_block=1024)


def steady(run, key0=0):
    from pmfm_tpu.utils import device_sync

    device_sync(run(jax.random.PRNGKey(key0)))
    best = None
    for i in range(3):
        t0 = time.time()
        device_sync(run(jax.random.PRNGKey(i)))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> int:
    bm = Benchmarker(csv_path="benchmarks/baseline_configs.csv", quiet=True)

    # -- config 1: fm2, pop 512, 512-pt, single frame ----------------------
    cfg1 = ESConfig(num_parents=16, num_offspring=512 - 16,
                    audio_length_log2=9, **FM2, **ENGINE)
    so1 = make_spectrum_ops(cfg1)
    truth = jnp.asarray([0.85, 0.25, 0.9, 0.8])
    scaled = scale_params(truth[None], jnp.asarray(cfg1.param_mins),
                          jnp.asarray(cfg1.param_maxs))[0]
    target_audio = synthesize_single(scaled, cfg1.n_samples, "fm2")
    t1 = target_spectrum(target_audio, so1)

    @jax.jit
    def run1(key):
        state = init_state(key, cfg1)
        final, _ = evolve(state, t1, GENS, so1, cfg1)
        return final.best_values, final.best_fitness

    dt = steady(run1)
    bv, bf = jax.block_until_ready(run1(jax.random.PRNGKey(0)))
    # The <=1e-3 bound is ENGINE parity (SURVEY.md §4: the TPU pipeline must
    # match the CPU/FFTW reference semantics within 1e-3 relative spectral
    # error FOR THE SAME CANDIDATE) — measured here on the matched best:
    # engine synthesis+spectrum vs the scalar float32 oracle.
    obj = OracleObjective(cfg1.n_samples)
    best_scaled = np.asarray(scale_params(
        bv[None], jnp.asarray(cfg1.param_mins),
        jnp.asarray(cfg1.param_maxs))[0])
    so1f = make_spectrum_ops(cfg1.replace(
        dft_dtype="float32", fused_kernel=False, fused_generation=False))
    engine_spec = np.asarray(target_spectrum(
        synthesize_single(jnp.asarray(best_scaled), cfg1.n_samples, "fm2"),
        so1f))
    oracle_spec = obj.magnitude_spectrum(obj.synthesize(best_scaled, "fm2"))
    rel = float(np.linalg.norm(engine_spec - oracle_spec)
                / np.linalg.norm(oracle_spec))
    bm.add_timer("Config1_fm2_pop512", dt * 1e3)
    bm.set_workload("Config1_fm2_pop512", 512, GENS)
    bm.elapsed_timer("Config1_fm2_pop512")
    verdict = "PASS" if rel <= 1e-3 else "FAIL"
    print(f"config-1: {512 * GENS / dt / 1e6:.2f}M evals/s  "
          f"({dt / GENS * 1e3:.4f} ms/gen)  best_fitness={float(bf):.3e}  "
          f"engine-vs-oracle rel_spectral_err={rel:.2e} "
          f"(bound 1e-3: {verdict})", flush=True)

    # -- config 2: fm2, pop 2^13, 1024-pt, multi-frame STFT on input_audio -
    audio, sr = read_wav("input_audio/input.wav")
    n = 1 << 10
    frames = len(audio) // n
    cfg2 = ESConfig(num_parents=256, num_offspring=(1 << 13) - 256,
                    audio_length_log2=10, num_frames=frames, **FM2, **ENGINE)
    so2 = make_spectrum_ops(cfg2)
    t2 = target_spectrum_frames(jnp.asarray(audio[: frames * n]), so2)

    @jax.jit
    def run2(key):
        state = init_state(key, cfg2)
        final, _ = evolve(state, t2, GENS, so2, cfg2)
        return final.best_fitness

    dt = steady(run2)
    pop2 = cfg2.population_size
    bm.add_timer("Config2_fm2_stft", dt * 1e3)
    bm.set_workload("Config2_fm2_stft", pop2, GENS)
    bm.elapsed_timer("Config2_fm2_stft")
    print(f"config-2: {pop2 * GENS / dt / 1e6:.2f}M cand/s, "
          f"{pop2 * frames * GENS / dt / 1e6:.1f}M frame-evals/s "
          f"({frames} frames of input_audio/input.wav)", flush=True)

    # -- config 3: the bench.py headline (documented there) ----------------
    print("config-3: the bench.py headline config — run `python bench.py` "
          "for the current number", flush=True)
    bm.close()
    print("wrote benchmarks/baseline_configs.csv")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
