"""Audio-mode quality artifact (VERDICT r4 missing #2).

The reference's primary demo is matching a WAV target
(/root/reference/main.cpp:204-208, 307-335). Every committed quality gate
so far ran params-mode synthetic targets; this study measures per-engine
QUALITY on the audio input surface itself:

* chunk mode — match input_audio/input.wav (8 known oracle-rendered
  fm3_series voices, one per 2048-sample chunk, peak-normalised 24-bit
  PCM — tools/make_input_wav.py) chunk-by-chunk under each engine rung;
  per chunk report the f32-rescored final fitness and the relative
  spectral error, next to the TRUTH FLOOR (the known voice's own params
  rescored against the same WAV chunk — nonzero because of per-voice
  peak normalisation, 24-bit quantisation and the oracle-vs-scanless
  engine difference; an engine at the floor has matched everything the
  file still carries);
* stft mode — one ES run scored over all 8 frames per engine
  (BASELINE.json config 2's shape on this file);
* off-manifold — a deterministic non-FM recording (exponential chirp +
  harmonic stack + filtered noise) matched chunk-by-chunk: no truth
  exists, the artifact records what residual error graceful degradation
  leaves per engine.

Writes benchmarks/audio_quality.json. Run on the real chip (~5 min):

    JAX_COMPILATION_CACHE_DIR=.jax_tpu_cache timeout 590 \
        python tools/audio_quality_study.py
"""
import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

if not jax.config.jax_compilation_cache_dir:
    from pmfm_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

from pmfm_tpu.es import ESConfig, make_spectrum_ops  # noqa: E402
from pmfm_tpu.es.pipeline import match_audio, match_audio_stft  # noqa: E402
from pmfm_tpu.es.strategy import evaluate  # noqa: E402
from pmfm_tpu.io.wav import read_wav  # noqa: E402
from pmfm_tpu.ops.spectral import target_spectrum  # noqa: E402
from tools.make_input_wav import VOICES  # noqa: E402

ENGINES = {
    "f32": dict(dft_dtype="float32", fused_kernel=False,
                fused_generation=False),
    "int8+sin7+refine": dict(dft_dtype="int8", fused_kernel=True,
                             fused_generation=True, sine_order=7,
                             refine_generations=100),
    # the shipped example config's engine block (examples/params_match.json)
    "shipped": dict(dft_dtype="int8", fused_kernel=True,
                    fused_generation=True, mutation_noise="clt12_neutral",
                    min_step=1e-4, restart_patience=100,
                    refine_generations=100),
}


def nonfm_recording(n_total: int, sr: int) -> np.ndarray:
    """Deterministic off-manifold audio: exponential chirp + 5-partial
    harmonic stack with vibrato + band-ish filtered noise."""
    t = np.arange(n_total) / sr
    chirp = 0.5 * np.sin(
        2 * np.pi * 200.0 * (np.exp(t * 2.0) - 1.0) / 2.0
    )
    stack = sum(
        (0.3 / h) * np.sin(2 * np.pi * 330.0 * h * t + 0.3 * h)
        for h in range(1, 6)
    )
    rng = np.random.default_rng(7)
    noise = rng.standard_normal(n_total)
    noise = np.convolve(noise, np.ones(8) / 8.0, mode="same")  # lowpass-ish
    out = chirp + stack * np.sin(2 * np.pi * 0.7 * t + 1.0) + 0.15 * noise
    return (out / np.abs(out).max()).astype(np.float32)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--gens", type=int, default=1000)
    ap.add_argument("--json", default="benchmarks/audio_quality.json")
    ap.add_argument("--wav", default="input_audio/input.wav")
    args = ap.parse_args(argv)

    audio, sr = read_wav(args.wav)
    log2 = 11
    n = 1 << log2
    n_chunks = len(audio) // n
    base = ESConfig(
        num_parents=64, num_offspring=4096 - 64, num_dimensions=6,
        topology="fm3_series", param_mins=(0.0,) * 6,
        param_maxs=(3520.0, 8.0, 3520.0, 8.0, 3520.0, 8.0),
        audio_length_log2=log2, sample_rate=sr,
        synthesis_engine="scanless", spectrum_method="dft", pop_block=1024,
    )
    # the independent f32 scorer, per chunk
    cfg32 = base.replace(dft_dtype="float32", fused_kernel=False,
                         fused_generation=False)
    so32 = make_spectrum_ops(cfg32)
    chunk_specs = [
        target_spectrum(jnp.asarray(audio[i * n:(i + 1) * n], jnp.float32),
                        so32)
        for i in range(n_chunks)
    ]
    energies = [float(np.sum(np.asarray(s, np.float64) ** 2))
                for s in chunk_specs]

    def rescore(genes, i):
        f = float(evaluate(jnp.asarray(genes, jnp.float32)[None],
                           chunk_specs[i], so32, cfg32)[0])
        return f, float(np.sqrt(max(f, 0.0) / energies[i]))

    out = {"meta": dict(
        wav=args.wav, chunks=n_chunks, chunk_samples=n, gens=args.gens,
        pop=base.population_size, scoring="f32/jnp.sin rescore per chunk",
    )}

    # truth floor: the known voice params against the WAV chunk (captures
    # normalisation + 24-bit + oracle-vs-scanless residuals)
    from pmfm_tpu.ops import synthesize
    from pmfm_tpu.ops.spectral import magnitude_spectrum

    floor = []
    for i in range(n_chunks):
        p = jnp.asarray(VOICES[i % len(VOICES)], jnp.float32)
        sa = synthesize(p[None], n, "fm3_series", engine="scanless",
                        sample_rate=sr)
        s = np.asarray(magnitude_spectrum(sa, so32)[0], np.float64)
        t = np.asarray(chunk_specs[i], np.float64)
        # the WAV chunk is PEAK-NORMALISED per voice, and magnitude spectra
        # are linear in the output amplitude (reachable via the last gene),
        # so the floor is the SCALE-OPTIMAL residual min_a ||a*s - t||^2
        a = float(s @ t / max(s @ s, 1e-30))
        res = float(np.sum((a * s - t) ** 2))
        floor.append(dict(scale=a, fitness=res,
                          rel=float(np.sqrt(res / energies[i]))))
    out["truth_floor"] = floor
    print("truth floor rel per chunk:",
          [round(c["rel"], 4) for c in floor], flush=True)

    results = {}
    for name, over in ENGINES.items():
        cfg = base.replace(**over)
        t0 = time.time()
        res = match_audio(np.asarray(audio, np.float32), cfg, key=0,
                          num_generations=args.gens)
        dt = time.time() - t0
        rows = []
        for i, c in enumerate(res.chunks):
            f, r = rescore(c.best_params_norm, i)
            rows.append(dict(chunk=i, fitness=f, rel=r))
        med = float(np.median([r["rel"] for r in rows]))
        results[name] = dict(chunks=rows, median_rel=med,
                             wall_seconds=round(dt, 1))
        print(f"{name:18s} chunk-mode median rel {med:.4f} "
              f"rels {[round(r['rel'], 3) for r in rows]} ({dt:.0f}s)",
              flush=True)
    out["chunk_mode"] = results

    # STFT mode: one run scored over all frames. pop_block 512: at n=2048
    # with 8 frames the fused kernel's unrolled per-frame fit epilogue
    # needs (K, PB) f32 temporaries — PB=1024 measured 24.3 MB scoped VMEM
    # (the gate now rejects it); PB=512 fits. The rescorer must be the
    # MULTI-FRAME f32 evaluator: a candidate's frame i is the i-th segment
    # of its continuous F*N-sample render, not a fresh phase-zero render.
    from pmfm_tpu.ops.spectral import target_spectrum_frames

    cfg32f = cfg32.replace(num_frames=n_chunks, pop_block=512)
    so32f = make_spectrum_ops(cfg32f)

    def rescore_stft(genes, target_f32):
        tframes = target_spectrum_frames(jnp.asarray(target_f32), so32f)
        f = float(evaluate(jnp.asarray(genes, jnp.float32)[None], tframes,
                           so32f, cfg32f)[0])
        e = float(np.sum(np.asarray(tframes, np.float64) ** 2))
        return f, float(np.sqrt(max(f, 0.0) / e))

    stft = {}
    for name, over in ENGINES.items():
        cfg = base.replace(pop_block=512, **over)
        t0 = time.time()
        res = match_audio_stft(np.asarray(audio, np.float32), cfg, key=0,
                               num_generations=args.gens)
        dt = time.time() - t0
        tot, rel = rescore_stft(res.chunks[0].best_params_norm,
                                audio[: n_chunks * n])
        stft[name] = dict(total_f32_fitness=tot, rel=rel,
                          wall_seconds=round(dt, 1))
        print(f"{name:18s} stft-mode rel {rel:.4f} ({dt:.0f}s)", flush=True)
    out["stft_mode"] = stft

    # STFT mode, MATCHED use-case: one sustained voice across all frames
    # (the mode exists for long targets of a single evolving source; the
    # block above scores it against input.wav's 8 DIFFERENT voices, where
    # ~75% residual is the best single-parameter compromise, not an engine
    # property). MODEL-SCALE target, deliberately NOT peak-normalised: in
    # the reference parameterisation the last gene is BOTH the output
    # amplitude factor and the output operator's base frequency
    # (Evolutionary_Strategy.hpp:403-448: ms[2]=p4*p5 AND cs[1]=p5), so a
    # loudness-normalised target cannot be matched coherently over many
    # frames — rescaling the amplitude necessarily moves a sub-audio
    # frequency, which decoheres the late frames (~0.37 cycles by frame 8;
    # the amp-rescaled TRUTH itself rescores at 95% relative error).
    # Chunk mode tolerates the coupling (46 ms windows); long-window STFT
    # matching of normalised recordings would need a loudness-invariant
    # fitness — a documented model-family limitation, not an engine bug.
    from pmfm_tpu.ops import synthesize_single

    sus = np.asarray(synthesize_single(
        jnp.asarray(VOICES[0], jnp.float32), n_chunks * n, "fm3_series",
        sample_rate=sr, engine="scanless",
    )).astype(np.float32)
    # sanity anchor: the truth genes under the multi-frame scorer (same
    # construction as the target -> ~0; recorded so the artifact carries
    # its own scoring-correctness proof)
    mins = np.asarray(base.param_mins, np.float32)
    maxs = np.asarray(base.param_maxs, np.float32)
    truth_genes = (np.asarray(VOICES[0], np.float32) - mins) / (maxs - mins)
    _, truth_rel = rescore_stft(truth_genes, sus)
    print(f"stft-sustained truth anchor rel {truth_rel:.2e}", flush=True)
    stft_sus = {"truth_anchor_rel": truth_rel}
    for name, over in ENGINES.items():
        cfg = base.replace(pop_block=512, **over)
        res = match_audio_stft(sus, cfg, key=0, num_generations=args.gens)
        tot, rel = rescore_stft(res.chunks[0].best_params_norm, sus)
        stft_sus[name] = dict(total_f32_fitness=tot, rel=rel)
        print(f"{name:18s} stft-sustained rel {rel:.4f}", flush=True)
    out["stft_mode_sustained_voice"] = stft_sus

    # off-manifold recording (no truth): chunk-mode residuals per engine
    rec = nonfm_recording(n_chunks * n, sr)
    rec_specs = [
        target_spectrum(jnp.asarray(rec[i * n:(i + 1) * n]), so32)
        for i in range(n_chunks)
    ]
    rec_energy = [float(np.sum(np.asarray(s, np.float64) ** 2))
                  for s in rec_specs]
    offm = {}
    for name in ("f32", "shipped"):
        cfg = base.replace(**ENGINES[name])
        res = match_audio(rec, cfg, key=0, num_generations=args.gens)
        rows = []
        for i, c in enumerate(res.chunks):
            f = float(evaluate(
                jnp.asarray(c.best_params_norm, jnp.float32)[None],
                rec_specs[i], so32, cfg32)[0])
            rows.append(round(float(np.sqrt(max(f, 0.0) / rec_energy[i])), 4))
        offm[name] = dict(chunk_rels=rows,
                          median_rel=float(np.median(rows)))
        print(f"{name:18s} off-manifold median rel "
              f"{offm[name]['median_rel']:.4f} rels {rows}", flush=True)
    out["off_manifold"] = offm

    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
