"""Identifiability diagnostics for deep serial chains (fm{k}_series, k>=4).

Round-5 measurements that shaped the series-gate acceptance line
(benchmarks/series_chaos.json; run on the real chip, ~2 min):

1. NEEDLE BASIN — relative spectral error at truth + gene noise, for noise
   scales 1e-3 .. 2e-2: even 0.001 normalised noise (~3.5 Hz / 0.008
   index) rescores at ~50% relative error on the fm4_series gate target.
   The chain's output phase integrates deviation products of ~6 kHz
   through three levels; sub-Hz parameter changes decohere the frame
   within a few hundred samples. Consequence: gene recovery is not a
   meaningful target for deep chains (contrast fm{k}_parallel, where the
   pursuit solver recovers genes to <=1%).

2. MOAT — the truth needle is surrounded by HIGHER loss than the
   degenerate ~3% valley the staged solver finds (truth+0.02 rescored at
   ~70%), so no loss-guided method (ES at any step size, Adam on the
   exact JAX gradient — both measured) can be attracted into it from
   outside. A wide-step ES polish descends INTO the needle only when
   seeded inside its ~0.02 shell (rel 0.70 -> 0.004 measured), which no
   spectrum-driven search reaches.

3. ENGINE-PARITY FLOOR — the scan (wavetable-floor, reference-parity)
   and scanless (jnp.sin) engines render the SAME truth genes ~7.7%
   apart in relative spectral terms on fm4_series (the same chaos,
   applied to the table-truncation difference). fm3_series and the
   parallel families sit far below this (their gates are unaffected).

Together: the fm4/fm5_series gate line is <=4-5%% relative spectral
error via the staged homotopy solver (tools/pursuit_study.py artifacts),
with the direct ES measured at 12-26%% — the solver reaches the
degenerate-valley floor, and the floor itself is a property of the
model family's chaotic parameterisation, not of the engines.

Usage: JAX_COMPILATION_CACHE_DIR=.jax_tpu_cache timeout 590 \
    python tools/series_chaos_probe.py [--topology fm4_series] \
    [--json benchmarks/series_chaos.json]
"""
import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

if not jax.config.jax_compilation_cache_dir:
    from pmfm_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

from pmfm_tpu.es import ESConfig, make_spectrum_ops  # noqa: E402
from pmfm_tpu.es.staged import _polish_runner  # noqa: E402
from pmfm_tpu.es.strategy import evaluate  # noqa: E402
from pmfm_tpu.models import get_topology  # noqa: E402
from pmfm_tpu.ops import synthesize_single  # noqa: E402
from pmfm_tpu.ops.spectral import target_spectrum  # noqa: E402
from pmfm_tpu.ops.synthesis import scale_params  # noqa: E402
from tools.convergence_check import TRUE_GENES_BY_TOPOLOGY  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--topology", default="fm4_series")
    ap.add_argument("--json", default="benchmarks/series_chaos.json")
    ap.add_argument("--draws", type=int, default=5)
    args = ap.parse_args(argv)

    topo = get_topology(args.topology)
    d = topo.num_dimensions
    cfg = ESConfig(
        num_parents=64, num_offspring=(1 << 13) - 64, num_dimensions=d,
        topology=args.topology, param_mins=topo.default_param_mins,
        param_maxs=topo.default_param_maxs, audio_length_log2=10,
        synthesis_engine="scanless", spectrum_method="dft", pop_block=1024,
        mutation_noise="clt12_neutral", min_step=1e-4, restart_patience=100,
        dft_dtype="float32", fused_kernel=True, fused_generation=True,
    )
    truth = np.asarray(TRUE_GENES_BY_TOPOLOGY[args.topology], np.float32)
    scaled = scale_params(
        jnp.asarray(truth)[None], jnp.asarray(cfg.param_mins),
        jnp.asarray(cfg.param_maxs),
    )[0]
    audio_sl = synthesize_single(scaled, cfg.n_samples, cfg.topology,
                                 engine="scanless")
    audio_sc = synthesize_single(scaled, cfg.n_samples, cfg.topology,
                                 engine="scan")
    ecfg = cfg.replace(fused_kernel=False, fused_generation=False)
    so = make_spectrum_ops(ecfg)
    tspec = target_spectrum(audio_sl, so)
    energy = float(np.sum(np.asarray(tspec, np.float64) ** 2))
    loss = jax.jit(lambda g: evaluate(g[None], tspec, so, ecfg)[0])

    def rel(g):
        return float(np.sqrt(max(float(loss(jnp.asarray(g))), 0.0) / energy))

    out = {"topology": args.topology, "true_genes": truth.tolist(),
           "target_energy": energy}

    # 1. needle basin
    basin = {}
    for s in (0.001, 0.002, 0.005, 0.01, 0.02):
        rels = []
        for i in range(args.draws):
            g = np.clip(truth + s * np.asarray(
                jax.random.normal(jax.random.PRNGKey(i), (d,))), 0, 1)
            rels.append(rel(g))
        basin[str(s)] = dict(median=float(np.median(rels)),
                             min=float(np.min(rels)),
                             max=float(np.max(rels)))
        print(f"truth+noise {s}: rel median {basin[str(s)]['median']:.4f} "
              f"[{basin[str(s)]['min']:.4f}, {basin[str(s)]['max']:.4f}]",
              flush=True)
    out["needle_basin_rel_at_noise"] = basin

    # 2. moat: wide-step ES polish from inside vs outside the shell
    so_p = make_spectrum_ops(cfg)
    tspec_p = target_spectrum(audio_sl, so_p)
    pol = _polish_runner(cfg, 500, 0.02, 0.01)
    g_in = np.clip(truth + 0.02 * np.asarray(
        jax.random.normal(jax.random.PRNGKey(0), (d,))), 0, 1)
    bv, _ = pol(jax.random.PRNGKey(5), jnp.asarray(g_in), tspec_p)
    in_from, in_to = rel(g_in), rel(np.asarray(bv))
    g_out = np.asarray(jax.random.uniform(jax.random.PRNGKey(100), (d,)))
    bv2, _ = pol(jax.random.PRNGKey(6), jnp.asarray(g_out), tspec_p)
    out_from, out_to = rel(g_out), rel(np.asarray(bv2))
    out["moat"] = dict(
        wide_polish_from_truth_shell=[in_from, in_to],
        wide_polish_from_random=[out_from, out_to],
    )
    print(f"wide polish from truth shell: {in_from:.4f} -> {in_to:.4f}",
          flush=True)
    print(f"wide polish from random:      {out_from:.4f} -> {out_to:.4f}",
          flush=True)

    # 3. engine-parity floor: scan-rendered truth vs the scanless target
    tspec_sc = target_spectrum(audio_sc, so)
    dspec = np.asarray(tspec_sc, np.float64) - np.asarray(tspec, np.float64)
    parity = float(np.sqrt(np.sum(dspec**2) / energy))
    out["scan_vs_scanless_truth_rel"] = parity
    print(f"scan-vs-scanless truth parity: {parity:.4f}", flush=True)

    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
