"""Decompose the fused-generation kernel's offspring-prologue cost on
hardware: gather mode (flat one-hot vs hierarchical two-stage), offspring
output blocking (per-program blocks vs full-array VMEM), and the XLA-side
selection flavour (none / select_t lane-gather / transpose + row-gather).

Parents are FIXED across the scan (seed varies by iteration, so nothing
hoists) — this times the kernel + selection only, without state-update ops.

Usage: python tools/tpu_gather_probe.py [stage]   # stage 1|2 to split runs
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from pmfm_tpu.es import ESConfig, make_spectrum_ops
from pmfm_tpu.es.strategy import select, select_t
from pmfm_tpu.kernels.generation import fused_generation

POP = 1 << 15
GENS = 200
D = 6

cfg0 = ESConfig(
    num_parents=256, num_offspring=POP - 256, num_dimensions=D,
    topology="fm3_series", audio_length_log2=10,
    synthesis_engine="scanless", spectrum_method="dft", dft_dtype="int8",
    fused_kernel=True, fused_generation=True, sine_order=7, pop_block=1024,
)
so = make_spectrum_ops(cfg0)
tgt = jnp.ones((so.num_bins,), jnp.float32)


def build(mu, gather_mode, blocked_out, select_mode):
    key = jax.random.PRNGKey(mu)
    pv = jax.random.uniform(key, (mu, D))
    ps = jnp.full((mu, D), 0.1)

    @jax.jit
    def run():
        def body(acc, i):
            fit, vt, st = fused_generation(
                i, pv, ps, so.dft_cos, so.dft_sin, tgt,
                pop=POP, param_mins=cfg0.param_mins,
                param_maxs=cfg0.param_maxs, topology=cfg0.topology,
                n=cfg0.n_samples, pop_block=1024,
                dft_packed=so.dft_packed, dft_scale=so.dft_packed_scale,
                sine_order=7, gather_mode=gather_mode,
                blocked_out=blocked_out,
            )
            if select_mode == "select_t":
                pvv, pss, pf = select_t(vt, st, fit, mu, D)
                dep = pf[0] + pvv[0, 0] + pss[0, 0]
            elif select_mode == "transpose":
                pvv, pss, pf = select(vt[:D].T, st[:D].T, fit, mu)
                dep = pf[0] + pvv[0, 0] + pss[0, 0]
            else:
                dep = fit[0] + vt[0, 0] + st[0, 0]
            return acc + dep * 1e-30, None

        acc, _ = jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(GENS, dtype=jnp.int32)
        )
        return acc

    return run


CASES = [
    # stage 1: isolate gather mode x output blocking (no selection)
    (256, "flat", False, "none"),
    (256, "flat", True, "none"),
    (256, "auto", True, "none"),
    (256, "auto", False, "none"),
    (1024, "flat", False, "none"),
    (1024, "auto", True, "none"),
    # stage 2: selection flavours on the best kernel configs
    (256, "flat", False, "transpose"),
    (256, "flat", False, "select_t"),
    (256, "flat", True, "select_t"),
    (1024, "flat", False, "transpose"),
    (1024, "flat", False, "select_t"),
    (1024, "auto", True, "select_t"),
]
stage = int(sys.argv[1]) if len(sys.argv) > 1 else 0
if stage == 1:
    CASES = CASES[:6]
elif stage == 2:
    CASES = CASES[6:]

print(f"backend={jax.default_backend()} pop=2^15 gens={GENS}", flush=True)
for mu, gm, bo, sel in CASES:
    run = build(mu, gm, bo, sel)
    print(f"compiling mu={mu} gather={gm} blocked={bo} select={sel} ...", flush=True)
    float(np.asarray(run()))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(run()))
        best = min(best, (time.time() - t0) / GENS * 1e3)
    print(f"mu={mu:5d} gather={gm:4s} blocked={int(bo)} select={sel:9s} "
          f"{best:7.4f} ms/gen", flush=True)
