"""Per-block pre-truncation probe (VERDICT r2 #6).

The fused-generation kernel writes the FULL (VR, P) offspring values+steps
to HBM and hands a (P,) fitness to an XLA-side top_k
(kernels/generation.py; es/strategy.select_t). Hypothesis under test: an
in-kernel per-block top-T (T = 128 of PB = 1024 — a probabilistic
superset of any block's global-top-mu members at mu = 256 over 32 blocks;
128 is the Mosaic lane-tile floor) shrinks both the HBM offspring writes
and the top_k input 8x.

Prior model (docs/KERNELS.md) predicts ~null: the select stage is only
~0.06 ms and HBM write bandwidth for 2 MB is ~us-scale, while the
in-kernel rank (the mega-kernel's _merge_topmu machinery, reused here)
costs VPU comparisons + a one-hot extraction per block — i.e. the same
work that makes the whole-run kernel's in-kernel merge a net loss against
the scan path. This probe measures the delta either way (reference
anchor: the whole-residency lesson,
/root/reference/Evolutionary_Strategy_Vulkan.hpp:1127-1154).

    python tools/tpu_trunc_probe.py [--gens 200] [--trunc 128]
"""
import argparse
import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

if not jax.config.jax_compilation_cache_dir:
    from pmfm_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

from pmfm_tpu.es import ESConfig, init_state, make_spectrum_ops  # noqa: E402
from pmfm_tpu.es.pipeline import (  # noqa: E402
    fused_generation_kwargs, generation_step, kernel_seed,
)
from pmfm_tpu.es.strategy import ESState, select_t  # noqa: E402
from pmfm_tpu.kernels.evolve import _merge_topmu  # noqa: E402
from pmfm_tpu.kernels.generation import (  # noqa: E402
    _gen_kernel, _offspring_block, _round8, _scale_rows, hier_parent_operand,
    use_hier_gather,
)
from pmfm_tpu.kernels.synth_fitness import (  # noqa: E402
    TIME_BLOCK, _evaluate_block, _tri_strict, resolve_pop_block,
)
from pmfm_tpu.utils import device_sync  # noqa: E402


def _trunc_kernel(
    seed_ref, pv_ref, ps_ref, dft_ref, target_ref, tri_ref,
    fitness_ref,  # (G, T) f32 out — truncated fitness per block
    values_ref,  # (VR, T) f32 out block — block's top-T offspring values
    steps_ref,  # (VR, T) f32 out block
    *scratches,
    mu: int, d: int, alpha: float, beta: float, beta_scale: float,
    root_two_over_pi: float, clamp_values: bool, min_step: float,
    hier: bool, vr: int, trunc: int, **statics,
):
    """_gen_kernel + an in-block exact top-`trunc` (rank + one-hot matmul,
    the _merge_topmu mechanism on a (D+D+1, PB) stack with an empty pool)."""
    pb = statics["pb"]
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0, 0] + i * 0x1E3779B9)
    new_x, new_s = _offspring_block(
        pv_ref[:], ps_ref[:], mu=mu, d=d, pb=pb, alpha=alpha, beta=beta,
        beta_scale=beta_scale, root_two_over_pi=root_two_over_pi,
        clamp_values=clamp_values, min_step=min_step, hier=hier,
    )
    mins = statics.pop("mins")
    maxs = statics.pop("maxs")
    p_scaled = _scale_rows(new_x, mins, maxs, d)
    fit = _evaluate_block(
        p_scaled, dft_ref, target_ref, tri_ref[:], *scratches, **statics
    )  # (1, PB)
    stack = jnp.concatenate([new_x, new_s, fit], axis=0)  # (2D+1, PB)
    # exact top-T of the block: _merge_topmu ranks the UNION of its two
    # arguments, so splitting the stack feeds it all PB candidates without
    # a zero-width pool operand
    top = _merge_topmu(stack[:, :trunc], stack[:, trunc:], trunc)
    pad = jnp.zeros((vr - d, trunc), jnp.float32)
    values_ref[:] = jnp.concatenate([top[:d], pad], axis=0)
    steps_ref[:] = jnp.concatenate([top[d : 2 * d], pad], axis=0)
    fitness_ref[pl.ds(i, 1), :] = top[2 * d : 2 * d + 1]


@functools.partial(
    jax.jit,
    static_argnames=(
        "pop", "param_mins", "param_maxs", "topology", "n", "wavetable_size",
        "sample_rate", "pop_block", "interpret", "num_frames", "alpha",
        "beta", "beta_scale", "root_two_over_pi", "clamp_values", "min_step",
        "dft_scale", "sine_order", "trunc",
    ),
)
def fused_generation_trunc(
    seed, parent_values, parent_steps, dft_cos, dft_sin, target_spectrum,
    *, pop, param_mins, param_maxs, topology, n, wavetable_size, sample_rate,
    pop_block, interpret=False, num_frames=1, alpha=1.4, beta=0.408,
    beta_scale=1.0 / 6.0, root_two_over_pi=0.7979, clamp_values=False,
    min_step=0.0, dft_packed=None, dft_scale=0.0, sine_order=9, trunc=128,
):
    mu, d = parent_values.shape
    k = dft_cos.shape[1]
    vr = _round8(d)
    hier = use_hier_gather(mu)
    pb = resolve_pop_block(pop, pop_block)
    dft = dft_packed
    tgt = target_spectrum.astype(jnp.float32)[:, None]
    tri = jnp.asarray(_tri_strict(TIME_BLOCK))
    statics = dict(
        mu=mu, d=d, hier=hier, vr=vr, trunc=trunc, alpha=alpha, beta=beta,
        beta_scale=beta_scale, root_two_over_pi=root_two_over_pi,
        clamp_values=clamp_values, min_step=min_step, mins=param_mins,
        maxs=param_maxs, topology=topology, n=n, pb=pb, k=k, c=TIME_BLOCK,
        wts=float(wavetable_size), w2sr=wavetable_size / float(sample_rate),
        num_frames=num_frames, dft_scale=dft_scale, sine_order=sine_order,
    )
    nblk = pop // pb
    kernel = functools.partial(_trunc_kernel, **statics)
    kwargs = {}
    if interpret:
        kwargs["interpret"] = pltpu.InterpretParams(random_seed=1234)
    else:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        )
    pv_in = hier_parent_operand(parent_values) if hier else parent_values.T.astype(jnp.float32)
    ps_in = hier_parent_operand(parent_steps) if hier else parent_steps.T.astype(jnp.float32)
    full = lambda *_: (0, 0)  # noqa: E731
    sdtype = jnp.int8 if dft_scale > 0.0 else jnp.bfloat16
    off_spec = pl.BlockSpec((vr, trunc), lambda i: (0, i), memory_space=pltpu.VMEM)
    fitness, values_t, steps_t = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nblk, trunc), jnp.float32),
            jax.ShapeDtypeStruct((vr, nblk * trunc), jnp.float32),
            jax.ShapeDtypeStruct((vr, nblk * trunc), jnp.float32),
        ),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),
            pl.BlockSpec(pv_in.shape, full, memory_space=pltpu.VMEM),
            pl.BlockSpec(ps_in.shape, full, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * k, dft.shape[1]), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, num_frames), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((TIME_BLOCK + 8, TIME_BLOCK), full, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nblk, trunc), full, memory_space=pltpu.VMEM),
            off_spec,
            off_spec,
        ),
        scratch_shapes=[pltpu.VMEM((n // 2, pb), sdtype) for _ in range(2)],
        **kwargs,
    )(seed.astype(jnp.int32).reshape(1, 1), pv_in, ps_in, dft, tgt, tri)
    return fitness.reshape(nblk * trunc), values_t, steps_t


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--gens", type=int, default=200)
    ap.add_argument("--trunc", type=int, default=128,
                    help="per-block keep count; Mosaic lane tiling needs a "
                         "multiple of 128 (top-128 of 1024 = 8x reduction)")
    ap.add_argument("--pop-log2", type=int, default=15)
    ap.add_argument("--mu", type=int, default=256)
    args = ap.parse_args(argv)
    pop = 1 << args.pop_log2
    cfg = ESConfig(
        num_parents=args.mu, num_offspring=pop - args.mu, num_dimensions=6,
        topology="fm3_series", audio_length_log2=10,
        synthesis_engine="scanless", spectrum_method="dft", dft_dtype="int8",
        sine_order=7, fused_kernel=True, fused_generation=True,
        pop_block=1024,
    )
    so = make_spectrum_ops(cfg)
    tspec = jnp.ones((so.num_bins,), jnp.float32)
    kw = fused_generation_kwargs(cfg, so)

    def step_trunc(state: ESState) -> ESState:
        seed = kernel_seed(state.key, state.generation)
        fitness, values_t, steps_t = fused_generation_trunc(
            seed, state.parent_values, state.parent_steps, so.dft_cos,
            so.dft_sin, tspec, trunc=args.trunc, **kw,
        )
        pv, ps, pf = select_t(values_t, steps_t, fitness, cfg.num_parents,
                              cfg.num_dimensions)
        improved = pf[0] < state.best_fitness
        return state._replace(
            parent_values=pv, parent_steps=ps, parent_fitness=pf,
            best_values=jnp.where(improved, pv[0], state.best_values),
            best_fitness=jnp.where(improved, pf[0], state.best_fitness),
            generation=state.generation + 1,
        )

    @jax.jit
    def run_trunc(key):
        s = init_state(key, cfg)
        s = jax.lax.fori_loop(0, args.gens, lambda i, s: step_trunc(s), s)
        return s.best_fitness

    @jax.jit
    def run_base(key):
        s = init_state(key, cfg)
        s = jax.lax.fori_loop(
            0, args.gens,
            lambda i, s: generation_step(s, tspec, so, cfg), s,
        )
        return s.best_fitness

    def steady(f, reps=3):
        device_sync(f(jax.random.PRNGKey(0)))
        best = None
        for i in range(reps):
            t0 = time.perf_counter()
            device_sync(f(jax.random.PRNGKey(i)))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    tb = steady(run_base)
    tt = steady(run_trunc)
    print(f"baseline (full offspring + XLA top_k over {pop}): "
          f"{tb*1e3/args.gens:.3f} ms/gen ({pop*args.gens/tb/1e6:.1f}M evals/s)")
    print(f"pre-trunc (in-kernel top-{args.trunc}/block, top_k over "
          f"{pop // cfg.pop_block * args.trunc}): "
          f"{tt*1e3/args.gens:.3f} ms/gen ({pop*args.gens/tt/1e6:.1f}M evals/s)")
    print(f"delta: {100*(tb-tt)/tb:+.1f}% (positive = pre-trunc wins)")
    # sanity: converged-quality equivalence at a quick glance
    bf_b = float(device_sync(run_base(jax.random.PRNGKey(42))))
    bf_t = float(device_sync(run_trunc(jax.random.PRNGKey(42))))
    print(f"best fitness after {args.gens} gens: base={bf_b:.1f} trunc={bf_t:.1f} "
          f"(different PRNG streams — magnitudes should match)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
