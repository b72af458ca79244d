"""(mu+lambda)-ES stage primitives, pure-functional.

TPU-native redesign of the reference's 9-stage device pipeline (SURVEY.md
§2.2). The double-buffer "rotation" mechanism (kernels/ocl_program.cl:54,674,
rotatePopulation) disappears entirely — functional updates subsume it. The
MWC64X + CLT PRNG (kernels/ocl_program.cl:5-31) becomes counter-based
``jax.random`` (threefry), which is what a per-thread multiply-with-carry
stream was approximating. The O(P^2/WG) enumeration sort
(kernels/ocl_program.cl:664-711) becomes ``lax.top_k``: only the parent set
and the best candidate are ever consumed, so a full sort is wasted work.

State layout: only the mu parents persist between generations (values, steps,
fitness) — the full population exists transiently inside a generation. This
is semantically identical to the reference (recombine overwrites every
population slot from parent data, kernels/ocl_program.cl:73-149, so the
non-parent slots never carry information across generations) and shrinks the
inter-generation state to O(mu * D).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import spectral, synthesis
from .config import ESConfig

INITIAL_STEP = 0.1  # initPopulation: step = 0.1 (kernels/ocl_program.cl:58)


class ESState(NamedTuple):
    """Persistent inter-generation ES state (a pytree)."""

    parent_values: jax.Array  # (mu, D) in [0, 1]
    parent_steps: jax.Array  # (mu, D)
    parent_fitness: jax.Array  # (mu,)
    best_values: jax.Array  # (D,) best-ever candidate
    best_fitness: jax.Array  # () best-ever fitness
    key: jax.Array  # PRNG key
    generation: jax.Array  # () int32
    stall: jax.Array  # () int32 — generations since the best improved


def init_state(key: jax.Array, cfg: ESConfig) -> ESState:
    """Fresh random parents — initPopulation (kernels/ocl_program.cl:46-66):
    values ~ |uniform|, steps = 0.1, fitness unknown (+inf so any evaluated
    candidate replaces them)."""
    key, sub = jax.random.split(key)
    mu, d = cfg.num_parents, cfg.num_dimensions
    values = jax.random.uniform(sub, (mu, d), jnp.float32)
    return ESState(
        parent_values=values,
        parent_steps=jnp.full((mu, d), INITIAL_STEP, jnp.float32),
        parent_fitness=jnp.full((mu,), jnp.inf, jnp.float32),
        best_values=values[0],
        best_fitness=jnp.asarray(jnp.inf, jnp.float32),
        key=key,
        generation=jnp.asarray(0, jnp.int32),
        stall=jnp.asarray(0, jnp.int32),
    )


# --------------------------------------------------------------------------
# Recombination
# --------------------------------------------------------------------------

def _compat_shuffle_index(pop: int, dims: int, wg_size: int, num_parents: int) -> np.ndarray:
    """Precompute the reference's deterministic workgroup shuffle as one flat
    gather index (host-side; it is a fixed permutation of parent gene slots).

    Reproduces recombinePopulation (kernels/ocl_program.cl:73-149): offspring
    workgroup ``g`` aliases parent block ``g % NUM_WGS_FOR_PARENTS``; within
    the block, flat gene ``j`` of lane ``l`` moves to
    ``(l*D + shift) % (WG*D)`` with ``shift = D * (i * (g+1))`` for dimension
    counter ``i``. Kept only as a parity/ablation mode — its documented
    limitation (mixing restricted to one workgroup's parent slice,
    kernels/ocl_program.cl:126-129) is exactly what the default "gather" mode
    fixes.
    """
    # the reference computes NUM_WGS_FOR_PARENTS = numParents/wgSize and takes
    # g % it — zero (UB) for its own default 16 parents @ wg 32
    # (Evolutionary_Strategy_OpenCL.hpp:115, SURVEY.md §7.4); we shrink the
    # workgroup to mu instead so the aliasing is always well-defined
    wg_size = min(wg_size, num_parents)
    if pop % wg_size or num_parents % wg_size:
        raise ValueError(
            f"compat_shuffle needs wg_size|pop and wg_size|num_parents, "
            f"got wg={wg_size}, pop={pop}, mu={num_parents}"
        )
    num_wgs_for_parents = max(num_parents // wg_size, 1)
    block = wg_size * dims
    src = np.empty(pop * dims, np.int64)
    for g in range(pop // wg_size):
        g_mod = g % num_wgs_for_parents
        base_src = g_mod * block  # parent block this group reads
        base_dst = g * block
        # invert the scatter: dst[new_idx] = src[start_idx]
        for lane in range(wg_size):
            start = lane * dims
            for i in range(dims):
                shift = dims * (i * (g + 1))
                new_idx = (start + i + shift) % block
                src[base_dst + new_idx] = base_src + start + i
    return src


def recombine(
    key: jax.Array,
    parent_values: jax.Array,
    parent_steps: jax.Array,
    cfg: ESConfig,
) -> tuple[jax.Array, jax.Array]:
    """Discrete recombination: population of ``P`` offspring whose genes are
    drawn per-(individual, dimension) from a uniformly random parent.

    This is the intended semantics of recombinePopulation — the reference
    CPU path already does random-parent gene copy
    (Evolutionary_Strategy_CPU.hpp:119-138) and the OpenCL kernel's
    deterministic shuffle is documented in-source as a limitation
    (kernels/ocl_program.cl:126-129). ``compat_shuffle`` reproduces the
    OpenCL behaviour for parity runs.
    """
    pop, d = cfg.population_size, cfg.num_dimensions
    if cfg.recombine_mode == "gather":
        mu = parent_values.shape[0]
        idx = jax.random.randint(key, (pop, d), 0, mu)
        # TPU gathers serialize; a one-hot contraction on the MXU is ~10x
        # faster at pop 2^15 (one-hot stays f32 so parent genes are copied
        # exactly). Both (values, steps) ride one one-hot tensor.
        oh = jax.nn.one_hot(idx, mu, dtype=jnp.float32)  # (pop, d, mu)
        parents = jnp.stack([parent_values, parent_steps], axis=-1)  # (mu, d, 2)
        out = jnp.einsum(
            "pdm,mdk->pdk", oh, parents, precision=jax.lax.Precision.HIGHEST
        )
        return out[..., 0], out[..., 1]
    if cfg.recombine_mode == "compat_shuffle":
        # source indices only ever address the parent slice (group aliasing
        # g % NUM_WGS_FOR_PARENTS keeps base_src < mu*D), so gather straight
        # from the flattened parents
        flat_idx = jnp.asarray(
            _compat_shuffle_index(pop, d, cfg.workgroup_size, cfg.num_parents)
        )
        flat_v = parent_values.reshape(-1)
        flat_s = parent_steps.reshape(-1)
        return flat_v[flat_idx].reshape(pop, d), flat_s[flat_idx].reshape(pop, d)
    # "off": population = parents tiled (ablation)
    reps = -(-pop // parent_values.shape[0])
    return (
        jnp.tile(parent_values, (reps, 1))[:pop],
        jnp.tile(parent_steps, (reps, 1))[:pop],
    )


# --------------------------------------------------------------------------
# Mutation
# --------------------------------------------------------------------------

def _gauss(key: jax.Array, shape, mode: str) -> jax.Array:
    """The reference's "gaussian": mean of 12 uniforms in [-1, 1]
    (kernels/ocl_program.cl:21-31) — i.e. sigma = 1/6, NOT unit variance.
    ``normal`` draws N(0, 1/6) directly (statistically equivalent bulk, 12x
    fewer random bits); ``normal_unit`` draws N(0, 1) (canonical Schwefel);
    the ``*_neutral`` variants differ only in the Es offset (config.py)."""
    if mode in ("clt12", "clt12_neutral"):
        u = jax.random.uniform(key, (*shape, 12), jnp.float32, -1.0, 1.0)
        return jnp.sum(u, axis=-1) / 12.0
    sigma = 1.0 if mode == "normal_unit" else 1.0 / 6.0
    return jax.random.normal(key, shape, jnp.float32) * sigma


def mutate(
    key: jax.Array,
    values: jax.Array,
    steps: jax.Array,
    cfg: ESConfig,
) -> tuple[jax.Array, jax.Array]:
    """Canonical log-normal self-adaptive mutation — mutatePopulation
    (kernels/ocl_program.cl:155-190):

      Ek   = coin ? alpha : 1/alpha                  (per gene)
      x'   = x + Ek * s * g,  g ~ gauss
      out-of-[0,1] retry once with g := -0.5 * g
      Es   = exp(|g| - sqrt(2/pi))
      s'   = s * Ek^beta * Es^betaScale
    """
    k_coin, k_gauss = jax.random.split(key)
    coin = jax.random.bernoulli(k_coin, 0.5, values.shape)
    ek = jnp.where(coin, cfg.alpha, cfg.one_over_alpha).astype(jnp.float32)
    g = _gauss(k_gauss, values.shape, cfg.mutation_noise)

    new_x = values + ek * steps * g
    out = (new_x < 0.0) | (new_x > 1.0)
    g = jnp.where(out, g * -0.5, g)
    new_x = jnp.where(out, values + ek * steps * g, new_x)
    if cfg.clamp_values:
        # CPU ground truth clamps (Evolutionary_Strategy_CPU.hpp:166-169);
        # the OpenCL kernel leaves the retried value unclamped.
        new_x = jnp.clip(new_x, 0.0, 1.0)

    es = jnp.exp(jnp.abs(g) - cfg.root_two_over_pi)
    new_steps = steps * (ek ** cfg.beta) * (es ** cfg.beta_scale)
    if cfg.min_step > 0.0:
        # step floor: keeps exploration alive indefinitely (the reference's
        # steps decay to ~0 and freeze the search; capability upgrade)
        new_steps = jnp.maximum(new_steps, cfg.min_step)
    return new_x, new_steps


# --------------------------------------------------------------------------
# Evaluation & selection
# --------------------------------------------------------------------------

def _fused_ok(cfg: ESConfig, spectrum_ops: spectral.SpectrumOps) -> bool:
    """Whether the Pallas fused synth+DFT+fitness kernel applies."""
    from ..kernels.synth_fitness import TIME_BLOCK

    return (
        (cfg.fused_kernel or cfg.fused_generation)
        and cfg.spectrum_method == "dft"
        and spectrum_ops.dft_cos is not None
        # the folded DFT (both engines) pairs time blocks (n <-> N-n), so
        # frames need an even block count; n=128 falls back to the XLA path
        and cfg.n_samples % (2 * TIME_BLOCK) == 0
        and spectrum_ops.dft_packed is not None
        and spectrum_ops.num_bins % 128 == 0
        and _final_pop_block_ok(cfg)
        and _fused_vmem_ok(cfg, spectrum_ops)
    )


def _fused_vmem_bytes(cfg: ESConfig, spectrum_ops: spectral.SpectrumOps) -> int:
    """The fused kernels' VMEM-resident footprint estimate."""
    n, k = cfg.n_samples, spectrum_ops.num_bins
    from ..kernels.synth_fitness import f32_pop_block, resolve_pop_block

    pop = cfg.population_size
    # element bytes of the folded operand AND audio scratch: 1 int8 / 2 bf16
    # / 4 true-f32 (the operand dtype IS the engine selector — kernels infer
    # audio_f32 from dft_packed.dtype; f32 additionally caps the pop block,
    # synth_fitness.F32_MAX_POP_BLOCK)
    eb = spectrum_ops.dft_packed.dtype.itemsize
    if eb == 4:
        pb = f32_pop_block(pop, cfg.pop_block, cfg.topology)
    else:
        pb = resolve_pop_block(pop, cfg.pop_block)
    dft_bytes = 2 * k * (n // 2) * eb  # folded operand
    scratch_bytes = 2 * (n // 2) * pb * eb  # a+ / a-
    vr = -(-cfg.num_dimensions // 8) * 8  # offspring rows, sublane-padded
    # Per-array residency matching kernels/generation.py's actual specs:
    # fitness output rides a FULL index map (4*pop); the (VR, P) offspring
    # outputs are BLOCKED (VR, PB) per program (double-buffered, pop-
    # independent — counting them at 8*D*pop here silently degraded
    # pop 2^18 to the XLA path at 2.8x the cost, round-4 bisect probes);
    # parent operands bind whole at mu scale; plus params/target blocks
    # and fixed headroom.
    other = (
        4 * (cfg.num_dimensions * pb + k * cfg.num_frames + pop)
        + 8 * cfg.num_dimensions * cfg.num_parents
        + 2 * (8 * vr * pb + 4 * pb)
        + (1 << 20)
    )
    # multi-frame STFT fitness unrolls the per-frame DFT+epilogue inside
    # the kernel and Mosaic keeps several (K, PB) f32 epilogue temporaries
    # live across the unrolled frames: measured 24.32 MB scoped (vs the
    # 16 MB limit) at int8 n=2048/K=1024/PB=1024/F=8 where the F=1 terms
    # above say ~5 MB. Charge ~3 such temporaries when F > 1 — calibrated
    # to reject that shape while keeping the known-good F=8 n=1024 and
    # every single-frame config unchanged.
    if cfg.num_frames > 1:
        other += 3 * k * pb * 4
    return dft_bytes + scratch_bytes + other


def _fused_vmem_ok(cfg: ESConfig, spectrum_ops: spectral.SpectrumOps) -> bool:
    """Whether the kernel's VMEM-resident buffers fit the ~16 MB scoped
    budget (large frames fall back to the XLA engines instead of failing at
    compile — e.g. bf16 n=4096's (2K, N) operand alone is 32 MB)."""
    return _fused_vmem_bytes(cfg, spectrum_ops) <= 12 * (1 << 20)


def _synth_fold_ok(cfg: ESConfig, spectrum_ops: spectral.SpectrumOps) -> bool:
    """Whether the large-frame hybrid applies (kernels/synth_fold.py):
    Pallas synthesis+fold with the DFT left to XLA. Used when the fully
    fused kernel is VMEM-gated off — the kernel's only VMEM tenants are the
    two (N/2, PB) folded-audio output blocks (PB auto-shrinks), so it holds
    to much larger n. Single-frame only (the chunk IS the frame there)."""
    from ..kernels.synth_fold import fold_pop_block
    from ..kernels.synth_fitness import TIME_BLOCK

    if not (
        (cfg.fused_kernel or cfg.fused_generation)
        and cfg.spectrum_method == "dft"
        and spectrum_ops.dft_packed is not None
        and cfg.num_frames == 1
        and cfg.n_samples % (2 * TIME_BLOCK) == 0
        # above kernels/synth_fold.LOOPED_ABOVE_N the kernel switches its
        # time loop to an in-kernel fori_loop (compile time flat in n,
        # where the unrolled body took >10 min at n=16384); the top of the
        # hybrid's range is spectral.DFT_MAX_MATERIALIZE_N (16384 since
        # round 5: the streamed+factored engine measured faster at 32768,
        # 120.3 vs 139.8 ms/gen, so dft_packed is None there and this
        # gate turns off through the method resolution)
        and cfg.n_samples <= 32768
    ):
        return False
    from ..kernels.synth_fold import fold_vmem_ok

    int8_mode = spectrum_ops.dft_packed_scale > 0.0
    pb = fold_pop_block(
        cfg.population_size, cfg.pop_block, cfg.n_samples, int8_mode
    )
    return (pb % 128 == 0 or pb == cfg.population_size) and fold_vmem_ok(
        cfg.population_size, cfg.pop_block, cfg.n_samples, int8_mode
    )


def _synth_stream_ok(cfg: ESConfig, spectrum_ops: spectral.SpectrumOps) -> bool:
    """Whether the huge-frame hybrid applies (kernels/synth_stream.py):
    streamed Pallas synthesis+window feeding the four-step factored DFT.
    Covers the n > 32768 range where synth_fold's (N/2, PB) fold blocks
    exceed scoped VMEM: the streamed kernel's VMEM tenants are one
    (TC, PB) time-chunk block (TC = 1024 samples), so it holds at any n
    the factored spectrum accepts."""
    from ..kernels.synth_fitness import TIME_BLOCK

    return (
        (cfg.fused_kernel or cfg.fused_generation)
        and spectrum_ops.method == "dft_factored"
        and spectrum_ops.factored is not None
        and cfg.num_frames == 1
        and cfg.n_samples % TIME_BLOCK == 0
        and _final_pop_block_ok(cfg)
    )


def _final_pop_block_ok(cfg: ESConfig) -> bool:
    """Mosaic needs the lane dim to be a multiple of 128 or the whole array:
    check the pop_block that survives the kernels' normalisation."""
    from ..kernels.synth_fitness import resolve_pop_block

    pop = cfg.population_size
    pb = resolve_pop_block(pop, cfg.pop_block)
    return pb % 128 == 0 or pb == pop


def active_engine(cfg: ESConfig, spectrum_ops: spectral.SpectrumOps) -> str:
    """Which engine actually runs for this (cfg, spectrum_ops) pair on the
    CURRENT backend — bench/report annotation (the gates auto-degrade
    silently by design, so benchmarks must label what actually ran):

      fused_generation — whole generation in one Pallas kernel (in-kernel
        PRNG; requires hardware + CLT sigma=1/6 noise, generation_step's
        extra gates)
      fused_kernel — fused Pallas evaluation (synth+DFT+fitness); the
        generation stages (recombine/mutate/select) run in XLA. This is
        also what a fused_generation config runs on CPU (interpret mode —
        the in-kernel PRNG is hardware-only) or with non-CLT noise.
      synth_fold — large-frame hybrid (Pallas synth+fold, XLA folded DFT)
      synth_stream — huge-frame hybrid (streamed Pallas synth+window,
        XLA four-step factored DFT; n > 32768)
      xla_stft — multi-frame STFT fitness on the plain XLA path
      xla_folded_dft — XLA synthesis + folded bf16/int8-family DFT matmul
      xla_dft / xla_rfft — plain XLA spectrum paths
    """
    if _fused_ok(cfg, spectrum_ops):
        if (
            cfg.fused_generation
            and cfg.gauss_sigma == 1.0 / 6.0
            and jax.default_backend() != "cpu"
        ):
            return "fused_generation"
        return "fused_kernel"
    if _synth_fold_ok(cfg, spectrum_ops):
        return "synth_fold"
    if _synth_stream_ok(cfg, spectrum_ops):
        return "synth_stream"
    if cfg.num_frames > 1:
        return "xla_stft"
    if (
        cfg.spectrum_method == "dft"
        and spectrum_ops.dft_packed is not None
        and cfg.dft_dtype in ("bfloat16", "int8")
    ):
        return "xla_folded_dft"
    return f"xla_{spectrum_ops.method}"


def evaluate(
    values: jax.Array,
    target_spectrum: jax.Array,
    spectrum_ops: spectral.SpectrumOps,
    cfg: ESConfig,
) -> jax.Array:
    """Stages 4-7 fused: scale -> synthesise -> window+FFT+magnitude -> L2.

    Replaces synthesisePopulation{,DoubleSeries,TripleParallel} +
    applyWindowPopulation + clFFT + fitnessPopulation
    (kernels/ocl_program.cl:280-659) with one XLA computation.
    """
    mins = jnp.asarray(cfg.param_mins, jnp.float32)
    maxs = jnp.asarray(cfg.param_maxs, jnp.float32)
    scaled = synthesis.scale_params(values, mins, maxs)
    if _fused_ok(cfg, spectrum_ops):
        import jax as _jax

        from ..kernels.synth_fitness import TIME_BLOCK, fused_synth_fitness

        from ..kernels.synth_fitness import resolve_pop_block

        pb = resolve_pop_block(cfg.population_size, cfg.pop_block)
        return fused_synth_fitness(
            scaled,
            spectrum_ops.dft_cos,
            spectrum_ops.dft_sin,
            target_spectrum,
            topology=cfg.topology,
            n=cfg.n_samples,
            wavetable_size=cfg.wavetable_size,
            sample_rate=cfg.sample_rate,
            pop_block=pb,
            interpret=_jax.default_backend() == "cpu",
            num_frames=cfg.num_frames,
            dft_packed=spectrum_ops.dft_packed,
            dft_scale=spectrum_ops.dft_packed_scale,
            sine_order=cfg.sine_order,
        )
    if _synth_fold_ok(cfg, spectrum_ops):
        # large-frame hybrid: Pallas synthesis+fold (audio never exists
        # unfolded in HBM), XLA spectrum matmul + fitness — ~10x the pure
        # XLA path at n=8192 (kernels/synth_fold.py; VERDICT r1 missing #2)
        import jax as _jax

        from ..kernels.synth_fold import fused_synth_fold

        ap, am, edge, ms = fused_synth_fold(
            scaled,
            topology=cfg.topology,
            n=cfg.n_samples,
            wavetable_size=cfg.wavetable_size,
            sample_rate=cfg.sample_rate,
            pop_block=cfg.pop_block,
            interpret=_jax.default_backend() == "cpu",
            dft_scale=spectrum_ops.dft_packed_scale,
            sine_order=cfg.sine_order,
        )
        spectra = spectral.magnitude_spectrum_prefolded(
            ap, am, edge, ms, spectrum_ops
        )
        return spectral.spectral_fitness(spectra, target_spectrum)
    if _synth_stream_ok(cfg, spectrum_ops):
        # huge-frame hybrid (n > 32768): streamed Pallas synthesis+window
        # (phase carries ride scratch across the time-chunk grid axis; the
        # only HBM traffic is the windowed bf16/f32 audio itself), then the
        # four-step factored matmul DFT in XLA (kernels/synth_stream.py)
        import jax as _jax

        from ..kernels.synth_stream import fused_synth_stream

        audio_w = fused_synth_stream(
            scaled,
            spectrum_ops.window,
            topology=cfg.topology,
            n=cfg.n_samples,
            wavetable_size=cfg.wavetable_size,
            sample_rate=cfg.sample_rate,
            pop_block=cfg.pop_block,
            interpret=_jax.default_backend() == "cpu",
            sine_order=cfg.sine_order,
            # the true-f32 engine keeps f32 emission + HIGHEST matmuls;
            # bf16 AND int8 configs stream bf16 (the factored DFT has no
            # int8 operand — documented degradation, ops/spectral.py)
            audio_f32=spectrum_ops.dft_dtype == jnp.float32,
        )
        spectra = spectral.magnitude_spectrum_factored(
            audio_w, spectrum_ops, prewindowed=True
        )
        return spectral.spectral_fitness(spectra, target_spectrum)
    audio = synthesis.synthesize(
        scaled,
        cfg.n_samples * cfg.num_frames,
        cfg.topology,
        wavetable_size=cfg.wavetable_size,
        sample_rate=cfg.sample_rate,
        osc_mode=cfg.osc_mode,
        unroll=cfg.scan_unroll,
        engine=cfg.synthesis_engine,
        # when the spectrum matmul runs reduced-precision, emit bf16 audio
        # directly (halves the HBM traffic of the pipeline's largest array;
        # the int8 config falls back to bf16 on this non-fused path)
        out_dtype=jnp.bfloat16
        if cfg.dft_dtype in ("bfloat16", "int8")
        else jnp.float32,
    )
    if cfg.num_frames > 1:
        # multi-frame STFT fitness: target_spectrum is (frames, bins)
        return spectral.stft_fitness(audio, target_spectrum, spectrum_ops)
    if (
        cfg.spectrum_method == "dft"
        and spectrum_ops.dft_packed is not None
        and cfg.dft_dtype in ("bfloat16", "int8")
    ):
        # large-frame engine: the fused kernel is VMEM-gated off here, but
        # the FOLD + int8 quantisation still apply in pure XLA, where the
        # dominant (2K, N/2) matmul is tiled natively with no VMEM budget
        # (spectral.magnitude_spectrum_folded; VERDICT r1 missing #2)
        spectra = spectral.magnitude_spectrum_folded(audio, spectrum_ops)
        return spectral.spectral_fitness(spectra, target_spectrum)
    return spectral.evaluate_fitness(audio, target_spectrum, spectrum_ops)


def select(
    values: jax.Array, steps: jax.Array, fitness: jax.Array, mu: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Truncation selection via top-k — replaces sortPopulation's full
    enumeration sort (kernels/ocl_program.cl:664-711): only the mu survivors
    are needed. Returns parents sorted best-first (rank order preserved)."""
    neg_fit, idx = jax.lax.top_k(-fitness, mu)
    return values[idx], steps[idx], -neg_fit


def select_t(
    values_t: jax.Array,  # (VR, P) — transposed, row-padded (kernel layout)
    steps_t: jax.Array,
    fitness: jax.Array,  # (P,)
    mu: int,
    d: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """``select`` on the fused-generation kernel's native TRANSPOSED padded
    offspring layout (kernels/generation.py): slice the padding rows,
    transpose, row-gather the survivors.

    Hardware note (tools/tpu_gather_probe.py): gathering mu COLUMNS from
    the (VR, P) layout ("no transpose needed") costs ~0.5 ms at mu=256 and
    ~1.8 ms at mu=1024 — lane-axis gathers serialize on TPU. The full-pop
    transpose + row gather XLA emits for this formulation costs ~0.03 ms.
    """
    neg_fit, idx = jax.lax.top_k(-fitness, mu)
    return values_t[:d].T[idx], steps_t[:d].T[idx], -neg_fit
