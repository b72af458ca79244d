"""Static configuration for the evolutionary strategy.

Mirrors `Evolutionary_Strategy_Arguments` + the ES hyper-constants
(Evolutionary_Strategy.hpp:579-630): alpha = 1.4, beta = sqrt(1/D),
betaScale = 1/D, rootTwoOverPi = sqrt(2/pi). The config is a frozen,
hashable dataclass so it can be a static argument to ``jax.jit``.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

from ..ops.synthesis import topology_dims
from ..ops.wavetable import DEFAULT_SAMPLE_RATE, DEFAULT_WAVETABLE_SIZE

RECOMBINE_MODES = ("gather", "compat_shuffle", "off")
# clt12/normal: reference parity — sigma=1/6 noise against the sigma=1
# constant sqrt(2/pi), which makes step adaptation contract by ~0.895x per
# generation and freezes the search after ~100 generations (a latent bug in
# the reference's gauss_rand, kernels/ocl_program.cl:21-31: it divides the
# CLT sum by 12 instead of normalising variance).
# *_neutral / normal_unit: the intended neutral-drift self-adaptation
# (E[ln Es] = 0), SURVEY.md §7.4 "implement the intended algorithm".
MUTATION_NOISE_MODES = ("clt12", "normal", "clt12_neutral", "normal_unit")


@dataclasses.dataclass(frozen=True)
class ESConfig:
    """All static knobs of the matcher.

    Defaults follow parameters.json + struct initialisers
    (Evolutionary_Strategy.hpp:579-589, SURVEY.md §5.6).
    """

    num_parents: int = 16  # mu
    num_offspring: int = 16  # lambda; population = mu + lambda (main.cpp:183)
    num_dimensions: int = 6
    topology: str = "fm3_series"
    param_mins: Tuple[float, ...] = (0.0,) * 6
    param_maxs: Tuple[float, ...] = (3520.0, 8.0, 3520.0, 8.0, 3520.0, 8.0)
    audio_length_log2: int = 11  # chunk size exponent (parameters.json:13)
    sample_rate: int = DEFAULT_SAMPLE_RATE
    wavetable_size: int = DEFAULT_WAVETABLE_SIZE

    # ES hyper-parameters (Evolutionary_Strategy.hpp:600-616)
    alpha: float = 1.4

    # engine knobs (new, TPU-native)
    fused_kernel: bool = False  # Pallas fused synth+DFT+fitness (kernels/)
    fused_generation: bool = False  # whole generation in one kernel (in-kernel PRNG)
    # ALL generations in one kernel invocation (kernels/evolve.py) — opt-in
    # ablation: pre-fold it beat the per-generation scan by ~4.5%, but the
    # folded DFT flipped that (scan wins by ~4.6%, docs/KERNELS.md); the
    # scan path additionally supports restarts, early stop and mesh sharding.
    # WIN CONDITION for keeping this path (else delete it): the mega-kernel
    # pays off iff per-generation dispatch+top_k overhead exceeds its ~4.6%
    # deficit — i.e. if a future runtime raises the per-dispatch cost above
    # ~40us (today ~1us + ~0.06ms select, tools/tpu_dispatch_probe.py), or
    # the run moves to an environment where every dispatch crosses a slow
    # host link (the axon dev-tunnel's ~25ms/run amortises away at
    # GENS>=1000 and does not qualify). Re-measure with
    # tools/tpu_mega_probe.py before flipping the bench default.
    fused_evolve: bool = False
    # fused_evolve only: generations folded into ONE grid step (the
    # per-grid-step VMEM/DMA base cost is paid once per gens_per_step
    # generations; results are bit-identical for any value —
    # tools/tpu_gpg_probe.py). Rounded down to a divisor of the run length.
    gens_per_step: int = 1
    pop_block: int = 512  # candidates per fused-kernel program
    # (A software-pipelined "lagged DFT" kernel variant was built, measured
    # 17% SLOWER — Mosaic's in-order issue forbids hand-scheduled MXU/VPU
    # overlap — and removed in round 3; analysis in docs/KERNELS.md.)
    synthesis_engine: str = "scan"  # "scan" (reference parity) | "scanless" (fast)
    osc_mode: str = "floor"  # "floor" | "exact" | "table" (scan engine only)
    spectrum_method: str = "dft"  # "dft" | "rfft"
    num_bins: int | None = None  # default N//2 (CPU ground-truth band)
    recombine_mode: str = "gather"  # "gather" | "compat_shuffle" | "off"
    mutation_noise: str = "clt12"  # "clt12" (reference CLT gaussian) | "normal"
    clamp_values: bool = False  # OpenCL leaves values unclamped after retry
    min_step: float = 0.0  # step floor (0 = reference behavior: none)
    workgroup_size: int = 32  # only used by compat_shuffle recombination
    scan_unroll: int = 8
    # "float32" | "bfloat16" | "int8". int8 applies to the fused Pallas
    # kernels (all topologies — fm{k}_parallel factors the mean |amp|
    # in-kernel): 2x MXU rate + halved VMEM footprint, exact int32
    # accumulation (ops/spectral.py); on the non-fused XLA paths it
    # degrades to bfloat16 (pipeline.make_spectrum_ops). float32 with the
    # fused flags runs the TRUE-f32 kernel (f32 operand/scratch +
    # Precision.HIGHEST dots — the refine tail's engine, round 5).
    dft_dtype: str = "float32"
    # Oscillator polynomial order in the fused kernels (9, 7 or 5; odd
    # minimax fit of sin(2*pi*w), kernels/synth_fitness._sin_turn_coeffs).
    # Measured at the int8 bench config (tools/tpu_sine_order_probe.py):
    # 9 = 2e-6 max err (below every quantisation); 7 = +3.9% throughput at
    # ~int8-noise-level ranking error (med rel 2.0e-3 vs f32, 255/256 top-mu
    # overlap); 5 = +9.7% but 1.4e-2 med rel — measurably degraded ranking.
    # XLA paths always use jnp.sin.
    sine_order: int = 9

    # Precision annealing: run the final `refine_generations` of a match
    # under the f32/jnp.sin XLA engine (fresh f32 target spectrum, best
    # rescored at the phase boundary). Motivation (round-2 quality audit,
    # benchmarks/quality_gates.json): at 64 PAIRED seeds every quantised
    # engine (even bf16) converges to a ~1.4-1.6x worse f32-rescored final
    # fitness than pure f32 — early convergence is identical
    # (generations-to-threshold match), the deficit is late-stage
    # refinement where quantised fitness can no longer rank near-equal
    # candidates. A short f32 tail recovers the refinement depth at a few
    # percent of the f32 engine's cost. 0 = off (single-engine, the
    # reference-shaped behaviour).
    #
    # Follow-up audit finding: a refine tail ALONE changes nothing
    # (measured: identical medians) because under the reference's
    # contractive clt12 dynamics the steps have decayed to ~0 long before
    # the tail starts — the population is frozen, in any precision. The
    # refine boundary therefore also RE-OPENS the steps to
    # refine_step_floor (a local f32 polish around the converged parents;
    # steps re-adapt from there). Set 0.0 to disable the re-opening.
    refine_generations: int = 0
    refine_step_floor: float = 0.01

    # Opt-in disk cache for the O(N^2) DFT operands at large frame sizes
    # (n >= spectral.OPERAND_CACHE_MIN_N): the f64 trig build costs ~2 min
    # at n=32768 per process; a cached read is ~3 s. Config key
    # "tpu.operandCacheDir". Caches are versioned
    # (spectral.OPERAND_BUILD_VERSION) and keyed by (n, bins, dtype).
    operand_cache_dir: str | None = None

    # capability upgrades over the reference (SURVEY.md §7.2 item 8)
    fitness_threshold: float = 0.0  # 0 disables early stop (dead knob in ref)
    # >1: one ES run scored against `num_frames` STFT frames of a longer
    # target (BASELINE.json config 2) instead of fresh-population-per-chunk
    num_frames: int = 1
    # >0: reinitialise the parents (keeping best-ever) after this many
    # generations without improvement — escapes the local optima a single
    # truncation-selected population collapses into (new capability)
    restart_patience: int = 0

    def __post_init__(self):
        if self.pop_block < 1:
            raise ValueError(f"pop_block must be >= 1, got {self.pop_block}")
        if self.gens_per_step < 1:
            raise ValueError(
                f"gens_per_step must be >= 1, got {self.gens_per_step}"
            )
        want = topology_dims(self.topology)  # raises on unknown names
        if self.num_dimensions != want:
            raise ValueError(
                f"topology {self.topology} needs {want} dims, got {self.num_dimensions}"
            )
        if len(self.param_mins) != self.num_dimensions or len(self.param_maxs) != self.num_dimensions:
            raise ValueError("param_mins/param_maxs length must equal num_dimensions")
        if self.synthesis_engine not in ("scan", "scanless"):
            raise ValueError("synthesis_engine must be 'scan' or 'scanless'")
        if self.recombine_mode not in RECOMBINE_MODES:
            raise ValueError(f"recombine_mode must be one of {RECOMBINE_MODES}")
        if self.mutation_noise not in MUTATION_NOISE_MODES:
            raise ValueError(f"mutation_noise must be one of {MUTATION_NOISE_MODES}")
        if self.num_parents <= 0 or self.num_offspring < 0:
            raise ValueError("need num_parents > 0 and num_offspring >= 0")
        if self.num_frames < 1:
            raise ValueError("num_frames must be >= 1")
        if self.sine_order not in (5, 7, 9):
            raise ValueError("sine_order must be 5, 7 or 9")
        if self.refine_generations < 0:
            raise ValueError("refine_generations must be >= 0")

    # --- derived ---------------------------------------------------------
    @property
    def population_size(self) -> int:
        """populationLength = numParents + numOffspring (main.cpp:183).

        (The reference also computes a bogus byte-ish
        ``numParents + numOffspring * sizeof(float)`` in places
        (main.cpp:115,131,151) — a documented quirk we do not copy,
        SURVEY.md §7.4.)
        """
        return self.num_parents + self.num_offspring

    @property
    def n_samples(self) -> int:
        return 1 << self.audio_length_log2

    @property
    def one_over_alpha(self) -> float:
        return 1.0 / self.alpha

    @property
    def beta_scale(self) -> float:
        return 1.0 / self.num_dimensions

    @property
    def beta(self) -> float:
        return math.sqrt(self.beta_scale)

    @property
    def gauss_sigma(self) -> float:
        """Mutation noise scale: reference CLT gaussian is sigma = 1/6."""
        return 1.0 if self.mutation_noise == "normal_unit" else 1.0 / 6.0

    @property
    def root_two_over_pi(self) -> float:
        """The Es offset in step adaptation (reference constant
        Evolutionary_Strategy.hpp:614). In the *_neutral modes it is scaled
        to E|g| of the actual noise so E[ln Es] = 0 (neutral drift)."""
        base = math.sqrt(2.0 / math.pi)
        if self.mutation_noise == "clt12_neutral":
            return base * self.gauss_sigma
        return base

    def replace(self, **kw) -> "ESConfig":
        return dataclasses.replace(self, **kw)

    def refine_config(self) -> "ESConfig":
        """The f32 engine the refine phase runs under (see
        refine_generations).

        Since round 5 the tail KEEPS the parent config's fused flags:
        dft_dtype="float32" now selects the TRUE-f32 fused kernels (f32
        folded operand + f32 audio scratch + Precision.HIGHEST DFT dots,
        kernels/synth_fitness audio_f32) instead of silently running the
        bf16 kernel, so a fused parent config gets a fused f32 tail at
        fused-kernel cost rather than the ~13 ms/gen unfused XLA path that
        made value_shipped 43% of the headline (VERDICT r4 weak #2). The
        tail's sine is the order-9 polynomial (max err ~2e-6, far below
        any fitness resolution the tail exploits); a non-fused parent
        config still gets the jnp.sin XLA engine. Quality-gated on
        hardware: tools/convergence_check.py holdout ratios re-recorded
        with the fused tail (benchmarks/quality_gates.json).

        The tail always uses NEUTRAL-DRIFT step adaptation: under the
        contractive reference noise (clt12/normal, sigma=1/6 against the
        sigma=1 offset) the re-opened steps freeze again within ~40
        generations and the polish stops sampling. Measured on the stuck
        holdout seeds (round 4): a contractive tail engages 0/12, a
        neutral tail engages 2/12 with large improvements (57k -> 18k,
        36k -> 17k) and can never regress (best-ever is monotone).
        The REMAINING non-engagement is real local optimality: on every
        probed stuck seed, 100 neutral f32 generations at step floors
        0.003/0.01/0.03/0.1 (3.2M samples each) find nothing better than
        best-ever — those basins are isolated, and escaping them is the
        restart mechanism's job (restart_patience), not the polish's
        (benchmarks/refine_engagement.json)."""
        noise = self.mutation_noise
        if noise in ("clt12", "normal"):
            noise = "clt12_neutral"
        return self.replace(
            dft_dtype="float32", fused_evolve=False, sine_order=9,
            refine_generations=0, refine_step_floor=0.0, mutation_noise=noise,
        )
