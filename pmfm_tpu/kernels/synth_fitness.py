"""Fused Pallas kernel: FM synthesis + windowed DFT + spectral fitness.

The reference's stages 4-7 (synthesisePopulation* -> applyWindowPopulation ->
clFFT -> fitnessPopulation, SURVEY.md §2.2) with zero HBM traffic for the
intermediates: per population block, the candidate audio is synthesised into
VMEM scratch via the scanless prefix-sum formulation (ops/scanless.py),
pushed through the window-folded DFT matmuls on the MXU, and reduced to one
fitness scalar per candidate — candidate audio NEVER exists in HBM (the
reference's largest buffer, outputAudio at popLen*N*4B,
Evolutionary_Strategy_OpenCL.hpp:289).

Grid: one program per population block of ``PB`` candidates. The DFT cos/sin
matrices (bf16, window and 1/(N*windowFactor) normalisation folded in,
ops/spectral.py) and the target spectrum are VMEM-resident across the whole
grid (constant index map). Phase prefix sums run block-sequentially over
time inside the kernel: per time block, a strictly-lower-triangular (C,C)
MXU matmul gives intra-block exclusive phases and a (1,PB) register carries
the running offset — all three oscillators advance in the same time loop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.spectral import window_factor
from ..ops.synthesis import parallel_pairs, series_ops
from ..ops.wavetable import DEFAULT_SAMPLE_RATE, DEFAULT_WAVETABLE_SIZE

DEFAULT_POP_BLOCK = 512
TIME_BLOCK = 128


def resolve_pop_block(pop: int, pop_block: int) -> int:
    """The kernels' pop_block normalisation: clamp to the population, then
    halve until it divides. One definition — the gating, the callers and the
    kernels must all agree or a gate-approved config can hand Mosaic an
    illegal lane block."""
    pb = min(pop_block, pop)
    while pop % pb:
        pb //= 2
    return pb


# True-f32 engine pop-block cap: the f32 scratches (4 B/sample) plus the
# HIGHEST-precision matmuls' operand-decomposition buffers overflow scoped
# VMEM at PB=1024 (measured 16.57 MB vs the 16 MB limit, n=1024 fm3_series
# fused generation — tools/tpu_f32_tail_probe.py); PB=512 fits there with
# headroom. High-dimensional / many-chain topologies carry more live f32
# synthesis state per lane: fm4_parallel (D=16, 4 chains) measured
# 22.17 MB at PB=512 — those halve again to 256 (fm4_series, D=8 /
# 3 chains, is hardware-validated fine at 512).
F32_MAX_POP_BLOCK = 512


def f32_pop_block(pop: int, pop_block: int, topology: str = "fm3_series") -> int:
    """resolve_pop_block with the true-f32 engine's cap applied — shared by
    the kernels and the VMEM gate (strategy._fused_vmem_bytes)."""
    from ..ops.synthesis import topology_dims

    cap = F32_MAX_POP_BLOCK
    if _chain_count(topology) >= 4 or topology_dims(topology) >= 12:
        cap //= 2
    return resolve_pop_block(pop, min(pop_block, cap))


def _chain_count(topology: str) -> int:
    """Oscillator chains advanced per sample (for the Mosaic cost estimate)."""
    if topology == "fm2":
        return 1
    k = parallel_pairs(topology)
    if k is not None:
        return k
    k = series_ops(topology)
    if k is not None:
        return k - 1
    raise NotImplementedError(topology)


def _tri_strict(c: int) -> np.ndarray:
    """(C+8, C): strictly-lower-triangular prefix matrix with a ones row
    appended at row C (rows C+1..C+7 zero-pad to the sublane tile). One MXU
    matmul then yields BOTH the exclusive intra-block prefix sums (rows
    0..C-1) and the block total (row C) — replacing a ~log2(C)-pass VPU
    sublane reduction per oscillator chain per block."""
    t = np.zeros((c + 8, c), np.float32)
    t[:c] = np.tril(np.ones((c, c), np.float32), k=-1)
    t[c] = 1.0
    return t


# Odd minimax-ish polynomial for sin(2*pi*w), w in [-0.5, 0.5] (turns),
# fitted on Chebyshev nodes. Max abs error ~2e-6 — far below the bf16
# quantisation of the kernel's audio (2^-8), so the approximation is free
# accuracy-wise and ~3x cheaper than a libm-grade sine on the VPU.
@functools.lru_cache(maxsize=None)
def _sin_turn_coeffs(order: int = 9) -> tuple:
    """Odd-power coefficients (c1, c3, ..., c_order) fitted on Chebyshev
    nodes. Max abs error: ~2e-6 at order 9, ~1.1e-4 at 7, ~7e-3 at 5
    (ESConfig.sine_order documents the measured throughput/ranking trade)."""
    w = 0.5 * np.cos(np.pi * (np.arange(2000) + 0.5) / 2000)  # (0, 0.5]
    target = np.sin(2 * np.pi * w)
    A = np.stack([w**j for j in range(1, order + 1, 2)], axis=1)
    coef, *_ = np.linalg.lstsq(A, target, rcond=None)
    return tuple(coef.astype(np.float32).tolist())


def _sin_turns(w, scale: float = 1.0, order: int = 9):
    """scale * sin(2*pi*w) for w in [-0.5, 0.5]. ``scale`` is folded into the
    polynomial coefficients at trace time (free — used to emit 127*sin for
    the int8 audio quantisation without an extra VPU pass)."""
    cs = [jnp.float32(v * scale) for v in _sin_turn_coeffs(order)]
    w2 = w * w
    acc = cs[-1]
    for cj in reversed(cs[:-1]):  # Horner in w^2
        acc = cj + w2 * acc
    return w * acc


_DN_STD = (((1,), (0,)), ((), ()))


def _edge_coef(k: int, edge_norm: float):
    """(K, 1) coefficient of the x[N/2] edge term: edge_norm * (-1)^k."""
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    return jnp.float32(edge_norm) - jnp.float32(2.0 * edge_norm) * (
        k_iota % 2
    ).astype(jnp.float32)


def _dft_uv(dft, a_plus, a_minus, k: int, adtype, precision=None):
    """The folded DFT's two half-length contractions: U = cos-half @ a+,
    V = sin-half @ a- (int32-exact in int8 mode; Precision.HIGHEST in the
    true-f32 mode — Mosaic's default f32 matmul multiplies reduced)."""
    u = jax.lax.dot_general(
        dft[:k], a_plus, _DN_STD, preferred_element_type=adtype,
        precision=precision,
    )
    v = jax.lax.dot_general(
        dft[k:], a_minus, _DN_STD, preferred_element_type=adtype,
        precision=precision,
    )
    return u, v


def _fit_epilogue(u, v, edge_q, mag_scale, target_col, edge_coef, k, pb):
    """(U, V) -> one fitness row (1, PB): add the x[N/2] edge term, take
    magnitudes, rescale (int8 mode), L2 against the target column."""
    u = u.astype(jnp.float32)
    v = v.astype(jnp.float32)
    # one axis broadcast at a time — Mosaic has no simultaneous
    # sublane+lane broadcast; in int8 mode the integer values stay < 2^24
    # so the f32 accumulation is exact
    ec = jnp.zeros((k, pb), jnp.float32) + edge_coef
    eq = jnp.zeros((k, pb), jnp.float32) + edge_q
    u = u + ec * eq
    mag = jnp.sqrt(u * u + v * v)  # (K, PB)
    if mag_scale is not None:
        mag = mag * mag_scale  # |amp| * dft_scale, lane-aligned
    d = mag - target_col
    return jnp.sum(d * d, axis=0)[None, :]


def _make_block_synth(
    p,  # (D, PB) f32 scaled params — lanes = candidates
    tri,  # (C+8, C) f32 prefix matrix + ones row (loaded)
    *,
    topology: str,
    pb: int,
    c: int,
    wts: float,
    w2sr: float,
    dft_scale: float,
    sine_order: int,
    audio_f32: bool = False,
):
    """Per-topology synthesis of ONE time block as a pure step function.

    Returns ``(block_synth, offs0, mag_scale)``:

    - ``block_synth(offs) -> (out (C, PB) f32, new_offs)`` advances every
      oscillator chain by C samples from the phase-offset carries ``offs``
      (a flat tuple of (1, PB) f32 rows, initial value ``offs0``);
    - ``mag_scale`` is the int8 engine's per-candidate magnitude rescale
      row (None in bf16 mode).

    The single definition of the synthesis numerics, shared by the
    fully-unrolled time loop (_evaluate_block — fastest at the bench frame
    sizes) and the in-kernel fori_loop variant (_synth_emit_looped — keeps
    Mosaic compile time flat for large n).

    Everything runs in TURNS (phase / wavetable_size): the wrap "mod wts"
    becomes frac(x) = x - floor(x) (no division), and the oscillator is a
    9th-order odd polynomial on [-0.5, 0.5] turns (see _sin_turns).
    Raw (un-frac'd) phases are fed straight to osc(): its round-based range
    reduction subsumes frac, and the prefix-sum magnitudes stay < ~90
    (per-sample increments < (fmax*imax+imax)/sr ~ 0.64, C=128 per block),
    where f32 still resolves 5e-6 turns — far below the bf16 audio
    quantisation. Saves two VPU passes per oscillator chain per block.
    """
    inv_sr = jnp.float32(w2sr / wts)  # = 1 / sample_rate
    int8_mode = dft_scale > 0.0

    def frac(x):
        return x - jnp.floor(x)

    def osc(x):  # sin(2*pi*x) for any x; round-reduce to [-0.5, 0.5] turns
        return _sin_turns(x - jnp.floor(x + 0.5), order=sine_order)

    def osc_out(x):  # OUTPUT oscillator: 63*sin in int8 mode (gain is free
        # — folded into the polynomial coefficients, see _sin_turns; 63 keeps
        # the folded sums a+/- = q[n] +- q[N-n] within int8)
        return _sin_turns(
            x - jnp.floor(x + 0.5), 63.0 if int8_mode else 1.0,
            order=sine_order,
        )

    def row(i):  # (1, PB)
        return p[i : i + 1, :]

    # one matmul -> exclusive intra-block prefix sums AND the block total
    # (tri carries a ones row at row C, see _tri_strict). In true-f32 mode
    # the prefix runs at HIGHEST precision: Mosaic's default f32 matmul
    # multiplies reduced, which leaves ~bf16-level noise on the phase
    # increments — measured 1.1e-3 median fitness error vs the XLA f32
    # path at default, ~the sine floor at HIGHEST
    # (tools/tpu_f32_tail_probe.py). The quantised engines keep the
    # default: the noise sits below their own audio quantisation.
    prefix_precision = jax.lax.Precision.HIGHEST if audio_f32 else None

    def ex_prefix(xb):  # (C, PB) -> ((C, PB) prefix, (1, PB) total)
        ps = jax.lax.dot_general(
            tri, xb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prefix_precision,
        )
        return ps[0:c], ps[c : c + 1]

    # Mosaic iota must be integer-typed; cast after
    t_block = jax.lax.broadcasted_iota(jnp.int32, (c, pb), 0).astype(jnp.float32)

    zeros = lambda: jnp.zeros((1, pb), jnp.float32)  # noqa: E731
    # inv_sr is folded into the modulator gain/bias rows once per kernel
    # (im = inv_sr*m, ic = inv_sr*c), so the per-sample phase increment is a
    # single FMA: x = osc(pos)*im + ic (== inv_sr * cur of the reference
    # recurrence, kernels/ocl_program.cl:312-329).
    if topology == "fm2":
        pairs = [
            (inv_sr * (row(0) * row(1)), inv_sr * row(2), row(3),
             frac(inv_sr * row(0)))
        ]
    elif parallel_pairs(topology):
        # k independent 2-op pairs, averaged (kernels/ocl_program.cl:388-443
        # is the k=3 reference variant)
        pairs = [
            (
                inv_sr * (row(4 * j) * row(4 * j + 1)),
                inv_sr * row(4 * j + 2),
                row(4 * j + 3),
                frac(inv_sr * row(4 * j)),
            )
            for j in range(parallel_pairs(topology))
        ]
    elif series_ops(topology):
        # generic k-operator serial chain (k=3 = the reference DoubleSeries)
        kn = series_ops(topology)
        ims = [inv_sr * (row(2 * j) * row(2 * j + 1)) for j in range(kn - 1)]
        ics = [inv_sr * row(2 * j + 3) for j in range(kn - 1)]
        m_out = row(2 * kn - 2) * row(2 * kn - 1)
        inc1 = frac(inv_sr * row(1))
        inc_blk = frac(jnp.float32(c) * inc1)
        pairs = None
    else:
        raise NotImplementedError(topology)

    multi_pair = pairs is not None and len(pairs) > 1
    gains = None
    if int8_mode:
        # the factored-out output amplitude, rescaled into the magnitude
        # spectrum after the exact int32 matmul (see _evaluate_block)
        if pairs is None:  # serial chain: single output amplitude
            amp_row = jnp.abs(m_out)  # (1, PB)
        elif multi_pair:
            # fm3_parallel: factor out s = mean_j |amp_j|; the per-pair
            # runtime gains amp_j*63/(3s) bound the summed audio to +-63
            amp_row = sum(
                jnp.abs(amp) for (_, _, amp, _) in pairs
            ) / jnp.float32(len(pairs))
            inv_s = jnp.float32(63.0) / (
                jnp.float32(len(pairs)) * amp_row + jnp.float32(1e-30)
            )
            gains = [amp * inv_s for (_, _, amp, _) in pairs]
        else:
            amp_row = jnp.abs(pairs[0][2])
        mag_scale = amp_row * jnp.float32(dft_scale)  # (1, PB)
    else:
        mag_scale = None

    if pairs is None:  # serial chain

        def block_synth(offs):
            new = list(offs)
            pos = t_block * inc1 + new[0]  # (C, PB) raw turns
            for j in range(kn - 1):
                x = osc(pos) * ims[j] + ics[j]  # = inv_sr * cur_{j+1}
                pre, tot = ex_prefix(x)
                pos = pre + new[j + 1]
                new[j + 1] = frac(new[j + 1] + tot)
            out = osc_out(pos) if int8_mode else osc(pos) * m_out
            new[0] = frac(new[0] + inc_blk)
            return out, tuple(new)

        offs0 = tuple(zeros() for _ in range(kn))
    else:  # one or k independent 2-op pairs
        npair = len(pairs)
        incs_blk = [frac(jnp.float32(c) * inc) for (_, _, _, inc) in pairs]

        def block_synth(offs):
            o1 = list(offs[:npair])
            o2 = list(offs[npair:])
            out = None
            for j, (im_, ic_, amp, inc) in enumerate(pairs):
                pos1 = t_block * inc + o1[j]
                x = osc(pos1) * im_ + ic_
                pre, tot = ex_prefix(x)
                pos2 = pre + o2[j]
                if int8_mode and multi_pair:
                    o = osc(pos2) * gains[j]  # gain folds 63, 1/3, amp_j/s
                elif int8_mode:
                    o = osc_out(pos2)
                else:
                    o = osc(pos2) * amp
                out = o if out is None else out + o
                o2[j] = frac(o2[j] + tot)
                o1[j] = frac(o1[j] + incs_blk[j])
            if multi_pair and not int8_mode:
                out = out / jnp.float32(len(pairs))
            return out, tuple(o1) + tuple(o2)

        offs0 = tuple(zeros() for _ in range(2 * npair))
    return block_synth, offs0, mag_scale


def _evaluate_block(
    p,  # (D, PB) f32 scaled params — lanes = candidates
    dft_ref,  # FOLDED (2K, N/2) operand ref — bf16, or int8 when dft_scale>0
    target_ref,  # (K, F) f32 ref
    tri,  # (C+8, C) f32 prefix matrix + ones row (loaded)
    *scratches,  # two (N/2, PB) folded-audio scratches a+ / a-
    #              (int8, or bf16 on hardware / f32 under interpret)
    topology: str,
    n: int,
    pb: int,
    k: int,
    c: int,
    wts: float,
    w2sr: float,
    num_frames: int = 1,
    dft_scale: float = 0.0,
    sine_order: int = 9,
    audio_f32: bool = False,
):
    """Shared kernel body: synthesise one population block and return its
    fitness row ``(1, PB)``. Used by both the evaluate-only kernel and the
    full-generation kernel (kernels/generation.py).

    The DFT runs FOLDED in BOTH dtypes (spectral.SpectrumOps docs): the
    reference window satisfies w[N-n] = w[n], so the windowed spectrum is
    two half-length transforms over the folded audio a+/- [n] = q[n] +-
    q[N-n] plus an x[N/2] edge term (the n=0 column is zero since
    w[0] = 0) — HALF the matmul FLOPs and operand bytes of the naive
    (2K, N) form, and a k=N/2 contraction still runs the MXU near peak.
    The time loop writes q directly into a+ rows for the first half-frame;
    each second-half block is reversed by a one-hot (C, C) matmul and
    read-modify-written into the aligned a+/a- row window one block late
    (sample N-m for m in block b lands at rows [N-(b+1)C, N-bC) and needs
    the NEXT block's first sample, carried in a register).

    ``dft_scale > 0`` selects the INT8 engine (v5e int8 MXU rate is 2x bf16
    and the big VMEM buffers halve again): the single output amplitude of
    fm2/fm3_series is factored out of the audio (magnitudes are linear in
    it), the final oscillator emits 63*sin via scaled polynomial
    coefficients (q = round(63*unit_audio) keeps |a+/-| <= 126 in int8),
    both (K, N/2) matmuls accumulate EXACTLY in int32 against the quantised
    SpectrumOps.dft_packed halves (and < 2^24, so the f32 casts are exact
    too), and the magnitude is rescaled by |amp| * dft_scale per candidate.
    In bf16 mode q is the bf16-rounded audio, the fold sums round once more
    (mimicked exactly under interpret), and window+norm stay folded in the
    operand with the edge coefficient 2*norm*(-1)^k applied in-kernel. For
    fm3_parallel (three summed amplitudes) the factored scalar is
    s = mean_j |amp_j|: each pair's output is scaled by amp_j * 63/(3s) at
    runtime (a multiply the bf16 path pays anyway), which bounds the
    normalised sum to |.| <= 63; the magnitude rescale is s * dft_scale.

    Passing ``dft_ref=None`` selects EMIT-ONLY mode (kernels/synth_fold.py,
    the large-frame hybrid): the folded a+/a- land in ``scratches`` (which
    are then output refs, not scratch) and the function returns
    ``(edge_q (1, PB), mag_scale (1, PB) or None)`` instead of the fitness —
    the DFT + fitness run in XLA outside, where the (2K, N/2) matmul has no
    VMEM budget. Requires ``num_frames == 1``.

    ``audio_f32`` selects the TRUE-f32 engine (round 5 — the refine tail's
    fast path, ESConfig.refine_config): f32 folded operand and f32 audio
    scratch (no rounding anywhere in the fold) with the two DFT dots at
    ``Precision.HIGHEST`` (Mosaic's default f32 matmul multiplies reduced,
    CLAUDE.md). ~f32-exact fitness at fused-kernel dispatch cost; the
    synthesis numerics (polynomial sine, f32 phase prefix matmuls) are the
    same ones every engine runs.
    """
    nb = n // c
    int8_mode = dft_scale > 0.0
    if nb % 2:
        raise ValueError(
            f"the folded DFT engine needs an even block count: n={n}, C={c}"
        )
    a_plus, a_minus = scratches
    nhb = nb // 2
    block_synth, offs_state, mag_scale = _make_block_synth(
        p, tri, topology=topology, pb=pb, c=c, wts=wts, w2sr=w2sr,
        dft_scale=dft_scale, sine_order=sine_order, audio_f32=audio_f32,
    )

    # Per-sample phase increments |w2sr*cur| < ~0.75*(fmax*imax+imax) stay far
    # below wts, and intra-block sums stay < C*0.64 in f32 to ~5e-6 turns, so
    # the elementwise pre-mod of the scanless reference implementation is
    # unnecessary here — osc()'s round reduction is the only mod. Each time
    # block's audio lands in the bf16 VMEM scratch; at frame end one k=N
    # matmul produces the spectrum.
    dn_std = (((1,), (0,)), ((), ()))
    fit = jnp.zeros((1, pb), jnp.float32)
    # constants for the folded-audio bookkeeping (docstring): a one-hot
    # reversal matrix (row j <- sample C-j; row 0 stays zero for the
    # carried next-block sample), a row-index mask, and the x[N/2] edge
    # coefficient edge_norm*(-1)^k — edge_norm = 127 in int8 mode (the exact
    # quantisation of 63.5*w[N/2], w[N/2] = 2 — the window's peak) or
    # 2*norm in bf16 mode (the operand folds window+norm; the edge column
    # would be w[N/2]*norm*cos(pi*k))
    sdtype = a_plus.dtype  # int8, or bf16 on hardware / f32 under interpret
    adtype = jnp.int32 if int8_mode else jnp.float32  # emit-accumulator dtype
    edge_norm = (
        127.0 if int8_mode else 2.0 / (n * window_factor(n))
    )
    i0 = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    p_rev = ((i0 + i1) == c).astype(jnp.int8 if int8_mode else sdtype)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (c, pb), 0)
    edge_coef = _edge_coef(k, edge_norm)  # (K, 1)
    prev_q = None
    edge_q = None

    def fold_cast(x):
        # int8: exact (|a| <= 126); bf16: ONE rounding of the sum — on
        # hardware the store rounds to bf16, under interpret the scratch is
        # f32 so we round explicitly to stay numerically identical; true-f32
        # mode stores the f32 sum unrounded
        if audio_f32:
            return x
        return x.astype(jnp.int8 if int8_mode else jnp.bfloat16).astype(sdtype)

    def emit(r0, prev_q, nxt):
        """Fold one delayed second-half block into the a+/a- rows
        [r0, r0+C): reversed prev rows 1..C-1 plus (optionally) the next
        block's first sample at row 0. True-f32 mode reverses at HIGHEST
        precision — the default reduced multiply would bf16-round every
        second-half audio sample through the one-hot copy."""
        asm = jax.lax.dot_general(
            p_rev, prev_q, dn_std, preferred_element_type=adtype,
            precision=jax.lax.Precision.HIGHEST if audio_f32 else None,
        )
        if nxt is not None:
            q0 = jnp.zeros((c, pb), adtype) + nxt[0:1, :].astype(adtype)
            asm = jnp.where(row_iota == 0, q0, asm)
        old = a_plus[pl.ds(r0, c), :].astype(adtype)
        a_plus[pl.ds(r0, c), :] = fold_cast(old + asm)
        a_minus[pl.ds(r0, c), :] = fold_cast(old - asm)

    for b in range(nb * num_frames):
        bf = b % nb  # block index within the current frame
        out, offs_state = block_synth(offs_state)
        # audio is QUANTISED in both modes — round(63*x) int8, or bf16 (the
        # scratch dtype is bf16 on hardware and f32 under plain interpret —
        # XLA:CPU has no bf16 dot kernel; a bf16 MXU matmul computes exact
        # products of bf16 values with f32 accumulation, so
        # quantise-then-upcast is numerically identical) — and FOLDED into
        # the a+/a- scratches (docstring)
        if int8_mode:
            q = jnp.round(out).astype(jnp.int8)  # (C, PB) in [-63, 63]
        elif audio_f32:
            q = out  # true-f32: the audio is never quantised
        else:
            q = out.astype(jnp.bfloat16).astype(sdtype)
        if bf < nhb:
            a_plus[pl.ds(bf * c, c), :] = q
        else:
            if bf == nhb:
                edge_q = q[0:1, :].astype(jnp.float32)  # x[N/2] (quantised)
            else:
                emit(n - bf * c, prev_q, q)
            prev_q = q
        if bf == nb - 1:
            f = b // nb
            # last delayed block: rows [0, C) — x[N-m] for m in the final
            # block; the row-0 slot is n = 0, whose operand column is
            # zero (w[0] = 0), so no next-sample carry is needed
            emit(0, prev_q, None)
            if dft_ref is None:  # EMIT-ONLY (see docstring): a+/a- are done
                return edge_q, (mag_scale if int8_mode else None)
            u, v = _dft_uv(
                dft_ref[:], a_plus[:], a_minus[:], k, adtype,
                precision=jax.lax.Precision.HIGHEST if audio_f32 else None,
            )
            fit = fit + _fit_epilogue(
                u, v, edge_q, mag_scale if int8_mode else None,
                target_ref[:, f : f + 1], edge_coef, k, pb,
            )
    return fit


def _synth_emit_looped(
    p,  # (D, PB) f32 scaled params
    tri,  # (C+8, C) f32 (loaded)
    a_plus,  # (N/2, PB) output ref — folded a+
    a_minus,  # (N/2, PB) output ref — folded a-
    prevq_ref,  # (C, PB) scratch ref, dtype = the quantised audio's
    *,
    topology: str,
    n: int,
    pb: int,
    c: int,
    wts: float,
    w2sr: float,
    dft_scale: float = 0.0,
    sine_order: int = 9,
    num_frames: int = 1,
    k: int = 8,  # unused (emit-only); accepted for statics compatibility
    audio_f32: bool = False,
):
    """EMIT-ONLY synthesis + fold with an in-kernel ``lax.fori_loop`` over
    time blocks — numerically identical to ``_evaluate_block``'s emit-only
    mode (both call the single ``_make_block_synth`` step; the fold/emit
    bookkeeping is the same code with traced offsets), but the Mosaic
    program size is CONSTANT in ``n`` instead of linear.

    The unrolled loop is what makes the large-frame hybrid's compile time
    explode (>10 min at n=16384, nb=128 unrolled bodies); this variant
    keeps it flat so the hybrid extends to arbitrary frame sizes
    (kernels/synth_fold.py chooses it above n=8192). Single frame only.
    Returns ``(edge_q (1, PB) f32, mag_scale (1, PB) or None)``.
    """
    if num_frames != 1:
        raise ValueError("the looped emit path is single-frame only")
    nb = n // c
    if nb % 2:
        raise ValueError(
            f"the folded DFT engine needs an even block count: n={n}, C={c}"
        )
    nhb = nb // 2
    int8_mode = dft_scale > 0.0
    block_synth, offs0, mag_scale = _make_block_synth(
        p, tri, topology=topology, pb=pb, c=c, wts=wts, w2sr=w2sr,
        dft_scale=dft_scale, sine_order=sine_order, audio_f32=audio_f32,
    )
    sdtype = a_plus.dtype
    adtype = jnp.int32 if int8_mode else jnp.float32
    dn_std = (((1,), (0,)), ((), ()))
    i0 = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    p_rev = ((i0 + i1) == c).astype(jnp.int8 if int8_mode else sdtype)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (c, pb), 0)

    def fold_cast(x):  # see _evaluate_block: one rounding of the fold sum
        if audio_f32:
            return x
        return x.astype(jnp.int8 if int8_mode else jnp.bfloat16).astype(sdtype)

    def emit(r0, prev_q, nxt):
        if not isinstance(r0, int):
            # loop-traced offsets are always whole blocks (r0 = n - bf*C),
            # but Mosaic cannot prove the sublane alignment of a traced
            # index on hardware ("cannot statically prove that index in
            # dimension 0 is a multiple of 8") — assert it explicitly
            r0 = pl.multiple_of(r0, c)
        asm = jax.lax.dot_general(
            p_rev, prev_q, dn_std, preferred_element_type=adtype,
            precision=jax.lax.Precision.HIGHEST if audio_f32 else None,
        )
        if nxt is not None:
            q0 = jnp.zeros((c, pb), adtype) + nxt[0:1, :].astype(adtype)
            asm = jnp.where(row_iota == 0, q0, asm)
        old = a_plus[pl.ds(r0, c), :].astype(adtype)
        a_plus[pl.ds(r0, c), :] = fold_cast(old + asm)
        a_minus[pl.ds(r0, c), :] = fold_cast(old - asm)

    def body(bf, carry):
        offs, edge_q = carry
        out, offs = block_synth(offs)
        if int8_mode:
            q = jnp.round(out).astype(jnp.int8)
        elif audio_f32:
            q = out
        else:
            q = out.astype(jnp.bfloat16).astype(sdtype)

        @pl.when(bf < nhb)
        def _first_half():
            a_plus[pl.ds(pl.multiple_of(bf * c, c), c), :] = q

        edge_q = jnp.where(
            bf == nhb, q[0:1, :].astype(jnp.float32), edge_q
        )  # x[N/2]

        @pl.when(bf > nhb)
        def _delayed_emit():  # reads the PREVIOUS block (written below)
            emit(n - bf * c, prevq_ref[:], q)

        @pl.when(bf >= nhb)
        def _carry_prev():
            prevq_ref[:] = q

        return offs, edge_q

    _, edge_q = jax.lax.fori_loop(
        0, nb, body, (offs0, jnp.zeros((1, pb), jnp.float32))
    )
    # final delayed block: rows [0, C); row 0 is n = 0 whose operand column
    # is zero (w[0] = 0), so no next-sample carry is needed
    emit(0, prevq_ref[:], None)
    return edge_q, (mag_scale if int8_mode else None)


def _kernel(
    params_ref,  # (D, PB) f32  — transposed: lanes = candidates
    dft_ref,  # (2K, N/2) folded [cos; sin] operand (standard GEMM layout)
    target_ref,  # (K, F) f32 — one column of target spectrum per STFT frame
    tri_ref,  # (C+8, C) f32 (prefix rows + ones row) strictly lower triangular
    fitness_ref,  # (G, PB) f32 out — full array; program i writes row i
    *scratches,  # two (N/2, PB) folded a+/a-
    **statics,
):
    fit = _evaluate_block(
        params_ref[:], dft_ref, target_ref, tri_ref[:], *scratches, **statics
    )
    # Mosaic needs >=(8,128) blocks, so the output block is the full (G, PB)
    # array and each program writes only its own row.
    fitness_ref[pl.ds(pl.program_id(0), 1), :] = fit


@functools.partial(
    jax.jit,
    static_argnames=("topology", "n", "wavetable_size", "sample_rate", "pop_block", "interpret", "time_block", "num_frames", "dft_scale", "sine_order"),
)
def fused_synth_fitness(
    params_scaled: jax.Array,  # (P, D) f32
    dft_cos: jax.Array,  # (N, K)
    dft_sin: jax.Array,  # (N, K)
    target_spectrum: jax.Array,  # (K,) f32 — or (F, K) for multi-frame STFT
    topology: str = "fm3_series",
    n: int = 1024,
    wavetable_size: int = DEFAULT_WAVETABLE_SIZE,
    sample_rate: int = DEFAULT_SAMPLE_RATE,
    pop_block: int = DEFAULT_POP_BLOCK,
    interpret: bool = False,
    time_block: int = TIME_BLOCK,
    num_frames: int = 1,
    dft_packed: jax.Array | None = None,
    dft_scale: float = 0.0,
    sine_order: int = 9,
) -> jax.Array:
    """Fitness for the whole population; returns ``(P,)`` f32.

    Pass ``dft_packed`` (SpectrumOps.dft_packed) when calling from inside a
    scan: XLA does not hoist the concat+transpose+cast below out of loop
    bodies, and rebuilding the (2K, N) operand cost ~0.3 ms per generation.

    With ``num_frames > 1`` each candidate synthesises ``num_frames * n``
    continuous samples and its fitness sums the framewise spectral errors
    against ``target_spectrum`` of shape ``(num_frames, K)`` (multi-frame
    STFT fitness, SURVEY.md §5.7).

    ``dft_scale > 0`` selects the int8 DFT engine (SpectrumOps.dft_packed
    must be the int8 operand and dft_scale its SpectrumOps.dft_packed_scale;
    fm2/fm3_series only — see _evaluate_block). An f32 ``dft_packed``
    selects the TRUE-f32 engine (f32 scratch, unquantised audio,
    Precision.HIGHEST DFT dots — _evaluate_block's ``audio_f32``).

    Requirements: P % pop_block == 0, n % 128 == 0, K % 128 == 0.
    """
    pop, d = params_scaled.shape
    k = dft_cos.shape[1]
    # the true-f32 engine caps the pop block (F32_MAX_POP_BLOCK rationale)
    _f32 = (
        dft_scale == 0.0
        and dft_packed is not None
        and dft_packed.dtype == jnp.float32
    )
    pb = f32_pop_block(pop, pop_block, topology) if _f32 else resolve_pop_block(pop, pop_block)
    if n % (2 * time_block):
        raise ValueError(
            f"n={n} must be a multiple of {2 * time_block} (the folded DFT "
            f"pairs time blocks n <-> N-n)"
        )
    params_t = params_scaled.T.astype(jnp.float32)  # (D, P)
    if dft_scale > 0.0:
        if dft_packed is None or dft_packed.dtype != jnp.int8:
            raise ValueError("int8 engine needs the int8 SpectrumOps.dft_packed")
        dft = dft_packed  # int8 in BOTH modes: CPU int8 dots are exact too
    elif dft_packed is not None:
        dft = dft_packed  # (2K, N/2) bf16 folded, precomputed
    else:
        dft = (
            jnp.concatenate([dft_cos, dft_sin], axis=1)
            .T[:, : n // 2]
            .astype(jnp.bfloat16)
        )  # (2K, N/2) folded
    if dft.shape[1] != n // 2:
        raise ValueError(
            f"dft operand must be the FOLDED (2K, N/2) form, got "
            f"{dft.shape} for n={n}"
        )
    # checked BEFORE the interpret upcast below: bf16-mode interpret runs
    # with an f32 copy of the operand but must keep bf16 quantisation
    audio_f32 = dft_scale == 0.0 and dft.dtype == jnp.float32
    if interpret and dft.dtype == jnp.bfloat16:
        # XLA:CPU cannot execute bf16 dots; quantise-then-upcast is
        # numerically identical to the TPU bf16 MXU (see _evaluate_block)
        dft = dft.astype(jnp.float32)
    if target_spectrum.ndim == 1:
        tgt = target_spectrum.astype(jnp.float32)[:, None]  # (K, 1)
    else:
        if target_spectrum.shape[0] != num_frames:
            raise ValueError(
                f"target has {target_spectrum.shape[0]} frames, expected {num_frames}"
            )
        tgt = target_spectrum.astype(jnp.float32).T  # (K, F)
    tri = jnp.asarray(_tri_strict(time_block))

    kernel = functools.partial(
        _kernel,
        topology=topology,
        n=n,
        pb=pb,
        k=k,
        c=time_block,
        wts=float(wavetable_size),
        w2sr=wavetable_size / float(sample_rate),
        num_frames=num_frames,
        dft_scale=dft_scale,
        sine_order=sine_order,
        audio_f32=audio_f32,
    )
    grid = (pop // pb,)
    chains = _chain_count(topology)
    cost = pl.CostEstimate(
        # dft.shape[1] = N/2 (folded operand, both dtypes)
        flops=pop * num_frames * (2 * dft.shape[1] * 2 * k + chains * 2 * time_block * n),
        bytes_accessed=pop * d * 4 + dft.shape[1] * 2 * k * 2 + pop * 4,
        transcendentals=pop * num_frames * n * (chains + 1),
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((pop // pb, pb), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, pb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (2 * k, dft.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((k, num_frames), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (time_block + 8, time_block), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (pop // pb, pb), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[  # folded a+ / a-
            pltpu.VMEM(
                (n // 2, pb),
                jnp.int8
                if dft_scale > 0.0
                else (
                    jnp.float32
                    if (interpret or audio_f32)
                    else jnp.bfloat16
                ),
            )
            for _ in range(2)
        ],
        cost_estimate=cost,
        interpret=interpret,
        **kwargs,
    )(params_t, dft, tgt, tri)
    return out.reshape(pop)
