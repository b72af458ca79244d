"""Windowing, magnitude spectra and the L2 spectral fitness.

Reference semantics being reproduced:

* Hann-like window ``w[i] = 1 - cos(i * (1/N - 1) * 2*pi)`` computed in double
  (Evolutionary_Strategy.hpp:308-314). For integer ``i`` this is *exactly*
  ``1 - cos(2*pi*i/N)`` (the extra ``-2*pi*i`` term is a whole number of
  turns); we keep the reference formula in float64 so the window factor
  matches to the ulp.
* ``windowFactor = sum(w)/N`` and magnitudes normalised by
  ``(1/N) * (1/windowFactor)`` (Evolutionary_Strategy.hpp:309-317, 535-541).
* Fitness: sum of squared differences between the candidate's normalised
  magnitude spectrum and the target's over the first ``N/2`` bins — the CPU
  ground-truth definition (Evolutionary_Strategy_CPU.hpp:228-280). The OpenCL
  kernel iterates to ``N/2+3`` bins, reading past the target buffer
  (kernels/ocl_program.cl:606-614) — a documented quirk (SURVEY.md §7.4) we
  deliberately do not copy; ``num_bins`` is configurable (``N//2`` default,
  ``N//2+1`` for the full rfft band).

Three spectrum engines, selected by ``method``:

* ``"rfft"`` — ``jnp.fft.rfft`` over the time axis (XLA FFT).
* ``"dft_factored"`` — four-step factored DFT (N = N1*N2, two matmul stages
    + O(N) twiddles; FactoredOps docstring) — the n > 32768 engine: keeps
    the MXU-matmul family at any power-of-two size with O(N) operand
    memory, where the direct operand is O(N^2) and the XLA TPU FFT lowering
    measured 918 ms/gen at n=65536 pop 2^13.
* ``"dft"``  — real DFT as two MXU matmuls against precomputed
    ``window ⊙ cos/sin`` matrices. Batched 1-2K-point FFTs are too small to
    keep a TPU busy through the FFT lowering, while a (pop x N) @ (N x bins)
    matmul is exactly what the MXU is built for; the Hann window *and* the
    ``1/(N*windowFactor)`` normalisation are folded into the DFT matrices so
    window+FFT+magnitude-normalise collapse into two matmuls and one hypot.
    This subsumes the reference's separate applyWindowPopulation and clFFT
    stages (SURVEY.md §2.2 stages 5-6).

All functions take audio **time-major** ``(N, pop)`` to match synthesis.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

SPECTRUM_METHODS = ("rfft", "dft", "dft_factored", "auto")

# DFT-as-matmul beats the FFT lowering up to a few K points on the MXU
# (measured: 1024-pt batch-2^15 dft 3.3ms f32 / 1.0ms bf16 vs rfft 6.4ms);
# the O(N^2) term wins out for long transforms. This "auto" threshold is
# conservative for the f32 unfolded operand; the FOLDED bf16 matmul
# (magnitude_spectrum_folded, what "dft" + bf16/int8 configs actually run)
# stays ahead of rfft to the materialisation limit — dft/rfft 0.44 at
# n=4096 rising to 0.86 at n=16384 (tools/tpu_spectrum_probe.py,
# benchmarks/spectrum_crossover.csv, 2026-08-21).
AUTO_DFT_MAX_N = 4096

# Hard ceiling for materialising the DFT-as-matmul operands, even when
# "dft" is requested explicitly: the (N, K)+(2K, N/2) operand set is
# O(N^2) bytes (n=32768 ~ 2.7 GB on-device; n=65536 would be ~11 GB,
# over the v5e HBM budget before any audio exists). Above this the
# request resolves to the factored engine (or rfft when non-factorable) —
# same contract as the int8 engine's documented bf16 degradation on
# unsupported paths. Round 5: lowered 32768 -> 16384 after the
# whole-generation crossover measurement — at n=32768 the streamed
# synthesis + factored DFT beats the synth_fold + folded-operand engine
# 120.3 vs 139.8 ms/gen (pop 2^15, hardware 2026-08-22), and the ~2-min
# host trig build + multi-GB operand disappear at that size with it.
DFT_MAX_MATERIALIZE_N = 16384


def hann_window(n: int) -> np.ndarray:
    """Reference window, float64: Evolutionary_Strategy.hpp:310-314."""
    i = np.arange(n, dtype=np.float64)
    return 1.0 - np.cos(i * (1.0 / n - 1.0) * 2.0 * math.pi)


def window_factor(n: int) -> float:
    """windowFactor = sum(w)/N (Evolutionary_Strategy.hpp:309-316); ~1.0."""
    return float(hann_window(n).sum() / n)


def default_num_bins(n: int) -> int:
    """CPU ground-truth bin count fftHalfSize = N/2
    (Evolutionary_Strategy.hpp:264, Evolutionary_Strategy_CPU.hpp:235)."""
    return n // 2


class FactoredOps(NamedTuple):
    """Operands of the four-step factored DFT (method "dft_factored").

    N = N1*N2 splits the windowed real DFT into two MXU matmul stages with
    an O(N) twiddle multiply between them — the role the reference's
    (compiled-but-never-dispatched) Stockham shader was written for
    (/root/reference/shaders/vulkanFFT.comp:68-122), realised as matmuls
    instead of butterfly passes because the MXU is the TPU's FLOP engine.
    With n = n1*N2 + n2 and k = k2*N1 + k1:

      A[k1, n2]  = sum_n1 y[n1, n2] * exp(-2i pi n1 k1 / N1)   (stage 1)
      B[k1, n2]  = A[k1, n2] * exp(-2i pi n2 k1 / N)           (twiddle)
      X[k2*N1+k1] = sum_n2 B[k1, n2] * exp(-2i pi n2 k2 / N2)  (stage 2)

    Total 2N(N1+N2) real MACs per candidate vs N*K = N^2/2 direct — 64x
    fewer at N=65536 — with O(N1^2 + N + N2^2/2) operand floats instead of
    the direct path's O(N*K) (11 GB at n=65536, over HBM). Only bins
    k < N/2 are needed (reference band), so stage 2 computes k2 < N2/2.
    Matrices are f32; the magnitude normalisation rides in stage 2.
    """

    n1: int
    n2: int
    c1: jax.Array  # (N1, N1)  cos(2 pi n1 k1 / N1)
    s1n: jax.Array  # (N1, N1) -sin(2 pi n1 k1 / N1)
    tw_re: jax.Array  # (N1, N2)  cos(2 pi n2 k1 / N)   [k1 is axis 0]
    tw_imn: jax.Array  # (N1, N2) -sin(2 pi n2 k1 / N)
    c2: jax.Array  # (N2, N2//2)  cos(2 pi n2 k2 / N2) * norm
    s2n: jax.Array  # (N2, N2//2) -sin(2 pi n2 k2 / N2) * norm


def _factored_split(n: int) -> tuple[int, int]:
    """N = N1 * N2 with N1 >= N2, both powers of two (N1 = N2 or 2*N2)."""
    if n < 16 or n & (n - 1):
        raise ValueError(f"dft_factored needs a power-of-two n >= 16, got {n}")
    log2n = n.bit_length() - 1
    n1 = 1 << ((log2n + 1) // 2)
    return n1, n // n1


def _build_factored_operands(n: int, norm: float) -> FactoredOps:
    """Host-side f64 trig, cast f32 — O(N) work and memory (the direct
    operand build is O(N*K) and costs ~2 min at n=32768; this is
    milliseconds at any size)."""
    n1, n2 = _factored_split(n)
    i1 = np.arange(n1, dtype=np.float64)
    ang1 = 2.0 * math.pi * i1[:, None] * i1[None, :] / n1
    i2 = np.arange(n2, dtype=np.float64)
    angt = 2.0 * math.pi * i2[None, :] * i1[:, None] / n  # (N1 k1, N2 n2)
    k2 = np.arange(n2 // 2, dtype=np.float64)
    ang2 = 2.0 * math.pi * i2[:, None] * k2[None, :] / n2
    return FactoredOps(
        n1=n1,
        n2=n2,
        c1=jnp.asarray(np.cos(ang1), jnp.float32),
        s1n=jnp.asarray(-np.sin(ang1), jnp.float32),
        tw_re=jnp.asarray(np.cos(angt), jnp.float32),
        tw_imn=jnp.asarray(-np.sin(angt), jnp.float32),
        c2=jnp.asarray(np.cos(ang2) * norm, jnp.float32),
        s2n=jnp.asarray(-np.sin(ang2) * norm, jnp.float32),
    )


class SpectrumOps(NamedTuple):
    """Precomputed constants for one FFT size."""

    n: int
    num_bins: int
    window: jax.Array  # (N,) float32
    norm: float  # (1/N) * (1/windowFactor)
    dft_cos: jax.Array | None  # (N, num_bins) window & norm folded in
    dft_sin: jax.Array | None
    method: str
    dft_dtype: jnp.dtype | None
    # (2K, N) [cos; sin] stacked+transposed, ready for the Pallas kernels —
    # bf16, or int8 when dft_dtype == int8. Precomputed HERE because XLA does
    # not hoist a large operand materialisation (concat+transpose+cast) out
    # of a scan body — rebuilding it per generation cost ~0.3 ms/gen at the
    # bench config.
    dft_packed: jax.Array | None = None
    # The FOLDED kernel operand (2K, N/2) for even n: bf16 with window+norm
    # folded in, or — int8 mode (dft_packed_scale > 0) — entries
    # round(63.5 * w[n] * trig(2*pi*k*n/N)) for n = 0..N/2-1 WITHOUT the
    # magnitude normalisation (folding norm ~ 1/N into int8 would quantise
    # every entry to zero). The reference window
    # satisfies w[N-n] = w[n] and the DFT basis cos(th*k*(N-n)) = cos(th*k*n),
    # sin(th*k*(N-n)) = -sin(th*k*n), so the windowed spectrum folds exactly:
    #   re[k] = sum_{n<N/2} w[n]cos(..) * (x[n]+x[N-n])  +  w[N/2](-1)^k x[N/2]
    #   im[k] = sum_{n<N/2} w[n]sin(..) * (x[n]-x[N-n])
    # (the n=0 row is zero because w[0] = 0). Halves the DFT matmul FLOPs and
    # the operand bytes; the kernels build the folded audio a+/a- in VMEM and
    # add the x[N/2] edge term post-matmul (coefficient +-127 = the exact
    # quantisation of 63.5 * w[N/2]). A candidate's audio is stored as
    # round(63 * unit_audio) (so |a+/-| <= 126 stays int8) with the amplitude
    # factored out (magnitude spectra are linear in a single amplitude); the
    # true spectrum is recovered as |amp| * dft_packed_scale * |int32 matmul|.
    # The int32 accumulation is EXACT (|sum| <= 512*127*126 << 2^31), unlike
    # the bf16 path's f32-accumulated bf16 products.
    dft_packed_scale: float = 0.0
    # Four-step factored-DFT operands (method "dft_factored" — the n > 32768
    # engine; see FactoredOps). None for the other methods.
    factored: FactoredOps | None = None


def _build_dft_operands(n, num_bins, w, norm, int8_mode, out_dtype):
    """Chunked host-side construction of the DFT-as-matmul operands over
    time-row blocks. The naive full (N, K) f64 outer product costs 4.3 GB
    PER TEMPORARY at n=32768 (and the int8 branch used to run the trig
    twice) — on this 2-vCPU box that meant ~4-5 min of swap-bound build per
    config. Blocked, the peak is a few hundred MB and each trig value is
    computed once. Per-element math (and therefore every output bit) is
    IDENTICAL to the unchunked form: f64 trig*window, one cast to the
    target dtype — golden tests unaffected.

    Returns ``(cos_out (N, K), sin_out (N, K), packed (2K, N/2) or None)``
    as numpy arrays; ``packed`` is the FOLDED operand — int8 rows
    round(63.5*w*trig) in int8 mode (norm moves to dft_packed_scale; audio
    is quantised at 63 LSB/unit so the fold sums q[n] +- q[N-n] stay
    within int8), else window+norm folded in at ``out_dtype`` itself:
    bf16 for dft_dtype bfloat16 (f64 -> f32 -> bf16 rounding chain
    preserved from the unchunked form) or f32 for dft_dtype float32 (the
    TRUE-f32 fused engine, round 5 — the kernel runs its DFT dots at
    Precision.HIGHEST so an f32 config keeps f32 numerics inside the
    fused kernels instead of silently degrading to bf16). The edge
    coefficient 2*norm*(-1)^k is applied in-kernel.
    """
    k = np.arange(num_bins, dtype=np.float64)[None, :]
    cos_out = np.empty((n, num_bins), out_dtype)
    sin_out = np.empty((n, num_bins), out_dtype)
    packed = None
    if int8_mode:
        packed = np.empty((2 * num_bins, n // 2), np.int8)
    elif n % 2 == 0:
        packed = np.empty(
            (2 * num_bins, n // 2),
            np.float32 if out_dtype == np.float32 else np.dtype(jnp.bfloat16),
        )
    blk = max(128, (1 << 25) // max(num_bins, 1))  # ~256 MB f64 temp
    for t0 in range(0, n, blk):
        t1 = min(t0 + blk, n)
        t = np.arange(t0, t1, dtype=np.float64)[:, None]
        ang = 2.0 * math.pi * t * k / n
        c_raw = np.cos(ang) * w[t0:t1, None]  # f64 trig * window
        s_raw = np.sin(ang) * -w[t0:t1, None]
        # window and magnitude normalisation folded in:
        #   re[k] = sum_n a[n] w[n] cos(..) * norm ; im likewise
        cos_out[t0:t1] = c_raw * norm
        sin_out[t0:t1] = s_raw * norm
        if packed is not None and t0 < n // 2:
            p1 = min(t1, n // 2)
            rows = slice(0, p1 - t0)
            if int8_mode:
                packed[:num_bins, t0:p1] = np.round(c_raw[rows].T * 63.5)
                packed[num_bins:, t0:p1] = np.round(s_raw[rows].T * 63.5)
            else:
                packed[:num_bins, t0:p1] = (
                    (c_raw[rows] * norm).astype(np.float32).T
                )
                packed[num_bins:, t0:p1] = (
                    (s_raw[rows] * norm).astype(np.float32).T
                )
    return cos_out, sin_out, packed


# --- operand disk cache (large frames only) --------------------------------
# The f64 trig build above is CPU-bound (~2 min at n=32768 on 2 vCPUs) and
# reruns in EVERY process that touches a large-frame config. Opt-in disk
# cache: ESConfig.operand_cache_dir / config "tpu.operandCacheDir" /
# make_spectrum_ops(cache_dir=...). Files are a few GB at the top sizes —
# that's the point (a ~3 s read replaces ~2 min of trig).
# BUMP THE VERSION whenever the operand math above changes (window formula,
# norm placement, quantisation constants) — it invalidates every cache.
OPERAND_BUILD_VERSION = 1
OPERAND_CACHE_MIN_N = 16384


def _operand_cache_file(cache_dir, n, num_bins, out_dtype, int8_mode):
    import os

    name = (
        f"dftops_v{OPERAND_BUILD_VERSION}_n{n}_k{num_bins}_"
        f"{out_dtype.name}{'_int8' if int8_mode else ''}.npz"
    )
    return os.path.join(cache_dir, name)


def _u16(a):
    """2-byte dtypes (bf16) as uint16 for npz (numpy's format can't store
    ml_dtypes); 1/4-byte dtypes pass through."""
    return a.view(np.uint16) if a.dtype.itemsize == 2 else a


def _load_operand_cache(cache_dir, n, num_bins, out_dtype, int8_mode):
    import os

    path = _operand_cache_file(cache_dir, n, num_bins, out_dtype, int8_mode)
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            cos_out = z["cos"]
            sin_out = z["sin"]
            packed = z["packed"] if "packed" in z else None
        if out_dtype.itemsize == 2:
            cos_out = cos_out.view(out_dtype)
            sin_out = sin_out.view(out_dtype)
        # non-int8 packed follows out_dtype (bf16 stored as uint16; f32
        # passes through) — a stale f32-keyed cache holding bf16 packed
        # fails the dtype validation below and rebuilds
        if packed is not None and not int8_mode and out_dtype.itemsize == 2:
            packed = packed.view(np.dtype(jnp.bfloat16))
        # full-shape validation: a stale/hand-edited cache missing 'packed'
        # (or with wrong shapes) must force a rebuild, not silently degrade
        # the fused/folded engines to the XLA path (the engine gates key on
        # dft_packed being present)
        if cos_out.shape != (n, num_bins) or sin_out.shape != (n, num_bins):
            return None
        if int8_mode or n % 2 == 0:  # packed is built whenever n is even
            if packed is None or packed.shape != (2 * num_bins, n // 2):
                return None
            want = (
                np.int8
                if int8_mode
                else (
                    np.float32
                    if out_dtype == np.float32
                    else np.dtype(jnp.bfloat16)
                )
            )
            if packed.dtype != want:
                return None
        return cos_out, sin_out, packed
    except Exception:
        return None  # corrupt/partial cache: rebuild (and overwrite)


def _save_operand_cache(
    cache_dir, n, num_bins, out_dtype, int8_mode, cos_out, sin_out, packed
):
    import os
    import tempfile

    os.makedirs(cache_dir, exist_ok=True)
    path = _operand_cache_file(cache_dir, n, num_bins, out_dtype, int8_mode)
    arrays = {"cos": _u16(cos_out), "sin": _u16(sin_out)}
    if packed is not None:
        arrays["packed"] = _u16(packed)
    fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)  # atomic: concurrent builders race benignly
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass


def make_spectrum_ops(
    n: int,
    num_bins: int | None = None,
    method: str = "dft",
    dft_dtype=jnp.float32,
    cache_dir: str | None = None,
) -> SpectrumOps:
    if method not in SPECTRUM_METHODS:
        raise ValueError(f"method must be one of {SPECTRUM_METHODS}")
    if num_bins is None:
        num_bins = default_num_bins(n)
    pow2 = n >= 16 and not (n & (n - 1))
    factorable = pow2 and num_bins <= n // 2
    if method == "auto":
        # reduced-precision configs run the FOLDED matmul, which beats rfft
        # to the materialisation limit (crossover measurement at
        # AUTO_DFT_MAX_N's definition); the f32 unfolded operand loses
        # earlier. Above the materialisation limit the four-step FACTORED
        # DFT keeps the MXU engine with O(N) operands (n=65536 pop 2^13:
        # 918 ms/gen via rfft, benchmarks/chunk_size_flagship.csv — the
        # XLA TPU FFT lowering is the thing to avoid).
        limit = (
            DFT_MAX_MATERIALIZE_N
            if jnp.dtype(dft_dtype) in (jnp.int8, jnp.bfloat16)
            else AUTO_DFT_MAX_N
        )
        if n <= limit:
            method = "dft"
        elif n > DFT_MAX_MATERIALIZE_N and factorable:
            method = "dft_factored"
        else:
            method = "rfft"
    if method == "dft" and n > DFT_MAX_MATERIALIZE_N:
        # An EXPLICIT dft request above the O(N^2) operand materialisation
        # limit resolves to the four-step factored matmul DFT — same
        # MXU-matmul engine family (silent: 'dft' means the matmul DFT
        # family; factoring is a size-dependent implementation detail).
        # Only the non-factorable fallback to rfft warns: THAT changes
        # numerics (exact f32 FFT, no bf16/int8 quantisation).
        if factorable:
            method = "dft_factored"
        else:
            import warnings

            warnings.warn(
                f"spectrum method 'dft' at n={n} exceeds the operand "
                f"materialisation limit (DFT_MAX_MATERIALIZE_N="
                f"{DFT_MAX_MATERIALIZE_N}) and the size/band does not "
                f"factor; falling back to XLA rfft (different numerics)",
                stacklevel=2,
            )
            method = "rfft"
    if method == "dft_factored" and not factorable:
        raise ValueError(
            f"dft_factored needs a power-of-two n >= 16 and num_bins <= n/2 "
            f"(got n={n}, num_bins={num_bins})"
        )
    w = hann_window(n)
    norm = 1.0 / (n * window_factor(n))
    dft_cos = dft_sin = dft_packed = None
    dft_packed_scale = 0.0
    factored = None
    if method == "dft_factored":
        factored = _build_factored_operands(n, norm)
    int8_mode = jnp.dtype(dft_dtype) == jnp.int8
    if int8_mode:
        # the XLA (non-Pallas) spectrum paths keep bf16 operands; only the
        # fused kernels consume the int8 dft_packed (see SpectrumOps docs)
        dft_dtype = jnp.bfloat16
    if method == "dft":
        if int8_mode and n % 2:
            raise ValueError("the int8 folded engine needs even n")
        out_dtype = np.dtype(dft_dtype)
        cos_out = sin_out = packed = None
        if cache_dir is not None and n >= OPERAND_CACHE_MIN_N:
            loaded = _load_operand_cache(
                cache_dir, n, num_bins, out_dtype, int8_mode
            )
            if loaded is not None:
                cos_out, sin_out, packed = loaded
        if cos_out is None:
            cos_out, sin_out, packed = _build_dft_operands(
                n, num_bins, w, norm, int8_mode, out_dtype
            )
            if cache_dir is not None and n >= OPERAND_CACHE_MIN_N:
                _save_operand_cache(
                    cache_dir, n, num_bins, out_dtype, int8_mode,
                    cos_out, sin_out, packed,
                )
        dft_cos = jnp.asarray(cos_out)
        dft_sin = jnp.asarray(sin_out)
        if packed is not None:
            dft_packed = jnp.asarray(packed)
            if int8_mode:
                dft_packed_scale = norm / (63.5 * 63.0)
    return SpectrumOps(
        n=n,
        num_bins=num_bins,
        window=jnp.asarray(w.astype(np.float32)),
        norm=float(norm),
        dft_cos=dft_cos,
        dft_sin=dft_sin,
        method=method,
        dft_dtype=dft_dtype,
        dft_packed=dft_packed,
        dft_packed_scale=dft_packed_scale,
        factored=factored,
    )


def magnitude_spectrum(audio_tm: jax.Array, ops: SpectrumOps) -> jax.Array:
    """Normalised magnitude spectrum of time-major audio.

    Args:
      audio_tm: ``(N, pop)`` float32.
    Returns:
      ``(pop, num_bins)`` float32 — ``|rfft(w*a)| / (N * windowFactor)``,
      mirroring Objective::calculateFFT (Evolutionary_Strategy.hpp:524-542).
    """
    if ops.method == "rfft":
        windowed = audio_tm * ops.window[:, None]
        spec = jnp.fft.rfft(windowed, axis=0)[: ops.num_bins]  # (bins, pop)
        return (jnp.abs(spec).astype(jnp.float32) * jnp.float32(ops.norm)).T
    if ops.method == "dft_factored":
        return magnitude_spectrum_factored(audio_tm, ops)
    # dft: contract over time without transposing the audio. precision=HIGHEST
    # keeps true-f32 MXU passes when inputs are f32 (the default "fastest"
    # lets XLA drop to bf16 multiplies, which costs ~1e-3 relative spectral
    # error — outside the BASELINE.md 1e-3 parity bound). With bf16 inputs the
    # flag is a no-op and the matmul runs at full bf16 MXU rate.
    a = audio_tm.astype(ops.dft_dtype)
    dn = (((0,), (0,)), ((), ()))
    re = jax.lax.dot_general(
        a, ops.dft_cos, dn,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )  # (pop, bins)
    im = jax.lax.dot_general(
        a, ops.dft_sin, dn,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.sqrt(re * re + im * im)


# working-set budget for one factored-DFT population chunk (the
# intermediates are ~7 f32 arrays of N values per candidate; chunking keeps
# large-frame populations inside HBM alongside the audio itself)
FACTORED_CHUNK_BYTES = 1 << 31


def _factored_chunk(n: int, pop: int) -> int:
    per_cand = 28 * n  # x + A_re/im + B_re/im + 4 stage-2 temps, f32
    c = max(128, FACTORED_CHUNK_BYTES // per_cand)
    c = 1 << (c.bit_length() - 1)
    while pop % c:
        c //= 2
    return max(c, 1)


def magnitude_spectrum_factored(
    audio_tm: jax.Array, ops: SpectrumOps, *, prewindowed: bool = False
) -> jax.Array:
    """Normalised magnitude spectrum via the four-step factored DFT — the
    n > DFT_MAX_MATERIALIZE_N engine (VERDICT r3 missing #2; the role of the
    reference's never-dispatched vulkanFFT.comp, realised as MXU matmuls).

    Math and operand layout: FactoredOps docstring. Stage 1 contracts the
    n1 axis ((N1, N1) @ (N1, N2*pop) matmul), the O(N) twiddle multiplies
    elementwise, stage 2 contracts n2 against the k2 < N2/2 half-band, and
    bins reassemble as k = k2*N1 + k1. The population is processed in
    chunks bounding the f32 intermediates to FACTORED_CHUNK_BYTES.

    Precision: f32 operands; with dft_dtype float32 the matmuls run
    precision=HIGHEST (true-f32 MXU passes, ~1e-6 relative spectral error
    vs rfft), with bfloat16 they run one bf16 pass per matmul.

    Args: ``audio_tm`` (N, pop) float32/bf16; ``prewindowed`` skips the
    window multiply (the streamed synthesis kernel,
    kernels/synth_stream.py, applies it in-VMEM). Returns
    (pop, num_bins) f32.
    """
    f = ops.factored
    if f is None:
        raise ValueError("magnitude_spectrum_factored needs SpectrumOps.factored")
    n1, n2 = f.n1, f.n2
    n, pop = audio_tm.shape
    prec = (
        jax.lax.Precision.HIGHEST
        if ops.dft_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    # The DEFAULT-precision (bf16/int8-config) family is HBM-bound on the
    # ~7 (N,)-sized per-candidate intermediates, and its matmuls round
    # operands to bf16 internally anyway — so carry the operands AND the
    # stage-1/twiddle intermediates in bf16 explicitly (halves the traffic
    # of every stage; accumulation stays f32 via preferred_element_type).
    # Hardware: 72.5 -> see tools/tpu_factored_probe.py. The f32 family
    # keeps the full-f32 chain at HIGHEST.
    cd = jnp.float32 if prec == jax.lax.Precision.HIGHEST else jnp.bfloat16
    c1, s1n = f.c1.astype(cd), f.s1n.astype(cd)
    tw_re, tw_imn = f.tw_re.astype(cd), f.tw_imn.astype(cd)
    c2, s2n = f.c2.astype(cd), f.s2n.astype(cd)
    if prewindowed:  # the streamed kernel windows in-VMEM already
        x = audio_tm.astype(cd)
    else:
        x = (audio_tm.astype(jnp.float32) * ops.window[:, None]).astype(cd)

    def one(chunk):  # (N, pc) -> (pc, num_bins)
        pc = chunk.shape[1]
        y = chunk.reshape(n1, n2 * pc)
        dn = (((0,), (0,)), ((), ()))
        a_re = jax.lax.dot_general(
            c1, y, dn, preferred_element_type=jnp.float32, precision=prec
        ).reshape(n1, n2, pc).astype(cd)
        a_im = jax.lax.dot_general(
            s1n, y, dn, preferred_element_type=jnp.float32, precision=prec
        ).reshape(n1, n2, pc).astype(cd)
        b_re = a_re * tw_re[:, :, None] - a_im * tw_imn[:, :, None]
        b_im = a_re * tw_imn[:, :, None] + a_im * tw_re[:, :, None]
        dn2 = (((1,), (0,)), ((), ()))  # contract n2 -> (N1, pc, N2//2)
        kw = dict(preferred_element_type=jnp.float32, precision=prec)
        x_re = jax.lax.dot_general(b_re, c2, dn2, **kw) - jax.lax.dot_general(
            b_im, s2n, dn2, **kw
        )
        x_im = jax.lax.dot_general(b_im, c2, dn2, **kw) + jax.lax.dot_general(
            b_re, s2n, dn2, **kw
        )
        mag = jnp.sqrt(x_re * x_re + x_im * x_im)  # (k1, pc, k2)
        # k = k2*N1 + k1: transpose to (pc, k2, k1) and flatten the band
        mag = jnp.transpose(mag, (1, 2, 0)).reshape(pc, (n2 // 2) * n1)
        return mag[:, : ops.num_bins]

    chunk = _factored_chunk(n, pop)
    if chunk >= pop:
        return one(x)
    xs = x.reshape(n, pop // chunk, chunk).transpose(1, 0, 2)
    out = jax.lax.map(one, xs)  # (pop//chunk, chunk, bins)
    return out.reshape(pop, ops.num_bins)


def magnitude_spectrum_folded(
    audio_tm: jax.Array, ops: SpectrumOps
) -> jax.Array:
    """Normalised magnitude spectrum via the FOLDED operand, pure XLA — the
    large-frame engine (VERDICT r1 missing #2).

    Above the fused kernel's VMEM gate (n >= 4096 at bench populations) the
    DFT matmul dominates the generation (O(N*K) MACs vs O(N) synthesis), and
    XLA tiles an HBM-resident matmul natively with no VMEM budget. This path
    applies the same w[N-n] = w[n] fold as the Pallas kernels
    (SpectrumOps.dft_packed docs): build a+/- = x[n] +- x[N-n] in XLA and
    contract each against the half-length operand — HALF the MACs and
    operand bytes of the naive (N, K) form. With the int8 operand
    (dft_dtype="int8") the audio is additionally quantised per candidate at
    127/max|a| LSB (int32-exact accumulation, 2x the bf16 MXU rate); with
    bf16 the folded sums are bf16-rounded like the kernel's scratch.

    Args: ``audio_tm`` (N, pop) float32 or bf16. Returns (pop, num_bins).
    """
    if ops.dft_packed is None:
        raise ValueError("folded path needs SpectrumOps.dft_packed (even n)")
    n, k = ops.n, ops.num_bins
    x = audio_tm.astype(jnp.float32)
    # a+[m] = x[m] + x[N-m], a-[m] = x[m] - x[N-m] for m = 1..N/2-1;
    # m = 0 pairs with itself (operand column is zero: w[0] = 0) and the
    # x[N/2] edge term is applied post-matmul, exactly like the kernel.
    xr = jnp.concatenate([x[0:1], x[1:][::-1]], axis=0)[: n // 2]
    a_plus = x[: n // 2] + xr
    a_minus = x[: n // 2] - xr
    edge = x[n // 2]  # (pop,)
    int8_mode = ops.dft_packed_scale > 0.0
    # contract operand time axis (dim 1 of the (2K, N/2) packed form)
    # directly against audio time (dim 0) — NO transposes: XLA does not
    # hoist large operand relayouts out of scan bodies (SpectrumOps docs)
    dn = (((1,), (0,)), ((), ()))
    if int8_mode:
        # per-candidate dynamic quantisation: 127 LSB at the folded peak
        peak = jnp.maximum(
            jnp.max(jnp.abs(a_plus), axis=0),
            jnp.maximum(jnp.max(jnp.abs(a_minus), axis=0), jnp.abs(edge)),
        )  # (pop,)
        scale = 127.0 / jnp.maximum(peak, 1e-30)
        qp = jnp.round(a_plus * scale).astype(jnp.int8)
        qm = jnp.round(a_minus * scale).astype(jnp.int8)
        u = jax.lax.dot_general(
            ops.dft_packed[:k], qp, dn, preferred_element_type=jnp.int32
        ).astype(jnp.float32)  # (K, pop); f32 cast exact to ~2^24, rel 6e-8 above
        v = jax.lax.dot_general(
            ops.dft_packed[k:], qm, dn, preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        eq = jnp.round(edge * scale)  # quantised edge sample (f32 carrier)
        kpar = (-1.0) ** jnp.arange(k, dtype=jnp.float32)
        # edge operand entry is w[N/2]*cos(pi k) = 2*(-1)^k; quantised at
        # 63.5 LSB/unit -> exactly +-127 (matches the kernel's edge_norm)
        u = u + (127.0 * kpar)[:, None] * eq[None, :]
        mag = jnp.sqrt(u * u + v * v)  # (K, pop)
        # operand rows are round(63.5 * w * trig) WITHOUT norm (see
        # SpectrumOps); audio LSB is peak/127
        rescale = jnp.float32(ops.norm / 63.5) * peak / 127.0
        return (mag * rescale[None, :]).T
    qp = a_plus.astype(jnp.bfloat16)
    qm = a_minus.astype(jnp.bfloat16)
    u = jax.lax.dot_general(
        ops.dft_packed[:k], qp, dn, preferred_element_type=jnp.float32
    )
    v = jax.lax.dot_general(
        ops.dft_packed[k:], qm, dn, preferred_element_type=jnp.float32
    )
    # bf16 operand folds window+norm; edge coefficient 2*norm*(-1)^k
    kpar = (-1.0) ** jnp.arange(k, dtype=jnp.float32)
    u = u + (2.0 * jnp.float32(ops.norm) * kpar)[:, None] * edge[None, :]
    return jnp.sqrt(u * u + v * v).T


def magnitude_spectrum_prefolded(
    a_plus: jax.Array,  # (N/2, pop) int8 or bf16 (f32 on CPU interpret)
    a_minus: jax.Array,
    edge: jax.Array,  # (pop,) f32 — x[N/2], quantised in int8 mode
    mag_scale: jax.Array,  # (pop,) f32 — |amp|*dft_scale (int8) or ones
    ops: SpectrumOps,
) -> jax.Array:
    """Spectrum from PRE-folded (and pre-quantised) audio — the XLA half of
    the large-frame hybrid (kernels/synth_fold.py): two (K, N/2) dots, the
    x[N/2] edge term, magnitude, per-candidate rescale. Numerics match the
    fully-fused kernel exactly in int8 mode (same integer accumulation,
    same +-127 edge coefficient). Returns (pop, num_bins)."""
    k = ops.num_bins
    int8_mode = ops.dft_packed_scale > 0.0
    dn = (((1,), (0,)), ((), ()))
    acc = jnp.int32 if int8_mode else jnp.float32
    # CPU interpret carries bf16 values in f32 (no XLA:CPU bf16 dot, values
    # already bf16-rounded by the kernel) — match the operand dtype to it
    packed = ops.dft_packed if int8_mode else ops.dft_packed.astype(a_plus.dtype)
    u = jax.lax.dot_general(
        packed[:k], a_plus, dn, preferred_element_type=acc
    ).astype(jnp.float32)
    v = jax.lax.dot_general(
        packed[k:], a_minus, dn, preferred_element_type=acc
    ).astype(jnp.float32)
    kpar = (-1.0) ** jnp.arange(k, dtype=jnp.float32)
    edge_norm = 127.0 if int8_mode else 2.0 * float(ops.norm)
    u = u + (edge_norm * kpar)[:, None] * edge[None, :]
    mag = jnp.sqrt(u * u + v * v)  # (K, pop)
    return (mag * mag_scale[None, :]).T


def target_spectrum(target_audio: jax.Array, ops: SpectrumOps) -> jax.Array:
    """Spectrum of one target frame — setTargetAudio / Objective::calculateFFT
    (Evolutionary_Strategy_OpenCL.hpp:563-570). Returns ``(num_bins,)``."""
    return magnitude_spectrum(target_audio[:, None], ops)[0]


def spectral_fitness(spectra: jax.Array, target: jax.Array) -> jax.Array:
    """L2 spectral error per candidate.

    ``err_p = sum_k (spectra[p,k] - target[k])^2`` — fitnessPopulation
    (kernels/ocl_program.cl:594-659, CPU: Evolutionary_Strategy_CPU.hpp:228-280).

    Args:
      spectra: ``(pop, bins)``; target: ``(bins,)``.
    Returns: ``(pop,)`` float32.
    """
    d = spectra - target[None, :]
    return jnp.sum(d * d, axis=-1)


def evaluate_fitness(audio_tm: jax.Array, target: jax.Array, ops: SpectrumOps) -> jax.Array:
    """window -> spectrum -> L2 error, fused. ``(N,pop),(bins,) -> (pop,)``."""
    return spectral_fitness(magnitude_spectrum(audio_tm, ops), target)


# --------------------------------------------------------------------------
# Multi-frame STFT fitness (SURVEY.md §5.7 / BASELINE.json config 2):
# a candidate synthesises frames*N continuous samples and is scored against
# the target's framewise magnitude spectra — blockwise STFT matching with a
# single parameter set instead of the reference's fresh-population-per-chunk
# loop (Evolutionary_Strategy_OpenCL.hpp:586-598).
# --------------------------------------------------------------------------

def magnitude_spectrum_frames(audio_tm: jax.Array, ops: SpectrumOps) -> jax.Array:
    """Framewise spectra of ``(frames*N, pop)`` audio -> ``(frames, pop, bins)``."""
    total, pop = audio_tm.shape
    frames = total // ops.n
    a = audio_tm.reshape(frames, ops.n, pop)
    if ops.method == "rfft":
        windowed = a * ops.window[None, :, None]
        spec = jnp.fft.rfft(windowed, axis=1)[:, : ops.num_bins]  # (F, bins, pop)
        return jnp.swapaxes(
            jnp.abs(spec).astype(jnp.float32) * jnp.float32(ops.norm), 1, 2
        )
    if ops.method == "dft_factored":
        return jax.vmap(lambda fr: magnitude_spectrum_factored(fr, ops))(a)
    x = a.astype(ops.dft_dtype)
    re = jnp.einsum("fnp,nk->fpk", x, ops.dft_cos,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    im = jnp.einsum("fnp,nk->fpk", x, ops.dft_sin,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    return jnp.sqrt(re * re + im * im)


def target_spectrum_frames(target_audio: jax.Array, ops: SpectrumOps) -> jax.Array:
    """``(frames*N,)`` target -> ``(frames, bins)`` framewise spectra."""
    return magnitude_spectrum_frames(target_audio[:, None], ops)[:, 0, :]


def stft_fitness(audio_tm: jax.Array, target_frames: jax.Array, ops: SpectrumOps) -> jax.Array:
    """Summed framewise L2 spectral error: ``(F*N, pop), (F, bins) -> (pop,)``."""
    spectra = magnitude_spectrum_frames(audio_tm, ops)  # (F, pop, bins)
    d = spectra - target_frames[:, None, :]
    return jnp.sum(d * d, axis=(0, 2))
