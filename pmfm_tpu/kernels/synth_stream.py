"""Huge-frame hybrid: STREAMED Pallas synthesis, factored DFT in XLA.

Above ``synth_fold``'s reach (n > 32768: the folded (2K, N/2) operand
exceeds ``DFT_MAX_MATERIALIZE_N`` and the (N/2, PB) fold output blocks
exceed scoped VMEM even at PB = 128) the spectrum already runs the
four-step factored matmul DFT (``ops/spectral.py::FactoredOps``) — but
synthesis still ran the pure-XLA scanless path, which materialises ~10
(N, pop) float intermediates in HBM and dominates the generation
(tools/tpu_factored_probe.py; same finding as the n=8192 hybrid,
kernels/synth_fold.py docstring).

This kernel streams the synthesis through VMEM in (C, PB) time blocks
over a (pop_blocks, time_chunks) grid: the phase-offset carries persist
in scratch across the (sequential) time-chunk grid axis, so the only
HBM traffic is the final windowed audio itself — one (N, pop) bf16 (or
f32 for the true-f32 engine) array, which
``spectral.magnitude_spectrum_factored(..., prewindowed=True)`` consumes
directly. The synthesis numerics are ``_make_block_synth`` — the same
single definition the fused in-VMEM engines run (turns-domain phases,
polynomial sine), so quality gates transfer.

The Hann window is applied IN-KERNEL (one (C, 1) column broadcast per
block) because the factored DFT cannot fold it into either matmul stage:
w[n1*N2 + n2] is not separable across the (n1, n2) split, and windowing
in XLA would cost an extra (N, pop) f32 round trip — the very traffic
this kernel exists to avoid.

Reference anchor: the arbitrary-audioLengthLog2 role of the reference's
never-dispatched Stockham shader (/root/reference/shaders/
vulkanFFT.comp:68-122) together with its synthesisePopulation stage
(/root/reference/kernels/ocl_program.cl:280-330).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.wavetable import DEFAULT_SAMPLE_RATE, DEFAULT_WAVETABLE_SIZE
from .synth_fitness import (
    TIME_BLOCK,
    _make_block_synth,
    _tri_strict,
    resolve_pop_block,
)

# time blocks synthesised per grid step: amortises the per-step block
# issue over 8 (C, PB) emissions; the (TC, PB) output block double-buffers
# at 2 * 1024 * PB * dtype bytes (4 MB at PB=1024 bf16) — comfortably
# inside scoped VMEM with the kernel's tiny operand set
BLOCKS_PER_CHUNK = 8


def stream_chunk(n: int, time_block: int = TIME_BLOCK) -> int:
    """Default time-chunk length: BLOCKS_PER_CHUNK blocks, clipped to the
    frame. The phase carries cross chunks as exact (frac'd) f32 through
    scratch, so chunking only perturbs numerics at the compiler's
    FMA-contraction level (ULPs — amplified only by chaotic deep-chain
    candidates, like every other engine-internal choice; PARITY.md)."""
    return min(n, BLOCKS_PER_CHUNK * time_block)


def _stream_kernel(
    params_ref,  # (D, PB) f32 scaled params
    tri_ref,  # (C+8, C) f32 prefix matrix
    win_ref,  # (TC, 1) f32 window slice for this time chunk
    out_ref,  # (TC, PB) out block — windowed audio
    offs_ref,  # (L8, PB) f32 scratch: phase-offset carries across chunks
    *,
    topology: str,
    pb: int,
    c: int,
    blocks: int,
    wts: float,
    w2sr: float,
    sine_order: int,
    audio_f32: bool,
):
    t = pl.program_id(1)
    block_synth, offs0, _ = _make_block_synth(
        params_ref[:], tri_ref[:], topology=topology, pb=pb, c=c, wts=wts,
        w2sr=w2sr, dft_scale=0.0, sine_order=sine_order, audio_f32=audio_f32,
    )
    ell = len(offs0)

    @pl.when(t == 0)
    def _init():
        offs_ref[:] = jnp.zeros_like(offs_ref)

    offs = tuple(offs_ref[j : j + 1, :] for j in range(ell))
    win = win_ref[:]  # (TC, 1)
    for i in range(blocks):  # static offsets: Mosaic-provable alignment
        out, offs = block_synth(offs)
        w_blk = win[i * c : (i + 1) * c, :]  # (C, 1) — lane-axis broadcast
        out_ref[i * c : (i + 1) * c, :] = (out * w_blk).astype(out_ref.dtype)
    for j in range(ell):
        offs_ref[j : j + 1, :] = offs[j]


@functools.partial(
    jax.jit,
    static_argnames=(
        "topology", "n", "wavetable_size", "sample_rate", "pop_block",
        "interpret", "time_block", "sine_order", "audio_f32", "time_chunk",
    ),
)
def fused_synth_stream(
    params_scaled: jax.Array,  # (P, D) f32
    window: jax.Array,  # (N,) f32
    *,
    topology: str = "fm3_series",
    n: int = 65536,
    wavetable_size: int = DEFAULT_WAVETABLE_SIZE,
    sample_rate: int = DEFAULT_SAMPLE_RATE,
    pop_block: int = 1024,
    interpret: bool = False,
    time_block: int = TIME_BLOCK,
    sine_order: int = 9,
    audio_f32: bool = False,
    time_chunk: int | None = None,  # None = stream_chunk(n)
) -> jax.Array:
    """Synthesise + window the whole population, streamed; single frame.

    Returns windowed time-major audio ``(N, P)`` — bf16, or f32 when
    ``audio_f32`` (the true-f32 engine: HIGHEST-precision phase prefix,
    f32 emission). Feed to ``spectral.magnitude_spectrum_factored(...,
    prewindowed=True)``.
    """
    pop, d = params_scaled.shape
    tc = time_chunk if time_chunk is not None else stream_chunk(n, time_block)
    if tc % time_block or n % tc:
        raise ValueError(f"n={n} must be a multiple of the chunk {tc}")
    pb = resolve_pop_block(pop, pop_block)
    params_t = params_scaled.T.astype(jnp.float32)
    tri = jnp.asarray(_tri_strict(time_block))
    win2d = window.astype(jnp.float32).reshape(n, 1)
    sdtype = jnp.float32 if (audio_f32 or interpret) else jnp.bfloat16
    kernel = functools.partial(
        _stream_kernel,
        topology=topology,
        pb=pb,
        c=time_block,
        blocks=tc // time_block,
        wts=float(wavetable_size),
        w2sr=wavetable_size / float(sample_rate),
        sine_order=sine_order,
        audio_f32=audio_f32,
    )
    kwargs = {}
    if not interpret:
        # time chunks carry the phase offsets through scratch: sequential
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        )
    # scratch sublanes pad to the f32 tile (8); series fm{k} needs k rows,
    # parallel fm{k} needs 2k
    ell8 = max(8, _num_offsets(topology))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, pop), sdtype),
        grid=(pop // pb, n // tc),
        in_specs=[
            pl.BlockSpec((d, pb), lambda p, t: (0, p), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (time_block + 8, time_block), lambda p, t: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((tc, 1), lambda p, t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tc, pb), lambda p, t: (t, p), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((ell8, pb), jnp.float32)],
        interpret=interpret,
        **kwargs,
    )(params_t, tri, win2d)


def _num_offsets(topology: str) -> int:
    from ..ops.synthesis import parallel_pairs, series_ops

    k = series_ops(topology)
    if k:
        return k
    return 2 * (parallel_pairs(topology) or 1)
