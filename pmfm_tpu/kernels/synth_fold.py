"""Large-frame hybrid: fused synthesis + FOLD in Pallas, DFT + fitness in XLA.

Above the fused kernels' VMEM gate (audioLengthLog2 >= 12-13 at bench
populations) the bottleneck is NOT the spectrum matmul — it is the XLA
synthesis path, which materialises several (N, pop) float intermediates in
HBM (~60 ms/gen at n=8192, pop 2^15: every engine variant ties because
synthesis dominates — tools/tpu_largeframe_probe.py). This kernel keeps the
synthesis + window-fold on-core (the part XLA does badly) and emits only
the folded, quantised half-length audio:

  outputs per candidate: a+/- = q[n] +- q[N-n] (N/2 rows, int8 or bf16),
  plus an (8, pop) aux row pair [x[N/2] edge sample; int8 magnitude scale].

The (2K, N/2) DFT contraction then runs in plain XLA
(spectral.magnitude_spectrum_prefolded), which tiles an HBM-resident matmul
natively with no VMEM budget — the fold and int8 still buy their 2x + 2x
on the MXU. HBM round trip for the folded audio is (N/2)*pop bytes * 2
(int8) ~ 0.25 GB/gen at n=8192, pop 2^15 — cents against the ~60 ms it
replaces.

The synthesis/fold code is literally synth_fitness._evaluate_block in
EMIT-ONLY mode (dft_ref=None), so the numerics are identical to the fused
in-VMEM engine (same polynomial oscillator, same quantisation, same fold).
Reference anchor: the role vulkanFFT.comp was meant to play for arbitrary
audioLengthLog2 (/root/reference/shaders/vulkanFFT.comp:68-122,
parameters.json:13).
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
    _evaluate_block,
    _synth_emit_looped,
    _tri_strict,
    resolve_pop_block,
)

# Above this frame size the time loop runs as an in-kernel fori_loop
# (_synth_emit_looped): the fully-unrolled body's Mosaic compile time grows
# linearly in nb = n/C (measured >10 min at n=16384) while the loop's is
# flat; at n <= 8192 the unrolled form stays (marginally faster steady
# state, already-validated compiles).
LOOPED_ABOVE_N = 8192


def fold_pop_block(pop: int, pop_block: int, n: int, int8_mode: bool) -> int:
    """The pop_block this kernel actually uses: the (N/2, PB) output block
    pair is the VMEM budget (Mosaic double-buffers blocked outputs, so the
    scoped cost is ~2x the block bytes). 8 MB of blocks fits at n=8192
    (measured); larger n needs headroom for the longer unrolled body —
    n=16384 at the same 8 MB ran 68 KB over the 16 MB scoped limit. One
    definition shared with the strategy gate (_synth_fold_ok)."""
    pb = resolve_pop_block(pop, pop_block)
    bytes_per = 1 if int8_mode else 2
    budget = _fold_budget(n)
    while pb > 128 and 2 * (n // 2) * pb * bytes_per > budget:
        pb //= 2
    return pb


def _fold_budget(n: int) -> int:
    # Mosaic double-buffers blocked outputs, so scoped VMEM ~= 2x the block
    # bytes + the kernel body's stack. 8 MB of blocks fit at n <= 4096;
    # at n = 8192 the same 8 MB went 2.02 MB over the 16 MB scoped limit
    # once the _make_block_synth refactor's register allocation grew the
    # stack (hardware-measured 2026-08-21), so larger frames cap blocks at
    # 4 MB (PB halves; throughput within a few % of the 8 MB setting).
    return (8 if n <= 4096 else 4) * (1 << 20)


def fold_vmem_ok(pop: int, pop_block: int, n: int, int8_mode: bool) -> bool:
    """Whether the (N/2, PB) output-block pair actually fits the budget at
    the PB ``fold_pop_block`` settles on (PB stops halving at 128 — the
    Mosaic lane tile — so huge-n/bf16 configs can end up over budget and
    must fall back to the folded-XLA engine; strategy._synth_fold_ok)."""
    pb = fold_pop_block(pop, pop_block, n, int8_mode)
    bytes_per = 1 if int8_mode else 2
    return 2 * (n // 2) * pb * bytes_per <= _fold_budget(n)


def _fold_kernel(
    params_ref,  # (D, PB) f32 scaled params
    tri_ref,  # (C+8, C) f32
    aplus_ref,  # (N/2, PB) out block — folded a+
    aminus_ref,  # (N/2, PB) out block — folded a-
    aux_ref,  # (8, PB) f32 out block: row 0 = x[N/2], row 1 = mag_scale
    *scratches,  # looped mode only: (C, PB) prev-block carry
    looped: bool,
    **statics,
):
    pb = statics["pb"]
    if looped:
        edge_q, mag_scale = _synth_emit_looped(
            params_ref[:], tri_ref[:], aplus_ref, aminus_ref, scratches[0],
            **statics,
        )
    else:
        edge_q, mag_scale = _evaluate_block(
            params_ref[:], None, None, tri_ref[:], aplus_ref, aminus_ref,
            **statics,
        )
    if mag_scale is None:  # bf16 mode: no per-candidate rescale
        mag_scale = jnp.ones((1, pb), jnp.float32)
    aux_ref[:] = jnp.concatenate(
        [edge_q, mag_scale, jnp.zeros((6, pb), jnp.float32)], axis=0
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "topology", "n", "wavetable_size", "sample_rate", "pop_block",
        "interpret", "time_block", "dft_scale", "sine_order", "looped",
    ),
)
def fused_synth_fold(
    params_scaled: jax.Array,  # (P, D) f32
    *,
    topology: str = "fm3_series",
    n: int = 8192,
    wavetable_size: int = DEFAULT_WAVETABLE_SIZE,
    sample_rate: int = DEFAULT_SAMPLE_RATE,
    pop_block: int = 512,
    interpret: bool = False,
    time_block: int = TIME_BLOCK,
    dft_scale: float = 0.0,
    sine_order: int = 9,
    looped: bool | None = None,  # None = auto (n > LOOPED_ABOVE_N)
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Synthesise + fold the whole population; single frame only.

    Returns ``(a_plus (N/2, P), a_minus (N/2, P), edge (P,), mag_scale (P,))``
    where the a's are int8 (``dft_scale > 0``) or bf16. Feed to
    ``spectral.magnitude_spectrum_prefolded``.
    """
    pop, d = params_scaled.shape
    int8_mode = dft_scale > 0.0
    if looped is None:
        looped = n > LOOPED_ABOVE_N
    # the (N/2, PB) output blocks are the VMEM budget: PB shrinks for huge n
    pb = fold_pop_block(pop, pop_block, n, int8_mode)
    if n % (2 * time_block):
        raise ValueError(f"n={n} must be a multiple of {2 * time_block}")
    params_t = params_scaled.T.astype(jnp.float32)
    tri = jnp.asarray(_tri_strict(time_block))
    sdtype = (
        jnp.int8 if int8_mode else (jnp.float32 if interpret else jnp.bfloat16)
    )
    kernel = functools.partial(
        _fold_kernel,
        looped=looped,
        topology=topology,
        n=n,
        pb=pb,
        k=8,  # unused in emit-only mode (edge-coef constants are DCE'd)
        c=time_block,
        wts=float(wavetable_size),
        w2sr=wavetable_size / float(sample_rate),
        num_frames=1,
        dft_scale=dft_scale,
        sine_order=sine_order,
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        )
    a_plus, a_minus, aux = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n // 2, pop), sdtype),
            jax.ShapeDtypeStruct((n // 2, pop), sdtype),
            jax.ShapeDtypeStruct((8, pop), jnp.float32),
        ),
        grid=(pop // pb,),
        in_specs=[
            pl.BlockSpec((d, pb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (time_block + 8, time_block), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec((n // 2, pb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n // 2, pb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, pb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=(
            [pltpu.VMEM((time_block, pb), sdtype)] if looped else []
        ),  # looped mode: the previous quantised block (register pressure
        # would explode if carried through the fori_loop)
        interpret=interpret,
        **kwargs,
    )(params_t, tri)
    return a_plus, a_minus, aux[0], aux[1]
