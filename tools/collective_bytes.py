"""Measure the sharded generation's per-generation collective payload from
the COMPILED executable (not an estimate): compile sharded_generation_step
on an 8-device mesh, walk the optimized (SPMD, per-device) HLO, and sum the
output bytes of every collective instruction.

The design claim (parallel/sharded.py, docs/DISTRIBUTED.md) is that
selection is the only communicating stage and its payload is O(mu*(2D+1))
per device, INDEPENDENT of population size. This tool verifies both: run it
and compare the byte totals at two population sizes.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/collective_bytes.py

tests/test_parallel.py runs the same measurement as a regression test.
"""
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

COLLECTIVES = (
    "all-gather", "all-reduce", "reduce-scatter", "collective-permute",
    "all-to-all",
)
_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1, "pred": 1,
}
# `%x = f32[8,256,6]{...} all-gather(...)` — possibly inside a tuple shape
_INSTR = re.compile(
    r"=\s*(?:\(([^)]*)\)|(\w+\[[\d,]*\])\S*)\s+(" + "|".join(COLLECTIVES) + r")\("
)
_SHAPE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(tok: str) -> int:
    m = _SHAPE.match(tok)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def collective_stats(hlo_text: str) -> dict:
    """Per-collective-op output bytes (per device) from optimized HLO."""
    out: dict[str, dict] = {}
    for m in _INSTR.finditer(hlo_text):
        tuple_body, single, op = m.groups()
        if single is not None:
            nbytes = _shape_bytes(single)
        else:
            nbytes = sum(
                _shape_bytes(t.strip()) for t in tuple_body.split(",")
            )
        rec = out.setdefault(op, {"count": 0, "bytes": 0})
        rec["count"] += 1
        rec["bytes"] += nbytes
    out["total_bytes"] = sum(
        v["bytes"] for k, v in out.items() if isinstance(v, dict)
    )
    return out


def measure(pop: int, mu: int = 64, frames: int = 1, mesh_shape=None):
    """Compile one sharded generation and return its collective stats."""
    import jax
    import jax.numpy as jnp

    from pmfm_tpu.es import ESConfig, init_state, make_spectrum_ops
    from pmfm_tpu.parallel import make_mesh
    from pmfm_tpu.parallel.mesh import FRAME_AXIS, POP_AXIS
    from pmfm_tpu.parallel.sharded import sharded_generation_step

    if mesh_shape is None:
        mesh = make_mesh()
    else:
        mesh = make_mesh(shape=mesh_shape, axis_names=(POP_AXIS, FRAME_AXIS))
    cfg = ESConfig(
        num_parents=mu, num_offspring=pop - mu, num_dimensions=6,
        topology="fm3_series", audio_length_log2=8,
        synthesis_engine="scanless", num_frames=frames,
    )
    so = make_spectrum_ops(cfg)
    tshape = (frames, so.num_bins) if frames > 1 else (so.num_bins,)
    tspec = jnp.ones(tshape, jnp.float32)
    state = init_state(jax.random.PRNGKey(0), cfg)

    step = jax.jit(
        lambda s: sharded_generation_step(s, tspec, so, cfg, mesh)
    )
    compiled = step.lower(state).compile()
    return collective_stats(compiled.as_text())


def main() -> int:
    import jax

    # in-process CPU force: this machine's sitecustomize overrides the
    # JAX_PLATFORMS env var (CLAUDE.md gotcha) and the analysis is
    # platform-independent anyway
    jax.config.update("jax_platforms", "cpu")
    print(f"devices={jax.device_count()} ({jax.default_backend()})")
    rows = []
    for pop, mu, frames, shape, label in (
        (1 << 12, 64, 1, None, "pop 2^12, mu 64, 1-D pop mesh"),
        (1 << 15, 64, 1, None, "pop 2^15, mu 64, 1-D pop mesh"),
        (1 << 12, 64, 4, (4, 2), "pop 2^12, mu 64, 2-D (pop x frame)"),
    ):
        stats = measure(pop, mu, frames, shape)
        rows.append((label, stats))
        print(f"{label}: {stats}")
    a, b = rows[0][1]["total_bytes"], rows[1][1]["total_bytes"]
    print(f"\npop-independence: {a} bytes at 2^12 vs {b} bytes at 2^15 "
          f"-> {'OK (O(mu), not O(P))' if a == b else 'MISMATCH'}")
    return 0 if a == b else 1


if __name__ == "__main__":
    raise SystemExit(main())
