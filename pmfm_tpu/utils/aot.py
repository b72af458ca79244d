"""AOT export/load of the flagship matcher via ``jax.export``.

The reference compiles its device program at every startup (clBuildProgram
with -D constants, Evolutionary_Strategy_OpenCL.hpp:246-265; SPIR-V loaded
from disk after an offline glslangValidator pass, shaders/compile.bat). The
offline-compile analog for the TPU build: serialize the fully-staged STFT
matcher (StableHLO, platform-checked) to a self-describing artifact that a
serving process can load and run without retracing Python — and, combined
with the persistent compilation cache, without recompiling. This also
sidesteps the remote-compile-service hangs documented in CLAUDE.md: the
exported artifact is traced/lowered once, and the first `.call` populates
the XLA executable cache keyed by the stable module bytes.

Artifact format (one file)::

    b"PMFMAOT1" | u32 header_len | header JSON (utf-8) | jax.export blob

The header carries the full ESConfig, generation count, target length and
platforms, so ``load_matcher`` needs no side-channel configuration.

MESH EXPORT (round 5): ``export_matcher(..., mesh_devices=M)`` traces the
population-SHARDED matcher (parallel/sharded.py) over an M-device mesh;
``jax.export`` records the device count and shardings, and the artifact's
header carries ``mesh_devices`` so ``load_matcher`` can verify the
consumer has at least that many devices of the export platform. A
single-chip artifact (the default) stays exactly as before. The reference
has no AOT capability at all, so either flavour bounds an upgrade, not a
parity gap.
"""
from __future__ import annotations

import dataclasses
import io
import json
import os
import struct
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from ..es.config import ESConfig

_MAGIC = b"PMFMAOT1"
_REGISTERED = False


def _register_pytrees() -> None:
    """jax.export serializes in/out pytrees by registered type; ESState is a
    NamedTuple and needs a one-time registration (idempotent)."""
    global _REGISTERED
    if _REGISTERED:
        return
    from ..es.strategy import ESState

    jax_export.register_namedtuple_serialization(
        ESState, serialized_name="pmfm_tpu.es.strategy.ESState"
    )
    _REGISTERED = True


def config_to_dict(cfg: ESConfig) -> dict:
    return dataclasses.asdict(cfg)


def config_from_dict(d: dict) -> ESConfig:
    d = dict(d)
    for k in ("param_mins", "param_maxs"):
        if k in d and d[k] is not None:
            d[k] = tuple(d[k])
    return ESConfig(**d)


def _make_run(cfg: ESConfig, num_generations: int, mesh=None):
    """(seed u32 scalar, target_audio (F*N,) f32) -> flat dict of results.

    Wraps the flagship STFT matcher (es/pipeline._compiled_stft_matcher —
    target spectrum, init, the full evolve scan, best-candidate resynthesis)
    behind a plain-array signature: PRNG key construction moves inside so
    callers pass a u32 seed, and the output is a string-keyed dict (natively
    serializable pytree; no custom-type registration needed on the consumer
    side). With ``mesh`` the evolve loop runs population-sharded
    (parallel/sharded.py shard_map collectives — exported as StableHLO
    collectives over the mesh's device count)."""
    from ..es.pipeline import _compiled_stft_matcher

    inner = _compiled_stft_matcher(cfg, num_generations, False, mesh)

    def run(seed, target_audio):
        final, _traj, best_scaled, best_audio = inner(
            jax.random.PRNGKey(seed), target_audio
        )
        return {
            "best_params_scaled": best_scaled,
            "best_params_norm": final.best_values,
            "best_fitness": final.best_fitness,
            "generations_run": final.generation,
            "parent_values": final.parent_values,
            "parent_fitness": final.parent_fitness,
            "best_audio": best_audio,
        }

    return jax.jit(run)


def export_matcher(
    cfg: ESConfig,
    num_generations: int,
    target_samples: int | None = None,
    *,
    platforms: Sequence[str] | None = None,
    allow_unstable_custom_calls: bool = True,
    mesh_devices: int | None = None,
) -> bytes:
    """Export the STFT matcher for ``cfg`` to a serialized artifact.

    ``target_samples`` defaults to one frame (``cfg.num_frames * n_samples``
    once the frame count is folded in); it must be a multiple of the frame
    size. ``platforms`` defaults to the current backend. Pallas/Mosaic
    kernels lower to the ``tpu_custom_call`` StableHLO custom call, which
    has no cross-release stability guarantee — exporting a fused-kernel
    config requires ``allow_unstable_custom_calls`` (fine when the artifact
    is consumed by the same JAX/libtpu build that produced it; set
    ``fused_kernel=False`` for a fully stable artifact).
    """
    _register_pytrees()
    n = cfg.n_samples
    if target_samples is None:
        target_samples = cfg.num_frames * n
    if target_samples < n or target_samples % n:
        raise ValueError(
            f"target_samples={target_samples} must be a positive multiple of "
            f"the frame size {n}"
        )
    cfg = cfg.replace(num_frames=target_samples // n)
    mesh = None
    if mesh_devices is not None and mesh_devices > 1:
        from ..parallel import make_mesh

        mesh = make_mesh(shape=(mesh_devices,))
    run = _make_run(cfg, num_generations, mesh)
    kwargs: dict[str, Any] = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    if allow_unstable_custom_calls:
        kwargs["disabled_checks"] = [
            jax_export.DisabledSafetyCheck.custom_call("tpu_custom_call"),
            jax_export.DisabledSafetyCheck.custom_call("Sharding"),
        ]
    exported = jax_export.export(run, **kwargs)(
        jax.ShapeDtypeStruct((), jnp.uint32),
        jax.ShapeDtypeStruct((target_samples,), jnp.float32),
    )
    header = {
        "config": config_to_dict(cfg),
        "num_generations": num_generations,
        "target_samples": target_samples,
        "platforms": list(exported.platforms),
        # number of mesh devices the computation was traced over (1 =
        # single-chip); jax.export also records it (exported.nr_devices),
        # the header copy makes the artifact self-describing pre-parse
        "mesh_devices": int(getattr(exported, "nr_devices", 1)),
    }
    hdr = json.dumps(header, sort_keys=True).encode()
    buf = io.BytesIO()
    buf.write(_MAGIC)
    buf.write(struct.pack("<I", len(hdr)))
    buf.write(hdr)
    buf.write(exported.serialize())
    return buf.getvalue()


def save_matcher(path: str | os.PathLike, *args, **kwargs) -> str:
    """``export_matcher`` straight to a file (atomic replace)."""
    path = os.fspath(path)
    blob = export_matcher(*args, **kwargs)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return path


class AOTMatcher:
    """A deserialized matcher artifact.

    ``matcher(seed, target_audio)`` runs the exported computation (compiled
    on first call, cached after) and returns numpy results. The embedded
    config/generation metadata make the artifact self-describing.
    """

    def __init__(self, cfg: ESConfig, num_generations: int,
                 target_samples: int, platforms: list[str], exported,
                 mesh_devices: int = 1):
        self.cfg = cfg
        self.num_generations = num_generations
        self.target_samples = target_samples
        self.platforms = platforms
        self.mesh_devices = mesh_devices
        self._exported = exported

    def __call__(self, seed: int, target_audio: np.ndarray) -> dict[str, np.ndarray]:
        target_audio = np.asarray(target_audio, np.float32)
        if target_audio.shape != (self.target_samples,):
            raise ValueError(
                f"artifact expects target of shape ({self.target_samples},), "
                f"got {target_audio.shape}"
            )
        if self.mesh_devices > len(jax.devices()):
            raise RuntimeError(
                f"artifact was exported over a {self.mesh_devices}-device "
                f"mesh but only {len(jax.devices())} devices are visible"
            )
        if self.mesh_devices > 1:
            # a multi-device export must be CALLED in a context with the
            # same device count: jit the call with replicated argument
            # shardings over a mesh of exactly nr_devices — the exported
            # computation's internal shardings take over from there
            from jax.sharding import Mesh, NamedSharding, PartitionSpec

            mesh = Mesh(
                np.asarray(jax.devices()[: self.mesh_devices]), ("aot",)
            )
            rep = NamedSharding(mesh, PartitionSpec())
            call = jax.jit(self._exported.call, in_shardings=(rep, rep))
        else:
            call = self._exported.call
        out = call(jnp.uint32(seed), jnp.asarray(target_audio))
        return {k: np.asarray(v) for k, v in out.items()}


def load_matcher(src: str | os.PathLike | bytes) -> AOTMatcher:
    """Load an artifact produced by ``export_matcher``/``save_matcher``."""
    _register_pytrees()
    if isinstance(src, (bytes, bytearray)):
        blob = bytes(src)
    else:
        with open(os.fspath(src), "rb") as f:
            blob = f.read()
    if blob[: len(_MAGIC)] != _MAGIC:
        raise ValueError("not a PMFM AOT artifact (bad magic)")
    off = len(_MAGIC)
    (hdr_len,) = struct.unpack_from("<I", blob, off)
    off += 4
    header = json.loads(blob[off : off + hdr_len].decode())
    off += hdr_len
    exported = jax_export.deserialize(blob[off:])
    return AOTMatcher(
        cfg=config_from_dict(header["config"]),
        num_generations=int(header["num_generations"]),
        target_samples=int(header["target_samples"]),
        platforms=list(header["platforms"]),
        exported=exported,
        mesh_devices=int(header.get("mesh_devices", 1)),
    )
