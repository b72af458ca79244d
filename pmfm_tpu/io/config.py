"""JSON configuration with the reference schema plus TPU extensions.

Reference schema (parameters.json:1-42, parsed in main.cpp:54-103,
SURVEY.md §5.6):

  general:      isDebug, isAudio, outputAudioPath, isBenchmarking, isLog
  audio:        sampleRate, audioLengthLog2, wavetableSize
  evolutionary: numParents, numOffspring, numDimensions, paramMins, paramMaxs,
                fitnessThreshold, numGenerations
  type:         implementation (CPU|OpenCL|Vulkan|CUDA|TPU), per-backend
                workgroupSize, input (params|audio), params, audio

Reference quirks deliberately fixed (SURVEY.md §7.4/§5.6):
  * ``wavetableSize`` is honoured (the reference parses it and then hardcodes
    32768);
  * ``fitnessThreshold`` can be made live as an early-stop criterion (dead
    in the reference) by setting ``tpu.useFitnessThreshold: true`` — opt-in
    so unmodified reference configs keep reference behaviour (their
    threshold values assume it is never consulted);
  * ``implementation`` values naming GPU backends are accepted and mapped to
    the TPU engine (so reference config files run unmodified).

TPU extension section (all optional)::

  "tpu": {
    "topology": "fm3_series",       # fm2 | fm{k}_series | fm{k}_parallel
    "synthesisEngine": "scan",      # scan | scanless
    "fusedKernel": false,           # Pallas fused synth+DFT+fitness kernel
    "fusedGeneration": false,       # whole generation in one kernel (TPU only)
    "fusedEvolve": false,           # ALL generations in one kernel (TPU only)
    "gensPerStep": 1,               # fusedEvolve: generations per grid step
    "popBlock": 512,                # candidates per fused-kernel program
    "oscMode": "floor",             # floor | exact | table
    "spectrumMethod": "dft",        # dft | rfft | dft_factored | auto
    "recombineMode": "gather",      # gather | compat_shuffle | off
    "mutationNoise": "clt12",       # clt12 | normal | clt12_neutral | normal_unit
    "minStep": 0.0,                 # mutation step floor (0 = reference)
    "restartPatience": 0,           # restart parents after N stalled gens
    "refineGenerations": 0,         # f32 precision-annealing tail length
    "refineStepFloor": 0.01,        # step re-opening at the refine boundary
    "dftDtype": "float32",          # float32 | bfloat16 | int8
    "sineOrder": 9,                 # fused-kernel sine polynomial (9 | 7 | 5)
    "numBins": null,
    "operandCacheDir": null,        # disk cache for large-frame DFT operands
                                    # (n >= 16384; ~2 min build -> ~3 s load)
    "meshShape": [8],               # population-sharding mesh (parallel/)
    "meshAxisNames": ["pop"],
    "solver": "evolve",             # "pursuit" = staged decomposition solver
                                    # for fm{k}_parallel (es/staged.py)
    "pursuit": {                    # optional pursuit tuning (all optional)
      "stagePopulation": 8192, "peelGenerations": 300, "peelTries": 3,
      "tailGenerations": 600, "tailTries": 2, "aliasRounds": 4,
      "aliasGenerations": 150, "jointGenerations": 500,
      "repairRounds": 0, "repairGenerations": 400   # k>=4: pairwise joint
    }                               # repair (examples/fm4_parallel_match.json)
  }
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

from ..es.config import ESConfig
from ..ops.synthesis import TOPOLOGY_DIMS


@dataclasses.dataclass(frozen=True)
class RunConfig:
    """Everything main.cpp derives from the JSON file."""

    es: ESConfig
    num_generations: int = 1000
    # general
    is_debug: bool = False
    is_audio: bool = True
    output_audio_path: str = "output_audio/output.wav"
    is_benchmarking: bool = True
    is_log: bool = True
    # type
    implementation: str = "TPU"
    input_mode: str = "params"  # "params" | "audio"
    input_params: tuple[float, ...] = (3078.0, 2.0, 3015.0, 1.5, 3141.0, 1.0)
    input_audio_path: str = "input_audio/input.wav"
    # tpu extensions
    mesh_shape: tuple[int, ...] = ()
    mesh_axis_names: tuple[str, ...] = ("pop",)
    # "evolve" (default) or "pursuit" — the staged decomposition solver for
    # fm{k}_parallel targets (es/staged.py; the 12-dim family is unsolvable
    # by the direct joint ES at any precision). Selecting it in the config
    # makes the CLI's default mode the pursuit matcher.
    solver: str = "evolve"
    # optional tuning knobs for the pursuit solver ("tpu"."pursuit" block,
    # camelCase like the rest of the schema; es/staged.py maps them)
    pursuit: tuple = ()


def _topology_for_dims(d: int) -> str:
    for t, n in TOPOLOGY_DIMS.items():
        if n == d:
            return t
    raise ValueError(
        f"numDimensions={d} matches no topology (need one of {TOPOLOGY_DIMS})"
    )


def load_config(path: str | os.PathLike) -> RunConfig:
    with open(os.fspath(path)) as f:
        return parse_config(json.load(f))


def parse_config(j: dict[str, Any]) -> RunConfig:
    gen = j.get("general", {})
    audio = j.get("audio", {})
    evo = j.get("evolutionary", {})
    typ = j.get("type", {})
    tpu = j.get("tpu", {})

    num_dims = int(evo.get("numDimensions", 6))
    topology = tpu.get("topology") or _topology_for_dims(num_dims)

    mins = evo.get("paramMins", [0.0] * num_dims)
    maxs = evo.get("paramMaxs")
    if maxs is None:
        # struct-initialiser defaults (Evolutionary_Strategy.hpp:586-588),
        # cycled to the dimension count
        base = [3520.0, 8.0, 3520.0, 1.0]
        maxs = [base[i % 4] for i in range(num_dims)]

    es = ESConfig(
        num_parents=int(evo.get("numParents", 16)),
        num_offspring=int(evo.get("numOffspring", 16)),
        num_dimensions=num_dims,
        topology=topology,
        param_mins=tuple(float(x) for x in mins),
        param_maxs=tuple(float(x) for x in maxs),
        audio_length_log2=int(audio.get("audioLengthLog2", 10)),
        sample_rate=int(audio.get("sampleRate", 44100)),
        wavetable_size=int(audio.get("wavetableSize", 32768)),
        synthesis_engine=tpu.get("synthesisEngine", "scan"),
        fused_kernel=bool(tpu.get("fusedKernel", False)),
        fused_generation=bool(tpu.get("fusedGeneration", False)),
        fused_evolve=bool(tpu.get("fusedEvolve", False)),
        gens_per_step=int(tpu.get("gensPerStep", 1)),
        pop_block=int(tpu.get("popBlock", 512)),
        osc_mode=tpu.get("oscMode", "floor"),
        spectrum_method=tpu.get("spectrumMethod", "dft"),
        num_bins=tpu.get("numBins"),
        operand_cache_dir=tpu.get("operandCacheDir"),
        recombine_mode=tpu.get("recombineMode", "gather"),
        mutation_noise=tpu.get("mutationNoise", "clt12"),
        min_step=float(tpu.get("minStep", 0.0)),
        sine_order=int(tpu.get("sineOrder", 9)),
        restart_patience=int(tpu.get("restartPatience", 0)),
        refine_generations=int(tpu.get("refineGenerations", 0)),
        refine_step_floor=float(tpu.get("refineStepFloor", 0.01)),
        dft_dtype=tpu.get("dftDtype", "float32"),
        workgroup_size=int(
            (
                typ.get(typ.get("implementation", "OpenCL"), {})
                if isinstance(typ.get(typ.get("implementation", "OpenCL")), dict)
                else {}
            ).get("workgroupSize", 32)
        ),
        fitness_threshold=float(evo.get("fitnessThreshold", 0.0))
        if tpu.get("useFitnessThreshold", False)
        else 0.0,
    )

    params = typ.get("params", [3078.0, 2.0, 3015.0, 1.5, 3141.0, 1.0])
    return RunConfig(
        es=es,
        num_generations=int(evo.get("numGenerations", 1000)),
        is_debug=bool(gen.get("isDebug", False)),
        is_audio=bool(gen.get("isAudio", True)),
        output_audio_path=gen.get("outputAudioPath", "output_audio/output.wav"),
        is_benchmarking=bool(gen.get("isBenchmarking", True)),
        is_log=bool(gen.get("isLog", True)),
        implementation=typ.get("implementation", "TPU"),
        input_mode=typ.get("input", "params"),
        input_params=tuple(float(x) for x in params),
        input_audio_path=typ.get("audio", "input_audio/input.wav"),
        mesh_shape=tuple(int(x) for x in tpu.get("meshShape", [])),
        mesh_axis_names=tuple(tpu.get("meshAxisNames", ["pop"])),
        solver=tpu.get("solver", "evolve"),
        pursuit=tuple(sorted(dict(tpu.get("pursuit", {})).items())),
    )
