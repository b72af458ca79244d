"""Coverage for profiling hooks, spectrum auto-select, benchmarker wiring."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pmfm_tpu import ops
from pmfm_tpu.es import ESConfig, match_audio
from pmfm_tpu.utils import Benchmarker


class TestSpectrumAuto:
    def test_auto_selects_dft_small(self):
        so = ops.make_spectrum_ops(1024, method="auto")
        assert so.method == "dft" and so.dft_cos is not None

    def test_auto_selects_rfft_large(self):
        so = ops.make_spectrum_ops(8192, method="auto")
        assert so.method == "rfft" and so.dft_cos is None


class TestProfilingHooks:
    def test_trace_writes_artifacts(self, tmp_path):
        import jax

        from pmfm_tpu.utils.profiling import annotate, maybe_trace

        with maybe_trace(str(tmp_path)):
            with annotate("stage"):
                jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
        assert any(tmp_path.rglob("*"))  # trace artifacts written

    def test_maybe_trace_none_is_noop(self):
        from pmfm_tpu.utils.profiling import maybe_trace

        with maybe_trace(None):
            pass


class TestBenchmarkerWiring:
    def test_match_audio_records_timers(self):
        cfg = ESConfig(num_parents=8, num_offspring=8, num_dimensions=4,
                       topology="fm2", param_mins=(0.0,) * 4,
                       param_maxs=(3520.0, 8.0, 3520.0, 1.0), audio_length_log2=8)
        tgt = np.random.default_rng(0).standard_normal(2 * 256).astype(np.float32)
        bm = Benchmarker(quiet=True)
        match_audio(tgt, cfg, key=1, num_generations=2, benchmarker=bm)
        chunk = bm.elapsed_timer("chunk")
        total = bm.elapsed_timer("Total Audio Analysis Time")
        assert chunk["Total_Time"] > 0
        assert total["Total_Time"] >= chunk["Total_Time"] * 0.5
        # per-chunk stats: two chunks recorded
        assert chunk["Max_Time"] >= chunk["Min_Time"]


class TestCLITrajectory:
    def test_trajectory_flag(self, tmp_path, capsys):
        import json

        from pmfm_tpu.cli import main

        cfg = {
            "general": {"isAudio": False, "isBenchmarking": False, "isLog": False},
            "audio": {"audioLengthLog2": 8},
            "evolutionary": {"numParents": 8, "numOffspring": 8,
                             "numDimensions": 4, "numGenerations": 3,
                             "paramMins": [0] * 4,
                             "paramMaxs": [3520.0, 8.0, 3520.0, 1.0]},
            "type": {"input": "params", "params": [880, 2.0, 2500, 0.9]},
        }
        p = tmp_path / "c.json"
        p.write_text(json.dumps(cfg))
        rc = main(["-j", str(p), "--trajectory", "--quiet",
                   "--input-generated-path", str(tmp_path / "ig.wav")])
        assert rc == 0


class TestConvergenceCheckTool:
    def test_smoke(self, capsys):
        """tools/convergence_check.py (the quality gate behind every
        throughput rung, benchmarks/quality_gates.json) runs end-to-end at
        toy scale and rescoring produces finite fitness for each variant."""
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "convergence_check",
            os.path.join(os.path.dirname(__file__), "..", "tools",
                         "convergence_check.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        rc = mod.main(["--variants", "f32", "int8+sin7", "--seeds", "1",
                       "--gens", "2", "--pop-log2", "7", "--mu", "8"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "f32" in out and "int8+sin7" in out
        assert "nan" not in out.lower()
        # per-topology + relative-threshold + split/merge path (tmp json)
        import json
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "qg.json")
            rc = mod.main(["--variants", "f32", "--seeds", "1", "--gens", "2",
                           "--pop-log2", "7", "--mu", "8",
                           "--topology", "fm2", "--thresholds-rel", "1e-2",
                           "--split", "fm2", "--json", path])
            assert rc == 0
            doc = json.load(open(path))
            r = doc["splits"]["fm2"]["results"]["f32"]
            assert "rel0.01" in r["generations_to_converge"]
            assert len(r["rescored_trajectory"][0]) == len(r["boundaries_gens"])
            assert doc["meta"]["topology"] == "fm2"


class TestKernelSeed:
    def test_no_block_stream_aliasing(self):
        """Regression: a LINEAR generation stride aliases the kernels'
        per-block stride (seed + program_id * 0x1E3779B9) — e.g. the
        golden-ratio constant differs from it by exactly 2^31, which made
        stream(gen, block) depend only on gen+block and gen's parity (~94%
        of per-block PRNG streams were replays). kernel_seed hashes the
        generation index, so every (generation, block) stream must be
        unique over a realistic window."""
        import numpy as np

        from pmfm_tpu.es.pipeline import kernel_seed

        key = jax.random.PRNGKey(7)
        gens, blocks = 256, 32
        seeds = np.asarray(
            [int(kernel_seed(key, jnp.int32(g))) for g in range(gens)],
            dtype=np.int64,
        )
        streams = (seeds[:, None] + np.arange(blocks)[None, :] * 0x1E3779B9)
        streams = (streams & 0xFFFFFFFF).astype(np.uint32)  # int32 wrap
        assert len(np.unique(streams)) == gens * blocks

    def test_shard_term_and_typed_keys(self):
        from pmfm_tpu.es.pipeline import kernel_seed

        k_raw = jax.random.PRNGKey(3)
        k_typed = jax.random.key(3)
        g = jnp.int32(5)
        assert int(kernel_seed(k_raw, g)) == int(kernel_seed(k_typed, g))
        s0 = int(kernel_seed(k_raw, g, shard=jnp.int32(0)))
        s1 = int(kernel_seed(k_raw, g, shard=jnp.int32(1)))
        assert s0 == int(kernel_seed(k_raw, g)) and s0 != s1


class TestGenCheckArtifact:
    """The hardware PRNG validation is a COMMITTED artifact
    (benchmarks/gen_check.json, written by tools/tpu_gen_check.py on a real
    chip). These tests fail when seeding-relevant sources change without the
    artifact being regenerated — the round-1 seed-aliasing regression class
    (commit ea801c8) now breaks CI instead of shipping silently."""

    def _load(self):
        import json

        from pmfm_tpu.utils.provenance import GEN_CHECK_ARTIFACT

        assert GEN_CHECK_ARTIFACT.exists(), (
            "benchmarks/gen_check.json missing - run tools/tpu_gen_check.py "
            "on a real TPU"
        )
        return json.loads(GEN_CHECK_ARTIFACT.read_text())

    def test_artifact_fresh_vs_seeding_sources(self):
        from pmfm_tpu.utils.provenance import seeding_fingerprint

        report = self._load()
        assert report["fingerprint"] == seeding_fingerprint(), (
            "kernel-PRNG-relevant sources (kernels/generation.py, "
            "evolve kernel seeding, pipeline.kernel_seed) changed since the "
            "hardware PRNG validation was captured - rerun "
            "tools/tpu_gen_check.py on a real TPU and commit "
            "benchmarks/gen_check.json"
        )

    def test_artifact_checks_passed(self):
        report = self._load()
        assert report["ok"], f"hardware PRNG checks failed: {report['checks']}"
        for name in ("moments", "pick_uniformity_flat", "pick_uniformity_hier",
                     "seed_sensitivity", "stream_collisions"):
            assert report["checks"][name]["ok"], name
        assert report["checks"]["stream_collisions"]["duplicate_rows"] == 0
