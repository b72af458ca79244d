"""AOT export/load (utils/aot.py): the offline-compile analog of the
reference's clBuildProgram/SPIR-V startup path (see module docstring)."""
import json

import numpy as np
import pytest

from pmfm_tpu.es import ESConfig, match_audio_stft
from pmfm_tpu.utils import aot

CFG = ESConfig(num_parents=8, num_offspring=24, audio_length_log2=8)


def _target(n=512, seed=0):
    return np.random.default_rng(seed).standard_normal(n).astype(np.float32)


class TestRoundTrip:
    def test_export_load_matches_live(self):
        target = _target()
        blob = aot.export_matcher(CFG, num_generations=15, target_samples=512)
        m = aot.load_matcher(blob)
        out = m(3, target)
        live = match_audio_stft(target, CFG, key=3, num_generations=15)
        c = live.chunks[0]
        np.testing.assert_allclose(out["best_fitness"], c.best_fitness, rtol=1e-6)
        np.testing.assert_allclose(
            out["best_params_scaled"], c.best_params_scaled, rtol=1e-6
        )
        np.testing.assert_allclose(out["best_audio"], live.output_audio, atol=1e-6)
        assert int(out["generations_run"]) == 15
        assert out["parent_values"].shape == (CFG.num_parents, CFG.num_dimensions)

    def test_artifact_is_self_describing(self, tmp_path):
        p = tmp_path / "m.pmfm"
        aot.save_matcher(p, CFG, num_generations=5, target_samples=512)
        m = aot.load_matcher(p)
        assert m.cfg.num_parents == CFG.num_parents
        assert m.cfg.num_frames == 2  # 512 samples / 256-sample frames
        assert m.num_generations == 5
        assert m.target_samples == 512

    def test_bad_magic_rejected(self):
        with pytest.raises(ValueError, match="magic"):
            aot.load_matcher(b"NOTPMFM!" + b"\0" * 64)

    def test_wrong_target_shape_rejected(self):
        m = aot.load_matcher(
            aot.export_matcher(CFG, num_generations=2, target_samples=256)
        )
        with pytest.raises(ValueError, match="shape"):
            m(0, _target(512))

    def test_bad_target_samples_rejected(self):
        with pytest.raises(ValueError, match="multiple"):
            aot.export_matcher(CFG, num_generations=2, target_samples=300)


class TestConfigDict:
    def test_config_round_trip(self):
        d = aot.config_to_dict(CFG)
        json.dumps(d)  # JSON-safe
        assert aot.config_from_dict(d) == CFG


class TestCLI:
    def _write_cfg(self, tmp_path):
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
        return p

    def test_export_then_run(self, tmp_path, capsys):
        from pmfm_tpu.cli import main

        cfgp = self._write_cfg(tmp_path)
        art = tmp_path / "matcher.pmfm"
        rc = main(["-j", str(cfgp), "--export-aot", str(art), "--quiet",
                   "--input-generated-path", str(tmp_path / "ig.wav")])
        assert rc == 0 and art.exists()
        rc = main(["-j", str(cfgp), "--aot", str(art),
                   "--input-generated-path", str(tmp_path / "ig.wav")])
        assert rc == 0
        out = capsys.readouterr().out
        assert "Overall best parameters found" in out


class TestMeshExport:
    """Round-5 mesh-aware export (VERDICT r4 #9): the population-sharded
    matcher exports with its mesh axes; the artifact records the device
    count and the loader re-establishes a calling context of that size."""

    def test_mesh_export_round_trip_matches_live_sharded(self):
        import jax

        from pmfm_tpu.es.pipeline import _compiled_stft_matcher
        from pmfm_tpu.parallel import make_mesh

        ndev = len(jax.devices())
        if ndev < 8:
            pytest.skip("needs the 8-virtual-device test mesh")
        cfg = CFG.replace(num_parents=16, num_offspring=240)
        target = _target(cfg.n_samples, seed=4)
        blob = aot.export_matcher(
            cfg, num_generations=10, target_samples=cfg.n_samples,
            mesh_devices=8,
        )
        m = aot.load_matcher(blob)
        assert m.mesh_devices == 8
        out = m(5, target)
        live = _compiled_stft_matcher(
            cfg.replace(num_frames=1), 10, False, make_mesh(shape=(8,))
        )
        fin, _, best_scaled, _ = live(
            jax.random.PRNGKey(5), np.asarray(target)
        )
        np.testing.assert_allclose(
            out["best_fitness"], float(fin.best_fitness), rtol=1e-6
        )
        np.testing.assert_allclose(
            out["best_params_scaled"], np.asarray(best_scaled), rtol=1e-6
        )

    def test_header_records_mesh_devices(self, tmp_path):
        blob = aot.export_matcher(CFG, num_generations=5, target_samples=256)
        m = aot.load_matcher(blob)
        assert m.mesh_devices == 1  # single-chip default unchanged
