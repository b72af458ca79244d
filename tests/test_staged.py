"""The staged decomposition (pursuit) solver for fm{k}_parallel targets
(pmfm_tpu/es/staged.py). The 32-seed convergence evidence lives in
benchmarks/pursuit_fm3_parallel.json (hardware study, tools/pursuit_study.py);
these tests cover the machinery: alias proposal algebra, config mapping,
block-stage elitism, and an end-to-end smoke at toy scale."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pmfm_tpu.es import ESConfig
from pmfm_tpu.es.staged import (
    alias_variants,
    match_parallel_pursuit,
    pursuit_kwargs_from_config,
)


class TestAliasVariants:
    def test_reflections_present_and_in_range(self):
        # one pair at fm=1936 Hz, fc=2182.4 Hz (genes over 3520/8/3520/1)
        est = np.array([1936 / 3520, 0.3, 2182.4 / 3520, 0.8], np.float32)
        scale = np.array([3520.0, 8.0, 3520.0, 1.0], np.float32)
        got = alias_variants(est, 1, scale)
        fcs = sorted(round(v[2] * 3520, 1) for v in got if v[0] == est[0])
        # fc + fm exceeds 3520 (filtered); |fc-fm|, |fc-2fm| survive
        assert round(abs(2182.4 - 1936), 1) in fcs
        assert round(abs(2182.4 - 2 * 1936), 1) in fcs
        for v in got:
            s = v * scale
            assert 0 < s[0] <= 3520 and 0 <= s[2] <= 3520
        # the swap variant changes both fm and fc
        assert any(
            v[0] != est[0] and round(v[0] * 3520, 1) == 2182.4 for v in got
        )

    def test_no_self_duplicate(self):
        est = np.array([0.5, 0.3, 0.5, 0.8], np.float32)  # fm == fc: swap = identity
        scale = np.array([3520.0, 8.0, 3520.0, 1.0], np.float32)
        got = alias_variants(est, 1, scale)
        for v in got:
            assert not (abs(v[0] - est[0]) * 3520 < 1.0
                        and abs(v[2] - est[2]) * 3520 < 1.0)

    def test_untouched_genes_preserved(self):
        est = np.arange(8, dtype=np.float32) / 10.0
        scale = np.array([3520.0, 8.0, 3520.0, 1.0] * 2, np.float32)
        got = alias_variants(est, 2, scale)
        for v in got:
            # exactly one pair's (fm, fc) may differ; indices 1,3,5,7 never
            np.testing.assert_array_equal(v[1::2], est[1::2])


class TestConfigMapping:
    def test_roundtrip(self):
        items = (("aliasRounds", 3), ("peelTries", 2), ("jointStep", 0.02),
                 ("repairRounds", 3))
        kw = pursuit_kwargs_from_config(items)
        assert kw == {"alias_rounds": 3, "peel_tries": 2, "joint_step": 0.02,
                      "repair_rounds": 3}

    def test_fm4_example_config_parses(self):
        """examples/fm4_parallel_match.json (the k=4 pursuit recipe: repair
        rounds + escalated alias/tail budgets) parses and maps cleanly."""
        import json as _json

        from pmfm_tpu.io.config import parse_config

        with open("examples/fm4_parallel_match.json") as f:
            rc = parse_config(_json.load(f))
        assert rc.solver == "pursuit"
        assert rc.es.topology == "fm4_parallel"
        assert rc.es.num_dimensions == 16
        kw = pursuit_kwargs_from_config(rc.pursuit)
        assert kw == {"repair_rounds": 3, "alias_rounds": 6, "tail_tries": 3,
                      "target_rel": 0.03, "max_attempts": 6}

    def test_unknown_key_raises(self):
        with pytest.raises(ValueError, match="unknown tpu.pursuit key"):
            pursuit_kwargs_from_config((("sweeps", 1),))

    def test_parse_config_plumbs_solver_and_pursuit(self):
        from pmfm_tpu.io.config import parse_config

        rc = parse_config({
            "evolutionary": {"numDimensions": 12},
            "tpu": {"solver": "pursuit",
                    "pursuit": {"aliasRounds": 2, "stagePopulation": 512}},
        })
        assert rc.solver == "pursuit"
        kw = pursuit_kwargs_from_config(rc.pursuit)
        assert kw == {"alias_rounds": 2, "stage_population": 512}


def _toy_cfg(k=2):
    d = 4 * k
    return ESConfig(
        num_parents=16,
        num_offspring=240,
        num_dimensions=d,
        topology=f"fm{k}_parallel",
        param_mins=(0.0,) * d,
        param_maxs=(3520.0, 8.0, 3520.0, 1.0) * k,
        audio_length_log2=9,
        synthesis_engine="scanless",
        spectrum_method="dft",
        dft_dtype="float32",
    )


class TestPursuitEndToEnd:
    def test_smoke_and_improves_over_silence(self):
        """Tiny-budget run: returns the right shapes, never exceeds the
        silence fitness (sum target^2), and runs the declared number of
        generations. (Convergence itself is a hardware-scale property —
        benchmarks/pursuit_fm3_parallel.json.)"""
        from pmfm_tpu.es import make_spectrum_ops
        from pmfm_tpu.ops import synthesize_single
        from pmfm_tpu.ops.spectral import target_spectrum
        from pmfm_tpu.ops.synthesis import scale_params

        cfg = _toy_cfg(k=2)
        true_genes = jnp.asarray([0.6, 0.25, 0.5, 0.9, 0.35, 0.3, 0.7, 0.7])
        scaled = scale_params(
            true_genes[None], jnp.asarray(cfg.param_mins),
            jnp.asarray(cfg.param_maxs),
        )[0]
        audio = synthesize_single(scaled, cfg.n_samples, cfg.topology)
        r = match_parallel_pursuit(
            np.asarray(audio), cfg, key=0,
            stage_population=256, peel_generations=10, peel_tries=1,
            tail_generations=20, tail_tries=1,
            alias_rounds=1, alias_generations=5,
            joint_generations=10,
        )
        assert r.best_values.shape == (8,)
        assert np.all((r.best_values >= 0) & (r.best_values <= 1))
        so = make_spectrum_ops(cfg)
        silence = float(jnp.sum(target_spectrum(audio, so) ** 2))
        assert 0 <= r.best_fitness <= silence
        # k=2: no peel stages, one tail stage
        assert r.stage_fitness.shape == (1,)
        assert r.alias_fitness.shape[0] >= 1
        assert r.generations_used >= 20 + 5 + 10

    def test_rejects_non_parallel_topology(self):
        cfg = ESConfig(
            num_parents=4, num_offspring=12, num_dimensions=6,
            topology="fm3_series", audio_length_log2=9,
        )
        with pytest.raises(ValueError, match="fm{k}_parallel"):
            match_parallel_pursuit(np.zeros(512, np.float32), cfg)

    def test_fm2_routes_as_one_pair_bank(self):
        """fm2 shares the pair gene layout (fm, index, fc, amp), so the
        pursuit wrapper treats it as k=1: no peel, whole-problem tail,
        alias jumps live (the huge-frame direct ES locks onto the folded
        comb |fc-fm| — examples/huge_frame_match.json)."""
        from pmfm_tpu.ops import synthesize_single
        from pmfm_tpu.ops.spectral import target_spectrum
        from pmfm_tpu.ops.synthesis import scale_params
        from pmfm_tpu.es import make_spectrum_ops

        cfg = ESConfig(
            num_parents=4, num_offspring=124, num_dimensions=4,
            topology="fm2", audio_length_log2=9,
            param_mins=(0.0,) * 4, param_maxs=(3520.0, 8.0, 3520.0, 1.0),
            synthesis_engine="scanless", refine_generations=0,
        )
        genes = jnp.asarray([0.62, 0.3, 0.48, 0.8])
        scaled = scale_params(
            genes[None], jnp.asarray(cfg.param_mins),
            jnp.asarray(cfg.param_maxs),
        )[0]
        audio = synthesize_single(scaled, cfg.n_samples, cfg.topology)
        r = match_parallel_pursuit(
            np.asarray(audio), cfg, key=0,
            stage_population=256, tail_generations=20, tail_tries=1,
            alias_rounds=1, alias_generations=5, joint_generations=10,
        )
        assert r.best_values.shape == (4,)
        so = make_spectrum_ops(cfg)
        silence = float(jnp.sum(target_spectrum(audio, so) ** 2))
        assert 0 <= r.best_fitness <= silence
        assert r.stage_fitness.shape == (1,)  # k=1: tail only, no peel

    def test_k3_runs_peel_then_tail(self):
        from pmfm_tpu.ops import synthesize_single
        from pmfm_tpu.ops.synthesis import scale_params

        cfg = _toy_cfg(k=3)
        genes = jnp.asarray([0.87, 0.25, 0.86, 0.9,
                             0.55, 0.3, 0.62, 0.8,
                             0.71, 0.2, 0.45, 0.7])
        scaled = scale_params(
            genes[None], jnp.asarray(cfg.param_mins),
            jnp.asarray(cfg.param_maxs),
        )[0]
        audio = synthesize_single(scaled, cfg.n_samples, cfg.topology)
        r = match_parallel_pursuit(
            np.asarray(audio), cfg, key=1,
            stage_population=256, peel_generations=8, peel_tries=1,
            tail_generations=8, tail_tries=1,
            alias_rounds=0, alias_generations=5, joint_generations=5,
        )
        assert r.stage_fitness.shape == (2,)  # one peel + one tail
        # elitism: the tail stage (which includes the peel's estimate as
        # its frozen/center baseline) can only improve the joint fitness
        assert r.stage_fitness[1] <= r.stage_fitness[0] + 1e-6


class TestSeriesPursuit:
    """The round-5 exact-reduction homotopy for serial chains
    (es/staged.py::match_series_pursuit). Convergence is a hardware-scale
    property (benchmarks/pursuit_fm4_series.json); CPU tests pin the
    staging structure and the multi-start wrapper."""

    def _cfg(self, k=4):
        d = 2 * k
        return ESConfig(
            num_parents=16, num_offspring=240, num_dimensions=d,
            topology=f"fm{k}_series", param_mins=(0.0,) * d,
            param_maxs=(3520.0, 8.0) * k, audio_length_log2=9,
            synthesis_engine="scanless", spectrum_method="dft",
            dft_dtype="float32", mutation_noise="clt12_neutral",
            min_step=1e-4, restart_patience=50,
        )

    def test_smoke_stage_structure(self):
        from pmfm_tpu.es import make_spectrum_ops
        from pmfm_tpu.es.staged import match_series_pursuit
        from pmfm_tpu.ops import synthesize_single
        from pmfm_tpu.ops.spectral import target_spectrum
        from pmfm_tpu.ops.synthesis import scale_params

        cfg = self._cfg(k=4)
        genes = jnp.asarray([0.87, 0.25, 0.86, 0.19, 0.89, 0.15, 0.85, 0.13])
        scaled = scale_params(
            genes[None], jnp.asarray(cfg.param_mins),
            jnp.asarray(cfg.param_maxs),
        )[0]
        audio = synthesize_single(scaled, cfg.n_samples, cfg.topology,
                                  engine="scanless")
        r = match_series_pursuit(
            np.asarray(audio), cfg, key=0,
            stage_population=256, core_generations=10, core_tries=1,
            grow_generations=8, grow_tries=1, repair_rounds=1,
            repair_generations=6, joint_generations=10,
        )
        assert r.best_values.shape == (8,)
        assert np.all((r.best_values >= 0) & (r.best_values <= 1))
        from pmfm_tpu.es import make_spectrum_ops as _mk  # noqa: F401
        so = make_spectrum_ops(cfg)
        silence = float(jnp.sum(target_spectrum(audio, so) ** 2))
        # the f32-elitist guard makes the result monotone vs silence
        assert 0 <= r.best_fitness <= silence
        # k=4: 1 core + 1 grow + 3 repair windows (one round)
        assert len(r.stage_fitness) == 5, r.stage_fitness
        # stage fitness is monotone non-increasing (elitist blocks; small
        # relative slack: the incumbent's fitness is re-evaluated per stage
        # and f32 reduction order can wobble the last bits)
        sf = np.asarray(r.stage_fitness)
        assert np.all(sf[1:] <= sf[:-1] * (1 + 1e-6))

    def test_rejects_small_k_and_non_series(self):
        from pmfm_tpu.es.staged import match_series_pursuit

        with pytest.raises(ValueError, match="k >= 4"):
            match_series_pursuit(
                np.zeros(512, np.float32),
                ESConfig(num_parents=4, num_offspring=12, num_dimensions=6,
                         topology="fm3_series", audio_length_log2=9),
            )
        with pytest.raises(ValueError, match="k >= 4"):
            match_series_pursuit(
                np.zeros(512, np.float32),
                ESConfig(num_parents=4, num_offspring=12, num_dimensions=8,
                         topology="fm2_parallel", audio_length_log2=9,
                         param_mins=(0.0,) * 8,
                         param_maxs=(3520.0, 8.0, 3520.0, 1.0) * 2),
            )

    def test_multi_start_consumes_attempts(self):
        """target_rel tighter than a tiny-budget run can reach: all
        attempts consumed, best returned, f32-scored acceptance."""
        from pmfm_tpu.es.staged import match_series_pursuit
        from pmfm_tpu.ops import synthesize_single
        from pmfm_tpu.ops.synthesis import scale_params

        cfg = self._cfg(k=4)
        genes = jnp.asarray([0.5, 0.3, 0.6, 0.2, 0.7, 0.25, 0.4, 0.5])
        scaled = scale_params(
            genes[None], jnp.asarray(cfg.param_mins),
            jnp.asarray(cfg.param_maxs),
        )[0]
        audio = synthesize_single(scaled, cfg.n_samples, cfg.topology,
                                  engine="scanless")
        r = match_series_pursuit(
            np.asarray(audio), cfg, key=2, target_rel=1e-9, max_attempts=2,
            stage_population=128, core_generations=6, core_tries=1,
            grow_generations=4, grow_tries=1, repair_rounds=0,
            joint_generations=6,
        )
        assert r.attempts == 2
        assert np.isfinite(r.best_fitness)
