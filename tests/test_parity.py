"""Statistical RNG parity + golden CPU/FFTW-reference parity (SURVEY.md §7.4:
'reproduce distributions, not bitstreams; parity tests must be statistical';
BASELINE.md bound: <=1e-3 relative spectral error vs the CPU reference)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pmfm_tpu import ops
from pmfm_tpu.es import ESConfig, init_state, match_audio, mutate
from pmfm_tpu.es.strategy import _gauss
from pmfm_tpu.ops.oracle import OracleObjective


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)


class TestRNGDistributions:
    def test_clt12_gaussian_moments(self):
        """Reference gauss_rand = mean of 12 U(-1,1): sigma = 1/6, support
        [-1, 1] (kernels/ocl_program.cl:21-31)."""
        g = np.asarray(_gauss(jax.random.PRNGKey(0), (200_000,), "clt12"))
        assert abs(g.mean()) < 2e-3
        assert abs(g.std() - 1 / 6) < 2e-3
        assert np.abs(g).max() <= 1.0
        assert abs(float(np.mean(np.abs(g))) - np.sqrt(2 / np.pi) / 6) < 2e-3

    def test_normal_mode_matches_clt12_moments(self):
        g = np.asarray(_gauss(jax.random.PRNGKey(1), (200_000,), "normal"))
        assert abs(g.std() - 1 / 6) < 2e-3

    def test_init_population_distribution(self):
        """initPopulation: values = |uniform(-1,1)| ~ U(0,1), steps = 0.1
        (kernels/ocl_program.cl:46-66)."""
        cfg = ESConfig(num_parents=4096, num_offspring=0, num_dimensions=6)
        s = init_state(jax.random.PRNGKey(2), cfg)
        v = np.asarray(s.parent_values).ravel()
        assert abs(v.mean() - 0.5) < 5e-3
        assert abs(v.var() - 1 / 12) < 5e-3
        assert v.min() >= 0 and v.max() <= 1

    def test_mutation_step_adaptation_shrinks(self):
        """With the reference constants, E[ln Es] = E|g| - sqrt(2/pi) < 0 for
        the sigma=1/6 CLT gaussian, so steps contract on average — the
        documented behaviour of the canonical kernel
        (kernels/ocl_program.cl:184-185)."""
        cfg = ESConfig(num_parents=16, num_offspring=16, num_dimensions=6)
        v = jnp.full((20_000, 6), 0.5)
        s = jnp.full((20_000, 6), 0.1)
        _, s2 = mutate(jax.random.PRNGKey(3), v, s, cfg)
        log_ratio = np.log(np.asarray(s2) / 0.1)
        # E[ln ratio] = beta*E[ln Ek] + betaScale*(E|g| - sqrt(2/pi))
        expect = (1 / 6) * (np.sqrt(2 / np.pi) / 6 - np.sqrt(2 / np.pi))
        assert abs(log_ratio.mean() - expect) < 0.02
        assert log_ratio.mean() < 0

    def test_mutation_ek_coin_moments(self):
        """Ek = coin ? alpha : 1/alpha with p=0.5
        (kernels/ocl_program.cl:168). Moves are Ek*s*g, so
        E[(move/s)^2] = E[Ek^2] * sigma_g^2 with
        E[Ek^2] = (alpha^2 + alpha^-2)/2 ~= 1.235 — distinguishable from the
        no-coin value 1.0."""
        cfg = ESConfig(num_parents=16, num_offspring=16, num_dimensions=6,
                       mutation_noise="normal")
        step = 1e-3  # large enough that moves are far above f32 ulp at 0.5
        v = jnp.full((50_000, 6), 0.5)
        s = jnp.full((50_000, 6), step)
        v2, _ = mutate(jax.random.PRNGKey(4), v, s, cfg)
        moves = (np.asarray(v2, np.float64) - 0.5) / step
        alpha = cfg.alpha
        expect = (alpha**2 + alpha**-2) / 2 * (1 / 36)
        got = float(np.mean(moves**2))
        assert abs(got - expect) < 0.08 * expect
        # and clearly not the coin-free variance
        assert abs(got - 1 / 36) > 0.1 * (1 / 36)


class TestGoldenConfig1:
    """BASELINE.json config 1: 2-op FM tone match, population 512, 512-pt
    FFT, single frame, CPU-FFTW-reference parity."""

    def test_matched_candidate_spectral_parity(self):
        cfg = ESConfig(
            num_parents=64, num_offspring=448, num_dimensions=4,
            topology="fm2", param_mins=(0.0,) * 4,
            param_maxs=(3520.0, 8.0, 3520.0, 1.0), audio_length_log2=9,
            osc_mode="floor", synthesis_engine="scan",
        )
        oracle = OracleObjective(cfg.n_samples)
        maxs = np.asarray(cfg.param_maxs, np.float32)
        true_scaled = np.asarray([880.0, 2.0, 2500.0, 0.9], np.float32)
        target = oracle.synthesize(true_scaled, "fm2")

        res = match_audio(target, cfg, key=13, num_generations=25,
                          record_trajectory=True)
        best = res.chunks[0]

        # 1. TPU spectrum of the matched candidate vs oracle spectrum of the
        #    same candidate: <=1e-3 relative (BASELINE.md bound)
        so = ops.make_spectrum_ops(cfg.n_samples, method="dft")
        tpu_audio = ops.synthesize_single(
            jnp.asarray(best.best_params_scaled), cfg.n_samples, "fm2",
            osc_mode="floor",
        )
        tpu_spec = np.asarray(ops.target_spectrum(tpu_audio, so))
        oracle_spec = oracle.magnitude_spectrum(
            oracle.synthesize(best.best_params_scaled, "fm2")
        )
        assert rel_err(tpu_spec, oracle_spec) <= 1e-3

        # 2. reported fitness agrees with oracle-recomputed fitness
        tgt_spec = oracle.magnitude_spectrum(target)
        oracle_fit = float(oracle.fitness(oracle_spec, tgt_spec))
        assert abs(best.best_fitness - oracle_fit) <= max(
            1e-2 * abs(oracle_fit), 1e-3 * float((tgt_spec.astype(np.float64) ** 2).sum())
        )

        # 3. the match actually converged meaningfully
        assert best.best_fitness < 0.3 * best.trajectory[0]


class TestNeutralDriftModes:
    def test_clt12_neutral_has_zero_step_drift(self):
        """The intended self-adaptation: E[ln s'/s] = 0 (config.py rationale;
        the reference's own constants give -0.111/generation and freeze the
        search)."""
        from pmfm_tpu.es import mutate

        cfg = ESConfig(num_parents=16, num_offspring=16, num_dimensions=6,
                       mutation_noise="clt12_neutral")
        v = jnp.full((50_000, 6), 0.5)
        s = jnp.full((50_000, 6), 0.01)
        _, s2 = mutate(jax.random.PRNGKey(11), v, s, cfg)
        drift = float(np.log(np.asarray(s2, np.float64) / 0.01).mean())
        assert abs(drift) < 0.01

    def test_normal_unit_matches_canonical_constant(self):
        from pmfm_tpu.es import mutate

        cfg = ESConfig(num_parents=16, num_offspring=16, num_dimensions=6,
                       mutation_noise="normal_unit")
        assert cfg.gauss_sigma == 1.0
        v = jnp.full((50_000, 6), 0.5)
        s = jnp.full((50_000, 6), 1e-4)
        _, s2 = mutate(jax.random.PRNGKey(12), v, s, cfg)
        drift = float(np.log(np.asarray(s2, np.float64) / 1e-4).mean())
        assert abs(drift) < 0.01  # E|N(0,1)| == sqrt(2/pi): neutral

    def test_reference_mode_still_contracts(self):
        """Parity guard: default mode keeps the reference's contractive
        dynamics."""
        cfg = ESConfig(num_parents=16, num_offspring=16, num_dimensions=6)
        assert cfg.mutation_noise == "clt12"
        assert abs(cfg.root_two_over_pi - np.sqrt(2 / np.pi)) < 1e-9
