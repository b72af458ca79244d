"""Model family registry tests."""
import numpy as np

import jax
import pytest

import jax.numpy as jnp

from pmfm_tpu.models import TOPOLOGIES, get_topology


class TestTopologies:
    def test_registry(self):
        assert set(TOPOLOGIES) == {
            "fm2", "fm3_series", "fm3_parallel", "fm4_series", "fm5_series"
        }
        with pytest.raises(ValueError):
            get_topology("fm9")
        # any fm{k}_series (k >= 3) resolves dynamically
        t = get_topology("fm7_series")
        assert t.num_dimensions == 14

    @pytest.mark.parametrize(
        "name", ["fm2", "fm3_series", "fm3_parallel", "fm4_series", "fm5_series"]
    )
    def test_descriptor_consistency(self, name):
        t = get_topology(name)
        assert len(t.param_names) == t.num_dimensions
        assert len(t.default_param_maxs) == t.num_dimensions
        p = jnp.asarray(np.full((2, t.num_dimensions), 0.4, np.float32)) * jnp.asarray(t.default_param_maxs)
        out = t.synthesize(p, 128)
        assert out.shape == (128, 2)
        assert np.isfinite(np.asarray(out)).all()


class TestGenericSeriesChain:
    """fm{k}_series generalization: every engine dispatches on the operator
    count; k=3 must stay the reference DoubleSeries (golden-tested
    elsewhere), larger k extends the same recurrence."""

    def _params(self, k, pop=8, seed=2):
        rng = np.random.default_rng(seed)
        p = np.empty((pop, 2 * k), np.float32)
        p[:, 0::2] = rng.uniform(100, 2000, (pop, k))
        p[:, 1::2] = rng.uniform(0.5, 4.0, (pop, k))
        return p

    @pytest.mark.parametrize("k", [4, 5])
    def test_scan_matches_oracle(self, k):
        from pmfm_tpu.ops import synthesize
        from pmfm_tpu.ops.oracle import OracleObjective

        p = self._params(k, pop=2)
        o = OracleObjective(256)
        a_ref = o.synthesize(p[0], f"fm{k}_series")
        a = np.asarray(
            synthesize(jnp.asarray(p[:1]), 256, f"fm{k}_series",
                       engine="scan", osc_mode="table")
        )[:, 0]
        rel = np.linalg.norm(a - a_ref) / np.linalg.norm(a_ref)
        assert rel < 1e-3

    @pytest.mark.parametrize("k", [4, 5])
    def test_fused_kernel_rank_agreement(self, k):
        from pmfm_tpu import ops
        from pmfm_tpu.kernels.synth_fitness import fused_synth_fitness

        p = self._params(k)
        so = ops.make_spectrum_ops(256, method="dft")
        tgt_audio = ops.synthesize(jnp.asarray(p[:1]), 256, f"fm{k}_series",
                                   engine="scanless")
        tgt = ops.magnitude_spectrum(tgt_audio, so)[0]
        fit = np.asarray(
            fused_synth_fitness(jnp.asarray(p), so.dft_cos, so.dft_sin, tgt,
                                topology=f"fm{k}_series", n=256, pop_block=8,
                                interpret=True)
        )
        audio = ops.synthesize(jnp.asarray(p), 256, f"fm{k}_series",
                               engine="scanless", out_dtype=jnp.bfloat16)
        so16 = ops.make_spectrum_ops(256, method="dft", dft_dtype=jnp.bfloat16)
        unf = np.asarray(ops.evaluate_fitness(audio, tgt, so16))
        assert fit[0] < 1e-3 * np.median(fit)  # planted candidate wins
        assert list(np.argsort(fit)) == list(np.argsort(unf))

    def test_int8_engine_fm4(self):
        from pmfm_tpu.es import ESConfig, make_spectrum_ops
        from pmfm_tpu.es.strategy import evaluate

        d = 8
        cfg8 = ESConfig(
            num_parents=16, num_offspring=112, num_dimensions=d,
            topology="fm4_series", param_mins=(0.0,) * d,
            param_maxs=(3520.0, 8.0) * 4, audio_length_log2=8,
            synthesis_engine="scanless", spectrum_method="dft",
            dft_dtype="int8", fused_kernel=True, pop_block=128,
        )
        cfg32 = cfg8.replace(dft_dtype="float32", fused_kernel=False)
        so8, so32 = make_spectrum_ops_pair(cfg8, cfg32)
        vals = jax.random.uniform(jax.random.PRNGKey(0), (128, d))
        tgt = jnp.ones((so8.num_bins,), jnp.float32)
        f8 = np.asarray(evaluate(vals, tgt, so8, cfg8))
        f32 = np.asarray(evaluate(vals, tgt, so32, cfg32))
        top8, top32 = np.argsort(f8)[:16], np.argsort(f32)[:16]
        assert top8[0] == top32[0]
        assert len(set(top8) & set(top32)) >= 15

    def test_match_audio_recovers_fm4(self):
        from pmfm_tpu.es import ESConfig, match_audio
        from pmfm_tpu.ops import scale_params, synthesize_single

        d = 8
        maxs = (3520.0, 8.0) * 4
        cfg = ESConfig(
            num_parents=8, num_offspring=56, num_dimensions=d,
            topology="fm4_series", param_mins=(0.0,) * d, param_maxs=maxs,
            audio_length_log2=8,
        )
        true_norm = jnp.asarray([0.3, 0.2, 0.5, 0.3, 0.7, 0.25, 0.4, 0.3])
        tgt = np.asarray(
            synthesize_single(
                scale_params(true_norm, jnp.zeros(d), jnp.asarray(maxs)),
                cfg.n_samples, "fm4_series",
            )
        )
        res = match_audio(tgt, cfg, key=5, num_generations=10,
                          record_trajectory=True)
        c = res.chunks[0]
        assert np.all(np.diff(c.trajectory) <= 1e-6)
        assert np.isfinite(c.best_fitness)


def make_spectrum_ops_pair(cfg8, cfg32):
    from pmfm_tpu.es import make_spectrum_ops

    return make_spectrum_ops(cfg8), make_spectrum_ops(cfg32)


class TestGenericParallelBank:
    def test_fm4_parallel_engines_agree(self):
        from pmfm_tpu.ops import synthesize
        from pmfm_tpu.ops.oracle import OracleObjective

        rng = np.random.default_rng(4)
        d = 16
        p = np.empty(d, np.float32)
        p[0::4] = rng.uniform(100, 2000, 4)
        p[1::4] = rng.uniform(0.5, 4.0, 4)
        p[2::4] = rng.uniform(100, 2000, 4)
        p[3::4] = rng.uniform(0.1, 1.0, 4)
        o = OracleObjective(256)
        a_ref = o.synthesize(p, "fm4_parallel")
        a = np.asarray(
            synthesize(jnp.asarray(p)[None], 256, "fm4_parallel",
                       engine="scan", osc_mode="table")
        )[:, 0]
        assert np.linalg.norm(a - a_ref) / np.linalg.norm(a_ref) < 1e-3

    def test_fused_int8_rank_agreement_fm2_parallel(self):
        """fm2_parallel (two pairs) through the folded int8 kernel: the
        mean-amp factoring is pair-count generic."""
        from pmfm_tpu.es import ESConfig, make_spectrum_ops
        from pmfm_tpu.es.strategy import evaluate

        d = 8
        cfg8 = ESConfig(
            num_parents=16, num_offspring=112, num_dimensions=d,
            topology="fm2_parallel", param_mins=(0.0,) * d,
            param_maxs=(3520.0, 8.0, 3520.0, 1.0) * 2, audio_length_log2=8,
            synthesis_engine="scanless", spectrum_method="dft",
            dft_dtype="int8", fused_kernel=True, pop_block=128,
        )
        cfg32 = cfg8.replace(dft_dtype="float32", fused_kernel=False)
        so8 = make_spectrum_ops(cfg8)
        so32 = make_spectrum_ops(cfg32)
        vals = jax.random.uniform(jax.random.PRNGKey(1), (128, d))
        tgt = jnp.ones((so8.num_bins,), jnp.float32)
        f8 = np.asarray(evaluate(vals, tgt, so8, cfg8))
        f32 = np.asarray(evaluate(vals, tgt, so32, cfg32))
        top8, top32 = np.argsort(f8)[:16], np.argsort(f32)[:16]
        assert top8[0] == top32[0]
        assert len(set(top8) & set(top32)) >= 15

    def test_registry_dynamic(self):
        t = get_topology("fm5_parallel")
        assert t.num_dimensions == 20
