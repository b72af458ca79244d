"""Whole-run fused ES kernel (kernels/evolve.py) — interpreter mode on CPU.

The in-kernel rank-merge selection is tested exactly against numpy; the full
kernel is validated by the strongest invariant available: re-evaluating the
returned parent genes through the (already golden-tested) fitness kernel must
reproduce the returned parent fitnesses exactly.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pmfm_tpu import ops
from pmfm_tpu.kernels.evolve import _BIG, _merge_topmu, fused_evolve

N, POP, MU, D = 256, 64, 8, 4
MAXS = (3520.0, 8.0, 3520.0, 1.0)


class TestMergeTopMu:
    @pytest.mark.parametrize("mu,pb", [(8, 32), (16, 16), (3, 40)])
    def test_exact_vs_numpy(self, mu, pb):
        rng = np.random.default_rng(mu * 100 + pb)
        r = 2 * 3 + 1
        pool = rng.standard_normal((r, mu)).astype(np.float32)
        pool[-1] = rng.uniform(0, 10, mu)
        block = rng.standard_normal((r, pb)).astype(np.float32)
        block[-1] = rng.uniform(0, 10, pb)
        out = np.asarray(_merge_topmu(jnp.asarray(pool), jnp.asarray(block), mu))
        cat = np.concatenate([pool, block], axis=1)
        order = np.argsort(cat[-1], kind="stable")[:mu]
        np.testing.assert_array_equal(out, cat[:, order])

    def test_nan_and_inf_fitness_lose(self):
        rng = np.random.default_rng(0)
        r = 3
        pool = rng.standard_normal((r, 4)).astype(np.float32)
        pool[-1] = [1.0, 2.0, np.nan, np.inf]
        block = rng.standard_normal((r, 8)).astype(np.float32)
        block[-1] = np.arange(3.0, 11.0, dtype=np.float32)
        out = np.asarray(_merge_topmu(jnp.asarray(pool), jnp.asarray(block), 4))
        assert np.isfinite(out).all()
        np.testing.assert_array_equal(out[-1], [1.0, 2.0, 3.0, 4.0])

    def test_ties_broken_by_index(self):
        r = 3
        pool = np.zeros((r, 4), np.float32)
        pool[0] = [10, 20, 30, 40]  # identify candidates by gene 0
        pool[-1] = 5.0
        block = np.zeros((r, 8), np.float32)
        block[0] = np.arange(8.0) + 100.0
        block[-1] = 5.0
        out = np.asarray(_merge_topmu(jnp.asarray(pool), jnp.asarray(block), 6))
        np.testing.assert_array_equal(out[0], [10, 20, 30, 40, 100, 101])


@pytest.fixture(scope="module")
def setup():
    so = ops.make_spectrum_ops(N, method="dft", dft_dtype=jnp.bfloat16)
    true = jnp.asarray([880.0, 2.0, 1760.0, 0.9], jnp.float32)
    tgt_audio = ops.synthesize(true[None], N, "fm2", engine="scanless")
    tgt = ops.magnitude_spectrum(tgt_audio, so)[0]
    return so, tgt


class TestFusedEvolve:
    def _run(self, so, tgt, gens=10, seed=7):
        key = jax.random.PRNGKey(0)
        pv = jax.random.uniform(key, (MU, D))
        ps = jnp.full((MU, D), 0.1)
        return fused_evolve(
            jnp.int32(seed), pv, ps, pv[0], jnp.float32(np.inf),
            so.dft_packed, tgt, gens=gens, pop=POP,
            param_mins=(0.0,) * D, param_maxs=MAXS, topology="fm2",
            n=N, pop_block=8, interpret=True,
        )

    def test_invariants(self, setup):
        so, tgt = setup
        pv, ps, pf, bv, bf, traj = [np.asarray(x) for x in self._run(*setup)]
        assert pv.shape == (MU, D) and ps.shape == (MU, D)
        assert np.all(np.diff(pf) >= 0)  # pool sorted best-first
        assert np.all(np.diff(traj) <= 1e-7)  # best-ever monotone
        assert bf == traj[-1]
        assert bf <= pf[0]
        assert np.all((pv >= 0) | (ps > 0))  # values real
        assert np.isfinite(pf).all() and pf[0] < _BIG

    def test_reeval_consistency(self, setup):
        """Returned parent fitness must match re-evaluating the returned
        genes through the golden-tested fitness kernel — exactly (the merge
        copies are bit-exact one-hot matmuls)."""
        from pmfm_tpu.kernels.synth_fitness import fused_synth_fitness

        so, tgt = setup
        pv, ps, pf, bv, bf, traj = self._run(*setup)
        scaled = np.asarray(pv) * np.asarray(MAXS, np.float32)
        fit2 = np.asarray(
            fused_synth_fitness(
                jnp.asarray(scaled), so.dft_cos, so.dft_sin, tgt,
                topology="fm2", n=N, pop_block=8, interpret=True,
            )
        )
        np.testing.assert_array_equal(fit2, np.asarray(pf))

    def test_best_values_match_best_fitness(self, setup):
        from pmfm_tpu.kernels.synth_fitness import fused_synth_fitness

        so, tgt = setup
        pv, ps, pf, bv, bf, traj = self._run(*setup)
        scaled = (np.asarray(bv) * np.asarray(MAXS, np.float32))[None]
        fit = np.asarray(
            fused_synth_fitness(
                jnp.asarray(np.tile(scaled, (8, 1))), so.dft_cos, so.dft_sin,
                tgt, topology="fm2", n=N, pop_block=8, interpret=True,
            )
        )
        np.testing.assert_allclose(fit[0], float(bf), rtol=1e-6)

    def test_resume_improves_or_holds(self, setup):
        """Chained runs behave like one longer run: incoming best-ever is
        respected (final best <= incoming best)."""
        so, tgt = setup
        pv, ps, pf, bv, bf, _ = self._run(*setup, gens=5)
        out = fused_evolve(
            jnp.int32(99), pv, ps, bv, bf, so.dft_packed, tgt,
            gens=5, pop=POP, param_mins=(0.0,) * D, param_maxs=MAXS,
            topology="fm2", n=N, pop_block=8, interpret=True,
        )
        assert float(out[4]) <= float(bf) + 1e-9


class TestFusedEvolveInt8Parallel:
    """Whole-run kernel on the int8 engine with fm3_parallel (mean-amp
    factoring): int8 dots are exact on CPU interpret, so the re-eval
    invariant holds exactly here too."""

    D12 = 12
    MAXS12 = tuple(([3520.0, 8.0, 3520.0, 1.0] * 3)[:12])

    def _setup(self):
        so = ops.make_spectrum_ops(N, method="dft", dft_dtype=jnp.int8)
        true = jnp.asarray(
            [880.0, 2.0, 1760.0, 0.9, 440.0, 1.0, 660.0, 0.5, 1200.0, 3.0,
             990.0, 0.7], jnp.float32)
        tgt_audio = ops.synthesize(true[None], N, "fm3_parallel", engine="scanless")
        tgt = ops.magnitude_spectrum(tgt_audio, so)[0]
        return so, tgt

    def test_invariants_and_reeval(self):
        from pmfm_tpu.kernels.synth_fitness import fused_synth_fitness

        so, tgt = self._setup()
        assert so.dft_packed.dtype == jnp.int8 and so.dft_packed_scale > 0
        key = jax.random.PRNGKey(1)
        pv = jax.random.uniform(key, (MU, self.D12))
        ps = jnp.full((MU, self.D12), 0.1)
        pv_o, ps_o, pf, bv, bf, traj = fused_evolve(
            jnp.int32(11), pv, ps, pv[0], jnp.float32(np.inf),
            so.dft_packed, tgt, gens=5, pop=POP,
            param_mins=(0.0,) * self.D12, param_maxs=self.MAXS12,
            topology="fm3_parallel", n=N, pop_block=8, interpret=True,
            dft_scale=so.dft_packed_scale,
        )
        pf = np.asarray(pf)
        assert np.all(np.diff(pf) >= 0)
        assert np.isfinite(pf).all() and pf[0] < _BIG
        assert np.all(np.diff(np.asarray(traj)) <= 1e-7)
        scaled = np.asarray(pv_o) * np.asarray(self.MAXS12, np.float32)
        fit2 = np.asarray(
            fused_synth_fitness(
                jnp.asarray(scaled), so.dft_cos, so.dft_sin, tgt,
                topology="fm3_parallel", n=N, pop_block=8, interpret=True,
                dft_packed=so.dft_packed, dft_scale=so.dft_packed_scale,
            )
        )
        np.testing.assert_array_equal(fit2, pf)


class TestEvolveMegaWrapper:
    def test_state_bookkeeping(self, setup):
        from pmfm_tpu.es import ESConfig, init_state
        from pmfm_tpu.es.pipeline import _evolve_mega, make_spectrum_ops

        so, tgt = setup
        cfg = ESConfig(
            num_parents=MU, num_offspring=POP - MU, num_dimensions=D,
            topology="fm2", param_mins=(0.0,) * D, param_maxs=MAXS,
            audio_length_log2=8, spectrum_method="dft", dft_dtype="bfloat16",
            fused_kernel=True, fused_generation=True, pop_block=8,
        )
        so_cfg = make_spectrum_ops(cfg)
        state = init_state(jax.random.PRNGKey(3), cfg)
        final, traj = _evolve_mega(state, tgt, 6, so_cfg, cfg, True,
                                   interpret=True)
        assert int(final.generation) == 6
        assert np.asarray(traj).shape == (6,)
        assert 0 <= int(final.stall) <= 6
        assert float(final.best_fitness) == float(np.asarray(traj)[-1])
        # keys must advance (next segment draws fresh randomness)
        assert not np.array_equal(np.asarray(final.key), np.asarray(state.key))
