"""Distributed tests on the virtual 8-device CPU mesh (SURVEY.md §4d)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pmfm_tpu.es import ESConfig, init_state, make_spectrum_ops, match_audio
from pmfm_tpu.ops import scale_params, synthesize_single, target_spectrum
from pmfm_tpu.parallel import (
    POP_AXIS,
    evolve_sharded,
    make_mesh,
    sharded_generation_step,
)

CFG = ESConfig(
    num_parents=8,
    num_offspring=56,  # population 64 -> 8 per device on 8 devices
    num_dimensions=4,
    topology="fm2",
    param_mins=(0.0,) * 4,
    param_maxs=(3520.0, 8.0, 3520.0, 1.0),
    audio_length_log2=8,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh()


@pytest.fixture(scope="module")
def tspec():
    so = make_spectrum_ops(CFG)
    mins = jnp.asarray(CFG.param_mins)
    maxs = jnp.asarray(CFG.param_maxs)
    true_norm = jnp.asarray([0.25, 0.25, 0.5, 0.9], jnp.float32)
    audio = synthesize_single(scale_params(true_norm, mins, maxs), CFG.n_samples, CFG.topology)
    return target_spectrum(audio, so)


class TestMesh:
    def test_make_mesh_default(self, mesh):
        assert mesh.shape[POP_AXIS] == 8

    def test_make_mesh_too_big(self):
        with pytest.raises(ValueError):
            make_mesh(shape=(1024,))


class TestShardedStep:
    def test_step_runs_and_is_replicated(self, mesh, tspec):
        so = make_spectrum_ops(CFG)
        state = init_state(jax.random.PRNGKey(0), CFG)
        out = sharded_generation_step(state, tspec, so, CFG, mesh)
        assert out.parent_values.shape == (CFG.num_parents, 4)
        assert int(out.generation) == 1
        # parent fitness sorted ascending (global top-k merge)
        pf = np.asarray(out.parent_fitness)
        assert np.all(np.diff(pf) >= 0)
        assert float(out.best_fitness) == pf[0]

    def test_population_not_divisible_raises(self, mesh, tspec):
        so = make_spectrum_ops(CFG)
        cfg = CFG.replace(num_offspring=53)  # population 61
        state = init_state(jax.random.PRNGKey(0), cfg)
        with pytest.raises(ValueError):
            sharded_generation_step(state, tspec, so, cfg, mesh)

    def test_local_population_smaller_than_mu_raises(self, mesh, tspec):
        so = make_spectrum_ops(CFG)
        cfg = CFG.replace(num_parents=16, num_offspring=16)  # 4 per device < 16
        state = init_state(jax.random.PRNGKey(0), cfg)
        with pytest.raises(ValueError):
            sharded_generation_step(state, tspec, so, cfg, mesh)

    def test_sharded_beats_single_shard_budget(self, mesh, tspec):
        """8-way sharded step evaluates 8x the candidates of one shard; its
        merged top-k must be at least as good as any single shard's would be
        in expectation — sanity-check convergence over a few generations."""
        so = make_spectrum_ops(CFG)
        state = init_state(jax.random.PRNGKey(1), CFG)
        final, traj = evolve_sharded(state, tspec, 6, so, CFG, mesh,
                                     record_trajectory=True)
        t = np.asarray(traj)
        assert t.shape == (6,)
        assert np.all(np.diff(t) <= 1e-6)  # best-ever monotone
        assert np.isfinite(t[-1])

    def test_match_audio_with_mesh(self, mesh):
        mins = np.zeros(4, np.float32)
        maxs = np.asarray(CFG.param_maxs, np.float32)
        true_norm = np.asarray([0.25, 0.25, 0.5, 0.9], np.float32)
        tgt = np.asarray(
            synthesize_single(jnp.asarray(true_norm * maxs), CFG.n_samples, CFG.topology)
        )
        res = match_audio(tgt, CFG, key=3, num_generations=8, mesh=mesh,
                          record_trajectory=True)
        assert len(res.chunks) == 1
        assert res.chunks[0].trajectory.shape == (8,)
        assert res.chunks[0].best_fitness < res.chunks[0].trajectory[0] * 1.0 + 1e-6

    def test_early_stop_sharded(self, mesh, tspec):
        so = make_spectrum_ops(CFG)
        cfg = CFG.replace(fitness_threshold=1e30)
        state = init_state(jax.random.PRNGKey(2), cfg)
        final, _ = evolve_sharded(state, tspec, 50, so, cfg, mesh)
        assert int(final.generation) == 1


class TestShardedFused:
    @pytest.fixture(scope="class")
    def mesh4(self):
        # the interpret-lowered whole-generation kernel deadlocks XLA:CPU's
        # multi-partition executor at 8 partitions on this 2-core box
        # (4 partitions fine, 0% CPU hang at 8 — runtime scheduling limit,
        # pure-XLA program with no callbacks); the structural tests only
        # need >1 shard, so they use a 4-device submesh
        return make_mesh(shape=(4,))

    def test_sharded_step_with_fused_kernel_interpret(self, mesh, tspec):
        """The Pallas kernel must compose with shard_map (per-shard local
        evaluate)."""
        from pmfm_tpu.es import make_spectrum_ops

        cfg = CFG.replace(
            fused_kernel=True, pop_block=8, synthesis_engine="scanless",
            dft_dtype="bfloat16",
        )
        so = make_spectrum_ops(cfg)
        state = init_state(jax.random.PRNGKey(11), cfg)
        out = sharded_generation_step(state, tspec, so, cfg, mesh)
        assert np.isfinite(np.asarray(out.parent_fitness)).all()
        pf = np.asarray(out.parent_fitness)
        assert np.all(np.diff(pf) >= 0)

    def test_sharded_step_fused_generation_interpret(self, mesh4, tspec):
        """The whole-generation kernel runs per shard (the population-sharded
        multi-chip fast path); interpreter mode exercises the plumbing on the
        CPU mesh (the interpreter PRNG is degenerate — structure only, as in
        the kernel unit tests)."""
        from pmfm_tpu.es import make_spectrum_ops

        cfg = CFG.replace(
            fused_kernel=True, fused_generation=True, pop_block=8,
            synthesis_engine="scanless", dft_dtype="bfloat16",
        )
        so = make_spectrum_ops(cfg)
        state = init_state(jax.random.PRNGKey(12), cfg)
        # jit: eager shard_map dispatches the interpreted kernel op-by-op
        # per shard (minutes); compiled it is instant
        step = jax.jit(
            lambda s: sharded_generation_step(
                s, tspec, so, cfg, mesh4, interpret=True
            )
        )
        out = step(state)
        pf = np.asarray(out.parent_fitness)
        assert np.isfinite(pf).all()
        assert np.all(np.diff(pf) >= 0)
        assert float(out.best_fitness) == pf[0]
        assert int(out.generation) == 1

    def test_evolve_sharded_fused_generation_interpret(self, mesh4, tspec):
        from pmfm_tpu.es import make_spectrum_ops

        cfg = CFG.replace(
            fused_kernel=True, fused_generation=True, pop_block=8,
            synthesis_engine="scanless", dft_dtype="bfloat16",
        )
        so = make_spectrum_ops(cfg)
        state = init_state(jax.random.PRNGKey(13), cfg)
        final, traj = evolve_sharded(state, tspec, 3, so, cfg, mesh4,
                                     record_trajectory=True, interpret=True)
        assert int(final.generation) == 3
        t = np.asarray(traj)
        assert t.shape == (3,)
        assert np.all(np.diff(t) <= 1e-7)  # best-ever monotone


class TestFrameSharded:
    """Frame-axis sharding (SURVEY.md §5.7): DFT+fitness sharded over STFT
    frames, synthesis replicated, psum over the frame axis."""

    FCFG = CFG.replace(
        audio_length_log2=8, num_frames=4,
        num_parents=8, num_offspring=24,  # population 32 -> 8 per pop shard
    )

    def _target_frames(self):
        so = make_spectrum_ops(self.FCFG)
        mins = jnp.asarray(self.FCFG.param_mins)
        maxs = jnp.asarray(self.FCFG.param_maxs)
        true_norm = jnp.asarray([0.25, 0.25, 0.5, 0.9], jnp.float32)
        audio = synthesize_single(
            scale_params(true_norm, mins, maxs),
            self.FCFG.n_samples * self.FCFG.num_frames, self.FCFG.topology,
        )
        from pmfm_tpu.ops.spectral import target_spectrum_frames

        return target_spectrum_frames(audio, so)  # (F, bins)

    def test_matches_pop_only_sharding(self):
        """(4 pop x 2 frame) must reproduce the (4 pop)-only result: same pop
        sharding -> identical offspring; the frame psum reassembles the same
        fitness (modulo float reassociation)."""
        so = make_spectrum_ops(self.FCFG)
        tframes = self._target_frames()
        state = init_state(jax.random.PRNGKey(5), self.FCFG)
        mesh_pf = make_mesh(shape=(4, 2), axis_names=("pop", "frame"))
        mesh_p = make_mesh(shape=(4,), devices=jax.devices()[:4])
        out_pf = sharded_generation_step(state, tframes, so, self.FCFG, mesh_pf)
        out_p = sharded_generation_step(state, tframes, so, self.FCFG, mesh_p)
        np.testing.assert_allclose(
            np.asarray(out_pf.parent_fitness),
            np.asarray(out_p.parent_fitness),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out_pf.parent_values),
            np.asarray(out_p.parent_values),
            rtol=1e-6,
        )

    def test_evolve_frame_sharded(self):
        so = make_spectrum_ops(self.FCFG)
        tframes = self._target_frames()
        state = init_state(jax.random.PRNGKey(6), self.FCFG)
        mesh_pf = make_mesh(shape=(2, 4), axis_names=("pop", "frame"))
        final, traj = evolve_sharded(
            state, tframes, 5, so, self.FCFG, mesh_pf, record_trajectory=True
        )
        t = np.asarray(traj)
        assert t.shape == (5,)
        assert np.all(np.diff(t) <= 1e-6)
        assert np.isfinite(t[-1])

    def test_frames_not_divisible_raises(self):
        so = make_spectrum_ops(self.FCFG)
        cfg = self.FCFG.replace(num_frames=3)
        tframes = self._target_frames()[:3]
        state = init_state(jax.random.PRNGKey(7), cfg)
        mesh_pf = make_mesh(shape=(4, 2), axis_names=("pop", "frame"))
        with pytest.raises(ValueError):
            sharded_generation_step(state, tframes, so, cfg, mesh_pf)


class TestBatchedSharded:
    def test_match_many_with_mesh(self, mesh):
        """BASELINE config 5 composition: vmapped multi-target matching with
        each run's population sharded over the mesh."""
        from pmfm_tpu.es import match_many
        from pmfm_tpu.ops import synthesize_single

        rng = np.random.default_rng(6)
        maxs = np.asarray(CFG.param_maxs, np.float32)
        targets = np.stack([
            np.asarray(synthesize_single(
                jnp.asarray(rng.uniform(0.2, 0.8, 4).astype(np.float32) * maxs),
                CFG.n_samples, CFG.topology))
            for _ in range(3)
        ])
        results = match_many(targets, CFG, key=7, num_generations=4, mesh=mesh)
        assert len(results) == 3
        fits = [r.chunks[0].best_fitness for r in results]
        assert all(np.isfinite(f) for f in fits)
        assert len({round(f, 6) for f in fits}) == 3


class TestCollectiveBytes:
    """MEASURED per-generation collective payload (from the compiled SPMD
    executable's HLO, tools/collective_bytes.py) — verifies the O(mu) design
    claim: selection is the only communicating stage and its bytes are
    independent of population size (docs/DISTRIBUTED.md)."""

    def test_payload_is_o_mu_not_o_pop(self):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
        from collective_bytes import measure

        small = measure(1 << 12, mu=64)
        large = measure(1 << 15, mu=64)
        assert small["total_bytes"] == large["total_bytes"]
        # exactly the design payload: ndev * mu * (2D+1) f32 all-gathered
        assert small["all-gather"]["bytes"] == 8 * 64 * 13 * 4
        # no other collective in the 1-D pop mesh step
        assert set(small) == {"all-gather", "total_bytes"}

    def test_2d_mesh_adds_only_fitness_psum(self):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
        from collective_bytes import measure

        st = measure(1 << 12, mu=64, frames=4, mesh_shape=(4, 2))
        # frame-axis psum of the local-pop fitness partials...
        assert st["all-reduce"]["bytes"] == (1 << 12) // 4 * 4
        # ...plus the pop-axis top-mu merge (4 pop shards)
        assert st["all-gather"]["bytes"] == 4 * 64 * 13 * 4


class TestManyMatcherCache:
    def test_vmapped_matcher_is_cached(self):
        """match_many's engine: the jitted VMAPPED matcher must be built
        once per (cfg, gens, mesh) — a bare jax.vmap(run) per call
        re-traced the whole G-generation scan every time (round-4: ~2x of
        the measured multi-target wall clock on hardware)."""
        from pmfm_tpu.es import ESConfig
        from pmfm_tpu.es.pipeline import _compiled_many_matcher

        cfg = ESConfig(num_parents=8, num_offspring=24, num_dimensions=6,
                       topology="fm3_series", audio_length_log2=8,
                       num_frames=1)
        a = _compiled_many_matcher(cfg, 5, None)
        b = _compiled_many_matcher(cfg, 5, None)
        assert a is b
        c = _compiled_many_matcher(cfg, 6, None)
        assert c is not a
