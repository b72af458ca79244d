"""Fused Pallas synth+DFT+fitness kernel vs the unfused scanless path.

Runs in Pallas interpreter mode on CPU (conftest forces cpu); the same code
compiles with Mosaic on TPU.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pmfm_tpu import ops
from pmfm_tpu.es import ESConfig, init_state, make_spectrum_ops
from pmfm_tpu.es.strategy import evaluate
from pmfm_tpu.kernels.synth_fitness import fused_synth_fitness


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)


@pytest.mark.parametrize("topology,d", [("fm2", 4), ("fm3_series", 6), ("fm3_parallel", 12)])
class TestFusedKernel:
    def _setup(self, topology, d, n=256, pop=8):
        rng = np.random.default_rng(0)
        maxs = np.asarray(([3520.0, 8.0, 3520.0, 1.0] * 3)[:d], np.float32)
        if topology == "fm3_series":
            maxs = np.asarray([3520.0, 8.0, 3520.0, 8.0, 3520.0, 8.0], np.float32)
        scaled = (rng.uniform(0.1, 0.9, (pop, d)).astype(np.float32)) * maxs
        so = ops.make_spectrum_ops(n, method="dft")
        tgt_audio = ops.synthesize(
            jnp.asarray(scaled[:1]), n, topology, engine="scanless"
        )
        tgt = ops.magnitude_spectrum(tgt_audio, so)[0]
        return jnp.asarray(scaled), so, tgt, n

    def test_matches_unfused_scanless(self, topology, d):
        scaled, so, tgt, n = self._setup(topology, d)
        fused = fused_synth_fitness(
            scaled, so.dft_cos, so.dft_sin, tgt,
            topology=topology, n=n, pop_block=8, interpret=True,
        )
        audio = ops.synthesize(scaled, n, topology, engine="scanless",
                               out_dtype=jnp.bfloat16)
        re_im_ops = ops.make_spectrum_ops(n, method="dft", dft_dtype=jnp.bfloat16)
        unfused = ops.evaluate_fitness(audio, tgt, re_im_ops)
        f = np.asarray(fused)
        u = np.asarray(unfused)
        assert rel_err(f, u) < 2e-2
        # candidate 0 synthesised the target: fitness must be ~zero relative
        assert f[0] < 1e-4 * np.median(f)
        assert list(np.argsort(f)) == list(np.argsort(u))

    def test_via_evaluate_config_flag(self, topology, d):
        maxs = ([3520.0, 8.0, 3520.0, 8.0, 3520.0, 8.0]) if topology == "fm3_series" else ([3520.0, 8.0, 3520.0, 1.0] * 3)[:d]
        cfg = ESConfig(
            num_parents=4, num_offspring=4, num_dimensions=d, topology=topology,
            param_mins=(0.0,) * d, param_maxs=tuple(maxs), audio_length_log2=8,
            fused_kernel=True, pop_block=8, synthesis_engine="scanless",
            dft_dtype="bfloat16",
        )
        so = make_spectrum_ops(cfg)
        tgt = jnp.ones((so.num_bins,), jnp.float32)
        values = jax.random.uniform(jax.random.PRNGKey(0), (8, d))
        fused = evaluate(values, tgt, so, cfg)
        unfused = evaluate(values, tgt, so, cfg.replace(fused_kernel=False))
        assert rel_err(np.asarray(fused), np.asarray(unfused)) < 2e-2

    def test_pipeline_with_fused_kernel(self, topology, d):
        from pmfm_tpu.es import match_audio

        maxs = ([3520.0, 8.0, 3520.0, 8.0, 3520.0, 8.0]) if topology == "fm3_series" else ([3520.0, 8.0, 3520.0, 1.0] * 3)[:d]
        cfg = ESConfig(
            num_parents=8, num_offspring=24, num_dimensions=d, topology=topology,
            param_mins=(0.0,) * d, param_maxs=tuple(maxs), audio_length_log2=8,
            fused_kernel=True, pop_block=32, synthesis_engine="scanless",
            dft_dtype="bfloat16",
        )
        true_norm = np.full(d, 0.4, np.float32)
        tgt = np.asarray(
            ops.synthesize(jnp.asarray(true_norm * np.asarray(maxs, np.float32))[None],
                           cfg.n_samples, topology, engine="scanless")
        )[:, 0]
        res = match_audio(tgt, cfg, key=7, num_generations=10, record_trajectory=True)
        c = res.chunks[0]
        assert np.all(np.diff(c.trajectory) <= 1e-6)
        assert np.isfinite(c.best_fitness)


class TestFusedMultiFrame:
    def test_matches_unfused_stft(self):
        from pmfm_tpu.ops.spectral import stft_fitness, target_spectrum_frames

        n, frames, pop = 256, 3, 8
        rng = np.random.default_rng(1)
        maxs = np.asarray([3520.0, 8.0, 3520.0, 8.0, 3520.0, 8.0], np.float32)
        scaled = (rng.uniform(0.1, 0.9, (pop, 6)).astype(np.float32)) * maxs
        so = ops.make_spectrum_ops(n, method="dft")
        tgt_audio = ops.synthesize(
            jnp.asarray(scaled[:1]), n * frames, "fm3_series", engine="scanless"
        )
        tgt_frames = target_spectrum_frames(tgt_audio[:, 0], so)
        fused = fused_synth_fitness(
            jnp.asarray(scaled), so.dft_cos, so.dft_sin, tgt_frames,
            topology="fm3_series", n=n, pop_block=8, interpret=True,
            num_frames=frames,
        )
        audio = ops.synthesize(jnp.asarray(scaled), n * frames, "fm3_series",
                               engine="scanless", out_dtype=jnp.bfloat16)
        so16 = ops.make_spectrum_ops(n, method="dft", dft_dtype=jnp.bfloat16)
        unfused = stft_fitness(audio, tgt_frames, so16)
        f, u = np.asarray(fused), np.asarray(unfused)
        assert rel_err(f, u) < 2e-2
        assert f[0] < 1e-4 * np.median(f)  # candidate 0 made the target
        assert list(np.argsort(f)) == list(np.argsort(u))

    def test_int8_multiframe_matches_f32_ranking(self):
        """The folded int8 engine's per-frame fold state (edge register,
        delayed reversal carry) must reset cleanly at frame boundaries:
        rankings must agree with the f32 STFT fitness and the planted
        candidate must win."""
        from pmfm_tpu.ops.spectral import stft_fitness, target_spectrum_frames

        n, frames, pop = 256, 3, 8
        rng = np.random.default_rng(3)
        maxs = np.asarray([3520.0, 8.0, 3520.0, 8.0, 3520.0, 8.0], np.float32)
        scaled = (rng.uniform(0.1, 0.9, (pop, 6)).astype(np.float32)) * maxs
        so8 = ops.make_spectrum_ops(n, method="dft", dft_dtype=jnp.int8)
        assert so8.dft_packed_scale > 0.0
        tgt_audio = ops.synthesize(
            jnp.asarray(scaled[:1]), n * frames, "fm3_series", engine="scanless"
        )
        tgt_frames = target_spectrum_frames(tgt_audio[:, 0], so8)
        fused = fused_synth_fitness(
            jnp.asarray(scaled), so8.dft_cos, so8.dft_sin, tgt_frames,
            topology="fm3_series", n=n, pop_block=8, interpret=True,
            num_frames=frames, dft_packed=so8.dft_packed,
            dft_scale=so8.dft_packed_scale,
        )
        so32 = ops.make_spectrum_ops(n, method="dft")
        audio = ops.synthesize(jnp.asarray(scaled), n * frames, "fm3_series",
                               engine="scanless")
        unfused = stft_fitness(audio, tgt_frames, so32)
        f, u = np.asarray(fused), np.asarray(unfused)
        assert np.isfinite(f).all()
        assert f[0] < 1e-3 * np.median(f)  # candidate 0 made the target
        assert list(np.argsort(f)) == list(np.argsort(u))

    def test_via_stft_matcher(self):
        from pmfm_tpu.es import ESConfig, match_audio_stft

        cfg = ESConfig(
            num_parents=8, num_offspring=24, num_dimensions=6,
            topology="fm3_series", audio_length_log2=8,
            fused_kernel=True, pop_block=32, synthesis_engine="scanless",
            dft_dtype="bfloat16",
        )
        maxs = np.asarray(cfg.param_maxs, np.float32)
        tgt = np.asarray(
            ops.synthesize(jnp.asarray((np.full(6, 0.4, np.float32) * maxs))[None],
                           cfg.n_samples * 2, "fm3_series", engine="scanless")
        )[:, 0]
        res = match_audio_stft(tgt, cfg, key=9, num_generations=10,
                               record_trajectory=True)
        c = res.chunks[0]
        assert np.all(np.diff(c.trajectory) <= 1e-6)
        assert np.isfinite(c.best_fitness)


class TestEdgeCases:
    def test_boundary_gene_values(self):
        """Genes exactly at 0 and 1 (scaled params at range bounds) must give
        finite fitness in the fused kernel."""
        n = 256
        so = ops.make_spectrum_ops(n, method="dft")
        vals = np.zeros((8, 6), np.float32)
        vals[1] = 1.0
        vals[2] = [1.0, 0.0, 1.0, 0.0, 1.0, 0.0]
        maxs = np.asarray([3520.0, 8.0, 3520.0, 8.0, 3520.0, 8.0], np.float32)
        scaled = jnp.asarray(vals * maxs)
        tgt = jnp.ones((so.num_bins,), jnp.float32)
        fit = fused_synth_fitness(scaled, so.dft_cos, so.dft_sin, tgt,
                                  topology="fm3_series", n=n, pop_block=8,
                                  interpret=True)
        assert np.isfinite(np.asarray(fit)).all()

    def test_single_block_population(self):
        """pop == pop_block (single grid program)."""
        n = 256
        so = ops.make_spectrum_ops(n, method="dft")
        scaled = jnp.asarray(np.full((16, 4), 100.0, np.float32))
        tgt = jnp.zeros((so.num_bins,), jnp.float32)
        fit = fused_synth_fitness(scaled, so.dft_cos, so.dft_sin, tgt,
                                  topology="fm2", n=n, pop_block=16,
                                  interpret=True)
        assert fit.shape == (16,)
        # identical candidates -> identical fitness
        f = np.asarray(fit)
        np.testing.assert_allclose(f, f[0], rtol=1e-5)


class TestInt8Engine:
    """int8 DFT engine (dft_dtype="int8"): exact int32-accumulated matmul
    against the quantised dft_packed, amplitude factored out of the audio
    (ops/spectral.py SpectrumOps docs). Interpreter-mode int8 dots are
    bit-identical to the TPU MXU (integer arithmetic), unlike bf16."""

    def _cfg(self, topology, d, dft_dtype, **kw):
        maxs = (
            (3520.0, 8.0, 3520.0, 8.0, 3520.0, 8.0)
            if topology == "fm3_series"
            else tuple(([3520.0, 8.0, 3520.0, 1.0] * 3)[:d])
        )
        return ESConfig(
            num_parents=16, num_offspring=112, num_dimensions=d,
            topology=topology, param_mins=(0.0,) * d, param_maxs=maxs,
            audio_length_log2=8, synthesis_engine="scanless",
            spectrum_method="dft", dft_dtype=dft_dtype, pop_block=128, **kw,
        )

    @pytest.mark.parametrize(
        "topology,d", [("fm2", 4), ("fm3_series", 6), ("fm3_parallel", 12)]
    )
    def test_rank_agreement_vs_f32(self, topology, d):
        cfg8 = self._cfg(topology, d, "int8", fused_kernel=True)
        cfg32 = self._cfg(topology, d, "float32")
        so8 = make_spectrum_ops(cfg8)
        so32 = make_spectrum_ops(cfg32)
        assert so8.dft_packed.dtype == jnp.int8 and so8.dft_packed_scale > 0
        vals = jax.random.uniform(jax.random.PRNGKey(0), (128, d))
        tgt = jnp.ones((so8.num_bins,), jnp.float32)
        f8 = np.asarray(evaluate(vals, tgt, so8, cfg8))
        f32 = np.asarray(evaluate(vals, tgt, so32, cfg32))
        rel = np.abs(f8 - f32) / (np.abs(f32) + 1e-9)
        assert np.median(rel) < 2e-3 and rel.max() < 3e-2
        # selection consumes the top-mu set and the best candidate
        top8, top32 = np.argsort(f8)[:16], np.argsort(f32)[:16]
        assert top8[0] == top32[0]
        assert len(set(top8) & set(top32)) >= 15

    def test_sine_order_knob(self):
        """ESConfig.sine_order swaps the oscillator polynomial in the fused
        kernels (9 = default/exactest; 7 and 5 trade accuracy for VPU FLOPs,
        tools/tpu_sine_order_probe.py). Lower orders must actually change
        the audio (regression: module-level jit caches must key on it) while
        keeping the ranking consistent at order 7."""
        vals = jax.random.uniform(jax.random.PRNGKey(0), (128, 6))
        fits = {}
        for order in (9, 7, 5):
            cfg = self._cfg("fm3_series", 6, "int8", fused_kernel=True,
                            sine_order=order)
            so = make_spectrum_ops(cfg)
            tgt = jnp.ones((so.num_bins,), jnp.float32)
            fits[order] = np.asarray(evaluate(vals, tgt, so, cfg))
        d97 = np.median(np.abs(fits[9] - fits[7]) / np.abs(fits[9]))
        d95 = np.median(np.abs(fits[9] - fits[5]) / np.abs(fits[9]))
        assert d97 > 0.0  # the knob reaches the kernel
        assert d95 > d97  # error grows as the order drops
        top9 = set(np.argsort(fits[9])[:16].tolist())
        top7 = set(np.argsort(fits[7])[:16].tolist())
        assert len(top9 & top7) >= 15
        with pytest.raises(ValueError, match="sine_order"):
            self._cfg("fm3_series", 6, "int8", sine_order=6)

    def test_parallel_topology_int8_supported(self):
        """fm3_parallel factors the mean amplitude out (three summed pairs),
        so it gets the int8 engine too — no bf16 downgrade."""
        cfg = self._cfg("fm3_parallel", 12, "int8")
        so = make_spectrum_ops(cfg)
        assert so.dft_packed.dtype == jnp.int8
        assert so.dft_packed_scale > 0.0

    def test_generation_step_int8(self):
        """Full generation_step pipeline with the int8 engine (XLA fallback
        offspring on CPU + int8 fused evaluate) improves fitness."""
        from pmfm_tpu.es.pipeline import evolve

        cfg = self._cfg("fm3_series", 6, "int8", fused_kernel=True)
        so = make_spectrum_ops(cfg)
        state = init_state(jax.random.PRNGKey(0), cfg)
        tgt = jnp.ones((so.num_bins,), jnp.float32)
        final, _ = evolve(state, tgt, 3, so, cfg)
        assert np.isfinite(float(final.best_fitness))
        assert float(final.best_fitness) < 1e30

    def test_int8_requires_packed_operand(self):
        so = ops.make_spectrum_ops(256, method="dft")
        scaled = jnp.asarray(np.full((8, 6), 100.0, np.float32))
        tgt = jnp.zeros((so.num_bins,), jnp.float32)
        with pytest.raises(ValueError, match="int8"):
            fused_synth_fitness(
                scaled, so.dft_cos, so.dft_sin, tgt, topology="fm3_series",
                n=256, pop_block=8, interpret=True, dft_scale=1e-7,
                dft_packed=so.dft_packed,  # bf16, not int8
            )


class TestInt8SmallFrameFallback:
    def test_n128_falls_back_to_xla(self):
        """The folded int8 engine pairs time blocks, so a single-block frame
        (n = 128) must be rejected by the gating and evaluate via XLA instead
        of crashing in the kernel."""
        from pmfm_tpu.es.strategy import _fused_ok, evaluate

        d = 4
        cfg = ESConfig(
            num_parents=16, num_offspring=112, num_dimensions=d,
            topology="fm2", param_mins=(0.0,) * d,
            param_maxs=(3520.0, 8.0, 3520.0, 1.0), audio_length_log2=7,
            synthesis_engine="scanless", spectrum_method="dft",
            dft_dtype="int8", fused_kernel=True, pop_block=128,
        )
        so = make_spectrum_ops(cfg)
        assert so.dft_packed_scale > 0.0
        assert not _fused_ok(cfg, so)
        vals = jax.random.uniform(jax.random.PRNGKey(0), (128, d))
        tgt = jnp.ones((so.num_bins,), jnp.float32)
        fit = np.asarray(evaluate(vals, tgt, so, cfg))
        assert np.isfinite(fit).all()


class TestVmemGating:
    def _cfg(self, log2, dft_dtype, **kw):
        d = 6
        return ESConfig(
            num_parents=64, num_offspring=4096 - 64, num_dimensions=d,
            topology="fm3_series", param_mins=(0.0,) * d,
            param_maxs=(3520.0, 8.0, 3520.0, 8.0, 3520.0, 8.0),
            audio_length_log2=log2, synthesis_engine="scanless",
            spectrum_method="dft", dft_dtype=dft_dtype, fused_kernel=True,
            pop_block=1024, **kw,
        )

    def test_bf16_4096_rejected_falls_back(self):
        """bf16 n=4096's (2K, N) operand alone is 32 MB — the gating must
        reject it (compile would OOM scoped VMEM) and evaluate via XLA."""
        from pmfm_tpu.es.strategy import _fused_ok, evaluate

        cfg = self._cfg(12, "bfloat16")
        so = make_spectrum_ops(cfg)
        assert not _fused_ok(cfg, so)
        vals = jax.random.uniform(jax.random.PRNGKey(0), (cfg.population_size, 6))
        tgt = jnp.ones((so.num_bins,), jnp.float32)
        assert np.isfinite(np.asarray(evaluate(vals, tgt, so, cfg))).all()

    def test_int8_2048_allowed(self):
        """The reference's default chunk size (audioLengthLog2=11) fits the
        folded int8 engine (~5 MB resident)."""
        from pmfm_tpu.es.strategy import _fused_ok

        cfg = self._cfg(11, "int8")
        so = make_spectrum_ops(cfg)
        assert _fused_ok(cfg, so)

    def test_bench_config_allowed(self):
        from pmfm_tpu.es.strategy import _fused_ok

        cfg = self._cfg(10, "int8").replace(num_parents=256,
                                            num_offspring=(1 << 15) - 256)
        so = make_spectrum_ops(cfg)
        assert _fused_ok(cfg, so)


class TestTrueF32Engine:
    """dft_dtype=float32 + fused flags = the TRUE-f32 kernel (round 5):
    f32 folded operand, f32 audio scratch, Precision.HIGHEST DFT dots —
    the refine tail's fast engine (ESConfig.refine_config)."""

    def _cfg(self, **kw):
        d = 6
        base = dict(
            num_parents=32, num_offspring=512 - 32, num_dimensions=d,
            topology="fm3_series", param_mins=(0.0,) * d,
            param_maxs=(3520.0, 8.0, 3520.0, 8.0, 3520.0, 8.0),
            audio_length_log2=9, synthesis_engine="scanless",
            spectrum_method="dft", pop_block=256,
        )
        base.update(kw)
        return ESConfig(**base)

    def test_f32_packed_operand(self):
        cfg = self._cfg(dft_dtype="float32", fused_kernel=True)
        so = make_spectrum_ops(cfg)
        assert so.dft_packed is not None
        assert so.dft_packed.dtype == jnp.float32
        assert so.dft_packed_scale == 0.0

    def test_fused_f32_matches_xla_f32(self):
        """The f32 fused kernel must agree with the unfused XLA f32 path to
        the order-9 sine polynomial's floor (~2e-6 per sample -> ~1e-4 on
        fitness), far below the bf16 engine's ~1e-2 — i.e. it is genuinely
        f32, not a relabelled bf16 kernel."""
        from pmfm_tpu.es.strategy import _fused_ok, active_engine

        cfg_f = self._cfg(dft_dtype="float32", fused_kernel=True)
        cfg_x = self._cfg(dft_dtype="float32", fused_kernel=False)
        so_f, so_x = make_spectrum_ops(cfg_f), make_spectrum_ops(cfg_x)
        assert _fused_ok(cfg_f, so_f)
        assert active_engine(cfg_f, so_f) == "fused_kernel"
        vals = jax.random.uniform(jax.random.PRNGKey(0), (512, 6))
        tgt = jnp.ones((so_f.num_bins,), jnp.float32)
        ff = np.asarray(evaluate(vals, tgt, so_f, cfg_f))
        fx = np.asarray(evaluate(vals, tgt, so_x, cfg_x))
        rel = np.abs(ff - fx) / (np.abs(fx) + 1e-9)
        assert np.median(rel) < 1e-4, np.median(rel)
        # full rank agreement over the best quarter
        k = 128
        assert set(np.argsort(ff)[:k]) == set(np.argsort(fx)[:k])

    def test_refine_config_keeps_fused_engines(self):
        """VERDICT r4 weak #2: the refine tail must not fall back to the
        ~13 ms/gen unfused XLA path when the parent config is fused."""
        from pmfm_tpu.es.strategy import _fused_ok

        cfg = self._cfg(
            dft_dtype="int8", fused_kernel=True, fused_generation=True,
            refine_generations=50, refine_step_floor=0.01,
        )
        cfg_r = cfg.refine_config()
        assert cfg_r.dft_dtype == "float32"
        assert cfg_r.fused_kernel and cfg_r.fused_generation
        assert not cfg_r.fused_evolve
        assert cfg_r.sine_order == 9
        # still eligible for the in-kernel-PRNG generation kernel on
        # hardware: CLT sigma=1/6 noise (clt12_neutral)
        assert cfg_r.gauss_sigma == pytest.approx(1.0 / 6.0)
        so_r = make_spectrum_ops(cfg_r)
        assert _fused_ok(cfg_r, so_r)
        # a non-fused parent config keeps the XLA tail
        cfg_plain = self._cfg(
            dft_dtype="bfloat16", refine_generations=50
        ).refine_config()
        assert not (cfg_plain.fused_kernel or cfg_plain.fused_generation)

    def test_vmem_estimate_tracks_operand_dtype(self):
        """f32 operands/scratch are 2x bf16 and 4x int8 in the footprint
        gate — the estimate must follow the packed dtype, not assume bf16."""
        from pmfm_tpu.es.strategy import _fused_vmem_bytes

        sizes = {}
        for dt in ("int8", "bfloat16", "float32"):
            cfg = self._cfg(dft_dtype=dt, fused_kernel=True)
            sizes[dt] = _fused_vmem_bytes(cfg, make_spectrum_ops(cfg))
        assert sizes["int8"] < sizes["bfloat16"] < sizes["float32"]

    def test_fused_generation_f32_structure(self):
        """Whole-generation kernel in f32 mode (interpret): offspring genes
        are exact parent copies at zero step, fitness finite."""
        from pmfm_tpu.kernels.generation import fused_generation

        cfg = self._cfg(
            dft_dtype="float32", fused_kernel=True, fused_generation=True,
            num_parents=16, num_offspring=48, pop_block=32,
            audio_length_log2=8,
        )
        so = make_spectrum_ops(cfg)
        key = jax.random.PRNGKey(2)
        pv = jax.random.uniform(key, (16, 6))
        ps = jnp.zeros((16, 6))
        tgt = jnp.ones((so.num_bins,), jnp.float32)
        fit, values_t, steps_t = fused_generation(
            jnp.asarray(0, jnp.int32), pv, ps, so.dft_cos, so.dft_sin, tgt,
            pop=cfg.population_size, param_mins=cfg.param_mins,
            param_maxs=cfg.param_maxs, topology=cfg.topology,
            n=cfg.n_samples, pop_block=cfg.pop_block,
            interpret=jax.default_backend() == "cpu", alpha=cfg.alpha,
            beta=cfg.beta, beta_scale=cfg.beta_scale,
            root_two_over_pi=cfg.root_two_over_pi,
            clamp_values=cfg.clamp_values, dft_packed=so.dft_packed,
            dft_scale=so.dft_packed_scale,
        )
        assert np.isfinite(np.asarray(fit)).all()
        vn = np.asarray(values_t[:6].T)
        pvn = np.asarray(pv)
        for dim in range(6):
            assert np.isin(vn[:, dim], pvn[:, dim]).all(), f"dim {dim}"


class TestFoldDeepWindows:
    """The delayed-reversal fold at nb >= 4 time blocks (multiple emission
    windows + the next-sample carry chain); nb=2 is covered everywhere else."""

    @pytest.mark.parametrize("dft_dtype", ["int8", "bfloat16"])
    def test_n512_rank_agreement(self, dft_dtype):
        from pmfm_tpu.es import ESConfig, make_spectrum_ops
        from pmfm_tpu.es.strategy import evaluate

        d = 6
        cfg = ESConfig(
            num_parents=16, num_offspring=112, num_dimensions=d,
            topology="fm3_series", param_mins=(0.0,) * d,
            param_maxs=(3520.0, 8.0) * 3, audio_length_log2=9,  # nb = 4
            synthesis_engine="scanless", spectrum_method="dft",
            dft_dtype=dft_dtype, fused_kernel=True, pop_block=128,
        )
        cfg32 = cfg.replace(dft_dtype="float32", fused_kernel=False)
        so = make_spectrum_ops(cfg)
        so32 = make_spectrum_ops(cfg32)
        vals = jax.random.uniform(jax.random.PRNGKey(2), (128, d))
        tgt = jnp.ones((so.num_bins,), jnp.float32)
        f = np.asarray(evaluate(vals, tgt, so, cfg))
        f32 = np.asarray(evaluate(vals, tgt, so32, cfg32))
        top, top32 = np.argsort(f)[:16], np.argsort(f32)[:16]
        assert top[0] == top32[0]
        assert len(set(top) & set(top32)) >= 15


class TestPopBlockNormalization:
    def test_gate_and_call_agree_for_odd_pops(self):
        """resolve_pop_block is THE normalisation: for pop=48 < pop_block the
        clamp must win (whole-array block), never the halving chain (which
        would reach 16 — an illegal Mosaic lane block the gate approved)."""
        from pmfm_tpu.kernels.synth_fitness import resolve_pop_block

        assert resolve_pop_block(48, 512) == 48
        assert resolve_pop_block(96, 512) == 96
        assert resolve_pop_block(32768, 1024) == 1024
        # and the fused path runs end-to-end at such a population
        d = 4
        cfg = ESConfig(
            num_parents=16, num_offspring=32, num_dimensions=d,  # pop 48
            topology="fm2", param_mins=(0.0,) * d,
            param_maxs=(3520.0, 8.0, 3520.0, 1.0), audio_length_log2=8,
            synthesis_engine="scanless", spectrum_method="dft",
            dft_dtype="bfloat16", fused_kernel=True, pop_block=512,
        )
        so = make_spectrum_ops(cfg)
        vals = jax.random.uniform(jax.random.PRNGKey(0), (48, d))
        tgt = jnp.ones((so.num_bins,), jnp.float32)
        fit = np.asarray(evaluate(vals, tgt, so, cfg))
        assert np.isfinite(fit).all()
