"""Unit tests for the ops layer vs closed-form / NumPy oracles (SURVEY.md §4a/4b)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pmfm_tpu import ops
from pmfm_tpu.ops.oracle import OracleObjective
from pmfm_tpu.ops import spectral


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)


class TestWavetable:
    def test_wavetable_matches_reference_formula(self):
        wt = ops.build_wavetable(1024)
        i = np.arange(1024)
        expect = np.sin(i / 1023.0 * 2 * np.pi)
        np.testing.assert_allclose(wt, expect, atol=1e-6)

    def test_floor_osc_equals_table_lookup(self):
        wt = ops.build_wavetable()
        osc = ops.make_osc("floor", ops.DEFAULT_WAVETABLE_SIZE)
        pos = jnp.asarray([0.0, 1.7, 500.2, 32767.9], jnp.float32)
        got = np.asarray(osc(pos))
        expect = wt[np.floor(np.asarray(pos)).astype(int)]
        np.testing.assert_allclose(got, expect, atol=1e-6)

    def test_wrap(self):
        size = 16.0
        p = jnp.asarray([15.0, 16.0, 17.5, -1.0])
        np.testing.assert_allclose(
            np.asarray(ops.wrap_pos(p, size)), [15.0, 0.0, 1.5, -1.0]
        )
        np.testing.assert_allclose(
            np.asarray(ops.wrap_pos_both(p, size)), [15.0, 0.0, 1.5, 15.0]
        )


class TestWindow:
    def test_window_is_hann_times_two(self):
        n = 512
        w = ops.hann_window(n)
        expect = 1.0 - np.cos(2 * np.pi * np.arange(n) / n)
        np.testing.assert_allclose(w, expect, atol=1e-9)

    def test_window_factor_is_one(self):
        assert abs(ops.window_factor(1024) - 1.0) < 1e-12


PARAM_MAXS = {
    "fm2": np.array([3520.0, 8.0, 3520.0, 1.0], np.float32),
    "fm3_series": np.array([3520.0, 8.0, 3520.0, 8.0, 3520.0, 8.0], np.float32),
    "fm3_parallel": np.array([3520.0, 8.0, 3520.0, 1.0] * 3, np.float32),
}


@pytest.mark.parametrize("topology", ["fm2", "fm3_series", "fm3_parallel"])
class TestSynthesisVsOracle:
    def test_matches_oracle(self, topology):
        n = 512
        rng = np.random.default_rng(0)
        maxs = PARAM_MAXS[topology]
        pop = 4
        values = rng.uniform(0.2, 0.9, size=(pop, maxs.size)).astype(np.float32)
        scaled = values * maxs
        oracle = OracleObjective(n)
        audio_tpu = np.asarray(
            ops.synthesize(jnp.asarray(scaled), n, topology, osc_mode="floor")
        )  # (n, pop)
        for p in range(pop):
            expect = oracle.synthesize(scaled[p], topology)
            # identical recurrences in float32; divergence only from sin/table
            # rounding which compounds through the phase feedback
            assert rel_err(audio_tpu[:, p], expect) < 2e-3, f"candidate {p}"

    def test_single_matches_batch(self, topology):
        maxs = PARAM_MAXS[topology]
        scaled = (0.5 * maxs).astype(np.float32)
        a1 = ops.synthesize_single(jnp.asarray(scaled), 256, topology)
        a2 = ops.synthesize(jnp.asarray(scaled)[None], 256, topology)[:, 0]
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))


class TestSpectrum:
    def test_method_gates(self):
        """auto is dtype-aware (folded bf16/int8 matmuls beat rfft to the
        materialisation limit — benchmarks/spectrum_crossover.csv) and an
        explicit 'dft' above DFT_MAX_MATERIALIZE_N degrades to rfft
        instead of building O(N^2) operands past HBM."""
        from pmfm_tpu.ops import spectral

        assert ops.make_spectrum_ops(4096, method="auto").method == "dft"
        assert ops.make_spectrum_ops(8192, method="auto").method == "rfft"
        assert (
            ops.make_spectrum_ops(
                8192, method="auto", dft_dtype=jnp.int8
            ).method
            == "dft"
        )
        # above the materialisation limit both auto and explicit dft now
        # resolve to the four-step FACTORED matmul DFT (O(N) operands);
        # the explicit switch warns
        assert (
            ops.make_spectrum_ops(
                1 << 16, method="auto", dft_dtype=jnp.int8
            ).method
            == "dft_factored"
        )
        big = ops.make_spectrum_ops(1 << 16, method="dft")
        assert big.method == "dft_factored" and big.dft_cos is None
        assert big.factored is not None and big.factored.n1 == 256
        # 16384 since round 5: at 32768 the streamed+factored engine beats
        # the folded-operand engine (120.3 vs 139.8 ms/gen, hardware), so
        # the 2.7 GB operand is never worth materialising
        assert spectral.DFT_MAX_MATERIALIZE_N == 16384
        # a non-factorable band request falls back to rfft (explicit dft
        # warns: that one IS a numerics change)
        with pytest.warns(UserWarning, match="rfft"):
            nf = ops.make_spectrum_ops(
                1 << 16, num_bins=(1 << 15) + 1, method="dft"
            )
        assert nf.method == "rfft"
        assert (
            ops.make_spectrum_ops(
                1 << 16, num_bins=(1 << 15) + 1, method="auto",
                dft_dtype=jnp.int8,
            ).method
            == "rfft"
        )

    @pytest.mark.parametrize("dtype", [jnp.int8, jnp.bfloat16, jnp.float32])
    def test_operand_disk_cache_roundtrip(self, tmp_path, monkeypatch, dtype):
        """Opt-in operand cache: a cached load is BIT-identical to a fresh
        build (incl. the bf16 uint16-view round trip), and the versioned
        file lands in the cache dir."""
        import os

        from pmfm_tpu.ops import spectral

        monkeypatch.setattr(spectral, "OPERAND_CACHE_MIN_N", 512)
        kw = dict(method="dft", dft_dtype=dtype, cache_dir=str(tmp_path))
        fresh = spectral.make_spectrum_ops(512, method="dft", dft_dtype=dtype)
        so1 = spectral.make_spectrum_ops(512, **kw)  # builds + saves
        files = os.listdir(tmp_path)
        assert any(f.startswith("dftops_v") for f in files), files
        so2 = spectral.make_spectrum_ops(512, **kw)  # loads
        for a, b in ((so1, so2), (fresh, so2)):
            assert np.array_equal(np.asarray(a.dft_cos), np.asarray(b.dft_cos))
            assert np.array_equal(np.asarray(a.dft_sin), np.asarray(b.dft_sin))
            assert a.dft_packed.dtype == b.dft_packed.dtype
            assert np.array_equal(
                np.asarray(a.dft_packed), np.asarray(b.dft_packed)
            )
        assert so2.dft_packed_scale == fresh.dft_packed_scale

    def test_active_engine_ladder(self):
        """strategy.active_engine names the engine evaluate() dispatches
        to at each frame size (the chunk-size suite's row annotations)."""
        from pmfm_tpu.es import ESConfig, make_spectrum_ops as mk
        from pmfm_tpu.es.strategy import active_engine

        def cfg(log2, pop_log2=15):
            return ESConfig(
                num_parents=256, num_offspring=(1 << pop_log2) - 256,
                audio_length_log2=log2, synthesis_engine="scanless",
                spectrum_method="dft", dft_dtype="int8", fused_kernel=True,
                fused_generation=True, pop_block=1024,
            )

        c = cfg(10)
        # on CPU the in-kernel-PRNG generation kernel is gated off
        # (hardware-only PRNG) and generation_step runs the XLA stages
        # around the fused EVALUATION kernel — active_engine mirrors the
        # backend gate (ADVICE r3: it must name what actually ran)
        assert active_engine(c, mk(c)) == "fused_kernel"
        c = cfg(13)
        assert active_engine(c, mk(c)) == "synth_fold"
        # above the materialisation limit: streamed Pallas synthesis into
        # the four-step factored DFT (round 5 — was xla_dft_factored in
        # round 4, rfft through round 3)
        c = cfg(16, pop_log2=13)
        assert active_engine(c, mk(c)) == "synth_stream"
        # ...and with the fused flags off, the label is the XLA path
        assert (
            active_engine(
                c.replace(fused_kernel=False, fused_generation=False), mk(c)
            )
            == "xla_dft_factored"
        )
        # multi-frame STFT on the XLA path gets its own label
        c = cfg(10).replace(fused_kernel=False, fused_generation=False,
                            num_frames=4)
        assert active_engine(c, mk(c)) == "xla_stft"
        # pop 2^18 (BASELINE config 4's total population): the fused kernel
        # must NOT be VMEM-gated off — its offspring outputs are blocked
        # (VR, PB) per program, so the footprint is pop-independent apart
        # from the full-map fitness output. The stale 8*D*pop estimate
        # silently degraded 2^18 to the XLA path at 2.8x the cost
        # (round-4 bisect: 13.3 vs 4.8 ms/gen on hardware).
        from pmfm_tpu.es.strategy import _fused_ok

        c = cfg(10, pop_log2=18).replace(num_parents=2048)
        assert _fused_ok(c, mk(c))
        assert active_engine(c, mk(c)) == "fused_kernel"  # cpu-backend label

    @pytest.mark.parametrize("n", [1024, 2048])  # even and odd log2(n)
    def test_factored_matches_rfft(self, n):
        """Four-step factored DFT (the n > 32768 engine, forced small here)
        matches the exact rfft spectrum to f32 round-off — well inside the
        BASELINE.md 1e-3 relative-spectral-error bound."""
        rng = np.random.default_rng(7)
        audio = rng.standard_normal((n, 16)).astype(np.float32)
        so_f = ops.make_spectrum_ops(n, method="dft_factored")
        so_r = ops.make_spectrum_ops(n, method="rfft")
        s_f = np.asarray(ops.magnitude_spectrum(jnp.asarray(audio), so_f))
        s_r = np.asarray(ops.magnitude_spectrum(jnp.asarray(audio), so_r))
        assert rel_err(s_f, s_r) < 1e-5
        assert s_f.shape == (16, n // 2)

    def test_factored_bf16_family_close(self):
        """The DEFAULT-precision family (bf16/int8 configs) carries the
        factored operands AND stage-1/twiddle intermediates in bf16
        (round 5 — the matmuls rounded operands to bf16 anyway; explicit
        bf16 halves the HBM traffic of every stage). Stays within the
        bf16 quantisation envelope of the exact spectrum."""
        n = 1024
        rng = np.random.default_rng(9)
        audio = jnp.asarray(rng.standard_normal((n, 32)), jnp.float32)
        so_b = ops.make_spectrum_ops(
            n, method="dft_factored", dft_dtype=jnp.bfloat16
        )
        so_r = ops.make_spectrum_ops(n, method="rfft")
        s_b = np.asarray(ops.magnitude_spectrum(audio, so_b))
        s_r = np.asarray(ops.magnitude_spectrum(audio, so_r))
        assert rel_err(s_b, s_r) < 2e-2

    def test_factored_chunking_equivalent(self, monkeypatch):
        """Population chunking (lax.map over chunks) only reshapes the
        matmul batch, so results match to f32 round-off (the reduction
        order may differ with the shape)."""
        from pmfm_tpu.ops import spectral

        n, pop = 1024, 256
        rng = np.random.default_rng(8)
        audio = jnp.asarray(rng.standard_normal((n, pop)), jnp.float32)
        so = ops.make_spectrum_ops(n, method="dft_factored")
        whole = np.asarray(ops.magnitude_spectrum(audio, so))
        # budget for exactly one 128-candidate chunk (the floor) -> 2 chunks
        monkeypatch.setattr(spectral, "FACTORED_CHUNK_BYTES", 28 * n * 128)
        assert spectral._factored_chunk(n, pop) == 128
        chunked = np.asarray(ops.magnitude_spectrum(audio, so))
        np.testing.assert_allclose(chunked, whole, rtol=1e-4, atol=1e-6)

    def test_factored_oracle_parity_and_evaluate_path(self):
        """End-to-end: a forced-factored config evaluates fitness within
        the oracle bound, and active_engine labels it."""
        from pmfm_tpu.es import ESConfig, make_spectrum_ops
        from pmfm_tpu.es.strategy import active_engine, evaluate

        cfg = ESConfig(
            num_parents=8, num_offspring=24, num_dimensions=6,
            audio_length_log2=10, spectrum_method="dft_factored",
            synthesis_engine="scanless",
        )
        so = make_spectrum_ops(cfg)
        assert so.method == "dft_factored"
        assert active_engine(cfg, so) == "xla_dft_factored"
        cfg_r = cfg.replace(spectrum_method="rfft")
        so_r = make_spectrum_ops(cfg_r)
        rng = np.random.default_rng(9)
        vals = jnp.asarray(rng.uniform(size=(32, 6)), jnp.float32)
        tgt = jnp.asarray(rng.uniform(size=(so.num_bins,)), jnp.float32)
        f_f = np.asarray(evaluate(vals, tgt, so, cfg))
        f_r = np.asarray(evaluate(vals, tgt, so_r, cfg_r))
        assert rel_err(f_f, f_r) < 1e-4

    def test_rfft_and_dft_agree(self):
        n = 512
        rng = np.random.default_rng(1)
        audio = rng.standard_normal((n, 8)).astype(np.float32)
        so_fft = ops.make_spectrum_ops(n, method="rfft")
        so_dft = ops.make_spectrum_ops(n, method="dft")
        s1 = np.asarray(ops.magnitude_spectrum(jnp.asarray(audio), so_fft))
        s2 = np.asarray(ops.magnitude_spectrum(jnp.asarray(audio), so_dft))
        assert rel_err(s2, s1) < 1e-4

    def test_matches_oracle_spectrum(self):
        n = 512
        rng = np.random.default_rng(2)
        audio = rng.standard_normal(n).astype(np.float32)
        oracle = OracleObjective(n)
        expect = oracle.magnitude_spectrum(audio)
        for method in ("rfft", "dft"):
            so = ops.make_spectrum_ops(n, method=method)
            got = np.asarray(ops.target_spectrum(jnp.asarray(audio), so))
            assert rel_err(got, expect) < 1e-4, method

    def test_pure_tone_peak_bin(self):
        n = 1024
        sr = 44100.0
        freq = sr / n * 100  # exactly bin 100
        t = np.arange(n) / sr
        audio = np.sin(2 * np.pi * freq * t).astype(np.float32)
        so = ops.make_spectrum_ops(n, method="dft")
        spec = np.asarray(ops.target_spectrum(jnp.asarray(audio), so))
        assert np.argmax(spec) == 100
        # Hann*2 window: peak magnitude ~ amplitude/2 * sum(w)/N / windowFactor = 0.5
        assert abs(spec[100] - 0.5) < 1e-3

    def test_fitness_zero_for_identical(self):
        n = 256
        rng = np.random.default_rng(3)
        audio = rng.standard_normal((n, 3)).astype(np.float32)
        so = ops.make_spectrum_ops(n, method="dft")
        spec = ops.magnitude_spectrum(jnp.asarray(audio), so)
        f = np.asarray(ops.spectral_fitness(spec, spec[1]))
        assert f[1] < 1e-10
        assert f[0] > f[1] and f[2] > f[1]

    def test_end_to_end_fitness_vs_oracle(self):
        """Golden test: TPU pipeline fitness ~= CPU/FFTW-path oracle fitness
        within the BASELINE.md bound (1e-3 relative spectral error)."""
        n = 512
        maxs = PARAM_MAXS["fm3_series"]
        rng = np.random.default_rng(4)
        pop = 6
        values = rng.uniform(0.1, 0.9, (pop, 6)).astype(np.float32)
        scaled = values * maxs
        target_scaled = (np.array([0.5, 0.25, 0.4, 0.19, 0.45, 0.125], np.float32) * maxs)

        oracle = OracleObjective(n)
        t_audio = oracle.synthesize(target_scaled, "fm3_series")
        t_spec = oracle.magnitude_spectrum(t_audio)
        expect = np.array(
            [
                oracle.fitness(oracle.magnitude_spectrum(oracle.synthesize(scaled[p], "fm3_series")), t_spec)
                for p in range(pop)
            ]
        )

        so = ops.make_spectrum_ops(n, method="dft")
        audio = ops.synthesize(jnp.asarray(scaled), n, "fm3_series", osc_mode="floor")
        tgt = ops.target_spectrum(jnp.asarray(t_audio), so)
        got = np.asarray(ops.evaluate_fitness(audio, tgt, so))
        # fitness values span orders of magnitude; require close agreement
        np.testing.assert_allclose(got, expect, rtol=5e-2)
        # ranking must agree exactly (it drives selection)
        assert list(np.argsort(got)) == list(np.argsort(expect))


class TestFoldedSpectrumXLA:
    """magnitude_spectrum_folded (the pure-XLA large-frame engine) against
    the unfolded f32 path — same fold identity as the Pallas kernels
    (SpectrumOps.dft_packed docs), so parity bounds are quantisation-only."""

    def _case(self, n, dtype):
        rng = np.random.default_rng(3)
        pop = 8
        audio = jnp.asarray(
            rng.uniform(-900.0, 900.0, (n, pop)).astype(np.float32)
        )
        so_ref = spectral.make_spectrum_ops(n, method="dft", dft_dtype=jnp.float32)
        so = spectral.make_spectrum_ops(n, method="dft", dft_dtype=dtype)
        ref = np.asarray(spectral.magnitude_spectrum(audio, so_ref))
        got = np.asarray(spectral.magnitude_spectrum_folded(audio, so))
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        return rel

    @pytest.mark.parametrize(
        "n",
        [512, 2048, pytest.param(8192, marks=pytest.mark.slow)],
    )
    def test_bf16_folded_parity(self, n):
        assert self._case(n, jnp.bfloat16) < 1.5e-2

    @pytest.mark.parametrize(
        "n",
        [512, 2048, pytest.param(8192, marks=pytest.mark.slow)],
    )
    def test_int8_folded_parity(self, n):
        assert self._case(n, jnp.int8) < 2.5e-2

    @pytest.mark.slow  # ~90 s: n=8192 XLA folded engine end-to-end
    def test_large_frame_engine_used_above_vmem_gate(self):
        """n=8192 int8: the fused kernel gates off on VMEM, and evaluate()
        must route to the folded XLA engine and still rank a planted truth
        candidate first."""
        from pmfm_tpu.es import ESConfig, make_spectrum_ops
        from pmfm_tpu.es.strategy import _fused_ok, evaluate
        from pmfm_tpu.ops import synthesize
        from pmfm_tpu.ops.synthesis import scale_params

        cfg = ESConfig(
            num_parents=4, num_offspring=28, num_dimensions=6,
            topology="fm3_series", audio_length_log2=13,
            synthesis_engine="scanless", spectrum_method="dft",
            dft_dtype="int8", fused_kernel=True, fused_generation=True,
        )
        so = make_spectrum_ops(cfg)
        assert not _fused_ok(cfg, so)  # VMEM gate rejects n=8192
        rng = np.random.default_rng(0)
        genes = jnp.asarray(rng.uniform(0.1, 0.9, (32, 6)).astype(np.float32))
        truth = genes[7]
        mins = jnp.asarray(cfg.param_mins)
        maxs = jnp.asarray(cfg.param_maxs)
        target_audio = synthesize(
            scale_params(truth[None], mins, maxs), cfg.n_samples,
            cfg.topology, engine="scanless",
        )[:, 0]
        tspec = spectral.target_spectrum(
            target_audio, make_spectrum_ops(cfg)
        )
        fits = np.asarray(evaluate(genes, tspec, so, cfg))
        assert fits.argmin() == 7
        assert fits[7] < 0.05 * np.partition(fits, 1)[1]


class TestSynthFoldHybrid:
    """kernels/synth_fold.py: Pallas synthesis+fold, XLA spectrum — the
    large-frame engine. Interpret mode is numerically real here (no PRNG),
    so the hybrid is testable end-to-end on CPU."""

    @pytest.mark.parametrize("dtype", [jnp.int8, jnp.bfloat16])
    def test_matches_f32_spectrum(self, dtype):
        from pmfm_tpu.kernels.synth_fold import fused_synth_fold
        from pmfm_tpu.ops import synthesize

        n, pop = 2048, 32
        rng = np.random.default_rng(5)
        maxs = np.asarray([3520, 8, 3520, 8, 3520, 8], np.float32)
        scaled = jnp.asarray(rng.uniform(0.1, 0.9, (pop, 6)).astype(np.float32) * maxs)
        so = spectral.make_spectrum_ops(n, method="dft", dft_dtype=dtype)
        ap, am, edge, ms = fused_synth_fold(
            scaled, topology="fm3_series", n=n, pop_block=32,
            interpret=True, dft_scale=so.dft_packed_scale,
        )
        got = np.asarray(spectral.magnitude_spectrum_prefolded(ap, am, edge, ms, so))
        so32 = spectral.make_spectrum_ops(n, method="dft", dft_dtype=jnp.float32)
        audio = synthesize(scaled, n, "fm3_series", engine="scanless")
        ref = np.asarray(spectral.magnitude_spectrum(audio, so32))
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < (3e-2 if dtype == jnp.int8 else 1.5e-2)

    def test_gate_and_ranking(self):
        """The strategy gate routes large frames to the hybrid and a planted
        truth candidate still ranks first at n=4096."""
        from pmfm_tpu.es import ESConfig, make_spectrum_ops
        from pmfm_tpu.es.strategy import _fused_ok, _synth_fold_ok, evaluate
        from pmfm_tpu.ops import synthesize
        from pmfm_tpu.ops.synthesis import scale_params

        cfg = ESConfig(
            num_parents=4, num_offspring=124, num_dimensions=6,
            topology="fm3_series", audio_length_log2=13,
            synthesis_engine="scanless", spectrum_method="dft",
            dft_dtype="int8", fused_kernel=True, fused_generation=True,
            pop_block=128,
        )
        so = make_spectrum_ops(cfg)
        assert not _fused_ok(cfg, so)
        assert _synth_fold_ok(cfg, so)
        rng = np.random.default_rng(1)
        genes = jnp.asarray(rng.uniform(0.1, 0.9, (128, 6)).astype(np.float32))
        truth = genes[17]
        mins = jnp.asarray(cfg.param_mins)
        maxs = jnp.asarray(cfg.param_maxs)
        target_audio = synthesize(
            scale_params(truth[None], mins, maxs), cfg.n_samples,
            cfg.topology, engine="scanless",
        )[:, 0]
        tspec = spectral.target_spectrum(target_audio, so)
        fits = np.asarray(evaluate(genes, tspec, so, cfg))
        assert fits.argmin() == 17


class TestSynthFoldLooped:
    """The fori_loop time-loop variant (synth_fitness._synth_emit_looped):
    same _make_block_synth step as the unrolled kernel, Mosaic program size
    constant in n — extends the hybrid past n=8192 where the unrolled
    body's compile time explodes. The two schedules differ by at most ONE
    final-rounding step on borderline samples (loop-carried offsets block
    the constant folding/fusion the unrolled form gets, flipping ties in
    the last rounding), so equivalence is quantisation-step-bounded, not
    bitwise."""

    @pytest.mark.parametrize(
        "topology,dims", [("fm3_series", 6), ("fm3_parallel", 12), ("fm2", 4)]
    )
    @pytest.mark.parametrize("dtype", [jnp.int8, jnp.bfloat16])
    def test_matches_unrolled_within_quantisation(self, topology, dims, dtype):
        from pmfm_tpu.kernels.synth_fold import fused_synth_fold

        n, pop = 512, 128
        rng = np.random.default_rng(7)
        maxs = np.asarray([3520, 8] * (dims // 2), np.float32)
        scaled = jnp.asarray(
            rng.uniform(0.1, 0.9, (pop, dims)).astype(np.float32) * maxs
        )
        so = spectral.make_spectrum_ops(n, method="dft", dft_dtype=dtype)
        kw = dict(topology=topology, n=n, pop_block=128, interpret=True,
                  dft_scale=so.dft_packed_scale)
        ap0, am0, e0, m0 = fused_synth_fold(scaled, **kw, looped=False)
        ap1, am1, e1, m1 = fused_synth_fold(scaled, **kw, looped=True)
        assert np.array_equal(np.asarray(m0), np.asarray(m1))  # setup-only
        for a, b in ((ap0, ap1), (am0, am1)):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            differing = (a != b).mean()
            assert differing < 0.01, f"{differing:.2%} of samples differ"
            if dtype == jnp.int8:
                assert np.abs(a - b).max() <= 1  # one quantisation step
            else:
                # one-two bf16 ulps AT THE AUDIO PEAK: fold sums can land
                # near zero, so a per-element relative bound is wrong
                atol = max(float(np.abs(a).max()), 1.0) / 128
                assert np.abs(a - b).max() <= atol

    @pytest.mark.slow  # ~25 min: n=16384 looped kernel under interpret
    def test_large_n_gate_and_ranking(self):
        """n=16384 routes to the hybrid (looped) and a planted truth
        candidate ranks first end-to-end; bf16 n=32768 falls back (the
        (N/2, PB) block pair cannot fit the VMEM budget at PB=128)."""
        from pmfm_tpu.es import ESConfig, make_spectrum_ops
        from pmfm_tpu.es.strategy import _fused_ok, _synth_fold_ok, evaluate
        from pmfm_tpu.ops import synthesize
        from pmfm_tpu.ops.synthesis import scale_params

        cfg = ESConfig(
            num_parents=4, num_offspring=60, num_dimensions=6,
            topology="fm3_series", audio_length_log2=14,
            synthesis_engine="scanless", spectrum_method="dft",
            dft_dtype="int8", fused_kernel=True, fused_generation=True,
            pop_block=128,
        )
        so = make_spectrum_ops(cfg)
        assert not _fused_ok(cfg, so)
        assert _synth_fold_ok(cfg, so)
        # n=32768 no longer materialises the folded operand (round 5:
        # DFT_MAX_MATERIALIZE_N dropped to 16384 on the crossover
        # measurement) — the hybrid hands over to the streamed+factored
        # engine there for every dtype
        from pmfm_tpu.es.strategy import _synth_stream_ok

        big_int8 = cfg.replace(
            audio_length_log2=15, num_parents=32, num_offspring=992
        )
        so_big = make_spectrum_ops(big_int8)
        assert so_big.method == "dft_factored"
        assert not _synth_fold_ok(big_int8, so_big)
        assert _synth_stream_ok(big_int8, so_big)

        rng = np.random.default_rng(2)
        genes = jnp.asarray(rng.uniform(0.1, 0.9, (64, 6)).astype(np.float32))
        truth = genes[11]
        mins = jnp.asarray(cfg.param_mins)
        maxs = jnp.asarray(cfg.param_maxs)
        target_audio = synthesize(
            scale_params(truth[None], mins, maxs), cfg.n_samples,
            cfg.topology, engine="scanless",
        )[:, 0]
        tspec = spectral.target_spectrum(target_audio, so)
        fits = np.asarray(evaluate(genes, tspec, so, cfg))
        assert fits.argmin() == 11
