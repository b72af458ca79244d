"""kernels/synth_stream.py: streamed Pallas synthesis + window feeding the
four-step factored DFT — the huge-frame engine (n > 32768). Interpret mode
is numerically real (no PRNG), and the factored method can be forced at
small n, so the hybrid is testable end-to-end on CPU. n >= 2048 cases
exercise the phase-carry scratch across time-chunk grid steps (TC = 1024
samples per chunk)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmfm_tpu.ops import spectral


def _spectra(scaled, topology, n, so, *, audio_f32, pop_block=128):
    from pmfm_tpu.kernels.synth_stream import fused_synth_stream

    aw = fused_synth_stream(
        scaled, so.window, topology=topology, n=n, pop_block=pop_block,
        interpret=True, audio_f32=audio_f32,
    )
    return np.asarray(
        spectral.magnitude_spectrum_factored(aw, so, prewindowed=True)
    )


def _ref_spectra(scaled, topology, n, so):
    from pmfm_tpu.ops import synthesize

    audio = synthesize(scaled, n, topology, engine="scanless")
    return np.asarray(spectral.magnitude_spectrum_factored(audio, so))


class TestStreamParity:
    @pytest.mark.parametrize(
        "topology,dims,median_tol",
        [("fm2", 4, 2e-4), ("fm3_parallel", 12, 2e-4), ("fm3_series", 6, 2e-3)],
    )
    def test_f32_stream_matches_xla(self, topology, dims, median_tol):
        """f32 emission + HIGHEST factored matmuls vs the XLA scanless +
        factored path: at the order-9 polynomial-sine floor for the shallow
        topologies; series chains sit higher (phase-recurrence sensitivity,
        the same spread the fused in-VMEM engines show — PARITY.md)."""
        from pmfm_tpu.models import get_topology

        n = 2048  # 2 time chunks: the offs scratch carry is live
        topo = get_topology(topology)
        rng = np.random.default_rng(7)
        maxs = np.asarray(topo.default_param_maxs, np.float32)
        scaled = jnp.asarray(
            rng.uniform(0.1, 0.9, (256, dims)).astype(np.float32) * maxs
        )
        so = spectral.make_spectrum_ops(
            n, method="dft_factored", dft_dtype=jnp.float32
        )
        got = _spectra(scaled, topology, n, so, audio_f32=True)
        ref = _ref_spectra(scaled, topology, n, so)
        rel = np.linalg.norm(got - ref, axis=1) / (
            np.linalg.norm(ref, axis=1) + 1e-30
        )
        assert np.median(rel) < median_tol
        assert np.mean(rel) < 10 * median_tol

    def test_bf16_stream_close(self):
        """bf16 emission (the int8/bf16 configs' huge-frame mode) stays
        within the bf16 audio-quantisation envelope of the f32 path."""
        n = 2048
        rng = np.random.default_rng(3)
        maxs = np.asarray([3520, 8, 3520, 8, 3520, 8], np.float32)
        scaled = jnp.asarray(
            rng.uniform(0.1, 0.9, (128, 6)).astype(np.float32) * maxs
        )
        so = spectral.make_spectrum_ops(
            n, method="dft_factored", dft_dtype=jnp.bfloat16
        )
        # interpret mode emits f32 (Mosaic-only bf16 stores); round to bf16
        # host-side to measure the real engine's quantisation
        from pmfm_tpu.kernels.synth_stream import fused_synth_stream

        aw = fused_synth_stream(
            scaled, so.window, topology="fm3_series", n=n, pop_block=128,
            interpret=True, audio_f32=False,
        ).astype(jnp.bfloat16)
        got = np.asarray(
            spectral.magnitude_spectrum_factored(aw, so, prewindowed=True)
        )
        so32 = spectral.make_spectrum_ops(
            n, method="dft_factored", dft_dtype=jnp.float32
        )
        ref = _ref_spectra(scaled, "fm3_series", n, so32)
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 1.5e-2

    @pytest.mark.parametrize("topology,dims", [("fm3_series", 6),
                                               ("fm3_parallel", 12)])
    def test_chunk_carry_correct(self, topology, dims):
        """One whole-frame chunk vs four 1024-sample chunks on MILD
        (non-chaotic) candidates: the scratch phase carry must agree to
        ULP-class tolerance — a carry bug (wrong/missing offsets at a
        chunk boundary) would be an O(1) phase jump. Exact bit-identity
        across chunkings is NOT expected: the compiler's FMA contraction
        differs with program shape (stream_chunk docstring)."""
        from pmfm_tpu.kernels.synth_stream import fused_synth_stream
        from pmfm_tpu.models import get_topology

        n = 4096
        topo = get_topology(topology)
        rng = np.random.default_rng(11)
        # mild modulation: gains in [0, 0.5], so ULP noise cannot amplify
        maxs = np.asarray(topo.default_param_maxs, np.float32).copy()
        maxs[1::2] = 0.5
        scaled = jnp.asarray(
            rng.uniform(0.1, 0.9, (128, dims)).astype(np.float32) * maxs
        )
        so = spectral.make_spectrum_ops(
            n, method="dft_factored", dft_dtype=jnp.float32
        )
        kw = dict(topology=topology, n=n, pop_block=128, interpret=True,
                  audio_f32=True)
        chunked = np.asarray(
            fused_synth_stream(scaled, so.window, **kw, time_chunk=1024)
        )
        whole = np.asarray(
            fused_synth_stream(scaled, so.window, **kw, time_chunk=n)
        )
        # measured: ~1e-5 of full scale (ULP drift, linear in n); a real
        # carry bug is an O(1) phase jump = O(scale) audio error
        scale = np.abs(whole).max()
        assert np.abs(chunked - whole).max() <= 5e-5 * scale

    def test_vmap_structurally_correct(self):
        """jax.vmap of the streamed kernel (the pallas batching rule adds
        a leading grid axis) must agree with sequential calls on mild
        candidates — full-range deep chains amplify the batched-dot
        reassociation ULPs, same as chunking (stream_chunk docstring).
        The staged solver vmaps this kernel in its alias-polish batches."""
        from pmfm_tpu.kernels.synth_stream import fused_synth_stream

        n = 2048
        rng = np.random.default_rng(1)
        maxs = np.asarray([3520, 0.5, 3520, 0.5, 3520, 8], np.float32)
        batch = jnp.asarray(
            rng.uniform(0.1, 0.9, (2, 64, 6)).astype(np.float32) * maxs
        )
        so = spectral.make_spectrum_ops(
            n, method="dft_factored", dft_dtype=jnp.float32
        )
        f = lambda p: fused_synth_stream(  # noqa: E731
            p, so.window, topology="fm3_series", n=n, pop_block=64,
            interpret=True, audio_f32=True,
        )
        seq = jnp.stack([f(batch[0]), f(batch[1])])
        vm = jax.vmap(f)(batch)
        scale = float(jnp.abs(seq).max())
        assert float(jnp.abs(seq - vm).max()) <= 1e-4 * scale


class TestStreamGate:
    def _cfg(self, **kw):
        from pmfm_tpu.es import ESConfig

        base = dict(
            num_parents=4, num_offspring=124, num_dimensions=6,
            topology="fm3_series", audio_length_log2=11,
            synthesis_engine="scanless", spectrum_method="dft_factored",
            dft_dtype="float32", fused_kernel=True, fused_generation=True,
            pop_block=128,
        )
        base.update(kw)
        return ESConfig(**base)

    def test_gate_and_ranking(self):
        """The strategy routes factored-spectrum configs to the streamed
        hybrid and a planted truth candidate still ranks first."""
        from pmfm_tpu.es import make_spectrum_ops
        from pmfm_tpu.es.strategy import (
            _fused_ok, _synth_fold_ok, _synth_stream_ok, active_engine,
            evaluate,
        )
        from pmfm_tpu.ops import synthesize
        from pmfm_tpu.ops.synthesis import scale_params

        cfg = self._cfg()
        so = make_spectrum_ops(cfg)
        assert so.method == "dft_factored"
        assert not _fused_ok(cfg, so)
        assert not _synth_fold_ok(cfg, so)
        assert _synth_stream_ok(cfg, so)
        assert active_engine(cfg, so) == "synth_stream"
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

    def test_gate_requires_fused_flags_and_single_frame(self):
        from pmfm_tpu.es import make_spectrum_ops
        from pmfm_tpu.es.strategy import _synth_stream_ok

        off = self._cfg(fused_kernel=False, fused_generation=False)
        assert not _synth_stream_ok(off, make_spectrum_ops(off))
        multi = self._cfg(num_frames=2)
        assert not _synth_stream_ok(multi, make_spectrum_ops(multi))

    def test_auto_method_huge_n_routes_to_stream(self):
        """The headline case: spectrum_method 'dft' at n = 2^16 resolves to
        dft_factored (materialisation limit) and the engine label is the
        streamed hybrid — was xla_dft_factored through round 4."""
        from pmfm_tpu.es import ESConfig, make_spectrum_ops
        from pmfm_tpu.es.strategy import active_engine

        cfg = ESConfig(
            num_parents=64, num_offspring=8128, audio_length_log2=16,
            synthesis_engine="scanless", spectrum_method="dft",
            dft_dtype="int8", fused_kernel=True, fused_generation=True,
            pop_block=1024,
        )
        so = make_spectrum_ops(cfg)
        assert so.method == "dft_factored"
        assert active_engine(cfg, so) == "synth_stream"
