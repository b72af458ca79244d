"""Scanless (prefix-sum) synthesis engine vs float64 oracle and scan engine."""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pmfm_tpu import ops
from pmfm_tpu.ops.scanless import exclusive_cumsum_mod, synthesize_scanless

WTS = ops.DEFAULT_WAVETABLE_SIZE
SR = ops.DEFAULT_SAMPLE_RATE


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)


class TestCumsum:
    @pytest.mark.parametrize("n,block", [(512, 128), (1024, 128), (300, 128), (128, 128)])
    def test_matches_numpy(self, n, block):
        rng = np.random.default_rng(0)
        x = rng.uniform(-3e4, 3e4, (n, 16)).astype(np.float32)
        got = np.asarray(exclusive_cumsum_mod(jnp.asarray(x), 32768.0, block))
        want = np.mod(np.cumsum(x.astype(np.float64), axis=0) - x, 32768.0)
        # compare as phases (mod wrap can land on either side of 0)
        d = np.abs(got - want)
        d = np.minimum(d, 32768.0 - d)
        # f32 accumulation at ~block*m magnitudes: ~1 wavetable unit = 2e-4 rad
        assert d.max() < 2.0

    def test_first_row_zero(self):
        x = jnp.ones((256, 4)) * 1000.0
        out = np.asarray(exclusive_cumsum_mod(x, 32768.0))
        np.testing.assert_allclose(out[0], 0.0)


def _oracle_scanless(params, n, topology):
    """float64 NumPy twin of the scanless math (period-WTS oscillator)."""
    p = np.asarray(params, np.float64)
    w2sr = WTS / SR
    omega = 2 * math.pi / WTS
    t = np.arange(n)

    def osc(pos):
        return np.sin(omega * np.mod(pos, WTS))

    def two_op(modf, modi, cf, amp):
        cur = osc(t * w2sr * modf) * (modf * modi) + cf
        pos2 = w2sr * (np.cumsum(cur) - cur)
        return osc(pos2) * amp

    if topology == "fm2":
        return two_op(*p).astype(np.float32)
    if topology == "fm3_series":
        cur1 = osc(t * w2sr * p[1]) * (p[0] * p[1]) + p[3]
        pos2 = w2sr * (np.cumsum(cur1) - cur1)
        cur2 = osc(pos2) * (p[2] * p[3]) + p[5]
        pos3 = w2sr * (np.cumsum(cur2) - cur2)
        return (osc(pos3) * (p[4] * p[5])).astype(np.float32)
    if topology == "fm3_parallel":
        outs = [two_op(*p[4 * j : 4 * j + 4]) for j in range(3)]
        return ((outs[0] + outs[1] + outs[2]) / 3.0).astype(np.float32)
    raise ValueError(topology)


PARAMS = {
    "fm2": np.array([880.0, 2.0, 2500.0, 0.9], np.float32),
    "fm3_series": np.array([3078.0, 2.0, 3015.0, 1.5, 3141.0, 1.0], np.float32),
    "fm3_parallel": np.array([880.0, 2.0, 2500.0, 0.9, 440.0, 1.0, 1200.0, 0.5, 660.0, 3.0, 800.0, 0.7], np.float32),
}


@pytest.mark.parametrize("topology", list(PARAMS))
class TestScanlessEngine:
    def test_matches_float64_oracle(self, topology):
        n = 1024
        p = PARAMS[topology]
        got = np.asarray(synthesize_scanless(jnp.asarray(p)[None], n, topology))[:, 0]
        want = _oracle_scanless(p, n, topology)
        assert rel_err(got, want) < 2e-3

    def test_spectrum_close_to_scan_engine(self, topology):
        """Same FM tone up to the WTS/(WTS-1) period rescale: magnitude
        spectra must agree closely (this is what fitness sees)."""
        n = 1024
        p = jnp.asarray(PARAMS[topology])[None]
        a_scan = ops.synthesize(p, n, topology, osc_mode="exact", engine="scan")
        a_fast = ops.synthesize(p, n, topology, engine="scanless")
        so = ops.make_spectrum_ops(n, method="dft")
        s_scan = np.asarray(ops.magnitude_spectrum(a_scan, so))[0]
        s_fast = np.asarray(ops.magnitude_spectrum(a_fast, so))[0]
        assert rel_err(s_fast, s_scan) < 5e-2
        assert np.argmax(s_fast) == np.argmax(s_scan)

    def test_batch_shapes(self, topology):
        p = jnp.tile(jnp.asarray(PARAMS[topology])[None], (5, 1))
        out = synthesize_scanless(p, 256, topology)
        assert out.shape == (256, 5)


@pytest.mark.parametrize("topology", list(PARAMS))
class TestEngineRankAgreement:
    """The ES only consumes fitness ORDER, so the engines are interchangeable
    iff they rank candidates identically. Tighter than the 5e-2 spectral bound
    (which absorbs the wavetable period rescale): for a spread-out population
    the scan (reference-semantics) and scanless (prefix-sum) engines must
    produce the same fitness ranking, including for fm3_parallel."""

    def test_rankings_match(self, topology):
        n = 512
        pop = 16
        d = PARAMS[topology].size
        rng = np.random.default_rng(42)
        maxs = np.asarray(PARAM_MAXS_RANK[topology], np.float32)
        scaled = (rng.uniform(0.1, 0.9, (pop, d)).astype(np.float32)) * maxs
        so = ops.make_spectrum_ops(n, method="dft")
        tgt_audio = ops.synthesize(
            jnp.asarray(scaled[:1]), n, topology, engine="scanless"
        )
        tgt = ops.magnitude_spectrum(tgt_audio, so)[0]
        fits = {}
        for engine in ("scan", "scanless"):
            audio = ops.synthesize(
                jnp.asarray(scaled), n, topology, engine=engine,
                osc_mode="exact" if engine == "scan" else "floor",
            )
            fits[engine] = np.asarray(ops.evaluate_fitness(audio, tgt, so))
        # the planted target candidate must win under both engines, and the
        # full ranking must agree for a well-separated random population
        assert np.argmin(fits["scan"]) == 0
        assert np.argmin(fits["scanless"]) == 0
        assert list(np.argsort(fits["scan"])) == list(np.argsort(fits["scanless"]))


PARAM_MAXS_RANK = {
    "fm2": [3520.0, 8.0, 3520.0, 1.0],
    "fm3_series": [3520.0, 8.0, 3520.0, 8.0, 3520.0, 8.0],
    "fm3_parallel": [3520.0, 8.0, 3520.0, 1.0] * 3,
}


class TestScanlessInPipeline:
    def test_match_audio_scanless(self):
        from pmfm_tpu.es import ESConfig, match_audio
        from pmfm_tpu.ops import synthesize_single

        cfg = ESConfig(
            num_parents=16, num_offspring=48, num_dimensions=4, topology="fm2",
            param_mins=(0.0,) * 4, param_maxs=(3520.0, 8.0, 3520.0, 1.0),
            audio_length_log2=9, synthesis_engine="scanless",
        )
        maxs = np.asarray(cfg.param_maxs, np.float32)
        true_norm = np.asarray([0.25, 0.25, 0.5, 0.9], np.float32)
        tgt = np.asarray(
            synthesize_single(jnp.asarray(true_norm * maxs), cfg.n_samples,
                              cfg.topology, engine="scanless")
        )
        res = match_audio(tgt, cfg, key=11, num_generations=30, record_trajectory=True)
        c = res.chunks[0]
        assert np.all(np.diff(c.trajectory) <= 1e-6)
        assert c.trajectory[-1] < 0.5 * c.trajectory[0]
