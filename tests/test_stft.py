"""Multi-frame STFT fitness + batched multi-target matching."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pmfm_tpu import ops
from pmfm_tpu.es import ESConfig, match_audio_stft, match_many
from pmfm_tpu.ops.spectral import (
    magnitude_spectrum_frames,
    stft_fitness,
    target_spectrum_frames,
)

CFG = ESConfig(
    num_parents=8,
    num_offspring=24,
    num_dimensions=4,
    topology="fm2",
    param_mins=(0.0,) * 4,
    param_maxs=(3520.0, 8.0, 3520.0, 1.0),
    audio_length_log2=8,
)


class TestFrameOps:
    def test_frames_equal_chunked_single(self):
        """Framewise spectra must equal per-chunk spectra."""
        n = 256
        rng = np.random.default_rng(0)
        audio = rng.standard_normal((3 * n, 4)).astype(np.float32)
        so = ops.make_spectrum_ops(n, method="dft")
        framed = np.asarray(magnitude_spectrum_frames(jnp.asarray(audio), so))
        for f in range(3):
            single = np.asarray(
                ops.magnitude_spectrum(jnp.asarray(audio[f * n : (f + 1) * n]), so)
            )
            np.testing.assert_allclose(framed[f], single, rtol=1e-5, atol=1e-6)

    def test_stft_fitness_sums_frames(self):
        n = 256
        rng = np.random.default_rng(1)
        audio = rng.standard_normal((2 * n, 3)).astype(np.float32)
        tgt_audio = rng.standard_normal(2 * n).astype(np.float32)
        so = ops.make_spectrum_ops(n, method="dft")
        tgt = target_spectrum_frames(jnp.asarray(tgt_audio), so)
        assert tgt.shape == (2, so.num_bins)
        total = np.asarray(stft_fitness(jnp.asarray(audio), tgt, so))
        per_frame = sum(
            np.asarray(
                ops.evaluate_fitness(
                    jnp.asarray(audio[f * n : (f + 1) * n]),
                    tgt[f],
                    so,
                )
            )
            for f in range(2)
        )
        np.testing.assert_allclose(total, per_frame, rtol=1e-5)

    def test_rfft_and_dft_frames_agree(self):
        n = 256
        rng = np.random.default_rng(2)
        audio = rng.standard_normal((2 * n, 3)).astype(np.float32)
        s1 = magnitude_spectrum_frames(jnp.asarray(audio), ops.make_spectrum_ops(n, method="dft"))
        s2 = magnitude_spectrum_frames(jnp.asarray(audio), ops.make_spectrum_ops(n, method="rfft"))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-4)


class TestSTFTMatcher:
    def _target(self, frames=2):
        maxs = np.asarray(CFG.param_maxs, np.float32)
        true_norm = np.asarray([0.25, 0.25, 0.5, 0.9], np.float32)
        return np.asarray(
            ops.synthesize_single(
                jnp.asarray(true_norm * maxs), CFG.n_samples * frames, CFG.topology
            )
        )

    def test_match_audio_stft(self):
        tgt = self._target(2)
        res = match_audio_stft(tgt, CFG, key=3, num_generations=12, record_trajectory=True)
        assert len(res.chunks) == 1
        c = res.chunks[0]
        assert res.config.num_frames == 2
        assert res.output_audio.shape == (2 * CFG.n_samples,)
        assert np.all(np.diff(c.trajectory) <= 1e-6)
        assert c.trajectory[-1] < c.trajectory[0]

    def test_match_many(self):
        rng = np.random.default_rng(4)
        maxs = np.asarray(CFG.param_maxs, np.float32)
        targets = np.stack(
            [
                np.asarray(
                    ops.synthesize_single(
                        jnp.asarray(rng.uniform(0.2, 0.8, 4).astype(np.float32) * maxs),
                        CFG.n_samples,
                        CFG.topology,
                    )
                )
                for _ in range(3)
            ]
        )
        results = match_many(targets, CFG, key=5, num_generations=8)
        assert len(results) == 3
        fits = [r.chunks[0].best_fitness for r in results]
        assert all(np.isfinite(f) for f in fits)
        # independent targets -> independent (different) outcomes
        assert len({round(f, 6) for f in fits}) == 3

    def test_too_short_raises(self):
        with pytest.raises(ValueError):
            match_audio_stft(np.zeros(10, np.float32), CFG)
        with pytest.raises(ValueError):
            match_many(np.zeros((2, 10), np.float32), CFG)
