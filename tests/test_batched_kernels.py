"""Row-batched DFA / Lomb–Scargle vs the scalar kernels (same pinned
semantics, independent implementations)."""

from __future__ import annotations

import numpy as np
import pytest

from mpds_ray.kernels.batched import dfa_batch, lomb_batch
from mpds_ray.kernels.dfa import fastdfa
from mpds_ray.kernels.lomb import dominant_frequency

rng = np.random.default_rng(42)


class TestDfaBatch:
    @pytest.mark.parametrize("n", [16, 68, 127, 512])
    def test_matches_scalar(self, n):
        x = rng.integers(0, 50257, (20, n)).astype(np.float64)
        got = dfa_batch(x)
        want = np.array([fastdfa(r) for r in x])
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12, equal_nan=True)

    def test_constant_rows_nan(self):
        x = np.vstack([np.ones(64), rng.normal(size=64)])
        got = dfa_batch(x)
        assert np.isnan(got[0]) and np.isfinite(got[1])

    def test_short_windows_nan(self):
        assert np.isnan(dfa_batch(rng.normal(size=(3, 3)))).all()


class TestLombBatch:
    @pytest.mark.parametrize("n", [8, 68, 128])
    def test_matches_scalar(self, n):
        x = rng.integers(0, 50257, (15, n)).astype(np.float64)
        dfc, amp = lomb_batch(x, sample_rate=50.0)
        t = np.arange(n) / 50.0
        want = np.array([dominant_frequency(t, r) for r in x])
        np.testing.assert_allclose(dfc, want[:, 0], rtol=1e-9, equal_nan=True)
        np.testing.assert_allclose(amp, want[:, 1], rtol=1e-9, equal_nan=True)

    def test_recovers_planted_frequency(self):
        n = 256
        t = np.arange(n) / 50.0
        x = np.vstack([np.sin(2 * np.pi * f * t) for f in (2.0, 7.5, 14.0)])
        dfc, _ = lomb_batch(x, sample_rate=50.0)
        np.testing.assert_allclose(dfc, [2.0, 7.5, 14.0], atol=0.1)


class TestHeavyStageIntegration:
    def test_token_stats_heavy_batched(self):
        from mpds_ray.stages.window_stats import token_stats_arrays

        lens = rng.integers(8, 128, 60)
        vals = [rng.integers(0, 50257, int(m)).astype(np.float64) for m in lens]
        flat = np.concatenate(vals)
        offs = np.r_[0, np.cumsum(lens)].astype(np.int64)
        got = token_stats_arrays(flat, offs, stats=("dfa", "dfc", "dfc_amp"), sample_rate=50.0)
        want_dfa = np.array([fastdfa(r) for r in vals])
        np.testing.assert_allclose(got["dfa"], want_dfa, rtol=1e-9, equal_nan=True)
        want_dfc = np.array(
            [dominant_frequency(np.arange(len(r)) / 50.0, r) for r in vals]
        )
        np.testing.assert_allclose(got["dfc"], want_dfc[:, 0], rtol=1e-9, equal_nan=True)
        np.testing.assert_allclose(got["dfc_amp"], want_dfc[:, 1], rtol=1e-9, equal_nan=True)
