"""session_spectral_features: the driver-gated query that makes the
W9/W10/W11 kernel block (DFA / Lomb-Scargle / Welch pitch) regression-
visible (VERDICT r4 'Next round' #7).

Two layers:
- the NAIVE oracle implementations in oracle/independent.py must agree with
  the engine kernels on arbitrary signals (they are scalar-loop / explicit-
  DFT reimplementations, so agreement is a genuine cross-check);
- the distributed query must agree with the single-process golden builder
  row-for-row at sf0.001 (the sf0.01 comparison is the committed golden the
  driver hashes).
"""

import numpy as np
import pandas as pd
import pytest

from mpds_ray.kernels.dfa import fastdfa
from mpds_ray.kernels.lomb import dominant_frequency
from mpds_ray.kernels.welch import get_pitch
from mpds_ray.oracle.independent import (
    _naive_dfa_alpha,
    _naive_lomb_dfc,
    _naive_pitch,
    golden_session_spectral_features,
)

SF_DIR = "/root/testdata/sf0.001"


class TestNaiveVsEngineKernels:
    @pytest.mark.parametrize("n", [17, 64, 200])
    def test_dfa(self, n):
        rng = np.random.default_rng(n)
        x = rng.normal(size=n).cumsum()  # correlated -> alpha well-defined
        assert _naive_dfa_alpha(x) == pytest.approx(fastdfa(x), abs=1e-8)

    @pytest.mark.parametrize("n", [16, 120])
    def test_lomb_dfc(self, n):
        rng = np.random.default_rng(n)
        t = np.sort(rng.uniform(0, 1, n))
        t[0], t[-1] = 0.0, 1.0
        x = np.sin(2 * np.pi * 7.0 * t) + 0.1 * rng.normal(size=n)
        nf, na = _naive_lomb_dfc(t, x)
        ef, ea = dominant_frequency(t, x)
        assert nf == ef  # grid points must match exactly
        assert na == pytest.approx(ea, rel=1e-9)
        assert ef == pytest.approx(7.0, abs=0.26)  # recovers the planted tone

    @pytest.mark.parametrize("n", [40, 300])
    def test_pitch(self, n):
        rng = np.random.default_rng(n)
        x = np.sin(2 * np.pi * 0.2 * np.arange(n)) + 0.05 * rng.normal(size=n)
        naive = _naive_pitch(x, fs=1.0, nfft=256)
        eng = get_pitch(x, fs=1.0, nfft=256)
        assert naive == eng  # same grid bin -> identical value
        assert eng == pytest.approx(0.2, abs=0.01)


class TestQueryVsGolden:
    def test_matches_independent_golden_sf0001(self, ray_session):
        from mpds_ray.pipelines.eventspipe import session_spectral_features

        res = session_spectral_features(SF_DIR)
        if not isinstance(res, pd.DataFrame):
            res = res.to_pandas()
        got = res.sort_values("user_id").reset_index(drop=True)
        want = (
            golden_session_spectral_features(SF_DIR)
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[want.columns], want, check_exact=True, check_dtype=False
        )

    def test_features_are_discriminative(self):
        # a constant output column would gate nothing; pin the spread
        g = golden_session_spectral_features(SF_DIR)
        assert g["dfa_alpha"].nunique() > len(g) // 2
        assert g["dfc"].nunique() > 3
        assert g["pitch"].nunique() > 3
