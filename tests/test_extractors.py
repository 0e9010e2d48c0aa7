"""Per-session extractor parity tests (FIXTURES.md F3 fixtures).

Widths are pinned by the reference: accel 153 (18x7 + 9x3), tap 151
(1 + 2x15+3 + 2x18+3 + 2x2x18 hmm -> validated below against the notebook's
151-wide tap slice), react 15, audio 17.
"""

from __future__ import annotations

import numpy as np
import pytest

from mpds_ray.functions import (
    extract_accel_features,
    extract_audio_features,
    extract_react_features,
    extract_tap_features,
)
from mpds_ray.functions.extractors import audio_voice_segments, react_lags, tap_sessionize

rng = np.random.default_rng(7)


def make_accel_session(n=1500):
    t = np.cumsum(rng.uniform(0.015, 0.025, n))  # ~50 Hz with jitter
    x = 9.7 + 0.3 * np.sin(2 * np.pi * 2.0 * t) + 0.05 * rng.normal(size=n)
    # +0.5 DC bias makes the abs-mean axis ordering deterministic (x > y > z)
    y = 0.5 + 0.8 * np.sin(2 * np.pi * 1.2 * t) + 0.05 * rng.normal(size=n)
    z = 0.2 * rng.normal(size=n)
    return np.column_stack([t, x, y, z])


_ACCEL_DATA = make_accel_session()
_ACCEL_H, _ACCEL_F = extract_accel_features(_ACCEL_DATA)


def make_tap_session(n=400):
    t = np.cumsum(rng.uniform(0.1, 0.4, n))
    # alternate across the screen midline with dwell
    side = (np.arange(n) // 2) % 2
    x = np.where(side == 0, 100 + 20 * rng.random(n), 800 + 20 * rng.random(n))
    y = 500 + 30 * rng.normal(size=n)
    return np.column_stack([t, x, y])


def make_react_session(n=300):
    t = np.cumsum(rng.uniform(0.01, 0.05, n))
    visible = (np.arange(n) // 10) % 2
    pressed = np.roll(visible, 3)  # lagged by 3 samples
    pressed[:3] = visible[:3]
    return np.column_stack([t, np.zeros(n), np.zeros(n), visible, pressed])


class TestAccel:
    def test_width_and_headers(self):
        h, f = _ACCEL_H, _ACCEL_F
        assert len(h) == len(f) == 18 * 7 + 9 * 3 == 153
        assert h[0] == "x_mean" and h[17] == "x_dfa"
        assert h[126] == "x_y_xcorr" and h[-1] == "e_r_xEn"

    def test_gravity_axis_ordering(self):
        h, f = _ACCEL_H, _ACCEL_F
        # gravity axis de-meaned: x_mean ~ 0 even though raw x has bias 9.7
        assert abs(f[h.index("x_mean")]) < 1e-9
        # magnitude channel mean ~ gravity magnitude
        assert f[h.index("acc_mean")] == pytest.approx(9.7, abs=0.3)

    def test_dfc_recovers_walk_frequency(self):
        h, f = _ACCEL_H, _ACCEL_F
        # the walking-direction channel (y by abs-mean order) oscillates at 1.2 Hz
        assert f[h.index("y_dfc")] == pytest.approx(1.2, abs=0.1)

    def test_deterministic(self):
        # compare two calls made in the SAME execution context: the
        # module-level _ACCEL_F is computed at import, BEFORE ray.init
        # forces OMP_NUM_THREADS=1, and OpenBLAS results can differ in the
        # last bits across a thread-count change — the kernel's actual
        # claim is no RNG/state, i.e. repeat-call bitwise equality
        _, f1 = extract_accel_features(_ACCEL_DATA)
        _, f2 = extract_accel_features(_ACCEL_DATA)
        np.testing.assert_array_equal(f1, f2)


class TestTap:
    def test_width_151(self):
        h, f = extract_tap_features(make_tap_session())
        # 1 + (2*15+3) + (2*18+3) + 2*(2*18) + 2*3 = 151 (notebook cell 14 slice)
        assert len(h) == len(f) == 151

    def test_sessionize_alternating(self):
        t = np.array([0.0, 1.0, 2.0, 3.0, 4.0, 5.0])
        x = np.array([0.0, 0.0, 10.0, 10.0, 0.0, 0.0])
        stay, move = tap_sessionize(t, x)
        # sign changes at i=2 (stay=1-0, move=2-1) and i=4 (stay=3-2, move=4-3)
        np.testing.assert_allclose(stay, [1.0, 1.0])
        np.testing.assert_allclose(move, [1.0, 1.0])

    def test_ntaps_counts_sign_changes(self):
        h, f = extract_tap_features(make_tap_session(400))
        # sides flip every 2 samples -> ~200 transitions
        assert f[h.index("ntaps")] == pytest.approx(199, abs=2)


class TestReact:
    def test_lag_scan_manual(self):
        t = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
        vis = np.array([0, 1, 1, 1, 0])
        prs = np.array([0, 0, 0, 1, 0])
        # mismatch at t=1, resolves at t=3 -> lag 2
        np.testing.assert_allclose(react_lags(t, vis, prs), [2.0])

    def test_width_15(self):
        h, f = extract_react_features(make_react_session())
        assert len(h) == len(f) == 15
        assert h[0] == "touch_sum"
        assert np.isfinite(f).sum() >= 12  # dfa may be nan on short lag series


class TestAudio:
    def test_voice_segments_manual(self):
        amp = np.array([0.0, 0.0, 1.0, 1.0, 1.0, 0.0, 1.0, 0.0])
        segs = audio_voice_segments(amp)
        assert [(s["start"], s["end"]) for s in segs] == [(3, 6), (7, 8)]

    def test_features_on_synthetic_voice(self):
        fs = 8000.0
        n = int(fs * 12)
        x = 0.001 * rng.normal(size=n)
        lo, hi = int(fs * 3), int(fs * 9)
        t = np.arange(hi - lo) / fs
        x[lo:hi] += 0.5 * np.sin(2 * np.pi * 330.0 * t)
        h, f = extract_audio_features(x, fs)
        assert len(h) == len(f) == 17
        assert f[h.index("length")] == pytest.approx(6.0, abs=1.0)
        assert f[h.index("pitch")] == pytest.approx(330.0, rel=0.05)
        assert f[h.index("amp_mean")] == pytest.approx(0.5, abs=0.1)
