"""Encoder/condition blocks (M12/M13/M14, T11) vs hand-computed values."""

from __future__ import annotations

import numpy as np
import pytest

from mpds_ray.stages.encoders import (
    decimal_to_bin_matrix,
    highest_status,
    logical_to_zero_one,
    safe_status_grading,
    sirs_instantaneous_conditions,
)


class TestBinMatrix:
    def test_bits_lsb_is_classbit1(self):
        out = decimal_to_bin_matrix(np.array([0, 1, 2, 3, 4, 5, 6, 7]), 8)
        np.testing.assert_array_equal(out["ClassBit1"], [0, 1, 0, 1, 0, 1, 0, 1])
        np.testing.assert_array_equal(out["ClassBit3"], [0, 0, 0, 0, 1, 1, 1, 1])

    def test_nonconcordant_classes_raise(self):
        with pytest.raises(ValueError, match="not concordant"):
            decimal_to_bin_matrix(np.array([0, 2]), 2)


class TestStatus:
    def test_logical_to_zero_one_preserves_nan(self):
        out = logical_to_zero_one(np.array([1.0, 0.0, np.nan, 5.0]))
        np.testing.assert_allclose(out, [1.0, 0.0, np.nan, 1.0])

    def test_highest_status_priority(self):
        out = highest_status(
            sirs=np.array([1, 1, 0, 0]),
            severe=np.array([0, 1, 1, 0]),
            shock=np.array([0, 0, 1, 0]),
        )
        np.testing.assert_array_equal(out, [1, 2, 3, 0])


class TestSIRS:
    def test_two_of_four_rule(self):
        # row 0: temp + hr hold -> raw 1; row 1: only hr -> 0;
        # row 2: rr|paco2 + wbc -> 1; row 3: all NaN -> 0
        out = sirs_instantaneous_conditions(
            temperature=[101.0, 98.0, 98.0, np.nan],
            hr=[95.0, 95.0, 80.0, np.nan],
            resp_rate=[15.0, 15.0, 25.0, np.nan],
            paco2=[40.0, 40.0, np.nan, np.nan],
            wbc=[8.0, 8.0, 2.0, np.nan],
        )
        np.testing.assert_array_equal(out["sirs_raw"], [1, 0, 1, 0])
        # NA|TRUE == TRUE: row 2 rr_or_paco2 = 1 despite NaN paco2
        assert out["resp_rate_or_paco2"][2] == 1.0
        # none_holds: row 1 has hr holding -> False
        assert out["none_holds"][1] == 0.0

    def test_none_holds_requires_observed_false(self):
        out = sirs_instantaneous_conditions(
            temperature=[98.0], hr=[80.0], resp_rate=[15.0], paco2=[np.nan], wbc=[np.nan]
        )
        assert out["none_holds"][0] == 1.0


class TestSafeStatus:
    def test_isolated_status_is_safe(self):
        ids = np.zeros(5)
        ht = np.array([0.0, 10.0, 20.0, 30.0, 40.0])
        status = np.array(["a", "a", "b", "a", "a"])
        safe = safe_status_grading(ids, ht, status, "a", time_th=5.0)
        # rows 0,1: next 'b' at 20 -> distances 20,10 > 5 -> safe
        # rows 3,4: since last 'b' 10,20 > 5 -> safe
        np.testing.assert_array_equal(safe, [True, True, False, True, True])
        tight = safe_status_grading(ids, ht, status, "a", time_th=15.0)
        np.testing.assert_array_equal(tight, [True, False, False, False, True])
