"""T10 event-window averaging vs a direct loop port of the reference."""

from __future__ import annotations

import numpy as np
import pytest

from mpds_ray.stages.windows import (
    event_window_pre_post,
    event_window_response,
    time_weighted_average,
)

rng = np.random.default_rng(42)


def oracle_response(ids, ht, dss, treat_idx, wind):
    """Direct transliteration of dssFunctionLibrary.R:1434-1453."""
    n = len(ht)
    rows = []
    for curr in treat_idx:
        curr_ht, curr_id = ht[curr], ids[curr]
        fwd = curr
        while fwd < n - 1 and ht[fwd + 1] - curr_ht <= wind and ids[fwd + 1] == curr_id:
            fwd += 1
        if fwd > curr:
            rows.append(
                (fwd - curr + 1, dss[curr], time_weighted_average(dss[curr : fwd + 1], ht[curr : fwd + 1]))
            )
        else:
            rows.append((np.nan, np.nan, np.nan))
    return np.array(rows)


def oracle_pre_post(ids, ht, dss, treat_idx, wind):
    n = len(ht)
    rows = []
    for curr in treat_idx:
        curr_ht, curr_id = ht[curr], ids[curr]
        fwd = curr
        while fwd < n - 1 and ht[fwd + 1] - curr_ht <= wind and ids[fwd + 1] == curr_id:
            fwd += 1
        bck = curr
        while bck > 0 and curr_ht - ht[bck - 1] <= wind and ids[bck - 1] == curr_id:
            bck -= 1
        if fwd > curr and bck < curr:
            ab = time_weighted_average(dss[bck : curr + 1], ht[bck : curr + 1])
            af = time_weighted_average(dss[curr : fwd + 1], ht[curr : fwd + 1])
            rows.append((curr - bck + 1, fwd - curr, ab, af, dss[curr], dss[curr] - ab, af - dss[curr]))
        else:
            rows.append((np.nan,) * 7)
    return np.array(rows)


def make_data(n_entities=6, rows=80):
    ids, ht, dss, ev = [], [], [], []
    for e in range(n_entities):
        m = int(rng.integers(5, rows))
        ids.append(np.full(m, e))
        ht.append(np.cumsum(rng.exponential(10.0, m)))
        dss.append(rng.normal(50, 10, m))
        ev.append((rng.random(m) < 0.2).astype(np.int64))
    return map(np.concatenate, (ids, ht, dss, ev))


class TestTWA:
    def test_single_value(self):
        assert time_weighted_average([7.0], [3.0]) == 7.0

    def test_linear_ramp(self):
        # trapezoid of a linear ramp == midpoint value
        t = np.array([0.0, 1.0, 2.0])
        v = np.array([0.0, 1.0, 2.0])
        assert time_weighted_average(v, t) == pytest.approx(1.0)


@pytest.mark.parametrize("wind", [5.0, 25.0, 100.0])
class TestWindows:
    def test_response_matches_oracle(self, wind):
        ids, ht, dss, ev = make_data()
        got = event_window_response(ids, ht, dss, ev, wind)
        want = oracle_response(ids, ht, dss, np.flatnonzero(ev == 1), wind)
        np.testing.assert_allclose(got["num_after"], want[:, 0], equal_nan=True)
        np.testing.assert_allclose(got["avg_before"], want[:, 1], equal_nan=True)
        np.testing.assert_allclose(got["avg_after"], want[:, 2], equal_nan=True, atol=1e-10)

    def test_pre_post_matches_oracle(self, wind):
        ids, ht, dss, ev = make_data()
        got = event_window_pre_post(ids, ht, dss, ev, wind)
        want = oracle_pre_post(ids, ht, dss, np.flatnonzero(ev == 1), wind)
        for i, k in enumerate(
            ["num_before", "num_after", "avg_before", "avg_after", "avg_now",
             "trend_before", "trend_after"]
        ):
            np.testing.assert_allclose(got[k], want[:, i], equal_nan=True, atol=1e-10, err_msg=k)
