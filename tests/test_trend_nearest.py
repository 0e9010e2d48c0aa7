"""Independent loop oracles for the two round-3 additions:

- ``user_value_trend`` (per-user OLS over time) vs per-user ``np.polyfit``
- ``nearest_purchase_for_views`` (bidirectional as-of) vs a brute-force
  all-pairs argmin per view

Both run the real distributed query on the sf0.001 testdata and compare to
a row-loop reference computed straight off the parquet — a different oracle
family from the driver's DuckDB SQL gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def raw_events() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type", "value"])
    ev["ts"] = ev["ts"].astype("int64") / 1e6  # epoch seconds, as the engine does
    return ev


def test_user_value_trend_matches_polyfit(ray_session, raw_events):
    from mpds_ray.pipelines.eventspipe import TREND_ORIGIN_S, user_value_trend

    got = user_value_trend(SF_DIR).sort_values("user_id").reset_index(drop=True)

    rows = []
    for uid, g in raw_events.groupby("user_id"):
        x = (g["ts"].to_numpy() - TREND_ORIGIN_S) / 86400.0
        y = g["value"].to_numpy(dtype=np.float64)
        if len(g) < 2 or np.all(x == x[0]):
            continue
        slope, intercept = np.polyfit(x, y, 1)
        rows.append((uid, slope, intercept, len(g)))
    want = pd.DataFrame(rows, columns=["user_id", "slope", "intercept", "n_events"])
    want = want.sort_values("user_id").reset_index(drop=True)

    assert list(got["user_id"]) == list(want["user_id"])
    np.testing.assert_allclose(got["slope"], want["slope"], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(got["intercept"], want["intercept"], rtol=1e-6, atol=1e-6)
    assert list(got["n_events"]) == list(want["n_events"])


def test_nearest_purchase_matches_bruteforce(ray_session, raw_events):
    from mpds_ray.pipelines.eventspipe import nearest_purchase_for_views

    got = (
        nearest_purchase_for_views(SF_DIR)
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    views = raw_events[raw_events["event_type"] == "view"]
    purch = raw_events[raw_events["event_type"] == "purchase"]
    rows = []
    for _, v in views.iterrows():
        cand = purch[purch["user_id"] == v["user_id"]]
        if cand.empty:
            continue
        gaps = (cand["ts"] - v["ts"]).abs().to_numpy()
        i = int(np.argmin(gaps))
        rows.append((v["event_id"], cand["ts"].iloc[i], gaps[i], cand["value"].iloc[i]))
    want = pd.DataFrame(
        rows, columns=["event_id", "nearest_purchase_ts", "nearest_gap", "purchase_value"]
    ).sort_values("event_id").reset_index(drop=True)

    assert list(got["event_id"]) == list(want["event_id"])
    np.testing.assert_allclose(got["nearest_purchase_ts"], want["nearest_purchase_ts"], atol=1e-5)
    np.testing.assert_allclose(got["nearest_gap"], want["nearest_gap"], atol=1e-5)
    np.testing.assert_allclose(got["purchase_value"], want["purchase_value"], atol=1e-5)


def test_trend_drops_degenerate_users(ray_session):
    """A user with a single event (or zero time spread) must be absent."""
    from mpds_ray.pipelines.eventspipe import user_value_trend

    got = user_value_trend(SF_DIR)
    counts = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id"])
    singletons = counts.groupby("user_id").size()
    single_ids = set(singletons[singletons < 2].index)
    assert not (set(got["user_id"]) & single_ids)
    assert (got["n_events"] >= 2).all()
