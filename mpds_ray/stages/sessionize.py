"""Sessionization operators.

Gap-threshold sessionize generalizes the reference's segmentation scans
(voice segments extractAudioTestV1.m:38-59; interval merge
mimicUsefulFunction.R:449-494) to the engine's (entity, ts) model: a new
session opens at an entity change or when the time gap to the previous row
exceeds ``gap``. Session ids are monotone over the sorted input.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def sessionize_gap(id_arr, ts, gap) -> np.ndarray:
    """Monotone session ids over (entity, ts)-sorted arrays. Vectorized:
    ``cumsum(entity_change | dt > gap) - 1``."""
    ids = np.asarray(id_arr)
    t = np.asarray(ts, dtype=np.float64)
    if t.size == 0:
        return np.empty(0, dtype=np.int64)
    id_change = np.r_[True, ids[1:] != ids[:-1]]
    dt = np.r_[np.inf, t[1:] - t[:-1]]
    new_session = id_change | (dt > gap)
    return np.cumsum(new_session) - 1


def session_bounds(session_id, ts, value=None) -> pd.DataFrame:
    """Per-session aggregate frame: n_events, t_start, t_end, duration
    (+ sum/mean of ``value``). Runs on one sorted block; the engine composes
    map-side partials with a final groupby when sessions straddle blocks."""
    df = pd.DataFrame({"session_id": np.asarray(session_id), "ts": np.asarray(ts)})
    aggs = {"ts": ["count", "min", "max"]}
    if value is not None:
        df["value"] = np.asarray(value, dtype=np.float64)
        aggs["value"] = ["sum", "mean"]
    out = df.groupby("session_id", sort=True).agg(aggs)
    out.columns = ["n_events", "t_start", "t_end"] + (
        ["value_sum", "value_mean"] if value is not None else []
    )
    out["duration"] = out["t_end"] - out["t_start"]
    return out.reset_index()
