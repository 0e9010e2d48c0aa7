"""Vectorized sequential-scan operators (engine side).

Same semantics as ``mpds_ray.oracle.scans`` (the loop oracle transliterated
from mimicUsefulFunction.R) but fully vectorized with pandas grouped
ffill/bfill/cum* and NumPy — no Python loop over rows. Inputs are arrays
sorted by (entity, ts); outputs are aligned arrays. These run inside
``map_batches`` on entity-complete blocks, so no cross-batch carry state is
needed by construction (see stages/partition.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _series(x) -> pd.Series:
    return pd.Series(np.asarray(x))


def time_since_to_event(id_arr, ht, event) -> dict[str, np.ndarray]:
    """Vectorized T4 (mimicUsefulFunction.R:23-94): per-entity forward scan
    (time since last/first event, events strictly BEFORE the row) and backward
    scan (time to next event), with entity-boundary resets."""
    ids = _series(id_arr)
    ht = np.asarray(ht, dtype=np.float64)
    ev_ts = pd.Series(np.where(np.asarray(event) == 1, ht, np.nan))
    g = ev_ts.groupby(ids, sort=False)
    prev_ev = g.shift(1).groupby(ids, sort=False).ffill()
    first_ev = g.transform("first").where(prev_ev.notna())
    next_ev = g.shift(-1).groupby(ids, sort=False).bfill()

    t_since_last = (ht - prev_ev).to_numpy()
    t_since_first = (ht - first_ev).to_numpy()
    t_next = (next_ev - ht).to_numpy()
    t_to_first = np.where(~np.isnan(t_next) & np.isnan(t_since_first), t_next, np.nan)
    return {
        "time_to_next_event": t_next,
        "time_to_first_event": t_to_first,
        "time_since_last_event": t_since_last,
        "time_since_first_event": t_since_first,
    }


def locf_with_expiration(id_arr, ht, vec, valid_time) -> dict[str, np.ndarray]:
    """Vectorized T5 (mimicUsefulFunction.R:301-332): grouped LOCF, time since
    last observed sample, and the LOCF value expired after ``valid_time``."""
    ids = _series(id_arr)
    ht = np.asarray(ht, dtype=np.float64)
    v = pd.Series(np.asarray(vec, dtype=np.float64))
    locf = v.groupby(ids, sort=False).ffill()
    sample_ts = pd.Series(np.where(v.notna(), ht, np.nan)).groupby(ids, sort=False).ffill()
    tsls = ht - sample_ts.to_numpy()
    expir = np.where(~np.isnan(tsls) & (tsls > valid_time), np.nan, locf.to_numpy())
    return {
        "locf": locf.to_numpy(),
        "time_since_last_sample": tsls,
        "locf_with_expir": expir,
    }


def linear_interpolation(id_arr, ht, vec, default) -> np.ndarray:
    """Vectorized T6 (mimicUsefulFunction.R:631-708): per-entity linear
    interpolation of NA gaps in event time; leading NAs (and all-NA entities)
    get ``default``; trailing NAs carry the last observation."""
    ids = _series(id_arr)
    t = np.asarray(ht, dtype=np.float64)
    v = np.asarray(vec, dtype=np.float64)
    n = v.size
    idx = np.arange(n, dtype=np.float64)
    obs_idx = pd.Series(np.where(~np.isnan(v), idx, np.nan))
    prev_i = obs_idx.groupby(ids, sort=False).ffill().to_numpy()
    next_i = obs_idx.groupby(ids, sort=False).bfill().to_numpy()

    out = v.copy()
    na = np.isnan(v)
    # interior gap: both neighbors exist
    both = na & ~np.isnan(prev_i) & ~np.isnan(next_i)
    p = prev_i[both].astype(np.int64)
    q = next_i[both].astype(np.int64)
    dt = t[q] - t[p]
    frac = np.where(dt != 0, (t[both] - t[p]) / np.where(dt != 0, dt, 1.0), 0.0)
    out[both] = v[p] + frac * (v[q] - v[p])
    # trailing: only prev
    trail = na & ~np.isnan(prev_i) & np.isnan(next_i)
    out[trail] = v[prev_i[trail].astype(np.int64)]
    # leading / all-NA entity
    out[na & np.isnan(prev_i)] = default
    return out


def sample_and_hold(id_arr, vec, default) -> np.ndarray:
    """Vectorized T7 (mimicUsefulFunction.R:711-718)."""
    ids = _series(id_arr)
    v = pd.Series(np.asarray(vec, dtype=np.float64))
    return v.groupby(ids, sort=False).ffill().fillna(default).to_numpy()


def _on_run_ids(sig: np.ndarray, ids: pd.Series) -> np.ndarray:
    """Monotone run id per ON-run (0 for OFF rows); runs never straddle ids."""
    on = sig == 1
    prev_on = np.r_[False, on[:-1]]
    id_change = np.r_[True, ids.to_numpy()[1:] != ids.to_numpy()[:-1]]
    run_start = on & (~prev_on | id_change)
    run = np.cumsum(run_start)
    return np.where(on, run, 0)


def remove_short_on_intervals(id_arr, ht, vec, time_th) -> np.ndarray:
    """Vectorized T8 debounce (mimicUsefulFunction.R:384-436): keep ON-runs
    whose span (last ON ts - first ON ts) >= time_th. Reproduces the reference
    quirk that a single-row run terminating at the entity's last row is
    dropped even when time_th <= 0."""
    ids = _series(id_arr)
    t = np.asarray(ht, dtype=np.float64)
    sig = np.nan_to_num(np.asarray(vec, dtype=np.float64), nan=0.0)
    run = _on_run_ids(sig, ids)
    on = run > 0
    if not on.any():
        return np.zeros(sig.size)
    df = pd.DataFrame({"run": run[on], "t": t[on]})
    spans = df.groupby("run")["t"].agg(["min", "max", "count"])
    keep_runs = spans.index[(spans["max"] - spans["min"]) >= time_th]
    keep = np.isin(run, keep_runs) & on
    # reference quirk: a 1-row run at the entity's LAST row never survives
    is_last = np.r_[ids.to_numpy()[1:] != ids.to_numpy()[:-1], True]
    singles = spans.index[spans["count"] == 1]
    keep &= ~(np.isin(run, singles) & is_last)
    return keep.astype(np.float64)


def unite_adjacent_on_intervals(id_arr, ht, vec, union_th) -> np.ndarray:
    """Vectorized T9 gap-merge (mimicUsefulFunction.R:449-494): OFF-gaps
    bounded by ON on both sides within one entity are turned ON when
    (first ON ts after gap) - (last ON ts before gap) <= union_th."""
    ids = _series(id_arr)
    t = np.asarray(ht, dtype=np.float64).copy()
    t[t < 0] = 0  # reference compatibility clamp
    sig = np.nan_to_num(np.asarray(vec, dtype=np.float64), nan=0.0)
    on_ts = pd.Series(np.where(sig == 1, t, np.nan))
    prev_on = on_ts.groupby(ids, sort=False).ffill().to_numpy()
    next_on = on_ts.groupby(ids, sort=False).bfill().to_numpy()
    fill = (
        (sig == 0)
        & ~np.isnan(prev_on)
        & ~np.isnan(next_on)
        & ((next_on - prev_on) <= union_th)
    )
    return np.where(fill, 1.0, sig)


def prefix_features(id_arr, ht, score) -> dict[str, np.ndarray]:
    """Vectorized T12 (dssFunctionLibrary.R:876-917): per-entity cumulative
    max/min/sum, running mean, trapezoid time-weighted running mean, and
    rate-of-change."""
    ids = _series(id_arr)
    t = np.asarray(ht, dtype=np.float64)
    s = pd.Series(np.asarray(score, dtype=np.float64))
    g = s.groupby(ids, sort=False)
    cmax = g.cummax().to_numpy()
    cmin = g.cummin().to_numpy()
    csum = g.cumsum().to_numpy()
    cnt = g.cumcount().to_numpy() + 1
    rmean = csum / cnt

    ts_ser = pd.Series(t)
    tg = ts_ser.groupby(ids, sort=False)
    prev_t = tg.shift(1).to_numpy()
    prev_s = g.shift(1).to_numpy()
    dt = t - prev_t
    area = 0.5 * (s.to_numpy() + prev_s) * dt
    # per-entity SEQUENTIAL naive cumsum (np.add.accumulate), NOT pandas'
    # Kahan-compensated group cumsum: the salted boundary-stitch replays this
    # chain from a carried scalar (stages/salted.py), which is only
    # bit-reproducible for plain left-to-right addition — and it matches the
    # reference loop oracle's `acc += area` semantics exactly.
    area_z = np.nan_to_num(area, nan=0.0)
    cum_area = np.empty_like(area_z)
    id_vals = ids.to_numpy()
    starts = np.flatnonzero(np.r_[True, id_vals[1:] != id_vals[:-1]])
    for s_, e_ in zip(starts, np.r_[starts[1:], area_z.size]):
        cum_area[s_:e_] = np.cumsum(area_z[s_:e_])
    t0 = tg.transform("first").to_numpy()
    s0 = g.transform("first").to_numpy()
    span = t - t0
    twmean = np.where(span > 0, cum_area / np.where(span > 0, span, 1.0), s0)

    dv = s.to_numpy() - prev_s
    roc = np.where(np.nan_to_num(dt, nan=0.0) > 0, dv / np.where(dt > 0, dt, 1.0), np.nan)
    return {
        "cummax": cmax,
        "cummin": cmin,
        "cumsum": csum,
        "runmean": rmean,
        "twmean": twmean,
        "roc": roc,
    }
