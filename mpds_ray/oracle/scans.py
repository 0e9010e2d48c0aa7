"""Loop oracle for the sequential scan operators (reference semantics).

Direct transliterations of the reference scans over (id, ts)-sorted rows:

- time since/to event:  mimicUsefulFunction.R:23-94
- LOCF with expiration: mimicUsefulFunction.R:301-332
- linear interpolation: mimicUsefulFunction.R:631-708
- sample-and-hold:      mimicUsefulFunction.R:711-718
- debounce:             mimicUsefulFunction.R:384-436
- gap merge:            mimicUsefulFunction.R:449-494
- gap sessionize:       extractAudioTestV1.m:38-59 semantics generalized

NaN plays R's NA. These are O(n) Python loops — oracle only, never run
inside the engine.
"""

from __future__ import annotations

import math

import numpy as np


def time_since_to_event(id_arr, ht, event):
    """Forward/backward event-distance scan (mimicUsefulFunction.R:23-94)."""
    n = len(ht)
    t_next = np.full(n, np.nan)
    t_first_to = np.full(n, np.nan)
    t_since_last = np.full(n, np.nan)
    t_since_first = np.full(n, np.nan)

    last_id = None
    last_ev = math.nan
    first_ev = math.nan
    for i in range(n):
        if last_id is None or id_arr[i] != last_id:
            last_id = id_arr[i]
            last_ev = math.nan
            first_ev = math.nan
        if not math.isnan(last_ev) or not math.isnan(first_ev):
            t_since_last[i] = ht[i] - last_ev
            t_since_first[i] = ht[i] - first_ev
        if event[i] == 1:
            last_ev = ht[i]
            if math.isnan(first_ev):
                first_ev = ht[i]

    last_id = None
    last_ev = math.nan
    for i in range(n - 1, -1, -1):
        if last_id is None or id_arr[i] != last_id:
            last_id = id_arr[i]
            last_ev = math.nan
        if not math.isnan(last_ev):
            t_next[i] = last_ev - ht[i]
        if event[i] == 1:
            last_ev = ht[i]

    cond = ~np.isnan(t_next) & np.isnan(t_since_first)
    t_first_to[cond] = t_next[cond]
    return {
        "time_to_next_event": t_next,
        "time_to_first_event": t_first_to,
        "time_since_last_event": t_since_last,
        "time_since_first_event": t_since_first,
    }


def locf_with_expiration(id_arr, ht, vec, valid_time):
    """LOCF + time-since-sample + expiring carry (mimicUsefulFunction.R:301-332)."""
    n = len(ht)
    locf = np.full(n, np.nan)
    tsls = np.full(n, np.nan)
    expir = np.full(n, np.nan)
    last_id = None
    carry = math.nan
    carry_ts = math.nan
    for i in range(n):
        if last_id is None or id_arr[i] != last_id:
            last_id = id_arr[i]
            carry = math.nan
            carry_ts = math.nan
        if not math.isnan(vec[i]):
            carry = vec[i]
            carry_ts = ht[i]
        locf[i] = carry
        if not math.isnan(carry_ts):
            tsls[i] = ht[i] - carry_ts
        expir[i] = carry
        if not math.isnan(tsls[i]) and tsls[i] > valid_time:
            expir[i] = math.nan
    return {"locf": locf, "time_since_last_sample": tsls, "locf_with_expir": expir}


def linear_interpolation(id_arr, ht, vec, default):
    """Per-entity linear interp of NA gaps; leading NA <- default, trailing NA
    <- last non-NA (mimicUsefulFunction.R:631-708 boundary rules)."""
    n = len(ht)
    out = np.array(vec, dtype=np.float64, copy=True)
    i = 0
    while i < n:
        j = i
        while j < n and id_arr[j] == id_arr[i]:
            j += 1
        seg = slice(i, j)
        v = out[seg]
        t = np.asarray(ht[seg], dtype=np.float64)
        obs = np.flatnonzero(~np.isnan(v))
        if obs.size == 0:
            v[:] = default
        else:
            for k in range(v.size):
                if not math.isnan(v[k]):
                    continue
                prev = obs[obs < k]
                nxt = obs[obs > k]
                if prev.size == 0:
                    v[k] = default
                elif nxt.size == 0:
                    v[k] = v[prev[-1]]
                else:
                    p, q = prev[-1], nxt[0]
                    frac = (t[k] - t[p]) / (t[q] - t[p]) if t[q] != t[p] else 0.0
                    v[k] = v[p] + frac * (v[q] - v[p])
        out[seg] = v
        i = j
    return out


def sample_and_hold(id_arr, vec, default):
    """Plain LOCF with default for leading NA (mimicUsefulFunction.R:711-718)."""
    n = len(vec)
    out = np.empty(n)
    last_id = None
    carry = math.nan
    for i in range(n):
        if last_id is None or id_arr[i] != last_id:
            last_id = id_arr[i]
            carry = math.nan
        if not math.isnan(vec[i]):
            carry = vec[i]
        out[i] = default if math.isnan(carry) else carry
    return out


def remove_short_on_intervals(id_arr, ht, vec, time_th):
    """Debounce: keep ON-runs lasting >= time_th (mimicUsefulFunction.R:384-436).
    Faithful port including the single-ON-row-at-user-end drop quirk."""
    n = len(ht)
    is_last = np.r_[np.asarray(id_arr)[1:] != np.asarray(id_arr)[:-1], True]
    sig = np.nan_to_num(np.asarray(vec, dtype=np.float64), nan=0.0)
    out = np.zeros(n)
    prev_val = -1.0
    prev_t = -time_th - 1.0
    rising_t = -time_th - 1.0
    rising_idx = -1
    for i in range(n):
        cur_t = ht[i]
        cur = sig[i]
        if cur == 1 and prev_val <= 0:
            rising_t = ht[i]
            rising_idx = i
        if cur == 0 and prev_val == 1:
            if prev_t - rising_t >= time_th:
                out[rising_idx:i] = 1
        if cur == 1 and prev_val == 1 and is_last[i]:
            if cur_t - rising_t >= time_th:
                out[rising_idx : i + 1] = 1
        if is_last[i]:
            prev_val = -1.0
            prev_t = -time_th - 1.0
        else:
            prev_val = cur
            prev_t = cur_t
    return out


def unite_adjacent_on_intervals(id_arr, ht, vec, union_th):
    """Merge ON-runs separated by <= union_th (mimicUsefulFunction.R:449-494)."""
    n = len(ht)
    is_last = np.r_[np.asarray(id_arr)[1:] != np.asarray(id_arr)[:-1], True]
    sig = np.nan_to_num(np.asarray(vec, dtype=np.float64), nan=0.0)
    ht = np.asarray(ht, dtype=np.float64).copy()
    ht[ht < 0] = 0  # reference compatibility clamp
    prev_val = -1.0
    prev_t = -1.0
    fall_t = -union_th - 1.0
    fall_idx = -1
    for i in range(n):
        cur_t = ht[i]
        cur = sig[i]
        if prev_val == 0 and cur == 1:
            if cur_t - fall_t <= union_th:
                sig[fall_idx : i + 1] = 1
        if prev_val == 1 and cur == 0:
            fall_t = prev_t
            fall_idx = i - 1
        if is_last[i]:
            prev_val = -1.0
            prev_t = -1.0
            fall_t = -union_th - 1.0
            fall_idx = -1
        else:
            prev_val = cur
            prev_t = cur_t
    return sig


def sessionize_gap(id_arr, ts, gap):
    """Gap-threshold sessionization: a new session starts at an entity change
    or when ts - prev_ts > gap. Returns globally monotone session ids."""
    n = len(ts)
    out = np.empty(n, dtype=np.int64)
    sid = -1
    last_id = None
    last_ts = None
    for i in range(n):
        if last_id is None or id_arr[i] != last_id or ts[i] - last_ts > gap:
            sid += 1
        out[i] = sid
        last_id = id_arr[i]
        last_ts = ts[i]
    return out


def prefix_features(id_arr, ts, score):
    """Per-entity prefix scans (dssFunctionLibrary.R:876-917 shapes):
    cumulative max/min/sum, running mean, time-weighted running mean and
    rate-of-change of the score."""
    n = len(ts)
    cmax = np.empty(n)
    cmin = np.empty(n)
    csum = np.empty(n)
    rmean = np.empty(n)
    twmean = np.empty(n)
    roc = np.full(n, np.nan)
    i = 0
    while i < n:
        j = i
        while j < n and id_arr[j] == id_arr[i]:
            j += 1
        s = np.asarray(score[i:j], dtype=np.float64)
        t = np.asarray(ts[i:j], dtype=np.float64)
        cmax[i:j] = np.maximum.accumulate(s)
        cmin[i:j] = np.minimum.accumulate(s)
        csum[i:j] = np.cumsum(s)
        rmean[i:j] = np.cumsum(s) / np.arange(1, s.size + 1)
        # trapezoid time-weighted running mean (dssFunctionLibrary.R:1350-1368 shape)
        for k in range(s.size):
            if k == 0 or t[k] == t[0]:
                twmean[i + k] = s[0]
            else:
                areas = 0.5 * (s[1 : k + 1] + s[:k]) * np.diff(t[: k + 1])
                twmean[i + k] = areas.sum() / (t[k] - t[0])
        dt = np.diff(t)
        dv = np.diff(s)
        roc[i + 1 : j] = np.where(dt > 0, dv / np.where(dt > 0, dt, 1.0), np.nan)
        i = j
    return {
        "cummax": cmax,
        "cummin": cmin,
        "cumsum": csum,
        "runmean": rmean,
        "twmean": twmean,
        "roc": roc,
    }


def asof_backward(left_id, left_ts, right_id, right_ts, right_val, tolerance=None):
    """Point-in-time lookup oracle: for each left row, the right value with the
    greatest right_ts <= left_ts for the same entity (within tolerance).
    Semantics of T5/J4 (LOCF-as-join, mimicUsefulFunction.R:301-332)."""
    n = len(left_ts)
    out = np.full(n, np.nan)
    out_ts = np.full(n, np.nan)
    for i in range(n):
        best = None
        for j in range(len(right_ts)):
            if right_id[j] != left_id[i] or right_ts[j] > left_ts[i]:
                continue
            if best is None or right_ts[j] > right_ts[best]:
                best = j
        if best is not None:
            if tolerance is None or left_ts[i] - right_ts[best] <= tolerance:
                out[i] = right_val[best]
                out_ts[i] = right_ts[best]
    return out, out_ts
