"""Vectorized encoders & instantaneous-condition blocks (M12/M13/M14, T11).

Per-row transforms mirroring mimicUsefulFunction.R; each is a pure NumPy
function usable directly inside ``map_batches``.
"""

from __future__ import annotations

import numpy as np

from .scans import time_since_to_event


def decimal_to_bin_matrix(dec: np.ndarray, num_classes: int) -> dict[str, np.ndarray]:
    """M12 (mimicUsefulFunction.R:204-235): class ints 0..C-1 -> big-endian
    bit columns ``ClassBit<k>`` (k = ceil(log2 C) .. 1). Hard error when the
    observed class set is not exactly 0..C-1 (reference stop)."""
    dec = np.asarray(dec, dtype=np.int64)
    uniq = np.unique(dec)
    if not np.array_equal(uniq, np.arange(num_classes)):
        raise ValueError(
            f"decimal_to_bin_matrix: unique classes {uniq.tolist()} not concordant "
            f"with {num_classes} classes"
        )
    num_bits = int(np.ceil(np.log2(num_classes)))
    out = {}
    for k in range(num_bits):  # bit k = 2^k, column name ClassBit{k+1}
        out[f"ClassBit{k + 1}"] = ((dec >> k) & 1).astype(np.int64)
    return out


def logical_to_zero_one(vec: np.ndarray) -> np.ndarray:
    """M13a (:497-501): TRUE/FALSE -> 1/0, NaN preserved."""
    v = np.asarray(vec, dtype=np.float64)
    return np.where(np.isnan(v), np.nan, (v != 0).astype(np.float64))


SEVERITY_LEVELS = ("none", "sirs", "severe", "shock")


def highest_status(sirs: np.ndarray, severe: np.ndarray, shock: np.ndarray) -> np.ndarray:
    """M13b (:553-569): 4-way priority encode -> ordinal codes 0..3
    (none < sirs < severe < shock)."""
    sirs = np.asarray(sirs)
    severe = np.asarray(severe)
    shock = np.asarray(shock)
    return np.where(shock == 1, 3, np.where(severe == 1, 2, np.where(sirs == 1, 1, 0))).astype(
        np.int64
    )


def sirs_instantaneous_conditions(
    temperature, hr, resp_rate, paco2, wbc
) -> dict[str, np.ndarray]:
    """M14 (:348-374): per-row threshold predicates with NA tolerance;
    sirs_raw = at least 2 of {temp, hr, rr|paco2, wbc} hold (NA counts as
    not-holding in the row sum, exactly like rowSums(na.rm=TRUE));
    none_holds = all observed conditions false with rr observed."""
    t = np.asarray(temperature, dtype=np.float64)
    h = np.asarray(hr, dtype=np.float64)
    r = np.asarray(resp_rate, dtype=np.float64)
    p = np.asarray(paco2, dtype=np.float64)
    w = np.asarray(wbc, dtype=np.float64)

    def _cond(x, expr):
        return np.where(np.isnan(x), np.nan, expr.astype(np.float64))

    temp_c = _cond(t, (t < 96.8) | (t > 100.4))
    hr_c = _cond(h, h > 90)
    rr_c = _cond(r, r > 20)
    paco2_c = _cond(p, p < 32)
    wbc_c = _cond(w, (w < 4) | (w > 12))
    # NA | TRUE == TRUE  (R semantics)
    rp = np.where(
        (rr_c == 1) | (paco2_c == 1), 1.0,
        np.where(np.isnan(rr_c) | np.isnan(paco2_c), np.nan, 0.0),
    )
    stack = np.stack([temp_c, hr_c, rp, wbc_c])
    sirs_raw = (np.nansum(stack, axis=0) >= 2).astype(np.float64)
    none_holds = (
        (temp_c == 0)
        & (hr_c == 0)
        & (rr_c == 0)
        & ((paco2_c == 0) | np.isnan(paco2_c))
        & ((wbc_c == 0) | np.isnan(wbc_c))
    ).astype(np.float64)
    return {
        "temperature": temp_c,
        "hr": hr_c,
        "resp_rate": rr_c,
        "paco2": paco2_c,
        "wbc": wbc_c,
        "resp_rate_or_paco2": rp,
        "sirs_raw": sirs_raw,
        "none_holds": none_holds,
    }


def safe_status_grading(
    id_arr, ht, status_raw, status_of_interest, time_th
) -> np.ndarray:
    """T11 (:504-516): a row's status is 'safe' iff it equals the status of
    interest and no different-status row lies within time_th on either side
    (built on the T4 event-distance scan with event = different-status)."""
    status_raw = np.asarray(status_raw)
    other = (status_raw != status_of_interest).astype(np.int64)
    td = time_since_to_event(id_arr, ht, other)
    to_next = td["time_to_next_event"]
    since_last = td["time_since_last_event"]
    return (
        (status_raw == status_of_interest)
        & (np.isnan(to_next) | (to_next > time_th))
        & (np.isnan(since_last) | (since_last > time_th))
    )
