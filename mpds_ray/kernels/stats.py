"""Windowed statistics kernels — the mpds per-session feature library.

Each function maps one window (a 1-D float array: a sensor channel, a token
sequence, an inter-tap-duration series ...) to one scalar feature, matching the
semantics of the reference extractors:

- stat block:     /root/reference/feature_extraction/extractAccelTestV2.m:72-101
- entropy:        /root/reference/feature_extraction/InfoTheory/entropy.m:1-8
- KL divergence:  /root/reference/feature_extraction/InfoTheory/relativeEntropy.m:1-20
- ZCR:            /root/reference/feature_extraction/ZCR.m:16
- mean TKEO:      /root/reference/feature_extraction/FeatureMeanTKEO.m:7-9
- AR(1):          /root/reference/feature_extraction/FeatureAR1.m:6-11

MATLAB builtins used by the reference without definition are pinned here
(documented in FIXTURES.md): ``prctile`` = linear interpolation between
midpoint plotting positions; ``mode`` = smallest most-frequent value;
``skewness``/``kurtosis`` = biased, kurtosis NON-excess; ``std`` = sample
(ddof=1); ``normalize`` = z-score with sample std; ``eps`` = 2**-52.

All kernels are pure NumPy and NaN on degenerate inputs (empty / too short)
instead of erroring, so they can run inside vectorized per-row loops.
"""

from __future__ import annotations

import numpy as np

EPS = 2.0**-52  # MATLAB eps


def _as1d(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float64).ravel()


def w_mean(x: np.ndarray) -> float:
    x = _as1d(x)
    return float(np.mean(x)) if x.size else float("nan")


def w_std(x: np.ndarray) -> float:
    """MATLAB std: sample standard deviation (normalized by N-1)."""
    x = _as1d(x)
    if x.size < 2:
        return 0.0 if x.size == 1 else float("nan")
    return float(np.std(x, ddof=1))


def prctile(x: np.ndarray, p) -> np.ndarray | float:
    """MATLAB ``prctile``: linear interpolation between the percentiles
    100*(k-0.5)/n of the k-th sorted sample; clamped to min/max outside."""
    x = _as1d(x)
    if x.size == 0:
        return float("nan") if np.isscalar(p) else np.full(len(p), np.nan)
    xs = np.sort(x)
    q = 100.0 * (np.arange(1, xs.size + 1) - 0.5) / xs.size
    return np.interp(p, q, xs)


def w_q1(x) -> float:
    return float(prctile(x, 25.0))


def w_q3(x) -> float:
    return float(prctile(x, 75.0))


def w_iqr(x) -> float:
    q = prctile(x, [25.0, 75.0])
    return float(q[1] - q[0])


def w_median(x) -> float:
    x = _as1d(x)
    return float(np.median(x)) if x.size else float("nan")


def w_mode(x) -> float:
    """MATLAB ``mode``: most frequent value; ties broken by smallest value."""
    x = _as1d(x)
    if x.size == 0:
        return float("nan")
    vals, counts = np.unique(x, return_counts=True)  # vals sorted ascending
    return float(vals[np.argmax(counts)])  # argmax returns FIRST max -> smallest


def w_range(x) -> float:
    x = _as1d(x)
    return float(np.max(x) - np.min(x)) if x.size else float("nan")


def w_skewness(x) -> float:
    """MATLAB ``skewness(x)`` default (biased): m3 / m2^(3/2)."""
    x = _as1d(x)
    if x.size == 0:
        return float("nan")
    d = x - x.mean()
    m2 = np.mean(d * d)
    if m2 == 0:
        return float("nan")
    return float(np.mean(d**3) / m2**1.5)


def w_kurtosis(x) -> float:
    """MATLAB ``kurtosis(x)`` default (biased, NON-excess): m4 / m2^2."""
    x = _as1d(x)
    if x.size == 0:
        return float("nan")
    d = x - x.mean()
    m2 = np.mean(d * d)
    if m2 == 0:
        return float("nan")
    return float(np.mean(d**4) / (m2 * m2))


def w_mse(x) -> float:
    """mean(x.^2) — named 'mse' in the reference header block."""
    x = _as1d(x)
    return float(np.mean(x * x)) if x.size else float("nan")


def w_sum(x) -> float:
    x = _as1d(x)
    return float(np.sum(x))


def entropy(x) -> float:
    """Discrete Shannon entropy over unique values as categories:
    ``-sum(p .* log2(p+eps))`` (reference InfoTheory/entropy.m:1-8)."""
    x = _as1d(x)
    if x.size == 0:
        return float("nan")
    _, counts = np.unique(x, return_counts=True)
    p = counts / x.size
    return float(-np.dot(p, np.log2(p + EPS)))


def relative_entropy(x, y) -> float:
    """KL(p(x)||p(y)) of two INTEGER-valued discrete signals over their shared
    support (reference InfoTheory/relativeEntropy.m:1-20): shift both to
    positive ints, count over 1..k, ``-sum(Px.*(log2(Py+eps)-log2(Px+eps)))``.
    Zero-probability x-bins contribute 0 (since Px=0 multiplies)."""
    x = np.asarray(np.round(_as1d(x)), dtype=np.int64)
    y = np.asarray(np.round(_as1d(y)), dtype=np.int64)
    if x.size != y.size:
        raise ValueError("relative_entropy: inputs must have equal length")
    if x.size == 0:
        return float("nan")
    lo = min(x.min(), y.min())
    x = x - lo
    y = y - lo
    k = int(max(x.max(), y.max())) + 1
    n = x.size
    px = np.bincount(x, minlength=k) / n
    py = np.bincount(y, minlength=k) / n
    return float(-np.dot(px, np.log2(py + EPS) - np.log2(px + EPS)))


def zcr(x) -> float:
    """Zero-crossing rate ``sum(abs(diff(x>0)))/length(x)`` (ZCR.m:16).
    The reference always calls it on the z-scored signal; see :func:`zcr_normalized`."""
    x = _as1d(x)
    if x.size < 2:
        return 0.0 if x.size else float("nan")
    return float(np.sum(np.abs(np.diff((x > 0).astype(np.int8))))) / x.size


def normalize_z(x) -> np.ndarray:
    """MATLAB ``normalize`` default: z-score with sample std (ddof=1)."""
    x = _as1d(x)
    s = np.std(x, ddof=1) if x.size > 1 else 0.0
    if s == 0:
        return x - np.mean(x) if x.size else x
    return (x - np.mean(x)) / s


def zcr_normalized(x) -> float:
    """``ZCR(normalize(x))`` as used at extractAccelTestV2.m:88-89."""
    return zcr(normalize_z(x))


def mean_tkeo(x) -> float:
    """Mean Teager–Kaiser energy: ``mean(x(2:m-1).^2 - x(3:m).*x(1:m-2))``
    (FeatureMeanTKEO.m:7-9)."""
    x = _as1d(x)
    m = x.size
    if m < 3:
        return float("nan")
    return float(np.mean(x[1 : m - 1] ** 2 - x[2:m] * x[0 : m - 2]))


def ar1(x) -> float:
    """No-intercept AR(1) coefficient ``regress(x(2:n), x(1:n-1))`` =
    sum(x[t]*x[t-1]) / sum(x[t-1]^2) (FeatureAR1.m:6-11)."""
    x = _as1d(x)
    if x.size < 2:
        return float("nan")
    xin = x[:-1]
    denom = float(np.dot(xin, xin))
    if denom == 0:
        return float("nan")
    return float(np.dot(x[1:], xin) / denom)
