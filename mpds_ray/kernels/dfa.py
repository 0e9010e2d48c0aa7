"""Detrended fluctuation analysis — semantics of the reference MEX kernel.

Reimplements fastdfa (feature_extraction/fastdfa.m:21-33 +
fastdfa_core.c:41-161,255-264) in vectorized NumPy:

1. cumulative-sum the input (fastdfa_core.c:41-56);
2. binary-subdivision interval widths: N_scales = floor(log10 n / log10 2),
   decremented once if 2^(N_scales-1) > n/2.5 (fastdfa_core.c:255-261);
   interval width at scale s = round(n / 2^s) (``calculateIntervals``);
3. per scale, tile the sequence into consecutive intervals; least-squares
   straight-line detrend each full interval (closed-form Sx/Sxx,
   fastdfa_core.c:133-135); a leftover tail smaller than the interval keeps
   trend = x, i.e. contributes zero fluctuation (fastdfa_core.c:111-120);
4. fluctuation at a scale = RMS of (x - trend) over ALL n elements;
5. alpha = slope of the degree-1 polyfit of log10(flucts) vs log10(intervals)
   (fastdfa.m:31-33).

Degenerate inputs (n too small for 2 scales, or zero fluctuation at any
scale) return NaN — pinned oracle behavior, documented in FIXTURES.md.
"""

from __future__ import annotations

import numpy as np


def dfa_intervals(n: int) -> np.ndarray | None:
    """Binary-subdivision interval widths, largest first (scale 0 = whole)."""
    if n < 4:
        return None
    n_scales = int(np.log10(n) / np.log10(2.0))
    if n_scales >= 1 and (1 << (n_scales - 1)) > n / 2.5:
        n_scales -= 1
    if n_scales < 2:
        return None
    return np.array([int(n / (1 << s) + 0.5) for s in range(n_scales)], dtype=np.int64)


def _fluctuation(y: np.ndarray, w: int) -> float:
    """RMS detrended fluctuation of cumulative signal y at interval width w."""
    n = y.size
    starts = np.arange(0, n, w, dtype=np.int64)
    full = starts[starts + w <= n]  # intervals that fit entirely
    trend = np.empty(n, dtype=np.float64)
    tail_start = full[-1] + w if full.size else 0
    if tail_start < n:
        trend[tail_start:] = y[tail_start:]  # tail: trend = x -> zero residual
    if full.size:
        idx = np.arange(n, dtype=np.float64)
        cs = np.concatenate([[0.0], np.cumsum(y)])
        csi = np.concatenate([[0.0], np.cumsum(y * idx)])
        sy = cs[full + w] - cs[full]
        sxy = csi[full + w] - csi[full]
        start = full.astype(np.float64)
        end = start + w - 1
        sx = (end + start) * w / 2.0
        sxx = w * (2 * end * end + 2 * start * start + 2 * start * end + end - start) / 6.0
        delta = w * sxx - sx * sx
        b = (sy * sxx - sx * sxy) / delta
        a = (w * sxy - sx * sy) / delta
        # starts are consecutive multiples of w, so full intervals tile [0, tail_start)
        seg_idx = idx[:tail_start].reshape(-1, w)
        trend[:tail_start] = (a[:, None] * seg_idx + b[:, None]).ravel()
    d = y - trend
    return float(np.sqrt(np.mean(d * d)))


def fastdfa(x) -> float:
    """Scaling exponent alpha of the detrended fluctuation analysis."""
    x = np.asarray(x, dtype=np.float64).ravel()
    n = x.size
    intervals = dfa_intervals(n)
    if intervals is None:
        return float("nan")
    y = np.cumsum(x)
    flucts = np.array([_fluctuation(y, int(w)) for w in intervals])
    if np.any(flucts <= 0) or not np.all(np.isfinite(flucts)):
        return float("nan")
    coeffs = np.polyfit(np.log10(intervals.astype(np.float64)), np.log10(flucts), 1)
    return float(coeffs[0])
