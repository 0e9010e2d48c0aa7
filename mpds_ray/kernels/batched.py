"""Row-batched heavy kernels: DFA and Lomb–Scargle vectorized across MANY
equal-length windows at once.

The scalar kernels (kernels.dfa.fastdfa, kernels.lomb.dominant_frequency)
cost ~0.5 ms/row in Python-loop form — fine for per-session extraction,
fatal for 10^6+ rows. For fixed window length n:

- DFA: every step (cumsum, per-scale closed-form line fits, RMS residuals,
  log-log slope) is row-parallel; the interval layout depends only on n, so
  a (m, n) matrix computes m exponents in a handful of matrix ops.
- Lomb–Scargle on the regular grid t = arange(n)/rate: the frequency grid,
  tau and the cos/sin design matrices are SHARED across rows, so the
  periodogram of all m rows is two BLAS matmuls (m,n)x(n,nf).

Both match the scalar kernels to ~1e-10 (tests/test_batched_kernels.py).
"""

from __future__ import annotations

import numpy as np

from .dfa import dfa_intervals


def dfa_batch(x: np.ndarray) -> np.ndarray:
    """DFA alpha for each row of an (m, n) matrix (NaN where degenerate)."""
    x = np.asarray(x, dtype=np.float64)
    m, n = x.shape
    intervals = dfa_intervals(n)
    if intervals is None:
        return np.full(m, np.nan)
    y = np.cumsum(x, axis=1)
    flucts = np.empty((m, intervals.size))
    idx = np.arange(n, dtype=np.float64)
    for s, w in enumerate(intervals.tolist()):
        n_full = n // w
        tail_start = n_full * w
        resid_sq = np.zeros(m)
        if n_full:
            seg = y[:, :tail_start].reshape(m, n_full, w)
            seg_idx = idx[:tail_start].reshape(n_full, w)
            sy = seg.sum(axis=2)  # (m, k)
            sxy = (seg * seg_idx[None]).sum(axis=2)
            start = seg_idx[:, 0]
            end = seg_idx[:, -1]
            sx = (end + start) * w / 2.0
            sxx = w * (2 * end * end + 2 * start * start + 2 * start * end + end - start) / 6.0
            delta = w * sxx - sx * sx
            b = (sy * sxx[None] - sx[None] * sxy) / delta[None]
            a = (w * sxy - sx[None] * sy) / delta[None]
            trend = a[:, :, None] * seg_idx[None] + b[:, :, None]
            d = seg - trend
            resid_sq = (d * d).sum(axis=(1, 2))
        # tail interval: trend = y -> zero residual (fastdfa_core.c:111-120)
        flucts[:, s] = np.sqrt(resid_sq / n)
    with np.errstate(divide="ignore", invalid="ignore"):
        ly = np.log10(flucts)
    lx = np.log10(intervals.astype(np.float64))
    lxc = lx - lx.mean()
    denom = float((lxc * lxc).sum())
    alpha = (ly @ lxc) / denom - 0.0  # slope of least-squares line (per row)
    # rows with any non-finite fluct -> NaN (matches scalar kernel pin)
    bad = ~np.isfinite(ly).all(axis=1)
    alpha[bad] = np.nan
    return alpha


def lomb_batch(
    x: np.ndarray,
    sample_rate: float = 50.0,
    fmin: float = 0.5,
    fmax: float = 20.0,
    ofac: int = 4,
) -> tuple[np.ndarray, np.ndarray]:
    """(dfc, dfc_amp) for each row of an (m, n) matrix sampled on the regular
    grid t = arange(n)/sample_rate — grid/tau/design matrices shared across
    rows, periodogram = two matmuls."""
    x = np.asarray(x, dtype=np.float64)
    m, n = x.shape
    if n < 2:
        return np.full(m, np.nan), np.full(m, np.nan)
    t = np.arange(n, dtype=np.float64) / sample_rate
    span = t[-1] - t[0]
    if span <= 0:
        return np.full(m, np.nan), np.full(m, np.nan)
    df = 1.0 / (ofac * span)
    freqs = np.arange(df, fmax + 0.5 * df, df)
    keep = freqs > fmin
    if not keep.any():
        return np.full(m, np.nan), np.full(m, np.nan)

    w = 2.0 * np.pi * freqs[:, None]  # (nf, 1)
    wt = w * t[None, :]  # (nf, n)
    tau = np.arctan2(np.sin(2 * wt).sum(axis=1), np.cos(2 * wt).sum(axis=1)) / (2.0 * w[:, 0])
    arg = wt - (w[:, 0] * tau)[:, None]
    c = np.cos(arg)  # (nf, n)
    s = np.sin(arg)
    cc = (c * c).sum(axis=1)  # (nf,)
    ss = (s * s).sum(axis=1)
    ss_safe = np.where(ss > 0, ss, 1.0)

    xc = x - x.mean(axis=1, keepdims=True)  # (m, n)
    var = x.var(axis=1, ddof=1)  # (m,)
    xcc = xc @ c.T  # (m, nf)  BLAS
    xcs = xc @ s.T
    power = (xcc * xcc) / cc[None, :] + np.where(
        ss[None, :] > 0, (xcs * xcs) / ss_safe[None, :], 0.0
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        power = power / (2.0 * var[:, None])

    fk = freqs[keep]
    pk = power[:, keep]
    imax = np.argmax(pk, axis=1)
    dfc = fk[imax]
    amp = pk[np.arange(m), imax]
    zero_var = var <= 0
    # constant rows: scalar kernel returns zero power -> argmax = first kept freq
    dfc = np.where(zero_var, fk[0], dfc)
    amp = np.where(zero_var, 0.0, amp)
    return dfc, amp
