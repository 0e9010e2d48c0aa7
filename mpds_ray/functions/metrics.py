"""Evaluation metrics (SURVEY A6-A10) — driver-side NumPy on collected
small results (per-user maxima, pair scores), mirroring the reference's
evaluation path (dssPerformanceEvaluation.R, notebook cell 14/18).
"""

from __future__ import annotations

import numpy as np


def sign_agreement_accuracy(score_diffs: np.ndarray) -> float:
    """SOA accuracy ``mean(diff >= 0)`` over pair score differences
    (notebook cell 14 get_accuracy; dssFunctionLibrary.R:850-852)."""
    d = np.asarray(score_diffs, dtype=np.float64)
    return float(np.mean(d >= 0)) if d.size else float("nan")


def roc_curve(labels: np.ndarray, scores: np.ndarray):
    """ROC points (fpr, tpr, thresholds) — descending-score sweep, ties
    collapsed (the standard construction used by pROC/sklearn)."""
    labels = np.asarray(labels).astype(bool)
    scores = np.asarray(scores, dtype=np.float64)
    order = np.argsort(-scores, kind="mergesort")
    labels = labels[order]
    scores = scores[order]
    distinct = np.r_[np.flatnonzero(np.diff(scores)), labels.size - 1]
    tps = np.cumsum(labels)[distinct]
    fps = (distinct + 1) - tps
    p = labels.sum()
    n = labels.size - p
    tpr = np.r_[0.0, tps / p] if p else np.r_[0.0, np.zeros(distinct.size)]
    fpr = np.r_[0.0, fps / n] if n else np.r_[0.0, np.zeros(distinct.size)]
    thr = np.r_[np.inf, scores[distinct]]
    return fpr, tpr, thr


def auc(labels: np.ndarray, scores: np.ndarray) -> float:
    """Area under the ROC (trapezoid; equals the rank statistic)."""
    fpr, tpr, _ = roc_curve(labels, scores)
    return float(np.trapz(tpr, fpr))


def precision_recall_f1(labels: np.ndarray, scores: np.ndarray, threshold: float):
    labels = np.asarray(labels).astype(bool)
    pred = np.asarray(scores, dtype=np.float64) >= threshold
    tp = int((pred & labels).sum())
    fp = int((pred & ~labels).sum())
    fn = int((~pred & labels).sum())
    prec = tp / (tp + fp) if tp + fp else float("nan")
    rec = tp / (tp + fn) if tp + fn else float("nan")
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else float("nan")
    return prec, rec, f1


def bootstrap_ci(
    values: np.ndarray, n_boot: int = 4000, alpha: float = 0.05, seed: int = 42
) -> tuple[float, float]:
    """Percentile bootstrap CI of the mean (mimicUsefulFunction.R:113-119,
    R=4000), seeded for determinism (reference is unseeded — SURVEY §4.2)."""
    rng = np.random.default_rng(seed)
    v = np.asarray(values, dtype=np.float64)
    means = rng.choice(v, size=(n_boot, v.size), replace=True).mean(axis=1)
    lo, hi = np.percentile(means, [100 * alpha / 2, 100 * (1 - alpha / 2)])
    return float(lo), float(hi)


def paired_t_test(a: np.ndarray, b: np.ndarray) -> tuple[float, float]:
    """Paired t statistic + two-sided p (normal approx for df>30, else exact
    via the regularized incomplete beta) — dssFunctionLibrary.R:1066-1068."""
    d = np.asarray(a, dtype=np.float64) - np.asarray(b, dtype=np.float64)
    n = d.size
    t = d.mean() / (d.std(ddof=1) / np.sqrt(n))
    return float(t), float(_t_sf(abs(t), n - 1) * 2)


def two_sample_t_test(a: np.ndarray, b: np.ndarray) -> tuple[float, float]:
    """Welch's t (unequal variances)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    va, vb = a.var(ddof=1) / a.size, b.var(ddof=1) / b.size
    t = (a.mean() - b.mean()) / np.sqrt(va + vb)
    df = (va + vb) ** 2 / (va**2 / (a.size - 1) + vb**2 / (b.size - 1))
    return float(t), float(_t_sf(abs(t), df) * 2)


def _t_sf(t: float, df: float) -> float:
    """Student-t survival function via the regularized incomplete beta
    (continued-fraction evaluation — no scipy in this environment)."""
    x = df / (df + t * t)
    return 0.5 * _betainc_reg(df / 2.0, 0.5, x)


def _betainc_reg(a: float, b: float, x: float) -> float:
    if x <= 0:
        return 0.0
    if x >= 1:
        return 1.0
    ln_beta = _gammaln(a) + _gammaln(b) - _gammaln(a + b)
    front = np.exp(a * np.log(x) + b * np.log(1 - x) - ln_beta)
    if x < (a + 1) / (a + b + 2):
        return front * _beta_cf(a, b, x) / a
    return 1.0 - front * _beta_cf(b, a, 1 - x) / b


def _beta_cf(a: float, b: float, x: float, max_iter: int = 200, eps: float = 3e-14) -> float:
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < 1e-300:
        d = 1e-300
    d = 1.0 / d
    h = d
    for m in range(1, max_iter + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < 1e-300:
            d = 1e-300
        c = 1.0 + aa / c
        if abs(c) < 1e-300:
            c = 1e-300
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < 1e-300:
            d = 1e-300
        c = 1.0 + aa / c
        if abs(c) < 1e-300:
            c = 1e-300
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    return h


def _gammaln(z: float) -> float:
    """Lanczos log-gamma."""
    g = 7
    coefs = [
        0.99999999999980993, 676.5203681218851, -1259.1392167224028,
        771.32342877765313, -176.61502916214059, 12.507343278686905,
        -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7,
    ]
    if z < 0.5:
        return np.log(np.pi / np.sin(np.pi * z)) - _gammaln(1 - z)
    z -= 1
    x = coefs[0]
    for i in range(1, g + 2):
        x += coefs[i] / (z + i)
    t = z + g + 0.5
    return 0.5 * np.log(2 * np.pi) + (z + 0.5) * np.log(t) - t + np.log(x)


def score_histogram_lift(
    labels: np.ndarray, scores: np.ndarray, n_bins: int = 1000
) -> dict[str, np.ndarray]:
    """Per-class score histograms -> cumulative lift curve
    (dssFunctionLibrary.R:1779-1796): descending-score bins; lift(k) =
    precision within the top-k bins relative to base rate."""
    labels = np.asarray(labels).astype(bool)
    scores = np.asarray(scores, dtype=np.float64)
    edges = np.linspace(scores.min(), scores.max(), n_bins + 1)
    pos, _ = np.histogram(scores[labels], bins=edges)
    allh, _ = np.histogram(scores, bins=edges)
    cum_pos = np.cumsum(pos[::-1])
    cum_all = np.cumsum(allh[::-1])
    base = labels.mean()
    with np.errstate(invalid="ignore", divide="ignore"):
        lift = np.where(cum_all > 0, (cum_pos / np.maximum(cum_all, 1)) / base, np.nan)
    return {"edges": edges, "pos_hist": pos, "all_hist": allh, "lift": lift}
