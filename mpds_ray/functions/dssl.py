"""DSSL linear trainer — disease-severity-score learning plumbing (SURVEY L1).

Faithful NumPy port of the reference objective
(dssFunctionLibrary.R:213-368, trainSmoothDSS_quadSmoothness_diff):

    J(w) = C0/2 ||w||^2 + C1n * sum huber(muO - DO w) + C2n * sum ((DS w)/dT)^2
    C0 = 1/Creg1, C1n = 1/nO, C2n = (Creg2/nS)/Creg1

with the three-zone Huber ramp (0 below -h, quadratic (m+h)^2/(4h) inside
[-h, h], linear m above) and the reference's smoothness gradient
``2 * colSums(DS * (DS w / dT))`` ported as-is (it omits a 1/dT factor
relative to the analytic gradient of the stated penalty — reference
behavior wins).

The optimizer differs (documented): the reference calls R ``nlm``
(quasi-Newton, iterlim 10000); this port uses gradient descent with Armijo
backtracking (the reference's own GBRT line-search scheme,
dssFunctionLibrary.R:640-669) — deterministic and dependency-free. The
training-loop compute is out-of-scope; the dataflow shapes (pair tables,
diff-matrix gathers, partial-sum scoring) are the in-scope surface.
"""

from __future__ import annotations

import numpy as np


def calculate_diff_matrix(data: np.ndarray, pairs: np.ndarray) -> np.ndarray:
    """J1 pair gather: diff[r] = data[on[r]] - data[off[r]]
    (dssFunctionLibrary.R:371-389)."""
    pairs = np.asarray(pairs)
    return data[pairs[:, 0]] - data[pairs[:, 1]]


def huber_ramp(margin: np.ndarray, h: float) -> np.ndarray:
    """Three-zone loss (dssFunctionLibrary.R:230-243)."""
    res = np.zeros_like(margin)
    z3 = margin > h
    z2 = (margin >= -h) & (margin <= h)
    res[z3] = margin[z3]
    res[z2] = (margin[z2] + h) ** 2 / (4 * h)
    return res


def dssl_objective(
    w: np.ndarray,
    diff_o: np.ndarray,
    diff_s: np.ndarray,
    dt_s: np.ndarray,
    mu_o: float,
    h: float,
    creg1: float,
    creg2: float,
) -> tuple[float, np.ndarray]:
    """Value + gradient of the DSSL objective (fgh, :257-350, ord=1)."""
    n_o = diff_o.shape[0]
    n_s = diff_s.shape[0] if diff_s.size else 1
    c0 = 1.0 / creg1
    c1n = (creg1 / n_o) / creg1
    c2n = (creg2 / n_s) / creg1

    rank_o = diff_o @ w
    margin = mu_o - rank_o
    z3 = margin > h
    z2 = (margin >= -h) & (margin <= h)
    penalty_o = huber_ramp(margin, h)

    if diff_s.size:
        rank_s_over_t = (diff_s @ w) / dt_s
        penalty_s = rank_s_over_t**2
    else:
        rank_s_over_t = np.zeros(0)
        penalty_s = np.zeros(0)

    value = c0 * 0.5 * float(w @ w) + c1n * penalty_o.sum() + c2n * penalty_s.sum()

    aux = (margin + h) / (2 * h)
    g_o = -(diff_o[z3].sum(axis=0)) - (diff_o[z2] * aux[z2, None]).sum(axis=0)
    g_s = (
        2.0 * (diff_s * rank_s_over_t[:, None]).sum(axis=0)
        if diff_s.size
        else np.zeros_like(w)
    )
    grad = c0 * w + c1n * g_o + c2n * g_s
    return float(value), grad


def train_dssl_linear(
    diff_o: np.ndarray,
    diff_s: np.ndarray,
    dt_s: np.ndarray,
    mu_o: float = 1.0,
    h: float = 0.5,
    creg1: float = 1.0,
    creg2: float = 1.0,
    max_iter: int = 500,
    tol: float = 1e-8,
) -> np.ndarray:
    """Deterministic GD + Armijo backtracking from w0 = ones
    (reference init, dssFunctionLibrary.R:249)."""
    w = np.ones(diff_o.shape[1])
    val, grad = dssl_objective(w, diff_o, diff_s, dt_s, mu_o, h, creg1, creg2)
    step = 1.0
    for _ in range(max_iter):
        gnorm2 = float(grad @ grad)
        if gnorm2 < tol * tol:
            break
        # Armijo backtracking (reference line-search shape, :640-669)
        step = min(step * 2.0, 1e4)
        while step > 1e-12:
            w_new = w - step * grad
            val_new, grad_new = dssl_objective(
                w_new, diff_o, diff_s, dt_s, mu_o, h, creg1, creg2
            )
            if val_new <= val - 1e-4 * step * gnorm2:
                break
            step *= 0.5
        if step <= 1e-12:
            break
        if abs(val - val_new) <= tol * max(1.0, abs(val)):
            w, val, grad = w_new, val_new, grad_new
            break
        w, val, grad = w_new, val_new, grad_new
    return w


def make_order_pairs(n_rows: int) -> np.ndarray:
    """The mPDS OrderPairs construction: row i (before medication) pairs with
    row i + n/2 (after) — notebook cell 12 / cell 5 parity split."""
    half = n_rows // 2
    return np.column_stack([np.arange(half), np.arange(half) + half])


def make_smoothness_pairs(ids: np.ndarray) -> np.ndarray:
    """Consecutive same-entity rows in (id, ts) order (notebook cell 16)."""
    ids = np.asarray(ids)
    idx = np.arange(len(ids) - 1)
    same = ids[1:] == ids[:-1]
    return np.column_stack([idx[same] + 1, idx[same]])


def subsample_pairs(pairs: np.ndarray, cap: int, seed: int = 42) -> np.ndarray:
    """The reference's 10N-cap pair subsampling (dssFunctionLibrary.R:38-52),
    SEEDED (the reference's unseeded sample() breaks resume determinism —
    SURVEY §4.2): sample 10*cap with replacement, unique, sample cap."""
    if len(pairs) <= cap:
        return pairs
    rng = np.random.default_rng(seed)
    take = rng.integers(0, len(pairs), 10 * cap)
    uniq = np.unique(take)
    if len(uniq) > cap:
        uniq = rng.choice(uniq, cap, replace=False)
    return pairs[np.sort(uniq)]
