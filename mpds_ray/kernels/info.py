"""Binned mutual-information kernels (reference feature_extraction/mi/).

``mi(A, B, L=256)`` follows mi/mi.m:16-41 + mi/hist2.m:14-33: scale both
signals to integer bins 0..L-1 with ``round((v-min)*(L-1)/(max-min+eps))``,
build the LxL joint histogram, and sum ``pab*log2(pab/(pa*pb))`` over the
support ``pab>1e-12 & pa*pb>1e-12``.

Pinned deviation from MATLAB (documented): the reference computes marginals
with MATLAB ``hist`` (center-based binning) while the joint uses the hist2
scaling above — two inconsistent binnings. We pin the self-consistent
definition: marginals = row/column sums of the joint histogram. This is the
mathematically standard MI and the oracle definition for conformance.

The joint/conditional/normalized variants mirror InfoTheory/{jointEntropy,
conditionalEntropy,nmi,nvi}.m (value-count based, not binned — they operate on
already-discrete signals like the entropy kernel).
"""

from __future__ import annotations

import numpy as np

from .stats import EPS, entropy


def _bin_index(v: np.ndarray, L: int) -> np.ndarray:
    lo = v.min()
    hi = v.max()
    return np.round((v - lo) * (L - 1) / (hi - lo + EPS)).astype(np.int64)


def mi(a, b, L: int = 256) -> float:
    """Binned mutual information of two equal-length signals (mi/mi.m)."""
    a = np.asarray(a, dtype=np.float64).ravel()
    b = np.asarray(b, dtype=np.float64).ravel()
    if a.size != b.size:
        raise ValueError("mi: inputs must have equal length")
    if a.size == 0:
        return float("nan")
    ai = _bin_index(a, L)
    bi = _bin_index(b, L)
    joint = np.bincount(ai * L + bi, minlength=L * L).astype(np.float64)
    joint /= joint.sum()
    joint = joint.reshape(L, L)
    pa = joint.sum(axis=1)
    pb = joint.sum(axis=0)
    papb = np.outer(pa, pb)
    mask = (joint > 1e-12) & (papb > 1e-12)
    return float(np.sum(joint[mask] * np.log2(joint[mask] / papb[mask])))


def cross_entropy_feature(a, b) -> float:
    """The reference's 'xEn' cross feature (extractAccelTestV2.m:118-119):
    ``entropy(a) + relativeEntropy(round(a*10000), round(b*10000))``."""
    from .stats import relative_entropy

    a = np.asarray(a, dtype=np.float64).ravel()
    b = np.asarray(b, dtype=np.float64).ravel()
    return entropy(a) + relative_entropy(np.round(a * 10000.0), np.round(b * 10000.0))


def corrcoef_pair(a, b) -> float:
    """Pearson correlation, off-diagonal of ``corrcoef`` (extractAccelTestV2.m:115)."""
    a = np.asarray(a, dtype=np.float64).ravel()
    b = np.asarray(b, dtype=np.float64).ravel()
    if a.size < 2:
        return float("nan")
    sa = a.std()
    sb = b.std()
    if sa == 0 or sb == 0:
        return float("nan")
    return float(np.corrcoef(a, b)[0, 1])


def joint_entropy(x, y) -> float:
    """H(x,y) over unique value pairs (InfoTheory/jointEntropy.m semantics)."""
    x = np.asarray(x).ravel()
    y = np.asarray(y).ravel()
    pairs = np.stack([x, y], axis=1)
    _, counts = np.unique(pairs, axis=0, return_counts=True)
    p = counts / x.size
    return float(-np.dot(p, np.log2(p + EPS)))


def conditional_entropy(x, y) -> float:
    """H(x|y) = H(x,y) - H(y) (InfoTheory/conditionalEntropy.m semantics)."""
    return joint_entropy(x, y) - entropy(np.asarray(y, dtype=np.float64))


def nmi(x, y) -> float:
    """Normalized MI = I(x;y)/sqrt(H(x)H(y)) over discrete values."""
    hx = entropy(np.asarray(x, dtype=np.float64))
    hy = entropy(np.asarray(y, dtype=np.float64))
    i = hx + hy - joint_entropy(x, y)
    denom = np.sqrt(hx * hy)
    return float(i / denom) if denom > 0 else float("nan")


def nvi(x, y) -> float:
    """Normalized variation of information = 1 - I(x;y)/H(x,y)."""
    hxy = joint_entropy(x, y)
    hx = entropy(np.asarray(x, dtype=np.float64))
    hy = entropy(np.asarray(y, dtype=np.float64))
    i = hx + hy - hxy
    return float(1.0 - i / hxy) if hxy > 0 else float("nan")
