"""Metrics (A6-A10) vs hand-computed values and statistical sanity."""

from __future__ import annotations

import numpy as np
import pytest

from mpds_ray.functions.metrics import (
    auc,
    bootstrap_ci,
    paired_t_test,
    precision_recall_f1,
    roc_curve,
    score_histogram_lift,
    sign_agreement_accuracy,
    two_sample_t_test,
)

rng = np.random.default_rng(42)


def test_sign_agreement():
    assert sign_agreement_accuracy([1.0, -2.0, 0.0, 3.0]) == pytest.approx(0.75)


def test_auc_perfect_and_random():
    labels = np.r_[np.ones(50), np.zeros(50)]
    scores = np.r_[np.linspace(1, 2, 50), np.linspace(-1, 0, 50)]
    assert auc(labels, scores) == pytest.approx(1.0)
    assert auc(labels, rng.normal(size=100)) == pytest.approx(0.5, abs=0.2)


def test_auc_equals_rank_statistic():
    labels = rng.random(500) < 0.3
    scores = rng.normal(size=500) + labels
    # Mann-Whitney U / (n_pos * n_neg)
    pos = scores[labels]
    neg = scores[~labels]
    u = (pos[:, None] > neg[None, :]).sum() + 0.5 * (pos[:, None] == neg[None, :]).sum()
    assert auc(labels, scores) == pytest.approx(u / (pos.size * neg.size), abs=1e-9)


def test_roc_monotone():
    labels = rng.random(200) < 0.4
    scores = rng.normal(size=200)
    fpr, tpr, thr = roc_curve(labels, scores)
    assert np.all(np.diff(fpr) >= 0) and np.all(np.diff(tpr) >= 0)
    assert fpr[0] == 0 and tpr[0] == 0 and fpr[-1] == 1 and tpr[-1] == 1


def test_precision_recall():
    labels = np.array([1, 1, 0, 0])
    scores = np.array([0.9, 0.4, 0.8, 0.1])
    p, r, f1 = precision_recall_f1(labels, scores, threshold=0.5)
    assert p == pytest.approx(0.5) and r == pytest.approx(0.5) and f1 == pytest.approx(0.5)


def test_bootstrap_ci_contains_mean():
    v = rng.normal(10.0, 2.0, 200)
    lo, hi = bootstrap_ci(v, n_boot=2000)
    assert lo < v.mean() < hi
    assert hi - lo < 1.5
    # deterministic
    assert bootstrap_ci(v, n_boot=500) == bootstrap_ci(v, n_boot=500)


def test_t_tests_pvalues():
    a = rng.normal(0, 1, 100)
    t0, p0 = paired_t_test(a, a + rng.normal(0, 0.01, 100))
    assert 0 <= p0 <= 1
    t1, p1 = two_sample_t_test(rng.normal(0, 1, 200), rng.normal(1.0, 1, 200))
    assert p1 < 1e-6 and t1 < 0
    # symmetric null: p near uniform-ish, just sanity bound
    _, p2 = two_sample_t_test(rng.normal(0, 1, 200), rng.normal(0, 1, 200))
    assert p2 > 0.001


def test_t_sf_against_known_values():
    # t=2.0, df=10 -> two-sided p ~ 0.0734 (tables)
    _, p = two_sample_known(2.0, 10)
    assert p == pytest.approx(0.0734, abs=0.002)


def two_sample_known(t, df):
    from mpds_ray.functions.metrics import _t_sf

    return t, _t_sf(t, df) * 2


def test_lift_top_bins():
    labels = rng.random(5000) < 0.2
    scores = rng.normal(size=5000) + 2.0 * labels
    out = score_histogram_lift(labels, scores, n_bins=100)
    # top-score bins should show lift >> 1
    first_valid = out["lift"][~np.isnan(out["lift"])]
    assert first_valid[0] > 2.0
    # full-population lift == 1
    assert first_valid[-1] == pytest.approx(1.0, abs=1e-9)
