"""L5 logistic + model select, O5 balanced pairs, L2 grid sweep."""

from __future__ import annotations

import os

import numpy as np
import pytest

from mpds_ray.functions.metrics import auc
from mpds_ray.functions.models import (
    balanced_stage_pairs,
    grid_sweep_ray,
    logistic_regression,
    predict_proba,
    select_by_validation_auc,
)

rng = np.random.default_rng(42)


class TestLogistic:
    def test_separable_fit(self):
        x = rng.normal(size=(400, 3))
        w_true = np.array([2.0, -1.0, 0.5])
        y = (x @ w_true + 0.3 * rng.normal(size=400) > 0).astype(float)
        w = logistic_regression(x, y, l2=1e-4)
        assert auc(y, predict_proba(w, x)) > 0.95

    def test_l2_shrinks(self):
        x = rng.normal(size=(200, 2))
        y = (x[:, 0] > 0).astype(float)
        w_small = logistic_regression(x, y, l2=1e-4)
        w_big = logistic_regression(x, y, l2=10.0)
        assert np.linalg.norm(w_big[:-1]) < np.linalg.norm(w_small[:-1])

    def test_model_select_picks_best(self):
        x = rng.normal(size=(600, 4))
        y = (x[:, 0] - x[:, 1] + 0.5 * rng.normal(size=600) > 0).astype(float)
        best = select_by_validation_auc(x[:400], y[:400], x[400:], y[400:])
        assert best["auc"] > 0.8
        assert "l2" in best


class TestBalancedPairs:
    def test_higher_first_and_gap(self):
        ids = np.array([1, 1, 1, 1, 2, 2])
        ht = np.array([0.0, 10.0, 20.0, 30.0, 0.0, 5.0])
        stage = np.array([0, 1, 0, 2, 1, 0])
        p = balanced_stage_pairs(ids, ht, stage, min_ht_gap=0.0)
        # every pair: stage[hi] > stage[lo], same entity
        assert (stage[p[:, 0]] > stage[p[:, 1]]).all()
        assert (ids[p[:, 0]] == ids[p[:, 1]]).all()
        # gap filter removes close pairs
        p2 = balanced_stage_pairs(ids, ht, stage, min_ht_gap=15.0)
        assert (np.abs(ht[p2[:, 0]] - ht[p2[:, 1]]) >= 15.0).all()
        assert len(p2) < len(p)

    def test_seeded_cap(self):
        ids = np.zeros(60, dtype=np.int64)
        ht = np.arange(60, dtype=np.float64)
        stage = np.r_[np.zeros(30), np.ones(30)]
        a = balanced_stage_pairs(ids, ht, stage, per_combo_cap=10, seed=5)
        b = balanced_stage_pairs(ids, ht, stage, per_combo_cap=10, seed=5)
        np.testing.assert_array_equal(a, b)
        assert len(a) == 10


class TestGridSweep:
    def test_sweep_and_checkpoint_resume(self, ray_session, tmp_path):
        ckpt = os.path.join(tmp_path, "sweep.jsonl")
        calls = []

        def train(cfg):
            return {"loss": cfg["lam"] ** 2 + 1}

        configs = [{"lam": l} for l in (0.1, 0.5, 1.0, 2.0)]
        r1 = grid_sweep_ray(configs, train, checkpoint_path=ckpt)
        assert len(r1) == 4
        assert min(r1, key=lambda r: r["loss"])["config"]["lam"] == 0.1
        # resume: all cached, same results, order preserved
        r2 = grid_sweep_ray(configs, train, checkpoint_path=ckpt)
        assert [r["loss"] for r in r2] == [r["loss"] for r in r1]
