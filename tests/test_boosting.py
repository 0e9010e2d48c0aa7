"""GBRT-DSSL loop (L3) + sliced scoring (A12): learning sanity, slice-sum
associativity, gradient correctness, and the distributed slice pass."""

from __future__ import annotations

import numpy as np
import pytest

from mpds_ray.functions.boosting import (
    RegressionStump,
    ranking_loss_and_grad,
    score_ensemble,
    slice_ensemble,
    train_gbrt_dssl,
)

rng = np.random.default_rng(42)


class TestStump:
    def test_fits_step_function(self):
        x = rng.uniform(0, 1, (500, 2))
        y = np.where(x[:, 0] > 0.5, 2.0, -1.0)
        t = RegressionStump(max_depth=1).fit(x, y)
        pred = t.predict(x)
        assert np.abs(pred - y).mean() < 0.2

    def test_constant_target(self):
        x = rng.uniform(0, 1, (100, 2))
        t = RegressionStump().fit(x, np.full(100, 3.0))
        np.testing.assert_allclose(t.predict(x), 3.0)


class TestFunctionalGradient:
    def test_grad_matches_finite_difference(self):
        n = 30
        scores = rng.normal(size=n)
        pairs = np.column_stack([rng.integers(0, n, 50), rng.integers(0, n, 50)])
        pairs = pairs[pairs[:, 0] != pairs[:, 1]]
        _, grad = ranking_loss_and_grad(scores, pairs, mu=1.0, h=0.5)
        eps = 1e-6
        for i in rng.choice(n, 5, replace=False):
            sp = scores.copy(); sp[i] += eps
            sm = scores.copy(); sm[i] -= eps
            lp, _ = ranking_loss_and_grad(sp, pairs, 1.0, 0.5)
            lm, _ = ranking_loss_and_grad(sm, pairs, 1.0, 0.5)
            assert grad[i] == pytest.approx((lp - lm) / (2 * eps), abs=1e-5)


class TestBoosting:
    def test_learns_nonlinear_ranking(self):
        # severity is a NONLINEAR function of x -> linear DSSL can't, GBRT can
        x = rng.uniform(-1, 1, (400, 3))
        sev = np.sin(3 * x[:, 0]) + x[:, 1] ** 2
        order = np.argsort(-sev)
        pairs = np.column_stack([order[:150], order[-150:]])
        model = train_gbrt_dssl(x, pairs, max_trees=40)
        assert model["loss_history"][-1] < model["loss_history"][0] * 0.7
        s = model["train_scores"]
        assert np.mean(s[pairs[:, 0]] > s[pairs[:, 1]]) > 0.85

    def test_loss_monotone_nonincreasing(self):
        x = rng.uniform(-1, 1, (200, 2))
        pairs = np.column_stack([rng.integers(0, 200, 300), rng.integers(0, 200, 300)])
        pairs = pairs[pairs[:, 0] != pairs[:, 1]]
        model = train_gbrt_dssl(x, pairs, max_trees=20)
        h = model["loss_history"]
        assert all(b <= a + 1e-12 for a, b in zip(h, h[1:]))


class TestSlicedScoring:
    def test_slice_sum_equals_full(self):
        x = rng.uniform(-1, 1, (300, 3))
        sev = x[:, 0] * x[:, 1]
        order = np.argsort(-sev)
        pairs = np.column_stack([order[:100], order[-100:]])
        model = train_gbrt_dssl(x, pairs, max_trees=12)
        full = score_ensemble(model, x)
        for k in (1, 2, 3, 5):
            parts = [score_ensemble(s, x) for s in slice_ensemble(model, k)]
            np.testing.assert_allclose(np.sum(parts, axis=0), full, atol=1e-12)

    def test_distributed_slice_pass(self, ray_session):
        import pandas as pd
        import ray
        import ray.data as rd

        from mpds_ray.functions.boosting import EnsembleSliceScorer

        x = rng.uniform(-1, 1, (500, 3))
        sev = x[:, 0]
        order = np.argsort(-sev)
        pairs = np.column_stack([order[:150], order[-150:]])
        model = train_gbrt_dssl(x, pairs, max_trees=9)
        full = score_ensemble(model, x)

        df = pd.DataFrame(x, columns=["f0", "f1", "f2"])
        df["row_key"] = np.arange(len(df))
        total = np.zeros(len(df))
        for sl in slice_ensemble(model, 3):  # A12: one actor-pool pass per slice
            ref = ray.put(sl)
            part = (
                rd.from_pandas(df)
                .map_batches(
                    EnsembleSliceScorer,
                    fn_constructor_kwargs={"slice_ref": ref, "feature_cols": ["f0", "f1", "f2"]},
                    batch_format="pandas",
                    concurrency=2,
                )
                .to_pandas()
                .set_index("row_key")["partial_score"]
            )
            total += part.loc[df["row_key"]].to_numpy()
        np.testing.assert_allclose(total, full, atol=1e-10)


class TestOptimalRanks:
    def test_achieves_perfect_pair_order(self):
        from mpds_ray.functions.boosting import optimize_ranks

        n = 100
        order = rng.permutation(n)
        pairs = np.column_stack([order[:40], order[-40:]])
        s = optimize_ranks(n, pairs, max_iter=300)
        assert np.mean(s[pairs[:, 0]] > s[pairs[:, 1]]) == 1.0

    def test_deterministic(self):
        from mpds_ray.functions.boosting import optimize_ranks

        pairs = np.column_stack([np.arange(20), np.arange(20) + 20])
        np.testing.assert_array_equal(
            optimize_ranks(40, pairs), optimize_ranks(40, pairs)
        )


class TestNegativeDownsample:
    def test_ratio_and_determinism(self):
        from mpds_ray.functions.boosting import negative_downsample

        labels = np.r_[np.ones(10), np.zeros(500)]
        keep = negative_downsample(labels, ratio=10, seed=1)
        assert (labels[keep] == 1).sum() == 10
        assert (labels[keep] == 0).sum() == 100
        np.testing.assert_array_equal(keep, negative_downsample(labels, ratio=10, seed=1))

    def test_fewer_negatives_than_cap(self):
        from mpds_ray.functions.boosting import negative_downsample

        labels = np.r_[np.ones(10), np.zeros(5)]
        assert len(negative_downsample(labels, ratio=10)) == 15
