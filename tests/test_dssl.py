"""DSSL trainer: objective/gradient correctness (finite differences), pair
constructions, learning sanity (recovers a planted ranking direction), and
the end-to-end events pipeline."""

from __future__ import annotations

import numpy as np
import pytest

from mpds_ray.functions.dssl import (
    calculate_diff_matrix,
    dssl_objective,
    huber_ramp,
    make_order_pairs,
    make_smoothness_pairs,
    subsample_pairs,
    train_dssl_linear,
)

rng = np.random.default_rng(42)


class TestObjective:
    def test_huber_zones(self):
        m = np.array([-2.0, 0.0, 0.5, 2.0])
        out = huber_ramp(m, h=0.5)
        # zone1: 0; zone2 center: (0+.5)^2/2 = 0.125; boundary h: (1)^2/2=0.5; zone3: m
        np.testing.assert_allclose(out, [0.0, 0.125, 0.5, 2.0])

    def test_gradient_matches_finite_difference(self):
        d = 6
        diff_o = rng.normal(size=(40, d))
        diff_s = rng.normal(size=(25, d))
        dt_s = rng.uniform(0.5, 3.0, 25)
        w = rng.normal(size=d)
        # NB: the smoothness gradient is the reference's (omits a 1/dT),
        # so check ONLY the order+reg parts analytically...
        val, grad = dssl_objective(w, diff_o, np.zeros((0, d)), np.zeros(0), 1.0, 0.5, 2.0, 3.0)
        eps = 1e-6
        fd = np.zeros(d)
        for i in range(d):
            wp = w.copy(); wp[i] += eps
            wm = w.copy(); wm[i] -= eps
            vp, _ = dssl_objective(wp, diff_o, np.zeros((0, d)), np.zeros(0), 1.0, 0.5, 2.0, 3.0)
            vm, _ = dssl_objective(wm, diff_o, np.zeros((0, d)), np.zeros(0), 1.0, 0.5, 2.0, 3.0)
            fd[i] = (vp - vm) / (2 * eps)
        np.testing.assert_allclose(grad, fd, atol=1e-4)
        # ...and that the smoothness term matches the REFERENCE formula
        _, g_full = dssl_objective(w, diff_o, diff_s, dt_s, 1.0, 0.5, 2.0, 3.0)
        rank_s_over_t = (diff_s @ w) / dt_s
        g_s_ref = 2.0 * (diff_s * rank_s_over_t[:, None]).sum(axis=0)
        np.testing.assert_allclose(
            g_full - grad, (3.0 / 25) / 2.0 * g_s_ref, atol=1e-10
        )

    def test_diff_matrix_gather(self):
        data = np.arange(12.0).reshape(4, 3)
        pairs = np.array([[2, 0], [3, 1]])
        np.testing.assert_allclose(calculate_diff_matrix(data, pairs), [[6, 6, 6], [6, 6, 6]])


class TestPairs:
    def test_order_pairs_parity(self):
        p = make_order_pairs(6)
        np.testing.assert_array_equal(p, [[0, 3], [1, 4], [2, 5]])

    def test_smoothness_pairs_same_entity_only(self):
        ids = np.array([1, 1, 1, 2, 2])
        p = make_smoothness_pairs(ids)
        np.testing.assert_array_equal(p, [[1, 0], [2, 1], [4, 3]])

    def test_subsample_deterministic_and_capped(self):
        pairs = np.column_stack([np.arange(1000), np.arange(1000) + 1])
        a = subsample_pairs(pairs, 50, seed=7)
        b = subsample_pairs(pairs, 50, seed=7)
        np.testing.assert_array_equal(a, b)
        assert len(a) == 50
        small = subsample_pairs(pairs[:10], 50)
        assert len(small) == 10


class TestTraining:
    def test_recovers_planted_direction(self):
        # severity = x @ w_true; order pairs always (higher, lower)
        d = 5
        w_true = np.array([2.0, -1.0, 0.5, 0.0, 1.0])
        x = rng.normal(size=(400, d))
        sev = x @ w_true
        order = np.argsort(-sev)
        pairs = np.column_stack([order[:150], order[-150:]])  # high vs low
        diff_o = calculate_diff_matrix(x, pairs)
        w = train_dssl_linear(diff_o, np.zeros((0, d)), np.zeros(0), creg1=100.0, creg2=0.0)
        cos = (w @ w_true) / (np.linalg.norm(w) * np.linalg.norm(w_true))
        assert cos > 0.9
        # pair ordering accuracy on train pairs
        assert np.mean(diff_o @ w >= 0) > 0.95

    def test_deterministic(self):
        d = 4
        x = rng.normal(size=(100, d))
        pairs = np.column_stack([np.arange(50), np.arange(50) + 50])
        diff_o = calculate_diff_matrix(x, pairs)
        w1 = train_dssl_linear(diff_o, np.zeros((0, d)), np.zeros(0))
        w2 = train_dssl_linear(diff_o, np.zeros((0, d)), np.zeros(0))
        np.testing.assert_array_equal(w1, w2)


class TestPipeline:
    def test_events_train_and_score(self, ray_session, sf_dir):
        from mpds_ray.pipelines.dssl_pipe import train_and_score

        res = train_and_score(sf_dir)
        assert res["train_pair_accuracy"] > 0.5  # better than chance on train
        assert len(res["weights"]) == 4
        assert np.isfinite(res["weights"]).all()
        # deterministic end-to-end
        res2 = train_and_score(sf_dir)
        np.testing.assert_array_equal(res["weights"], res2["weights"])

    def test_distributed_scoring_matches_local(self, ray_session, sf_dir):
        """M11: broadcast weight mat-vec inside map_batches == local X @ w."""
        import ray
        import ray.data as rd

        from mpds_ray.pipelines.dssl_pipe import FEATURES, build_design_matrix, zscale

        df = build_design_matrix(sf_dir)
        x, mu, sd = zscale(df[FEATURES].to_numpy(dtype=np.float64))
        w = rng.normal(size=len(FEATURES))
        want = x @ w
        ref = ray.put((mu, sd, w))

        class Scorer:
            def __init__(self, ref):
                self.mu, self.sd, self.w = ray.get(ref)

            def __call__(self, b):
                z = (b[FEATURES].to_numpy(dtype=np.float64) - self.mu) / self.sd
                return {"event_id": b["event_id"].to_numpy(), "score": z @ self.w}

        scored = (
            rd.from_pandas(df)
            .map_batches(Scorer, fn_constructor_kwargs={"ref": ref},
                         batch_format="pandas", concurrency=2)
            .to_pandas()
            .set_index("event_id")["score"]
        )
        got = scored.loc[df["event_id"]].to_numpy()
        np.testing.assert_allclose(got, want, atol=1e-10)
