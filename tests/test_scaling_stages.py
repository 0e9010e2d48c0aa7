"""Two-pass scaler/imputer stages (M5/M6/M7) vs direct NumPy."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from mpds_ray.stages.scaling import (
    apply_impute,
    apply_robust_scaler,
    fit_center_rescale,
    fit_median_impute,
    fit_robust_scaler,
    mpds_rescale,
)

rng = np.random.default_rng(42)


@pytest.fixture(scope="module")
def num_ds(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {
            "a": rng.normal(10, 3, 5000),
            "b": rng.exponential(2, 5000),
            "c": np.where(rng.random(5000) < 0.3, np.nan, rng.normal(size=5000)),
            "const": np.ones(5000),
        }
    )
    return rd.from_pandas(df), df


class TestRobustScaler:
    def test_params_match_numpy(self, num_ds):
        ds, df = num_ds
        p = fit_robust_scaler(ds, ["a", "b"], quantile_range=(15.0, 85.0))
        assert p["a"]["center"] == pytest.approx(np.percentile(df["a"], 50))
        assert p["a"]["scale"] == pytest.approx(
            np.percentile(df["a"], 85) - np.percentile(df["a"], 15)
        )

    def test_apply_and_mpds(self, num_ds):
        ds, df = num_ds
        p = fit_robust_scaler(ds, ["a"])
        out = apply_robust_scaler(ds, p).to_pandas()
        want = (df["a"] - p["a"]["center"]) / p["a"]["scale"]
        np.testing.assert_allclose(np.sort(out["a_scaled"]), np.sort(want), atol=1e-12)
        m = mpds_rescale(want.to_numpy())
        assert m.min() >= 0 and m.max() <= 100

    def test_zero_range_guard(self, num_ds):
        ds, _ = num_ds
        p = fit_robust_scaler(ds, ["const"])
        assert p["const"]["scale"] == 1.0
        p2 = fit_center_rescale(ds, ["const"])
        assert p2["const"]["scale"] == 1.0


class TestImpute:
    def test_median_defaults_and_overrides(self, num_ds):
        ds, df = num_ds
        d = fit_median_impute(ds, ["c"], overrides={})
        assert d["c"] == pytest.approx(np.nanmedian(df["c"]))
        d2 = fit_median_impute(ds, ["c"], overrides={"c": 99.0})
        assert d2["c"] == 99.0
        out = apply_impute(ds, d).to_pandas()
        assert out["c"].isna().sum() == 0
        filled = out.loc[df["c"].isna().to_numpy(), "c"].to_numpy()
        np.testing.assert_allclose(filled, d["c"])

    def test_all_nan_column_raises(self, ray_session):
        import ray.data as rd

        ds = rd.from_pandas(pd.DataFrame({"x": [np.nan, np.nan]}))
        with pytest.raises(ValueError, match="NaN defaults"):
            fit_median_impute(ds, ["x"])
