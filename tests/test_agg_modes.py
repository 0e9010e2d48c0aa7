"""partial_groupby_sum: driver-final (bounded-key combiner root) and
dataset-final (distributed) must agree exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd


def test_driver_and_dataset_final_agree(ray_session):
    import ray.data as rd

    from mpds_ray.pipelines.common import partial_groupby_sum

    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c", "d"], 20_000),
            "k2": rng.integers(0, 3, 20_000),
            "v": rng.normal(10, 2, 20_000),
            "w": rng.uniform(size=20_000),
        }
    )
    ds = rd.from_pandas(df).repartition(6)

    def canon(res):
        out = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        out = out[sorted(out.columns)].sort_values(["k", "k2"]).reset_index(drop=True)
        return out

    a = canon(
        partial_groupby_sum(ds, ["k", "k2"], {"v": "sum_v", "w": "sum_w"},
                            count_as="n", final="driver").to_pandas()
    )
    b = canon(
        partial_groupby_sum(ds, ["k", "k2"], {"v": "sum_v", "w": "sum_w"},
                            count_as="n", final="dataset").to_pandas()
    )
    assert a["n"].sum() == len(df)
    pd.testing.assert_series_equal(a["n"], b["n"])
    np.testing.assert_allclose(a["sum_v"], b["sum_v"], rtol=1e-12)
    np.testing.assert_allclose(a["sum_w"], b["sum_w"], rtol=1e-12)
    # pandas ground truth
    want = df.groupby(["k", "k2"], as_index=False).agg(
        sum_v=("v", "sum"), sum_w=("w", "sum"), n=("v", "size")
    )
    want = want[sorted(want.columns)].sort_values(["k", "k2"]).reset_index(drop=True)
    np.testing.assert_allclose(a["sum_v"], want["sum_v"], rtol=1e-12)
    assert (a["n"].to_numpy() == want["n"].to_numpy()).all()
