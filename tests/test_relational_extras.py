"""Grouped exact-moment correlation, ROLLUP subtotals, LWW compaction."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq


def test_corr_matches_numpy(ray_session, sf_dir):
    from mpds_ray.pipelines.relational import lineitem_corr_by_flag

    got = lineitem_corr_by_flag(sf_dir)
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_discount"],
    ).to_pandas()
    for _, row in got.iterrows():
        sub = li[li.l_returnflag == row.l_returnflag]
        exp = np.corrcoef(sub.l_quantity, np.rint(sub.l_discount * 100))[0, 1]
        assert abs(row.qty_disc_corr - exp) < 1e-9, (row.l_returnflag, exp)


def test_rollup_levels_consistent(ray_session, sf_dir):
    from mpds_ray.pipelines.relational import rollup_sales_by_flag_status

    out = rollup_sales_by_flag_status(sf_dir)
    fine = out[(out.l_returnflag != "ALL") & (out.l_linestatus != "ALL")]
    lvl1 = out[(out.l_returnflag != "ALL") & (out.l_linestatus == "ALL")]
    total = out[(out.l_returnflag == "ALL") & (out.l_linestatus == "ALL")]
    assert len(total) == 1
    # int-cents revenue is order-free: levels must agree exactly
    assert fine.n_rows.sum() == total.n_rows.iloc[0]
    assert abs(fine.revenue.sum() - total.revenue.iloc[0]) < 1e-6
    for flag, grp in fine.groupby("l_returnflag"):
        sub = lvl1[lvl1.l_returnflag == flag]
        assert sub.n_rows.iloc[0] == grp.n_rows.sum()
        assert abs(sub.revenue.iloc[0] - grp.revenue.sum()) < 1e-6


def test_latest_event_is_argmax(ray_session, sf_dir):
    from mpds_ray.pipelines.eventspipe import latest_event_per_user_type

    got = latest_event_per_user_type(sf_dir)
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    ev["ts"] = ev.ts.astype("int64") / 1e6
    exp = (
        ev.sort_values(["user_id", "event_type", "ts", "event_id"])
        .groupby(["user_id", "event_type"], as_index=False)
        .tail(1)
        .sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got.last_event_id.to_numpy() == exp.event_id.to_numpy()).all()
    assert np.allclose(got.last_value.to_numpy(), exp.value.to_numpy())
    # no (user, type) key appears twice — it's a compaction
    assert not got.duplicated(["user_id", "event_type"]).any()


def test_latest_event_tie_break(ray_session, tmp_path, monkeypatch):
    # two events with IDENTICAL ts: the larger event_id must win
    import pyarrow as pa

    from mpds_ray.pipelines.eventspipe import latest_event_per_user_type

    d = tmp_path / "sf"
    d.mkdir()
    ts = pd.Timestamp("2024-01-01").value // 1000
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([5, 2], pa.int64()),
                "ts": pa.array([ts, ts], pa.timestamp("us")),
                "user_id": pa.array([1, 1], pa.int64()),
                "event_type": ["click", "click"],
                "value": [1.0, 2.0],
                "props": ["{}", "{}"],
            }
        ),
        d / "events.parquet",
    )
    got = latest_event_per_user_type(str(d))
    assert len(got) == 1 and got.last_event_id.iloc[0] == 5
