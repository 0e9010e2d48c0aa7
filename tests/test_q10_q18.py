"""Q18-shape (aggregate-HAVING-join top-k) and Q10-shape (returned-item
revenue per customer) pipelines:

- both match DuckDB at sf0.001 across bucket counts (so tie-aware per-bucket
  partial top-k is exercised with qualifying rows straddling buckets)
- an unreachable HAVING threshold yields the empty frame with the stable
  output schema (driver smoke-check contract)
"""

from __future__ import annotations

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["customer", "orders", "lineitem", "nation"]


def _duck(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.execute(sql).df()


@pytest.mark.parametrize("num_buckets", [1, 4, 16])
def test_large_order_customers_matches_duckdb(ray_session, num_buckets):
    from mpds_ray.pipelines.relational import Q18_SQL, large_order_customers

    got = large_order_customers(SF, num_buckets=num_buckets)
    exp = _duck(Q18_SQL)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True)
    )


def test_large_order_customers_empty_threshold(ray_session):
    from mpds_ray.pipelines.relational import large_order_customers

    got = large_order_customers(SF, min_qty=1e9, num_buckets=4)
    assert len(got) == 0
    assert list(got.columns) == ["c_name", "o_orderkey", "o_totalprice", "sum_qty"]


@pytest.mark.parametrize("num_buckets", [1, 4, 16])
def test_returned_item_revenue_matches_duckdb(ray_session, num_buckets):
    from mpds_ray.pipelines.relational import Q10_SQL, returned_item_revenue

    got = returned_item_revenue(SF, num_buckets=num_buckets)
    exp = _duck(Q10_SQL)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True)
    )


@pytest.mark.parametrize("num_buckets", [1, 8])
def test_priority_ship_lag_matches_duckdb(ray_session, num_buckets):
    from mpds_ray.pipelines.relational import Q12_SQL, priority_ship_lag_counts

    got = priority_ship_lag_counts(SF, num_buckets=num_buckets)
    exp = _duck(Q12_SQL)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True)
    )


@pytest.mark.parametrize("num_buckets", [1, 8])
def test_late_order_priority_matches_duckdb(ray_session, num_buckets):
    from mpds_ray.pipelines.relational import Q4_SQL, late_order_priority_counts

    got = late_order_priority_counts(SF, num_buckets=num_buckets)
    exp = _duck(Q4_SQL)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True)
    )


@pytest.mark.parametrize("num_buckets", [1, 8])
def test_rich_customers_without_orders_matches_duckdb(ray_session, num_buckets):
    """Includes the empty-orders-bucket anti-join edge at num_buckets=8 (the
    1999+ order subset leaves some buckets without orders rows; those
    buckets must KEEP their customers)."""
    from mpds_ray.pipelines.relational import (
        Q22_SQL,
        rich_customers_without_orders,
    )

    got = rich_customers_without_orders(SF, num_buckets=num_buckets)
    exp = _duck(Q22_SQL)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True)
    )


@pytest.mark.parametrize("num_buckets", [1, 8])
def test_customer_order_distribution_matches_duckdb(ray_session, num_buckets):
    from mpds_ray.pipelines.relational import Q13_SQL, customer_order_distribution

    got = customer_order_distribution(SF, num_buckets=num_buckets)
    exp = _duck(Q13_SQL)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True)
    )


def test_monthly_revenue_cumshare_matches_duckdb(ray_session):
    from mpds_ray.pipelines.relational import CUMSHARE_SQL, monthly_revenue_cumshare

    got = monthly_revenue_cumshare(SF, num_buckets=4)
    exp = _duck(CUMSHARE_SQL)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True)
    )
    assert got.cum_share.iloc[-1] == 1.0
    assert got.cum_share.is_monotonic_increasing
