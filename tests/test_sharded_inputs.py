"""The exchange-routed queries must behave identically when a table is a
DIRECTORY of parquet shards (the 100-TB layout) rather than one file."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def sharded_dir(tmp_path):
    """Copy sf0.001 testdata, splitting events + documents into 3 shards."""
    import shutil

    src = "/root/testdata/sf0.001"
    for name in os.listdir(src):
        if name in ("events.parquet", "documents.parquet",
                    "lineitem.parquet", "orders.parquet"):
            t = pq.read_table(f"{src}/{name}")
            d = tmp_path / name
            os.makedirs(d)
            per = (t.num_rows + 2) // 3
            for i in range(3):
                piece = t.slice(i * per, per)
                if piece.num_rows:
                    pq.write_table(piece, d / f"part-{i}.parquet")
        else:
            shutil.copy(f"{src}/{name}", tmp_path / name)
    return str(tmp_path)


def _canon(res) -> pd.DataFrame:
    df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize(
    "name",
    ["sessionize_user_events", "locf_last_purchase", "cumulative_user_value",
     "dedup_exact", "first_event_per_user"],
)
def test_sharded_equals_single_file(ray_session, sharded_dir, name):
    import __ray_entry__ as entrymod

    q = entrymod.queries()[name]
    got = _canon(q(sharded_dir))
    want = _canon(q("/root/testdata/sf0.001"))
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.parametrize(
    "name",
    ["large_order_customers", "returned_item_revenue", "nation_pair_trade",
     "priority_ship_lag_counts", "late_order_priority_counts",
     "customer_order_distribution", "monthly_order_revenue",
     "dedup_passages", "unigram_logprob"],
)
def test_sharded_join_queries_equal_single_file(ray_session, sharded_dir, name):
    """The round-3 exchange-join / two-pass queries over sharded lineitem,
    orders and documents directories (the 100-TB layout)."""
    import __ray_entry__ as entrymod

    q = entrymod.queries()[name]
    got = _canon(q(sharded_dir))
    want = _canon(q("/root/testdata/sf0.001"))
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.parametrize(
    "name",
    ["repeated_ngram_stats", "similar_pairs_exact", "segment_urgent_coverage",
     "group_uniform_sample", "user_feature_matrix",
     "approx_distinct_users_by_type"],
)
def test_sharded_r4_queries_equal_single_file(ray_session, sharded_dir, name):
    """Round-4 operators: k-gram windows must not leak across shard
    boundaries, prefix-filter candidates must dedupe across shards, the
    LEFT join and hash-rank sample must merge shard partials exactly."""
    import __ray_entry__ as entrymod

    q = entrymod.queries()[name]
    got = _canon(q(sharded_dir))
    want = _canon(q("/root/testdata/sf0.001"))
    pd.testing.assert_frame_equal(got, want)
