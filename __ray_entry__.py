"""Driver contract for the mpds_ray engine (Ray Data target).

``entry()`` runs the flagship pipeline (tokenize -> windowed token stats ->
entity-complete shuffle -> sessionize/lag/as-of/backfill) on sf0.001.
``queries()`` exposes the operator surface of SURVEY.md §2 (relational,
longitudinal/events, text/dedup, embedding ANN); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible entry (identical column
names and float rounding). Ray is initialised by the caller — nothing here
calls ``ray.init()``/``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship on sf0.001: documents -> tokens table -> windowed stats ->
    sessionize -> as-of join to synthetic score timestamps -> backfill."""
    import pyarrow as pa
    import ray.data as rd

    from mpds_ray.pipelines.flagship import flagship_features
    from mpds_ray.tokenize import tokenize_batch

    sf_dir = "/root/testdata/sf0.001"
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "source"])

    def to_tokens(batch: pa.Table) -> pa.Table:
        t = tokenize_batch(batch)
        # deterministic irregular event-time per row (doc_id is unique here)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        import numpy as np

        ts = (ids.astype(np.int64) * 9973) % 1_000_000
        return t.append_column("ts", pa.array(ts, type=pa.int64()))

    tokens = docs.map_batches(to_tokens, batch_format="pyarrow")
    # entity = source (few entities, many rows each -> exercises sessions);
    # synthesize deterministic score timestamps per source entity
    import numpy as np

    rng = np.random.default_rng(7)
    srcs = [f"src{i}" for i in range(20)]
    scores = rd.from_arrow(
        pa.table(
            {
                "source": pa.array(np.repeat(srcs, 5)),
                "ts": pa.array(rng.integers(0, 1_000_000, 100, dtype=np.int64)),
                "score": pa.array(rng.normal(50, 15, 100)),
            }
        )
    )
    return flagship_features(
        tokens, scores, entity="source", ts="ts",
        session_gap=50_000.0, tolerance=None, num_buckets=8,
    )


# Names that already carry a green driver CORRECTNESS row (rounds 1-3).
# The driver gate truncates at the first 50 enumerated queries, so entries
# NOT in this set are enumerated first to rotate fresh surface into the gate
# each round (VERDICT r3 top item).
_GATED_BEFORE_R4 = frozenset({
    "monthly_order_revenue", "monthly_revenue_cumshare",
    "urgent_order_month_revenue", "q1_pricing_summary", "q3_top_orders",
    "q5_region_nation_revenue", "large_order_customers",
    "returned_item_revenue", "nation_pair_trade", "priority_ship_lag_counts",
    "late_order_priority_counts", "rich_customers_without_orders",
    "customer_order_distribution", "lineitem_corr_by_flag",
    "rollup_sales_by_flag_status", "cube_sales_by_flag_status",
    "part_type_revenue_share", "small_quantity_revenue",
    "customers_per_region", "top_customers_by_max_order",
    "distinct_segments", "event_type_counts", "value_quantiles",
    "value_median_exact", "grouped_value_quantiles",
    "customers_without_orders", "building_order_stats", "mpds_scaled_orders",
    "kfold_counts", "user_event_pivot", "value_histogram",
    "value_quartile_label", "approx_distinct_users", "props_json_stats",
    "top_users_per_event_type", "sessionize_user_events", "session_funnel",
    "user_value_lag_lead", "user_mode_event_type", "user_value_percent_rank",
    "user_time_weighted_value", "user_value_ewma", "event_type_user_reach",
    "event_type_cooccurrence", "user_value_dense_rank",
    "user_retention_cohorts", "hourly_user_value_grid",
    "signup_view_purchase_funnel", "user_median_gap", "session_bounce_rate",
})


def queries() -> dict[str, Callable[[str], Any]]:
    from mpds_ray.pipelines import (
        dssl_pipe, eventspipe, flagship, knn, media, relational, text,
        traindata,
    )

    merged: dict[str, Callable[[str], Any]] = {}
    merged.update(flagship.QUERIES)
    merged.update(text.QUERIES)
    merged.update(knn.QUERIES)
    merged.update(dssl_pipe.QUERIES)
    merged.update(media.QUERIES)
    merged.update(traindata.QUERIES)
    merged.update(eventspipe.QUERIES)
    merged.update(relational.QUERIES)

    # operators NEW this round lead (they have no verification history at
    # all), then the rest of the never-gated surface, then rounds-1-3 green
    # rows — the driver gate truncates at 50 enumerated queries
    new_this_round = (
        "repeated_ngram_stats", "similar_pairs_exact", "video_frame_features",
        "segment_urgent_coverage", "group_uniform_sample", "user_feature_matrix",
        "approx_distinct_users_by_type",
    )
    out: dict[str, Callable[[str], Any]] = {}
    for name in new_this_round:
        if name in merged:
            out[name] = merged[name]
    for name, fn in merged.items():          # never-gated surface next
        if name not in _GATED_BEFORE_R4 and name not in out:
            out[name] = fn
    for name, fn in merged.items():          # rounds-1-3 green rows last
        if name in _GATED_BEFORE_R4 and name not in out:
            out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    from mpds_ray.oracle.golden import golden_oracles
    from mpds_ray.pipelines import (
        eventspipe, flagship, knn, relational, text, traindata,
    )

    out: dict[str, str] = {}
    out.update(flagship.ORACLE)
    out.update(relational.ORACLE)
    out.update(eventspipe.ORACLE)
    out.update(text.ORACLE)
    out.update(knn.ORACLE)
    out.update(traindata.ORACLE)
    # non-SQL-expressible sketches/ML: committed golden-parquet regression
    # oracles (see mpds_ray/oracle/golden.py for what they do and don't prove)
    out.update(golden_oracles())
    return out
