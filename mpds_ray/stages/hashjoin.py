"""General two-sided distributed hash equi-join over the explicit exchange.

The join shape q3 (pipelines/relational.py:q3_top_orders) builds inline,
extracted as a reusable operator: both inputs exchange on the SAME key with
the SAME bucket function, and each reduce task joins its co-partitioned
bucket pair. Map fns can pre-aggregate (combiner) so only partials shuffle;
filters push into the parquet scans so filtered rows never leave storage.

    left  shards --map/filter--> bucket by hash(key) --\
                                                        +--> per-bucket join
    right shards --map/filter--> bucket by hash(key) --/

Returns the concatenated per-bucket reduce outputs (callers make the reduce
output SMALL — aggregated partials or top-k — or write it out per bucket;
the concat is a driver root and is bound-checked)."""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .exchange import exchange_map
from .partition import stable_bucket


def exchange_join(
    left_shards: list[str],
    right_shards: list[str],
    key: str,
    reduce_fn: Callable[[int, pa.Table, pa.Table], pd.DataFrame],
    num_buckets: int,
    left_map: Callable[[pa.Table], pa.Table] | None = None,
    right_map: Callable[[pa.Table], pa.Table] | None = None,
    columns_left: list[str] | None = None,
    columns_right: list[str] | None = None,
    filters_left=None,
    filters_right=None,
    driver_row_cap: int = 5_000_000,
) -> pd.DataFrame:
    """Co-partition both sides on ``hash(key) % num_buckets`` and run
    ``reduce_fn(bucket, left_tbl, right_tbl)`` per bucket. ``left_map`` /
    ``right_map`` default to identity — pass combiners to pre-aggregate
    map-side so the exchange moves partials, not rows."""

    def bucket_fn(t: pa.Table) -> np.ndarray:
        return stable_bucket(t[key].to_numpy(zero_copy_only=False), num_buckets)

    ident = lambda t: t  # noqa: E731
    l_refs = exchange_map(
        left_shards, left_map or ident, bucket_fn, num_buckets,
        columns=columns_left, filters=filters_left,
    )
    r_refs = exchange_map(
        right_shards, right_map or ident, bucket_fn, num_buckets,
        columns=columns_right, filters=filters_right,
    )

    @ray.remote
    def join_bucket(b: int, n_left: int, *parts: pa.Table) -> pd.DataFrame:
        lp = [p for p in parts[:n_left] if p.num_rows]
        rp = [p for p in parts[n_left:] if p.num_rows]
        if not lp or not rp:
            return pd.DataFrame()
        return reduce_fn(b, pa.concat_tables(lp), pa.concat_tables(rp))

    out = [
        join_bucket.remote(
            b,
            len(left_shards),
            *[l_refs[s][b] for s in range(len(left_shards))],
            *[r_refs[s][b] for s in range(len(right_shards))],
        )
        for b in range(num_buckets)
    ]
    frames = [f for f in ray.get(out) if len(f)]
    res = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
    if len(res) > driver_row_cap:
        raise RuntimeError(
            f"exchange_join driver root collected {len(res):,} rows "
            f"(> cap {driver_row_cap:,}): make reduce_fn emit aggregated "
            "partials / top-k, or write per-bucket output instead"
        )
    return res
