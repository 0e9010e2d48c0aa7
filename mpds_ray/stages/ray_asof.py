"""Distributed as-of join over ray.data.Datasets (flagship operator J4).

Plan: tag each side, project to a common schema, co-partition by
``stable_bucket(entity) % B`` (ONE shuffle moves both sides), then per bucket
run the vectorized sorted merge (stages.asof). Small right sides skip the
shuffle entirely: broadcast via ``ray.put`` and merge inside ``map_batches``
(the reference's J2/J3 broadcast-lookup shape).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .asof import asof_join_arrays
from .partition import add_bucket_column

_SIDE = "_asof_side"
_BUCKET = "_bucket"


def _merge_group(
    g: pd.DataFrame,
    entity: str,
    ts: str,
    value_cols: list[str],
    tolerance: float | None,
    direction: str,
    left_cols: list[str],
) -> pd.DataFrame:
    left = g[g[_SIDE] == 0]
    right = g[g[_SIDE] == 1]
    left = left.sort_values([entity, ts], kind="mergesort")
    out = left[left_cols].reset_index(drop=True)
    if len(right) == 0:
        for c in value_cols:
            out[c] = np.nan
        out["_matched_ts"] = np.nan
        return out
    right = right.sort_values([entity, ts], kind="mergesort")
    joined = asof_join_arrays(
        out[entity].to_numpy(),
        out[ts].to_numpy(),
        right[entity].to_numpy(),
        right[ts].to_numpy(),
        {c: right[c].to_numpy() for c in value_cols},
        tolerance=tolerance,
        direction=direction,
    )
    for c in value_cols:
        out[c] = joined[c]
    out["_matched_ts"] = joined["_matched_ts"]
    return out


def asof_join(
    left,
    right,
    entity: str = "doc_id",
    ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance: float | None = None,
    direction: str = "backward",
    num_buckets: int = 64,
):
    """Co-partitioned sort-merge as-of join of two Datasets.

    Returns the left columns + right ``value_cols`` (NaN where unmatched) +
    ``_matched_ts``. Both sides may be unsorted; sorting happens per bucket.
    """
    left_schema = left.schema()
    right_schema = right.schema()
    left_cols = list(left_schema.names)
    if value_cols is None:
        value_cols = [c for c in right_schema.names if c not in (entity, ts)]
    all_cols = left_cols + [c for c in value_cols if c not in left_cols]
    # ray.data.Schema exposes parallel .names/.types (Arrow DataType values)
    type_map = dict(zip(left_schema.names, left_schema.types))
    for n, t in zip(right_schema.names, right_schema.types):
        type_map.setdefault(n, t)

    def _tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            t = add_bucket_column(t, entity, num_buckets, _BUCKET)
            t = t.append_column(_SIDE, pa.array(np.full(t.num_rows, side, dtype=np.int8)))
            # project to the union schema (missing columns -> nulls)
            cols = {}
            for c in all_cols + [_BUCKET, _SIDE]:
                if c in t.column_names:
                    cols[c] = t[c]
                else:
                    cols[c] = pa.nulls(t.num_rows, type=type_map.get(c, pa.float64()))
            return pa.table(cols)

        return fn

    tagged = left.map_batches(_tag(0), batch_format="pyarrow").union(
        right.map_batches(_tag(1), batch_format="pyarrow")
    )
    return tagged.groupby(_BUCKET).map_groups(
        lambda g: _merge_group(g, entity, ts, value_cols, tolerance, direction, left_cols),
        batch_format="pandas",
    )


class BroadcastAsof:
    """Actor-pool as-of stage for a SMALL right side: the right table is
    ``ray.put`` once on the driver; each actor fetches it in ``__init__``
    (one object-store read per actor, zero per-batch shipping) and merges
    every batch locally — no shuffle at all (SURVEY J2/J3 broadcast shape)."""

    def __init__(
        self,
        right_ref,
        entity: str = "doc_id",
        ts: str = "ts",
        tolerance: float | None = None,
        direction: str = "backward",
    ):
        right: pd.DataFrame = ray.get(right_ref) if isinstance(right_ref, ray.ObjectRef) else right_ref
        self.right = right.sort_values([entity, ts], kind="mergesort")
        self.entity = entity
        self.ts = ts
        self.value_cols = [c for c in right.columns if c not in (entity, ts)]
        self.tolerance = tolerance
        self.direction = direction

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((batch[self.ts].to_numpy(), batch[self.entity].to_numpy()))
        left = batch.iloc[order].reset_index(drop=True)
        joined = asof_join_arrays(
            left[self.entity].to_numpy(),
            left[self.ts].to_numpy(),
            self.right[self.entity].to_numpy(),
            self.right[self.ts].to_numpy(),
            {c: self.right[c].to_numpy() for c in self.value_cols},
            tolerance=self.tolerance,
            direction=self.direction,
        )
        for c in self.value_cols:
            left[c] = joined[c]
        left["_matched_ts"] = joined["_matched_ts"]
        return left
