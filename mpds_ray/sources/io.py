"""Dataset sources/sinks (S1/S2/S3).

- ``read_table``: format-dispatching reader with column pruning and optional
  Arrow row filters pushed to the parquet scan (prune at the read — a read
  that loads all columns for a 2-column transform is wrong at 100 TB).
- ``write_table_resumable``: partitioned parquet sink + lineage manifest
  (wraps mpds_ray.state) — the engine's S2/S3 replacement for the
  reference's ad-hoc CSV/RData outputs.
"""

from __future__ import annotations


def read_table(
    path: str,
    columns: list[str] | None = None,
    filter_expr=None,
    file_format: str | None = None,
):
    import ray.data as rd

    fmt = file_format or path.rsplit(".", 1)[-1].lower()
    if fmt in ("parquet", "pq"):
        kwargs = {}
        if columns:
            kwargs["columns"] = columns
        if filter_expr is not None:
            kwargs["filter"] = filter_expr  # pyarrow dataset expression pushdown
        return rd.read_parquet(path, **kwargs)
    if fmt == "csv":
        ds = rd.read_csv(path)
    elif fmt in ("json", "jsonl"):
        ds = rd.read_json(path)
    elif fmt in ("txt", "text"):
        return rd.read_text(path)
    else:
        raise ValueError(f"unsupported format {fmt!r} for {path}")
    return ds.select_columns(columns) if columns else ds


def write_table_resumable(ds, out_dir: str, stage: str, partition_col: str = "_bucket"):
    from ..state import write_partitioned_resumable

    return write_partitioned_resumable(
        ds, out_dir, stage, f"{out_dir}/manifest.jsonl", partition_col
    )
