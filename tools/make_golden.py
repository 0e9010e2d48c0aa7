"""Regenerate the committed golden-output parquet oracles (sf0.01).

Usage: python tools/make_golden.py [names...]

Runs each golden query twice (determinism check: the two runs must be
value-identical) and writes golden/<name>.parquet. Rerun after any deliberate
behavior change to a golden query, and commit the refreshed files.
"""

from __future__ import annotations

import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_GOLDEN_SF_DIR", "/root/testdata/sf0.01")


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    return df[sorted(df.columns)].sort_values(sorted(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod
    from mpds_ray.oracle.golden import GOLDEN_QUERIES, golden_path

    only = set(sys.argv[1:])
    qs = entrymod.queries()
    os.makedirs(os.path.join(os.path.dirname(golden_path("x")), ""), exist_ok=True)
    for name in GOLDEN_QUERIES:
        if only and name not in only:
            continue
        a = to_pandas(qs[name](SF_DIR))
        b = to_pandas(qs[name](SF_DIR))
        pd.testing.assert_frame_equal(canon(a), canon(b))  # determinism gate
        pq.write_table(pa.Table.from_pandas(a, preserve_index=False), golden_path(name))
        print(f"wrote {golden_path(name)} ({len(a)} rows)")
    ray.shutdown()


if __name__ == "__main__":
    main()
