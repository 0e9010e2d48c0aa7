"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() on the same sf_dir, compare row count + (sorted-column)
value content. Usage: python tools/check_correctness.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys
import traceback

import duckdb
import numpy as np
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if len(got) != len(want):
        problems.append(f"row count {len(got)} != {len(want)}")
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        problems.append(f"columns {gc} != {wc}")
        return problems
    # the driver's value-hash is dtype-exact: an int64 engine column vs a
    # float64 oracle column (e.g. HUGEINT window sums -> .df() float) is a
    # hash mismatch even when every value is equal. Catch that here.
    for c in gc:
        gk = "f" if pd.api.types.is_float_dtype(got[c]) else (
            "i" if pd.api.types.is_integer_dtype(got[c]) else "o")
        wk = "f" if pd.api.types.is_float_dtype(want[c]) else (
            "i" if pd.api.types.is_integer_dtype(want[c]) else "o")
        if gk != wk:
            problems.append(f"col {c}: dtype kind {got[c].dtype} != {want[c].dtype}")
    g, w = canon(got), canon(want)
    if len(g) == len(w):
        for c in g.columns:
            a, b = g[c].to_numpy(), w[c].to_numpy()
            if pd.api.types.is_float_dtype(g[c]) or pd.api.types.is_float_dtype(w[c]):
                ok = np.allclose(
                    a.astype(float), b.astype(float), atol=2e-6, rtol=1e-9, equal_nan=True
                )
            else:
                ok = (pd.Series(a).fillna("\0") == pd.Series(b).fillna("\0")).all()
            if not ok:
                bad = np.flatnonzero(
                    ~np.isclose(a.astype(float), b.astype(float), atol=2e-6, equal_nan=True)
                    if pd.api.types.is_float_dtype(g[c])
                    else (pd.Series(a).fillna("\0") != pd.Series(b).fillna("\0")).to_numpy()
                )[:3]
                problems.append(
                    f"col {c}: {len(bad)}+ mismatches, first rows {bad.tolist()} "
                    f"got={a[bad].tolist()} want={b[bad].tolist()}"
                )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception:
            print(f"FAIL {name}: query raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows)")
            n_pass += 1
            continue
        if "golden" in oracles[name].splitlines()[0] and not sf_dir.rstrip("/").endswith("sf0.01"):
            # golden parquets are generated at sf0.01 (the driver's gate SF);
            # comparing them against another SF's data is meaningless
            print(f"ok   {name}: golden oracle is sf0.01-only ({len(got)} rows)")
            n_pass += 1
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: oracle raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        problems = compare(name, got, want)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
