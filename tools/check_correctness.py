"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() on the same sf_dir, compare row count + (sorted-column)
value content. Usage: python tools/check_correctness.py [sf_dir] [names...]

Float columns are compared BIT-EXACT AFTER a canonical round(6) by default
(VERDICT r4 'Next round' #3: "bit compare after the committed round(6)") —
the driver's gate is an exact value hash over round-6-canonicalized values:
X88 was driver-red at 44.759062 vs 44.759063 (differs after rounding) while
knn_cosine_top10 was driver-green with the engine emitting 0.276301 and the
SQL 0.27630099654 (equal after rounding). The old atol=2e-6 default passed
X88 locally five times while it was driver-red. Pass --allclose to get the
loose compare back for debugging only; a PASS in that mode is NOT evidence
the driver gate will be green.
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


ALLCLOSE = False  # set by --allclose; default is the driver-faithful exact mode


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]) and ALLCLOSE:
            # rounding here masks exact-hash bugs; only the loose mode does it
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
                af, bf = a.astype(float), b.astype(float)
                if ALLCLOSE:
                    okmask = np.isclose(af, bf, atol=2e-6, rtol=1e-9, equal_nan=True)
                else:
                    # driver-faithful: bit-equal after canonical round(6)
                    # (NaN == NaN)
                    af, bf = np.round(af, 6), np.round(bf, 6)
                    okmask = (af == bf) | (np.isnan(af) & np.isnan(bf))
                ok = bool(okmask.all())
            else:
                okmask = (pd.Series(a).fillna("\0") == pd.Series(b).fillna("\0")).to_numpy()
                ok = bool(okmask.all())
            if not ok:
                bad = np.flatnonzero(~okmask)[:3]
                problems.append(
                    f"col {c}: {len(bad)}+ mismatches, first rows {bad.tolist()} "
                    f"got={a[bad].tolist()} want={b[bad].tolist()}"
                )
    return problems


def main():
    global ALLCLOSE
    argv = [a for a in sys.argv[1:] if a != "--allclose"]
    ALLCLOSE = "--allclose" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

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
