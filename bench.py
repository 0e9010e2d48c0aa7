"""Benchmark harness (driver contract + BASELINE.md scaling protocol).

Headline: the flagship pipeline (windowed token stats -> entity-complete
shuffle -> sessionize -> lag/lead -> as-of join -> LOCF backfill -> resumable
partitioned write + manifest) over the deterministic bench-scale tokens table
(1M sequences, seed 42, cached under /tmp). Metric: wall seconds; derived
sequences/sec. Also times a representative query set over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": secs, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N, "seq_per_sec": ...}

``--scaling``: runs the headline twice in FRESH processes at num_cpus=8 and
num_cpus=32 on the same input and reports both throughputs + efficiency
(BASELINE.json two-cluster-size criterion, sandbox evidence rule).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BENCH_QUERIES = (
    "q1_pricing_summary",
    "sessionize_user_events",
    "asof_purchase_for_views",
    "locf_last_purchase",
    "cumulative_user_value",
    "dedup_exact",
    "doc_token_stats",
    "knn_cosine_top10",
)


def run_headline() -> tuple[float, int]:
    import ray.data as rd

    from mpds_ray.pipelines.flagship import run_flagship
    from mpds_ray.synth import cached_fixture_dir

    d = cached_fixture_dir("bench")
    # warm the page cache so we measure compute+shuffle, not first disk read
    import pyarrow.parquet as pq

    n_rows = pq.read_metadata(f"{d}/tokens.parquet").num_rows
    with open(f"{d}/tokens.parquet", "rb") as f:
        while f.read(1 << 24):
            pass
    # untimed warmup: pre-spawn the Ray worker pool so the timed run measures
    # steady-state throughput rather than worker cold-start
    rd.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).count()

    out_dir = f"/tmp/mpds_bench_out/{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    res = run_flagship(
        f"{d}/tokens.parquet",
        f"{d}/scores.parquet",
        out_dir=out_dir,
        num_buckets=128,  # constant across parallelism levels (same plan)
    )
    written = res.to_pandas()["rows"].sum()
    secs = time.perf_counter() - t0
    assert written == n_rows, f"row loss: wrote {written} of {n_rows}"
    return secs, n_rows


def run_queries() -> dict[str, float]:
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        res = qs[name](SF_DIR)
        # consume
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    secs, n_rows = run_headline()
    queries = run_queries()
    print(
        json.dumps(
            {
                "metric": "flagship_asof_windowed_features_wall_sec",
                "value": round(secs, 3),
                "unit": "sec",
                "queries": queries,
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                "num_cpus": NUM_CPUS,
                "seq_per_sec": round(n_rows / secs, 1),
                "n_sequences": n_rows,
            }
        )
    )
    ray.shutdown()


def scaling() -> None:
    # pre-generate the shared fixture once so both runs read the same input
    from mpds_ray.synth import cached_fixture_dir

    cached_fixture_dir("bench")

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = run(lo), run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    print(
        json.dumps(
            {
                "sec_8": r_lo["value"],
                "sec_32": r_hi["value"],
                "seq_per_sec_8": r_lo["seq_per_sec"],
                "seq_per_sec_32": r_hi["seq_per_sec"],
                "scaling_efficiency": round(eff, 3),
                "n_sequences": r_lo["n_sequences"],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
