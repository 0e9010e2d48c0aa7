"""Explicit hash exchange: equivalence with the Dataset groupby path,
resume-skip, and split correctness."""

from __future__ import annotations

import glob
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mpds_ray.pipelines.flagship import run_flagship, run_flagship_exchange
from mpds_ray.stages.exchange import _split_by_bucket
from mpds_ray.synth import cached_fixture_dir


class TestSplit:
    def test_split_partitions_and_preserves_rows(self):
        t = pa.table({"k": list(range(10)), "b": [3, 1, 0, 1, 2, 3, 0, 0, 1, 2]})
        bucket = t["b"].to_numpy()
        parts = _split_by_bucket(t, bucket, 4)
        assert sum(p.num_rows for p in parts) == 10
        for b, p in enumerate(parts):
            assert (p["b"].to_numpy() == b).all()
        # stable within bucket: original order preserved
        assert parts[0]["k"].to_pylist() == [2, 6, 7]

    def test_empty_buckets(self):
        t = pa.table({"k": [1], "b": [2]})
        parts = _split_by_bucket(t, np.array([2]), 4)
        assert [p.num_rows for p in parts] == [0, 0, 1, 0]

    def test_sort_keys_produce_sorted_runs(self):
        t = pa.table(
            {
                "e": ["b", "a", "a", "b", "a"],
                "ts": [3.0, 2.0, 1.0, 1.0, 2.0],
                "uid": [0, 1, 2, 3, 4],
            }
        )
        bucket = np.array([0, 0, 0, 0, 0])
        (run,) = _split_by_bucket(t, bucket, 1, sort_keys=["e", "ts"])
        assert run["e"].to_pylist() == ["a", "a", "a", "b", "b"]
        assert run["ts"].to_pylist() == [1.0, 2.0, 2.0, 1.0, 3.0]
        # stable: the (a, 2.0) tie keeps original order (uid 1 before 4)
        assert run["uid"].to_pylist() == [2, 1, 4, 3, 0]


class TestAutoNumBuckets:
    def test_scales_with_bytes_and_clamps(self, tmp_path):
        from mpds_ray.stages.exchange import auto_num_buckets

        p = tmp_path / "x.parquet"
        pq.write_table(pa.table({"a": list(range(1000))}), p)
        small = auto_num_buckets([str(p)], target_task_bytes=1 << 30, min_buckets=8)
        assert small == 8  # tiny input -> floor
        big = auto_num_buckets(
            [str(p)] * 50, target_task_bytes=1024, min_buckets=8, max_buckets=64
        )
        assert big == 64  # would exceed -> ceiling
        mid = auto_num_buckets(
            [str(p)] * 10, target_task_bytes=20_000, min_buckets=2, max_buckets=10_000,
            expansion=1.0,
        )
        import os

        want = -(-os.path.getsize(p) * 10 // 20_000)
        assert mid == want


class TestExchangeFlagship:
    @pytest.fixture(scope="class")
    def dirs(self, ray_session):
        d = cached_fixture_dir("small")
        a, b = "/tmp/mpds_test_ex/a", "/tmp/mpds_test_ex/b"
        shutil.rmtree("/tmp/mpds_test_ex", ignore_errors=True)
        run_flagship(f"{d}/tokens.parquet", f"{d}/scores.parquet",
                     out_dir=a, num_buckets=8).to_pandas()
        run_flagship_exchange(f"{d}/tokens.parquet", f"{d}/scores.parquet",
                              out_dir=b, num_buckets=8)
        return a, b

    def _load(self, out_dir):
        files = sorted(glob.glob(f"{out_dir}/part-*.parquet"))
        df = pd.concat([pq.read_table(p).to_pandas() for p in files])
        return df.sort_values(["doc_id", "ts"]).reset_index(drop=True)

    def test_byte_equivalent_outputs(self, dirs):
        a, b = dirs
        fa, fb = self._load(a), self._load(b)
        pd.testing.assert_frame_equal(fa, fb[fa.columns])

    def test_exchange_resume_skips(self, dirs, ray_session):
        d = cached_fixture_dir("small")
        _, b = dirs
        res = run_flagship_exchange(f"{d}/tokens.parquet", f"{d}/scores.parquet",
                                    out_dir=b, num_buckets=8)
        assert res["skipped"].all()


class TestWideOutput:
    def test_wide_output_token_byte_identity(self, ray_session, tmp_path):
        import numpy as np

        d = cached_fixture_dir("small")
        wide_dir = str(tmp_path / "wide")
        run_flagship_exchange(
            f"{d}/tokens.parquet", f"{d}/scores.parquet",
            out_dir=str(tmp_path / "narrow"), wide_out_dir=wide_dir, num_buckets=4,
        )
        files = sorted(glob.glob(f"{wide_dir}/wide-*.parquet"))
        assert files
        wide = pd.concat([pq.read_table(p).to_pandas() for p in files])
        orig = pq.read_table(f"{d}/tokens.parquet").to_pandas()
        assert len(wide) == len(orig)
        assert "tok_mean" in wide.columns

        # (doc_id, ts) can repeat -> compare canonically sorted token bytes
        def canon(df):
            key = df["tokens"].map(lambda v: np.asarray(v, dtype=np.int32).tobytes())
            return (
                df.assign(_k=key)
                .sort_values(["doc_id", "ts", "_k"], kind="mergesort")["_k"]
                .to_numpy()
            )

        a, b = canon(orig), canon(wide)
        assert (a == b).all()
