"""Salt invariance (FIXTURES.md F6): salted scans == unsalted scans for every
chunking of a heavy key."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mpds_ray.stages.salted import (
    carry_locf_boundary,
    detect_heavy_keys,
    salted_sessionize,
)
from mpds_ray.stages.sessionize import sessionize_gap

rng = np.random.default_rng(42)


def heavy_ts(n=5000):
    # irregular gaps with real session structure (some gaps >> threshold)
    gaps = np.where(rng.random(n) < 0.05, rng.uniform(400, 2000, n), rng.exponential(30, n))
    return np.cumsum(gaps)


class TestSaltedSessionize:
    @pytest.mark.parametrize("num_salts", [1, 2, 3, 7, 16, 64])
    def test_salt_invariance(self, num_salts):
        ts = heavy_ts()
        want = sessionize_gap(np.zeros(ts.size), ts, gap=300.0)
        got = salted_sessionize(ts, gap=300.0, num_salts=num_salts)
        np.testing.assert_array_equal(got, want)

    def test_boundary_exactly_at_gap(self):
        # a boundary falling exactly on the gap threshold must merge (<=)
        ts = np.array([0.0, 100.0, 400.0, 500.0])  # gap 300 at index 2
        want = sessionize_gap(np.zeros(4), ts, gap=300.0)
        for s in (2, 4):
            np.testing.assert_array_equal(salted_sessionize(ts, 300.0, s), want)

    def test_empty_chunks_tolerated(self):
        ts = heavy_ts(10)
        got = salted_sessionize(ts, gap=300.0, num_salts=64)  # many empty chunks
        want = sessionize_gap(np.zeros(10), ts, gap=300.0)
        np.testing.assert_array_equal(got, want)


class TestLocfCarry:
    def test_carry_propagates_across_gaps(self):
        carries = carry_locf_boundary([1.0, None, np.nan, 4.0, None])
        assert carries == [None, 1.0, 1.0, 1.0, 4.0]


class TestHeavyDetection:
    def test_threshold(self):
        counts = {"voice": 600, "gait": 100, "tap": 100, "react": 100, "balance": 100}
        assert detect_heavy_keys(counts, 1000, threshold=0.25) == ["voice"]
        assert detect_heavy_keys(counts, 1000, threshold=0.7) == []


class TestDistributedSalting:
    """VERDICT round-1 'Next round' #3: the salted distributed flagship must
    (a) produce byte-identical output to the unsalted path on a fixture where
    one entity holds ~70% of rows, and (b) bound every salted reduce task to
    at most 2/S of that entity's rows."""

    HOT_ROWS = 3000

    def _fixture(self, tmp_path):
        import os

        rng = np.random.default_rng(5)
        ents = ["hotent"] * self.HOT_ROWS + [
            f"e{i:03d}" for i in range(40) for _ in range(30)
        ]
        n = len(ents)
        perm = rng.permutation(n)
        ents = [ents[i] for i in perm]
        ts = rng.integers(0, 500_000, n).astype(np.int64)  # duplicate ts occur
        toks = [rng.integers(0, 50257, rng.integers(8, 17)).astype(np.int32) for _ in range(n)]
        tok_dir = tmp_path / "tokens.parquet"
        os.makedirs(tok_dir, exist_ok=True)
        per = (n + 2) // 3
        for s in range(3):
            sl = slice(s * per, min((s + 1) * per, n))
            t = pa.table(
                {
                    "doc_id": pa.array(ents[sl]),
                    "tokens": pa.array([t.tolist() for t in toks[sl]],
                                       type=pa.list_(pa.int32())),
                    "n_tok": pa.array([len(t) for t in toks[sl]], type=pa.int32()),
                    "source": pa.array(["s"] * (sl.stop - sl.start)),
                    "ts": pa.array(ts[sl.start:sl.stop]),
                }
            )
            pq.write_table(t, tok_dir / f"part-{s}.parquet")
        sc_ents = ["hotent"] + [f"e{i:03d}" for i in range(0, 40, 3)]
        sids, sts, sval = [], [], []
        for e in sc_ents:
            k = int(rng.integers(2, 6))
            sids += [e] * k
            sts += list(rng.integers(0, 500_000, k))
            sval += list(rng.normal(50, 10, k))
        pq.write_table(
            pa.table({"doc_id": pa.array(sids), "ts": pa.array(np.array(sts, dtype=np.int64)),
                      "score": pa.array(np.array(sval))}),
            tmp_path / "scores.parquet",
        )
        return str(tok_dir), str(tmp_path / "scores.parquet")

    def _canon(self, df):
        df = df.drop(columns=["_bucket"], errors="ignore")
        df = df.sort_values(["doc_id", "ts"], kind="mergesort").reset_index(drop=True)
        return df

    def test_salted_byte_identical_and_bounded(self, ray_session, tmp_path):
        from mpds_ray.pipelines.flagship import detect_salt_spec, run_flagship_exchange

        tok_dir, scores = self._fixture(tmp_path)
        base = run_flagship_exchange(
            tok_dir, scores, out_dir=None, num_buckets=8, salt=False,
            session_gap=5_000.0, tolerance=100_000.0,
        )
        salted = run_flagship_exchange(
            tok_dir, scores, out_dir=None, num_buckets=8, salt=True,
            salt_threshold=0.2, salt_min_rows=0, session_gap=5_000.0, tolerance=100_000.0,
        )
        a, b = self._canon(base), self._canon(salted)
        pd.testing.assert_frame_equal(a, b, check_exact=True)

        # (b) chunk bound: run with a sink to get per-partition row counts
        out_dir = str(tmp_path / "out")
        res = run_flagship_exchange(
            tok_dir, scores, out_dir=out_dir, num_buckets=8, salt=True,
            salt_threshold=0.2, salt_min_rows=0, session_gap=5_000.0, tolerance=100_000.0,
        )
        salted_parts = res[res["partition_id"] >= 8]
        assert len(salted_parts) >= 2, "salting did not engage"
        s_chunks = len(salted_parts)
        assert salted_parts["rows"].sum() == self.HOT_ROWS
        assert salted_parts["rows"].max() <= 2 * self.HOT_ROWS / s_chunks

    def test_salt_spec_detection(self, ray_session, tmp_path):
        from mpds_ray.pipelines.flagship import detect_salt_spec

        tok_dir, _ = self._fixture(tmp_path)
        import glob

        shards = sorted(glob.glob(f"{tok_dir}/*.parquet"))
        spec, n_extra = detect_salt_spec(shards, "doc_id", "ts", 8, threshold=0.2, min_rows=0)
        assert set(spec) == {"hotent"}
        off, bounds = spec["hotent"]
        assert off == 0 and n_extra == bounds.size + 1 and bounds.size >= 1
        # no heavy key at a higher threshold
        spec2, n2 = detect_salt_spec(shards, "doc_id", "ts", 8, threshold=0.9, min_rows=0)
        assert spec2 == {} and n2 == 0


class TestCarryChainNaNEdges:
    """Kernel-level salted-chunk replay with NaN stat values: splitting one
    entity's process_bucket output at arbitrary points and replaying via
    chunk_carry_info/fold_carry/flagship_apply_carry must reproduce the
    unsplit output byte-for-byte (pandas cummax NaN rows, nan_to_num'd
    trapezoid areas, LOCF prefix fills)."""

    def _entity_frame(self, n=400, nan_frac=0.15, seed=3):
        rng = np.random.default_rng(seed)
        t = np.cumsum(rng.exponential(40.0, n))
        stat = rng.normal(10, 3, n)
        stat[rng.random(n) < nan_frac] = np.nan
        left = pd.DataFrame(
            {
                "doc_id": "e0",
                "ts": t,
                "source": "s",
                "n_tok": np.int32(8),
                "tok_mean": stat,
            }
        )
        k = 6
        right = pd.DataFrame(
            {
                "doc_id": "e0",
                "ts": np.sort(rng.uniform(0, t[-1], k)),
                "score": rng.normal(50, 10, k),
                "_side": 1,
            }
        )
        return left, right

    @pytest.mark.parametrize("cuts", [[100, 250], [1], [399], [50, 100, 150, 200, 399]])
    def test_split_replay_byte_identical(self, cuts):
        from mpds_ray.pipelines.flagship import process_bucket
        from mpds_ray.stages.salted import (
            chunk_carry_info,
            flagship_apply_carry,
            fold_carry,
        )

        gap, tol = 200.0, 500.0
        left, right = self._entity_frame()
        want = process_bucket(
            left, right, "doc_id", "ts", gap, tol, ["tok_mean"], bucket_id=0
        ).reset_index(drop=True)

        bounds = [0] + cuts + [len(left)]
        chunks = [left.iloc[bounds[i]:bounds[i + 1]] for i in range(len(bounds) - 1)]
        feats = [
            process_bucket(c, right, "doc_id", "ts", gap, tol, ["tok_mean"], bucket_id=0)
            for c in chunks
        ]
        infos = [chunk_carry_info(f, "ts", "tok_mean") for f in feats]
        carry = None
        fixed = []
        for k, (f, info) in enumerate(zip(feats, infos)):
            nxt = next((infos[j]["first_ts"] for j in range(k + 1, len(infos)) if infos[j]), None)
            fixed.append(flagship_apply_carry(f, carry, nxt, "ts", "tok_mean", gap))
            carry = fold_carry(carry, info, gap)
        got = pd.concat([f for f in fixed if f is not None and len(f)], ignore_index=True)
        pd.testing.assert_frame_equal(got, want, check_exact=True)
