"""Segment-vectorized token stats vs the per-row kernel library (independent
implementations of the same pinned semantics)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from mpds_ray.kernels import STAT_KERNELS, fastdfa
from mpds_ray.kernels.lomb import dominant_frequency
from mpds_ray.stages.window_stats import CHEAP_STATS, TokenWindowStats, token_stats_arrays

rng = np.random.default_rng(42)


def make_lists(n_rows=200, max_len=120, int_vals=True):
    lens = rng.integers(1, max_len, n_rows)
    # include degenerate windows: length 1, 2, constant
    lens[0] = 1
    lens[1] = 2
    vals = []
    for i, m in enumerate(lens):
        if i == 2:
            vals.append(np.full(int(m), 7.0))
        elif int_vals:
            vals.append(rng.integers(0, 50257, int(m)).astype(np.float64))
        else:
            vals.append(rng.normal(size=int(m)))
    flat = np.concatenate(vals)
    offsets = np.r_[0, np.cumsum(lens)].astype(np.int64)
    return flat, offsets, vals


FLAT, OFFS, ROWS = make_lists()


class TestSegmentedVsKernels:
    @pytest.mark.parametrize("stat", [s for s in CHEAP_STATS if s != "n"])
    def test_stat_matches_per_row_kernel(self, stat):
        got = token_stats_arrays(FLAT, OFFS, stats=(stat,))[stat]
        want = np.array([STAT_KERNELS[stat](r) for r in ROWS])
        np.testing.assert_allclose(got, want, equal_nan=True, rtol=1e-10, atol=1e-12)

    def test_float_values_too(self):
        flat, offs, rows = make_lists(80, 60, int_vals=False)
        for stat in ("mean", "std", "s", "k", "En", "mode", "median", "zcr", "ar1"):
            got = token_stats_arrays(flat, offs, stats=(stat,))[stat]
            want = np.array([STAT_KERNELS[stat](r) for r in rows])
            np.testing.assert_allclose(got, want, equal_nan=True, rtol=1e-9, atol=1e-12, err_msg=stat)

    def test_heavy_stats_match(self):
        flat, offs, rows = make_lists(30, 100)
        got = token_stats_arrays(flat, offs, stats=("dfa", "dfc", "dfc_amp"), sample_rate=50.0)
        want_dfa = np.array([fastdfa(r) for r in rows])
        np.testing.assert_allclose(got["dfa"], want_dfa, equal_nan=True, rtol=1e-10)
        want_dfc = np.array(
            [dominant_frequency(np.arange(len(r)) / 50.0, r)[0] for r in rows]
        )
        np.testing.assert_allclose(got["dfc"], want_dfc, equal_nan=True, rtol=1e-10)

    def test_empty_segment_nan(self):
        flat = np.array([1.0, 2.0])
        offs = np.array([0, 2, 2], dtype=np.int64)  # second row empty
        got = token_stats_arrays(flat, offs, stats=("mean", "std", "median", "En"))
        assert np.isnan(got["mean"][1]) and np.isnan(got["median"][1])
        assert got["mean"][0] == 1.5


class TestArrowStage:
    def test_batch_passthrough_and_columns(self):
        toks = [list(map(int, r)) for r in ROWS[:50]]
        batch = pa.table(
            {
                "doc_id": pa.array([f"d{i:04d}" for i in range(50)]),
                "tokens": pa.array(toks, type=pa.list_(pa.int32())),
            }
        )
        out = TokenWindowStats(stats=("mean", "std", "En"))(batch)
        # token passthrough: exact equality (F6 invariant)
        assert out["tokens"].equals(batch["tokens"])
        assert out.num_rows == 50
        want = np.array([STAT_KERNELS["mean"](np.array(t, dtype=float)) for t in toks])
        np.testing.assert_allclose(out["tok_mean"].to_numpy(), want)

    def test_sliced_offsets_handled(self):
        # Arrow slices carry non-zero starting offsets — stage must rebase
        toks = pa.array([[1, 2], [3, 4, 5], [6]], type=pa.list_(pa.int32()))
        batch = pa.table({"tokens": toks}).slice(1, 2)
        out = TokenWindowStats(stats=("mean",))(batch)
        np.testing.assert_allclose(out["tok_mean"].to_numpy(), [4.0, 6.0])
