"""General two-sided distributed hash equi-join over the explicit exchange.

The join shape q3 (pipelines/relational.py:q3_top_orders) builds inline,
extracted as a reusable operator: both inputs exchange on the SAME key with
the SAME bucket function, and each reduce task joins its co-partitioned
bucket pair. Map fns can pre-aggregate (combiner) so only partials shuffle;
filters push into the parquet scans so filtered rows never leave storage.

    left  shards --map/filter--> bucket by hash(key) --\
                                                        +--> per-bucket join
    right shards --map/filter--> bucket by hash(key) --/

Returns the concatenated per-bucket reduce outputs (callers make the reduce
output SMALL — aggregated partials or top-k — or write it out per bucket;
the concat is a driver root and is bound-checked)."""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .exchange import exchange_map
from .partition import stable_bucket

# --- bloom-filter join prefilter -------------------------------------------
#
# When one join side is selective (a pushed-down predicate keeps only a small
# key set), the OTHER side's map tasks can drop non-matching rows BEFORE the
# exchange: build a bloom filter over the selective side's keys (one extra
# pruned-column scan of the SMALL side), broadcast the packed bits once via
# ray.put, and probe inside every big-side map task. False positives only
# re-admit rows the per-bucket exact join discards anyway, so results are
# byte-identical with the filter on or off (tests/test_bloom_join.py); what
# changes is shuffle volume — at 100 TB the big fact side ships only rows
# whose key MIGHT match instead of the whole table.


def _bloom_positions(values: np.ndarray, num_bits: int, num_hashes: int) -> np.ndarray:
    """(num_hashes, n) bit positions via double hashing off the same stable
    uint64 hash the bucket exchange uses (process-stable, any key dtype)."""
    h1 = pd.util.hash_pandas_object(
        pd.Series(np.asarray(values)), index=False
    ).to_numpy()
    h2 = h1 * np.uint64(0x9E3779B97F4A7C15)
    h2 = (h2 >> np.uint64(29)) ^ h2 | np.uint64(1)  # odd so strides differ
    ks = np.arange(num_hashes, dtype=np.uint64)[:, None]
    return ((h1[None, :] + ks * h2[None, :]) % np.uint64(num_bits)).astype(np.int64)


def bloom_insert(values: np.ndarray, num_bits: int, num_hashes: int) -> np.ndarray:
    """Packed (uint8) bloom bits with every value's positions set."""
    flat = np.zeros(num_bits, dtype=bool)
    if len(values):
        flat[_bloom_positions(values, num_bits, num_hashes).ravel()] = True
    return np.packbits(flat)


def bloom_probe(
    values: np.ndarray, bits: np.ndarray, num_bits: int, num_hashes: int
) -> np.ndarray:
    """Boolean mask: True where the value MIGHT be in the inserted set
    (never False for an inserted value)."""
    if not len(values):
        return np.zeros(0, dtype=bool)
    pos = _bloom_positions(values, num_bits, num_hashes)
    hit = (bits[pos >> 3] >> (np.uint8(7) - (pos & 7).astype(np.uint8))) & 1
    return hit.all(axis=0)


def build_key_bloom(
    shard_paths: list[str],
    key: str,
    num_bits: int = 1 << 23,
    num_hashes: int = 4,
    map_fn: Callable[[pa.Table], pa.Table] | None = None,
    columns: list[str] | None = None,
    filters=None,
) -> np.ndarray:
    """Distributed bloom build: one task per shard reads only ``key`` (plus
    whatever ``map_fn`` needs), inserts its post-map keys, and the driver ORs
    the packed arrays — num_bits/8 bytes per shard (1 MiB at the 2^23
    default), independent of row count."""

    @ray.remote
    def shard_bloom(path: str) -> np.ndarray:
        import pyarrow.parquet as pq

        t = pq.read_table(path, columns=columns or [key], filters=filters)
        if map_fn is not None:
            t = map_fn(t)
        return bloom_insert(
            t[key].to_numpy(zero_copy_only=False), num_bits, num_hashes
        )

    parts = ray.get([shard_bloom.remote(p) for p in shard_paths])
    out = np.zeros(num_bits // 8, dtype=np.uint8)
    for p in parts:
        out |= p
    return out


def exchange_join(
    left_shards: list[str],
    right_shards: list[str],
    key: str,
    reduce_fn: Callable[[int, pa.Table, pa.Table], pd.DataFrame],
    num_buckets: int,
    left_map: Callable[[pa.Table], pa.Table] | None = None,
    right_map: Callable[[pa.Table], pa.Table] | None = None,
    columns_left: list[str] | None = None,
    columns_right: list[str] | None = None,
    filters_left=None,
    filters_right=None,
    driver_row_cap: int = 5_000_000,
    bloom_from: str | None = None,
    bloom_bits: int = 1 << 23,
    bloom_hashes: int = 4,
    how: str = "inner",
) -> pd.DataFrame:
    """Co-partition both sides on ``hash(key) % num_buckets`` and run
    ``reduce_fn(bucket, left_tbl, right_tbl)`` per bucket. ``left_map`` /
    ``right_map`` default to identity — pass combiners to pre-aggregate
    map-side so the exchange moves partials, not rows.

    ``bloom_from='right'`` (or ``'left'``) builds a bloom filter over that
    side's post-map keys and prefilters the OTHER side's rows map-side,
    before its combiner and the shuffle — use when one side is selective.
    Results are identical with or without (exact join per bucket).

    ``how='left'`` preserves LEFT rows in buckets where the right side is
    empty: ``reduce_fn`` is then called as ``reduce_fn(b, left_tbl,
    right_tbl_or_None)`` and must treat ``None`` as zero matches (the
    documented footgun of the inner path, which SKIPS one-sided buckets —
    wrong for LEFT/anti semantics). ``bloom_from='right'`` is rejected for
    'left' — it prefilters the preserved side, dropping its unmatched rows;
    ``bloom_from='left'`` (filtering the nullable side) remains valid."""

    def bucket_fn(t: pa.Table) -> np.ndarray:
        return stable_bucket(t[key].to_numpy(zero_copy_only=False), num_buckets)

    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if how == "left" and bloom_from == "right":
        raise ValueError(
            "bloom_from='right' with how='left' would prefilter the "
            "preserved side and drop its unmatched rows"
        )
    ident = lambda t: t  # noqa: E731
    left_map = left_map or ident
    right_map = right_map or ident

    if bloom_from is not None:
        src = dict(
            left=(left_shards, left_map, columns_left, filters_left),
            right=(right_shards, right_map, columns_right, filters_right),
        )[bloom_from]
        bits_ref = ray.put(
            build_key_bloom(
                src[0], key, bloom_bits, bloom_hashes,
                map_fn=src[1], columns=src[2], filters=src[3],
            )
        )

        def bloomed(inner: Callable[[pa.Table], pa.Table]):
            def fn(t: pa.Table) -> pa.Table:
                t = inner(t)
                bits = ray.get(bits_ref)  # zero-copy plasma view
                keep = bloom_probe(
                    t[key].to_numpy(zero_copy_only=False),
                    bits, bloom_bits, bloom_hashes,
                )
                return t.filter(pa.array(keep))

            return fn

        if bloom_from == "right":
            left_map = bloomed(left_map)
        else:
            right_map = bloomed(right_map)

    l_refs = exchange_map(
        left_shards, left_map, bucket_fn, num_buckets,
        columns=columns_left, filters=filters_left,
    )
    r_refs = exchange_map(
        right_shards, right_map, bucket_fn, num_buckets,
        columns=columns_right, filters=filters_right,
    )

    @ray.remote
    def join_bucket(b: int, n_left: int, *parts: pa.Table) -> pd.DataFrame:
        lp = [p for p in parts[:n_left] if p.num_rows]
        rp = [p for p in parts[n_left:] if p.num_rows]
        if not lp:
            return pd.DataFrame()
        if not rp:
            if how == "left":
                return reduce_fn(b, pa.concat_tables(lp), None)
            return pd.DataFrame()
        return reduce_fn(b, pa.concat_tables(lp), pa.concat_tables(rp))

    out = [
        join_bucket.remote(
            b,
            len(left_shards),
            *[l_refs[s][b] for s in range(len(left_shards))],
            *[r_refs[s][b] for s in range(len(right_shards))],
        )
        for b in range(num_buckets)
    ]
    frames = [f for f in ray.get(out) if len(f)]
    res = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
    if len(res) > driver_row_cap:
        raise RuntimeError(
            f"exchange_join driver root collected {len(res):,} rows "
            f"(> cap {driver_row_cap:,}): make reduce_fn emit aggregated "
            "partials / top-k, or write per-bucket output instead"
        )
    return res


# --- chained (multi-way) exchange joins -------------------------------------
#
# A star/chain query (fact ⨝ dim1 ⨝ dim2 ⨝ ...) changes join key between
# hops, so each hop's output must be RE-EXCHANGED on the next key. The
# intermediates stay in the object store as per-bucket Arrow tables — the
# driver only ever holds ObjectRefs, never rows — so a three-hop join over a
# 10^12-row fact table moves each surviving row through plasma twice and
# through the driver zero times. Compose:
#
#   grid_l = exchange_map(paths, ..., bucket_fn(key1), B1)    # from storage
#   refs1  = exchange_join_refs(grid_l, grid_r, reduce1, B1, emit="refs")
#   grid2  = rebucket_refs(refs1, key2, B2)                   # re-key hop
#   refs2  = exchange_join_refs(grid2, grid_fact2, reduce2, B2, emit="refs")
#   final  = exchange_join_refs(..., emit="pandas")           # small root
#
# reduce_fn for emit="refs" must return a pyarrow Table (pre-aggregate /
# project so hops shrink); for emit="pandas" a small pandas DataFrame.


def rebucket_refs(
    table_refs: list["ray.ObjectRef"],
    key: str,
    num_buckets: int,
    map_fn: Callable[[pa.Table], pa.Table] | None = None,
) -> list[list["ray.ObjectRef"]]:
    """Second-hop exchange: one split task per upstream reduce output,
    bucketing its rows on ``hash(key) % num_buckets``. Returns the same
    ``refs[i][b]`` grid shape ``exchange_map`` produces, so the two exchange
    sources compose interchangeably. Empty/None upstream outputs yield
    zero-row slices that the bucket join skips."""
    from .exchange import _split_by_bucket

    @ray.remote(num_returns=num_buckets)
    def split(t):
        if t is None or t.num_rows == 0:
            empty = pa.table({})
            return tuple([empty] * num_buckets) if num_buckets > 1 else empty
        if map_fn is not None:
            t = map_fn(t)
        bucket = stable_bucket(t[key].to_numpy(zero_copy_only=False), num_buckets)
        parts = _split_by_bucket(t, bucket, num_buckets)
        return tuple(parts) if num_buckets > 1 else parts[0]

    out = [split.remote(r) for r in table_refs]
    if num_buckets == 1:
        out = [[r] for r in out]
    return out


def build_key_bloom_refs(
    table_refs: list["ray.ObjectRef"],
    key: str,
    num_bits: int = 1 << 23,
    num_hashes: int = 4,
) -> np.ndarray:
    """Bloom bits over the keys of in-flight per-bucket tables (an upstream
    hop's outputs) — lets a later hop prefilter its BIG storage side by the
    keys that actually survived the earlier joins. num_bits/8 bytes per
    upstream bucket cross the driver, independent of row count."""

    @ray.remote
    def part_bloom(t) -> np.ndarray:
        if t is None or t.num_rows == 0:
            return np.zeros(num_bits // 8, dtype=np.uint8)
        return bloom_insert(t[key].to_numpy(zero_copy_only=False), num_bits, num_hashes)

    parts = ray.get([part_bloom.remote(r) for r in table_refs])
    out = np.zeros(num_bits // 8, dtype=np.uint8)
    for p in parts:
        out |= p
    return out


def exchange_join_refs(
    left_refs: list[list["ray.ObjectRef"]],
    right_refs: list[list["ray.ObjectRef"]],
    reduce_fn: Callable[[int, pa.Table, pa.Table], object],
    num_buckets: int,
    emit: str = "pandas",
    driver_row_cap: int = 5_000_000,
):
    """Per-bucket join over two ``refs[i][b]`` grids (from ``exchange_map``
    or ``rebucket_refs``). ``emit='pandas'`` ray.gets the (small) reduce
    outputs and concatenates under the driver-root cap; ``emit='refs'``
    leaves each bucket's output pyarrow Table in the object store and
    returns the list of refs for the next hop."""

    n_left = len(left_refs)

    @ray.remote
    def join_bucket(b: int, *parts):
        lp = [p for p in parts[:n_left] if p is not None and p.num_rows]
        rp = [p for p in parts[n_left:] if p is not None and p.num_rows]
        if not lp or not rp:
            return None if emit == "refs" else pd.DataFrame()
        return reduce_fn(b, pa.concat_tables(lp), pa.concat_tables(rp))

    out = [
        join_bucket.remote(
            b,
            *[left_refs[i][b] for i in range(n_left)],
            *[right_refs[i][b] for i in range(len(right_refs))],
        )
        for b in range(num_buckets)
    ]
    if emit == "refs":
        return out
    frames = [f for f in ray.get(out) if f is not None and len(f)]
    res = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
    if len(res) > driver_row_cap:
        raise RuntimeError(
            f"exchange_join_refs driver root collected {len(res):,} rows "
            f"(> cap {driver_row_cap:,}): aggregate in reduce_fn or keep "
            "emit='refs' and write per bucket"
        )
    return res
