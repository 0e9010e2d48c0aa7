"""Heavy-hitter salting with boundary stitch (SURVEY §4.2, north-star skew
handling).

Entity-complete partitioning cannot split one entity across tasks — but a
heavy key (the testdata's 60%-of-rows ``source``, or a pathological doc_id)
can make its bucket the straggler. For SCAN-shaped operators the engine
range-salts the hot key: its (ts-sorted) rows are cut into S contiguous
chunks, each chunk is scanned independently in parallel, and a cheap per-key
merge pass fixes the O(1)-wide state that straddles chunk boundaries.

Implemented here for the gap-threshold sessionizer (T2/T9): after independent
chunk sessionization, two adjacent chunks' sessions are merged when the
boundary gap <= ``gap`` — only session IDS need renumbering, which is a
per-chunk offset subtraction (no data rescan). The same pattern applies to
LOCF (carry the last observation across the boundary) and lag scans (carry
one row of state); each stitch touches O(S) values, never O(rows).

Salt invariance is property-tested: salted == unsalted output for every
chunking (FIXTURES.md F6).
"""

from __future__ import annotations

import numpy as np

from .sessionize import sessionize_gap


def sessionize_chunks(ts_chunks: list[np.ndarray], gap: float) -> list[np.ndarray]:
    """Phase 1 (parallel): sessionize each contiguous ts-sorted chunk of ONE
    entity independently; local session ids start at 0 per chunk."""
    out = []
    for t in ts_chunks:
        t = np.asarray(t, dtype=np.float64)
        ids = sessionize_gap(np.zeros(t.size), t, gap)
        out.append(ids)
    return out


def stitch_sessions(
    ts_chunks: list[np.ndarray], sid_chunks: list[np.ndarray], gap: float
) -> list[np.ndarray]:
    """Phase 2 (per-key merge): renumber local session ids into one global
    monotone sequence, merging the boundary session when the inter-chunk gap
    <= ``gap``. O(number of chunks) work."""
    offset = 0
    prev_last_ts = None
    prev_last_sid = -1
    out = []
    for t, sid in zip(ts_chunks, sid_chunks):
        t = np.asarray(t, dtype=np.float64)
        sid = np.asarray(sid, dtype=np.int64)
        if t.size == 0:
            out.append(sid)
            continue
        merge = prev_last_ts is not None and (t[0] - prev_last_ts) <= gap
        base = prev_last_sid + (0 if merge else 1)
        out.append(sid + base)
        prev_last_sid = base + int(sid[-1])
        prev_last_ts = float(t[-1])
    return out


def salted_sessionize(ts: np.ndarray, gap: float, num_salts: int) -> np.ndarray:
    """End-to-end salted sessionize of one hot entity's sorted timestamps:
    contiguous range-salt into ``num_salts`` chunks -> parallel local scans ->
    boundary stitch. Returns ids identical to the unsalted scan."""
    ts = np.asarray(ts, dtype=np.float64)
    bounds = np.linspace(0, ts.size, num_salts + 1).astype(np.int64)
    chunks = [ts[bounds[i] : bounds[i + 1]] for i in range(num_salts)]
    local = sessionize_chunks(chunks, gap)
    stitched = stitch_sessions(chunks, local, gap)
    return np.concatenate(stitched) if stitched else np.empty(0, dtype=np.int64)


def carry_locf_boundary(chunk_last_values: list[float | None]) -> list[float | None]:
    """The LOCF stitch: the carry-in for chunk k is the last non-null carry
    among chunks < k (O(S) pass). Returned list aligns with chunks."""
    carry = None
    out = []
    for last in chunk_last_values:
        out.append(carry)
        if last is not None and not (isinstance(last, float) and np.isnan(last)):
            carry = last
    return out


def detect_heavy_keys(counts: dict, total: int, threshold: float = 0.25) -> list:
    """Heavy-hitter detection (first-pass groupby().count() sample): keys
    holding more than ``threshold`` of all rows get salted."""
    return [k for k, c in counts.items() if c / max(total, 1) > threshold]
