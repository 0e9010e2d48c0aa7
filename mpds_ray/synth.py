"""Deterministic synthesis of the engine's fixture tables (FIXTURES.md F1/F2).

Everything is seeded (default seed=42) and pure — no external data. The
bench-scale table is written once to a parquet cache under /tmp so repeated
bench runs measure the pipeline, not the generator.

F1 tokens table: doc_id (Zipf(1.2)-skewed rows/entity), tokens list<int32>
(len 8..512), n_tok, source (5 modalities, one ~60% heavy hitter), and a
derived irregular event-time ``ts`` with occasional out-of-order rows (to
prove the sort stage).

F2 scores table: sparse per-entity score timestamps, some entities absent,
some timestamps before/after all F1 rows (as-of miss + tolerance coverage).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SOURCES = ("voice", "balance", "gait", "tap", "react")
SOURCE_P = (0.6, 0.1, 0.1, 0.1, 0.1)  # heavy-hitter skew axis


def synth_tokens_table(
    n_entities: int = 200,
    n_rows: int = 20_000,
    seed: int = 42,
    max_tok: int = 512,
    out_of_order_frac: float = 0.02,
    hot_share: float = 0.0,
) -> pa.Table:
    rng = np.random.default_rng(seed)
    # Zipf(1.2) row allocation over entities; ``hot_share`` > 0 pins that
    # fraction of all rows on entity 0 (pathological heavy hitter, the
    # salting demo fixture)
    w = 1.0 / np.arange(1, n_entities + 1) ** 1.2
    w /= w.sum()
    if hot_share > 0.0:
        w = np.r_[hot_share, (1.0 - hot_share) * w[1:] / w[1:].sum()]
    ent = rng.choice(n_entities, size=n_rows, p=w)
    ent.sort()  # group rows per entity; ts ordering handled below
    doc_id = np.array([f"d{e:05d}" for e in ent])
    source = rng.choice(len(SOURCES), size=n_rows, p=SOURCE_P)

    n_tok = rng.integers(8, max_tok + 1, n_rows).astype(np.int32)
    flat = rng.integers(0, 50257, int(n_tok.sum()), dtype=np.int32)
    offsets = np.r_[0, np.cumsum(n_tok)].astype(np.int32)
    tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat))

    # irregular per-entity event times with occasional out-of-order rows
    gaps = rng.exponential(30.0, n_rows)  # seconds, irregular
    ts = np.empty(n_rows, dtype=np.float64)
    start = 0
    for e, cnt in zip(*np.unique(ent, return_counts=True)):
        seg = slice(start, start + cnt)
        base = 1_700_000_000.0 + (e * 9973) % 86_400
        ts[seg] = base + np.cumsum(gaps[seg])
        start += cnt
    swap = np.flatnonzero(rng.random(n_rows - 1) < out_of_order_frac)
    swap = swap[ent[swap] == ent[swap + 1]]  # only scramble within an entity
    ts[swap], ts[swap + 1] = ts[swap + 1].copy(), ts[swap].copy()

    return pa.table(
        {
            "doc_id": pa.array(doc_id),
            "tokens": tokens,
            "n_tok": pa.array(n_tok),
            "source": pa.array([SOURCES[i] for i in source]),
            "ts": pa.array(np.round(ts).astype(np.int64)),
        }
    )


def synth_scores_table(n_entities: int = 200, seed: int = 43, per_entity: int = 8) -> pa.Table:
    rng = np.random.default_rng(seed)
    ids, ts, score = [], [], []
    for e in range(n_entities):
        if e % 5 == 4:
            continue  # entities absent from the right side (null-join coverage)
        k = rng.integers(1, per_entity + 1)
        base = 1_700_000_000.0 + (e * 9973) % 86_400
        t = base + np.sort(rng.uniform(-3_600, 3_600 * 24, k))
        ids.extend([f"d{e:05d}"] * int(k))
        ts.extend(t.tolist())
        score.extend(rng.normal(50.0, 15.0, int(k)).tolist())
    return pa.table(
        {
            "doc_id": pa.array(ids),
            "ts": pa.array(np.array(ts, dtype=np.int64)),
            "score": pa.array(np.array(score)),
        }
    )


def cached_fixture_dir(scale: str = "small", seed: int = 42) -> str:
    """Write (once) and return a /tmp directory with tokens.parquet +
    scores.parquet at the named scale: tiny | small | bench."""
    sizes = {
        "tiny": (3, 40, 512, 0.0),
        "small": (200, 20_000, 512, 0.0),
        "bench": (2_000, 2_000_000, 128, 0.0),  # 2M sequences, bounded token bytes
        # pathological heavy hitter: one entity owns 60% of all rows —
        # the salting demo (SURVEY §4.2); identical row count to "bench"
        "hot": (2_000, 2_000_000, 128, 0.6),
    }
    n_entities, n_rows, max_tok, hot_share = sizes[scale]
    d = f"/tmp/mpds_fixtures/{scale}_seed{seed}"
    marker = os.path.join(d, "_COMPLETE")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        # shard the tokens table into many files: ray.data schedules one read
        # task per file, so a single giant file would serialize the parquet
        # decode (exactly the layout rule for the real 100 TB input)
        table = synth_tokens_table(n_entities, n_rows, seed, max_tok=max_tok,
                                   hot_share=hot_share)
        n_shards = max(1, min(32, n_rows // 16_384))
        shard_dir = f"{d}/tokens.parquet"
        os.makedirs(shard_dir, exist_ok=True)
        per = (table.num_rows + n_shards - 1) // n_shards
        for i in range(n_shards):
            piece = table.slice(i * per, per)
            if piece.num_rows:
                pq.write_table(piece, f"{shard_dir}/part-{i:04d}.parquet",
                               row_group_size=16_384)
        pq.write_table(synth_scores_table(n_entities, seed + 1), f"{d}/scores.parquet")
        with open(marker, "w") as f:
            f.write("ok")
    return d
