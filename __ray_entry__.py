"""Driver contract for the mpds_ray engine (Ray Data target).

``entry()`` runs the flagship pipeline (tokenize -> windowed token stats ->
entity-complete shuffle -> sessionize/lag/as-of/backfill) on sf0.001.
``queries()`` exposes the operator surface of SURVEY.md §2 (relational,
longitudinal/events, text/dedup, embedding ANN); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible entry (identical column
names and float rounding). Ray is initialised by the caller — nothing here
calls ``ray.init()``/``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship on sf0.001: documents -> tokens table -> windowed stats ->
    sessionize -> as-of join to synthetic score timestamps -> backfill."""
    import pyarrow as pa
    import ray.data as rd

    from mpds_ray.pipelines.flagship import flagship_features
    from mpds_ray.tokenize import tokenize_batch

    sf_dir = "/root/testdata/sf0.001"
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "source"])

    def to_tokens(batch: pa.Table) -> pa.Table:
        t = tokenize_batch(batch)
        # deterministic irregular event-time per row (doc_id is unique here)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        import numpy as np

        ts = (ids.astype(np.int64) * 9973) % 1_000_000
        return t.append_column("ts", pa.array(ts, type=pa.int64()))

    tokens = docs.map_batches(to_tokens, batch_format="pyarrow")
    # entity = source (few entities, many rows each -> exercises sessions);
    # synthesize deterministic score timestamps per source entity
    import numpy as np

    rng = np.random.default_rng(7)
    srcs = [f"src{i}" for i in range(20)]
    scores = rd.from_arrow(
        pa.table(
            {
                "source": pa.array(np.repeat(srcs, 5)),
                "ts": pa.array(rng.integers(0, 1_000_000, 100, dtype=np.int64)),
                "score": pa.array(rng.normal(50, 15, 100)),
            }
        )
    )
    return flagship_features(
        tokens, scores, entity="source", ts="ts",
        session_gap=50_000.0, tolerance=None, num_buckets=8,
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from mpds_ray.pipelines import (
        dssl_pipe, eventspipe, knn, media, relational, text, traindata,
    )

    out: dict[str, Callable[[str], Any]] = {}
    out.update(relational.QUERIES)
    out.update(eventspipe.QUERIES)
    out.update(text.QUERIES)
    out.update(knn.QUERIES)
    out.update(dssl_pipe.QUERIES)
    out.update(media.QUERIES)
    out.update(traindata.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    from mpds_ray.oracle.golden import golden_oracles
    from mpds_ray.pipelines import eventspipe, knn, relational, text, traindata

    out: dict[str, str] = {}
    out.update(relational.ORACLE)
    out.update(eventspipe.ORACLE)
    out.update(text.ORACLE)
    out.update(knn.ORACLE)
    out.update(traindata.ORACLE)
    # non-SQL-expressible sketches/ML: committed golden-parquet regression
    # oracles (see mpds_ray/oracle/golden.py for what they do and don't prove)
    out.update(golden_oracles())
    return out
