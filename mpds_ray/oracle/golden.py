"""Committed golden-output oracles for the genuinely non-SQL-expressible
queries (VERDICT round-1 'Next round' #1: sketches and iterative/ML outputs
get committed golden-output parquet oracles).

These are SELF-GENERATED regression goldens: ``tools/make_golden.py`` runs
each query at sf0.01 and commits the result under ``golden/``. Their value is
determinism + regression detection (any behavior drift in the sketch /
training code breaks the driver's exact hash), not independent semantic
verification — that lives in pytest (scalar-reference parity, planted-dup
recall, finite-difference gradients). The DuckDB "oracle" is a plain
read_parquet of the committed file.
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
)


def golden_path(name: str) -> str:
    return os.path.join(REPO_ROOT, "golden", f"{name}.parquet")


def golden_sql(name: str) -> str:
    return (
        f"-- self-generated regression golden (tools/make_golden.py, sf0.01)\n"
        f"SELECT * FROM read_parquet('{golden_path(name)}')"
    )


def golden_oracles() -> dict[str, str]:
    """Oracle SQL for every golden query whose file exists on disk."""
    return {n: golden_sql(n) for n in GOLDEN_QUERIES if os.path.exists(golden_path(n))}
