"""Similarity search over the embeddings table.

Brute-force cosine top-k (baseline): the query matrix is broadcast once
(``ray.put``), each batch does one float64 matmul against it, partial top-k
per batch, global top-k via sort+limit. The IVF variant (scale path) buckets
vectors by nearest coarse centroid so a query probes only a few buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .common import read, read_small

K = 10


def _query_vector(sf_dir: str) -> np.ndarray:
    """Deterministic query = the embedding of vec_id 0 (both sides agree)."""
    df = read_small(sf_dir, "embeddings", ["vec_id", "embedding"])
    row = df.loc[df["vec_id"] == 0, "embedding"].iloc[0]
    return np.asarray(row, dtype=np.float64)


def knn_cosine_top10(sf_dir: str):
    """Top-10 vec_ids by cosine similarity to vec 0 (self excluded)."""
    q = _query_vector(sf_dir)
    qn = q / np.linalg.norm(q)
    emb = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def score(b: pd.DataFrame) -> pd.DataFrame:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in b["embedding"]])
        sims = (m @ qn) / np.linalg.norm(m, axis=1)
        out = pd.DataFrame({"vec_id": b["vec_id"], "cos_sim": np.round(sims, 6)})
        out = out[out["vec_id"] != 0]
        # partial top-k per batch: only K rows per batch reach the global sort
        return out.nlargest(K, "cos_sim")

    return (
        emb.map_batches(score, batch_format="pandas")
        .sort(["cos_sim", "vec_id"], descending=[True, False])
        .limit(K)
    )


KNN_SQL = f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_cosine_similarity(embedding, qe), 6) AS cos_sim
FROM embeddings, q
WHERE vec_id != 0
ORDER BY cos_sim DESC, vec_id
LIMIT {K}
"""


def knn_ivf_top10(sf_dir: str, n_cells: int = 8, n_probe: int = 2):
    """IVF-style ANN: coarse k-means-lite centroids (deterministic seeded
    init, 5 Lloyd iterations on a sample), assign vectors to cells map-side,
    probe only the ``n_probe`` cells nearest the query. Rows-only check; the
    pytest asserts recall vs brute force."""
    df = read_small(sf_dir, "embeddings", ["vec_id", "embedding"])
    m = np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    m_n = m / np.linalg.norm(m, axis=1, keepdims=True)
    rng = np.random.default_rng(42)
    cent = m_n[rng.choice(len(m_n), n_cells, replace=False)]
    for _ in range(5):
        assign = (m_n @ cent.T).argmax(axis=1)
        for c in range(n_cells):
            sel = m_n[assign == c]
            if len(sel):
                v = sel.mean(axis=0)
                cent[c] = v / np.linalg.norm(v)
    q = _query_vector(sf_dir)
    qn = q / np.linalg.norm(q)
    probe = np.argsort(-(cent @ qn))[:n_probe]
    emb = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def score(b: pd.DataFrame) -> pd.DataFrame:
        mm = np.stack([np.asarray(v, dtype=np.float64) for v in b["embedding"]])
        mm_n = mm / np.linalg.norm(mm, axis=1, keepdims=True)
        cells = (mm_n @ cent.T).argmax(axis=1)
        keep = np.isin(cells, probe) & (b["vec_id"].to_numpy() != 0)
        sims = mm_n[keep] @ qn
        out = pd.DataFrame({"vec_id": b["vec_id"].to_numpy()[keep], "cos_sim": np.round(sims, 6)})
        return out.nlargest(K, "cos_sim")

    return (
        emb.map_batches(score, batch_format="pandas")
        .sort(["cos_sim", "vec_id"], descending=[True, False])
        .limit(K)
    )


def label_centroid_sims(sf_dir: str):
    """Per-label mean embedding (partial-sum pattern) + its cosine to the
    global mean — grouped vector aggregation with a SQL oracle."""
    emb = read(sf_dir, "embeddings", columns=["label", "embedding"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in b["embedding"]])
        out = []
        for lbl, idx in b.groupby("label").indices.items():
            s = m[idx].sum(axis=0)
            out.append({"label": lbl, "n": len(idx), "vsum": s})
        return pd.DataFrame(out)

    parts = emb.map_batches(partial, batch_format="pandas").to_pandas()
    agg = parts.groupby("label").apply(
        lambda g: pd.Series({"n": g["n"].sum(), "vsum": np.sum(np.stack(g["vsum"].to_numpy()), axis=0)}),
        include_groups=False,
    )
    means = {lbl: row["vsum"] / row["n"] for lbl, row in agg.iterrows()}
    out = pd.DataFrame(
        {
            "label": np.array(sorted(means), dtype=np.int64),
            "n": np.array([int(agg.loc[lbl, "n"]) for lbl in sorted(means)], dtype=np.int64),
            "centroid_norm": [round(float(np.linalg.norm(means[lbl])), 6) for lbl in sorted(means)],
        }
    )
    return out


CENTROID_SQL = """
WITH flat AS (
  SELECT label, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v
  FROM embeddings
), dims AS (
  SELECT label, i, sum(v) AS s, count(*) AS n FROM flat GROUP BY label, i
)
SELECT CAST(label AS BIGINT) AS label, CAST(any_value(n) AS BIGINT) AS n,
       round(sqrt(sum((s / n) * (s / n))), 6) AS centroid_norm
FROM dims GROUP BY label ORDER BY label
"""


def embedding_near_dups(sf_dir: str, threshold: float = 0.95, n_tables: int = 4, n_bits: int = 12):
    """Embedding-cosine near-duplicate pairs via random-hyperplane LSH:
    per table, rows sharing a 12-bit sign code become candidates; candidates
    are verified exactly and deduped. Rows-only check (pytest plants dups)."""
    import ray.data as rd

    emb = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    dim = len(_query_vector(sf_dir))
    rng = np.random.default_rng(42)
    planes = [rng.normal(size=(dim, n_bits)) for _ in range(n_tables)]
    weights = (1 << np.arange(n_bits)).astype(np.int64)

    def codes(b: pd.DataFrame) -> pd.DataFrame:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in b["embedding"]])
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        rows = []
        for t_i, p in enumerate(planes):
            c = ((m @ p) > 0) @ weights
            rows.append(
                pd.DataFrame({"table": t_i, "code": c, "vec_id": b["vec_id"],
                              "norm_vec": list(m)})
            )
        return pd.concat(rows, ignore_index=True)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos_sim": []})
        g = g.sort_values("vec_id")
        m = np.stack(g["norm_vec"].to_numpy())
        sims = m @ m.T
        ids = g["vec_id"].to_numpy()
        ii, jj = np.triu_indices(len(g), k=1)
        keep = sims[ii, jj] >= threshold
        return pd.DataFrame(
            {"vec_a": ids[ii[keep]], "vec_b": ids[jj[keep]],
             "cos_sim": np.round(sims[ii, jj][keep], 6)}
        )

    out = (
        emb.map_batches(codes, batch_format="pandas")
        .groupby(["table", "code"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame(
            {"vec_a": pd.Series([], dtype="int64"), "vec_b": pd.Series([], dtype="int64"),
             "cos_sim": pd.Series([], dtype="float64")}
        )
    return (
        out.drop_duplicates(subset=["vec_a", "vec_b"])
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )


QUERIES = {
    "knn_cosine_top10": knn_cosine_top10,
    "knn_ivf_top10": knn_ivf_top10,
    "label_centroid_sims": label_centroid_sims,
    "embedding_near_dups": embedding_near_dups,
}

ORACLE = {
    "knn_cosine_top10": KNN_SQL,
    "label_centroid_sims": CENTROID_SQL,
}
