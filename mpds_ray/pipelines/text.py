"""Training-data text operators over documents: exact & near dedup, token
counting, quality scoring, language-id, fingerprinting, windowed token stats
(SURVEY §2.8 + the large-scale-pipeline additions).

SQL-expressible operators carry DuckDB oracles; the sketch-based ones
(MinHash-LSH, SimHash, fingerprints) are deterministic and covered by pytest
(driver records rows-only checks for them).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.window_stats import token_stats_arrays
from ..tokenize import TOKENS_SQL_EXPR, tokenize_batch
from .common import partial_groupby_sum, read

STOPWORDS = ("the", "a", "of", "and", "to")

# --- exact dedup (D1): first doc per identical text ---


def dedup_exact(sf_dir: str):
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        # shuffle the (cheap) content hash, not the text payload
        h = pd.util.hash_pandas_object(b["text"], index=False).astype("uint64")
        return pd.DataFrame({"text_hash": h.astype("int64"), "doc_id": b["doc_id"]})

    from ray.data.aggregate import Count, Min

    return (
        docs.map_batches(prep, batch_format="pandas")
        .groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="n_copies"))
        .drop_columns(["text_hash"])
        .sort("keep_doc_id")
    )


DEDUP_SQL = """
SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM documents GROUP BY text ORDER BY keep_doc_id
"""

# --- token counting / quality scoring ---


def token_counts(sf_dir: str):
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        words = b["text"].str.split(" ")
        return pd.DataFrame({"doc_id": b["doc_id"], "n_words": words.map(len).astype(np.int64)})

    return docs.map_batches(fn, batch_format="pandas")


TOKEN_COUNT_SQL = "SELECT doc_id, len(string_split(text, ' ')) AS n_words FROM documents"


def quality_scores(sf_dir: str):
    """length / stopword-ratio / mean-word-length quality features
    (the reference's stat-block shape applied to text hygiene)."""
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])
    stop = set(STOPWORDS)

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        words = b["text"].str.split(" ")
        n = words.map(len).astype(np.int64)
        stop_n = words.map(lambda ws: sum(w in stop for w in ws))
        mean_len = words.map(lambda ws: float(np.mean([len(w) for w in ws])))
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "n_words": n,
                "stop_ratio": (stop_n / n).round(6),
                "mean_word_len": mean_len.round(6),
            }
        )

    return docs.map_batches(fn, batch_format="pandas")


QUALITY_SQL = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_words,
       round(len(list_filter(string_split(text, ' '),
                 w -> w IN {STOPWORDS!r})) * 1.0
             / len(string_split(text, ' ')), 6) AS stop_ratio,
       round(list_aggregate(list_transform(string_split(text, ' '),
                 w -> length(w) * 1.0), 'avg'), 6) AS mean_word_len
FROM documents
"""

# --- windowed token stats over the derived tokens table (W1 surface) ---


def doc_token_stats(sf_dir: str):
    docs = read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def fn(batch: pa.Table) -> pa.Table:
        tok = tokenize_batch(batch)
        arr = tok["tokens"].combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        st = token_stats_arrays(flat, offsets, stats=("mean", "std", "median", "range", "En"))
        return pa.table(
            {
                "doc_id": tok["doc_id"],
                "tok_mean": pa.array(np.round(st["mean"], 6)),
                "tok_std": pa.array(np.round(st["std"], 6)),
                "tok_median": pa.array(np.round(st["median"], 6)),
                "tok_range": pa.array(np.round(st["range"], 6)),
                "tok_entropy": pa.array(np.round(st["En"], 6)),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


TOKEN_STATS_SQL = f"""
WITH tok AS (
  SELECT doc_id, {TOKENS_SQL_EXPR} AS tokens FROM documents
), flat AS (
  SELECT doc_id, unnest(tokens) AS t FROM tok
), counts AS (
  SELECT doc_id, t, count(*) AS c FROM flat GROUP BY doc_id, t
), ent AS (
  SELECT doc_id,
         -sum((c * 1.0 / n) * log2(c * 1.0 / n + 2.220446049250313e-16)) AS entropy
  FROM (SELECT doc_id, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM counts)
  GROUP BY doc_id
)
SELECT f.doc_id,
       round(avg(t), 6)                    AS tok_mean,
       round(coalesce(stddev_samp(t), 0), 6) AS tok_std,
       round(median(t), 6)                 AS tok_median,
       round(max(t) - min(t), 6)           AS tok_range,
       round(any_value(e.entropy), 6)      AS tok_entropy
FROM flat f JOIN ent e ON f.doc_id = e.doc_id
GROUP BY f.doc_id
"""

# --- language id (heuristic; rows-only check + pytest) ---


class LangId:
    """Actor-pool stage: stopword/character profiles compiled once per actor
    (the ray_guide actor-pool shape). Heuristic, deterministic."""

    PROFILES = {
        "en": ("the", "and", "of", "to", "a"),
        "de": ("der", "die", "und", "das", "ist"),
        "fr": ("le", "la", "et", "les", "des"),
        "es": ("el", "la", "de", "los", "que"),
        "zh": (),
    }

    def __init__(self):
        self.sets = {k: frozenset(v) for k, v in self.PROFILES.items()}

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        def pred(text: str) -> str:
            ws = text.split(" ")
            scores = {k: sum(w in s for w in ws) for k, s in self.sets.items() if s}
            best = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
            return best[0] if best[1] > 0 else "und"

        return pd.DataFrame({"doc_id": b["doc_id"], "lang_pred": b["text"].map(pred)})


def lang_id(sf_dir: str):
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(LangId, batch_format="pandas", concurrency=2)


def _lang_count_expr(words: tuple[str, ...]) -> str:
    return f"len(list_filter(string_split(text, ' '), w -> w IN {words!r}))"


# CASE chain replicates LangId's tie-break max(score, lang): on equal scores
# the lexicographically LARGEST language wins (fr > es > en > de).
LANG_ID_SQL = f"""
WITH s AS (
  SELECT doc_id,
         {_lang_count_expr(LangId.PROFILES["en"])} AS s_en,
         {_lang_count_expr(LangId.PROFILES["de"])} AS s_de,
         {_lang_count_expr(LangId.PROFILES["fr"])} AS s_fr,
         {_lang_count_expr(LangId.PROFILES["es"])} AS s_es
  FROM documents
)
SELECT doc_id,
       CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
            WHEN s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
            WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
            WHEN s_en >= s_de THEN 'en'
            ELSE 'de' END AS lang_pred
FROM s
"""


# --- SimHash (64-bit) over tokens — deterministic sketch (rows-only) ---


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return x ^ (x >> np.uint64(31))


def simhash_batch(tokens_list: list[np.ndarray]) -> np.ndarray:
    out = np.empty(len(tokens_list), dtype=np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    for i, toks in enumerate(tokens_list):
        h = _splitmix64(np.asarray(toks, dtype=np.uint64))
        bitmat = ((h[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64)
        score = (2 * bitmat - 1).sum(axis=0)
        set_bits = bits[score > 0]
        out[i] = (
            np.bitwise_or.reduce(np.left_shift(np.uint64(1), set_bits))
            if set_bits.size
            else np.uint64(0)
        )
    return out


def simhash_docs(sf_dir: str):
    docs = read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def fn(batch: pa.Table) -> pa.Table:
        tok = tokenize_batch(batch)
        toks = [np.asarray(t) for t in tok["tokens"].to_pylist()]
        sh = simhash_batch(toks)
        return pa.table(
            {"doc_id": tok["doc_id"], "simhash": pa.array(sh.view(np.int64))}
        )

    return docs.map_batches(fn, batch_format="pyarrow")


# --- MinHash-LSH near-dup candidates (rows-only; pytest proves recall) ---

N_HASHES = 64
N_BANDS = 16  # 4 rows/band


def minhash_signature(shingles: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """64 min-hashes of a shingle set (vectorized over hashes x shingles)."""
    if shingles.size == 0:
        return np.full(seeds.size, np.iinfo(np.uint64).max, dtype=np.uint64)
    h = _splitmix64(shingles[None, :].astype(np.uint64) ^ seeds[:, None])
    return h.min(axis=1)


def _shingles(tokens: np.ndarray, k: int = 3) -> np.ndarray:
    t = np.asarray(tokens, dtype=np.uint64)
    if t.size < k:
        return _splitmix64(t)
    acc = np.zeros(t.size - k + 1, dtype=np.uint64)
    for j in range(k):
        acc = _splitmix64(acc ^ t[j : t.size - k + 1 + j])
    return np.unique(acc)


def minhash_dup_candidates(sf_dir: str, threshold: float = 0.5):
    """Banded-LSH candidate pairs + exact shingle-Jaccard verification.

    Scale path: signatures per batch -> explode to (band, band_hash, doc) ->
    groupby band buckets -> verify candidates. Verification here re-reads the
    two docs' shingles from a broadcast map (documents table is small per
    bucket at test scale; at 10^12 scale verification joins signatures only).
    """
    docs = read(sf_dir, "documents", columns=["doc_id", "text", "source"])
    seeds = _splitmix64(np.arange(1, N_HASHES + 1, dtype=np.uint64) * np.uint64(0x9E3779B9))

    def sig_batch(batch: pa.Table) -> pd.DataFrame:
        tok = tokenize_batch(batch)
        rows = []
        for did, toks in zip(tok["doc_id"].to_pylist(), tok["tokens"].to_pylist()):
            sh = _shingles(np.asarray(toks))
            sig = minhash_signature(sh, seeds)
            bands = sig.reshape(N_BANDS, -1)
            bh = _splitmix64(
                bands[:, 0] ^ _splitmix64(bands[:, 1] ^ _splitmix64(bands[:, 2] ^ bands[:, 3]))
            )
            for b_i in range(N_BANDS):
                rows.append((int(b_i), int(bh[b_i]), did))
        return pd.DataFrame(rows, columns=["band", "band_hash", "doc_id"])

    sigs = docs.map_batches(sig_batch, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["doc_id"]))
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        return pd.DataFrame(pairs, columns=["doc_a", "doc_b"])

    cand = (
        sigs.groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if len(cand) == 0:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    # verify: exact shingle Jaccard via a broadcast doc->shingle map
    texts = read(sf_dir, "documents", columns=["doc_id", "text", "source"]).to_pandas()
    tok = tokenize_batch(pa.Table.from_pandas(texts))
    sh_map = {
        did: _shingles(np.asarray(t))
        for did, t in zip(tok["doc_id"].to_pylist(), tok["tokens"].to_pylist())
    }
    jac = []
    for a, b in zip(cand["doc_a"], cand["doc_b"]):
        sa, sb = sh_map[a], sh_map[b]
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        jac.append(inter / (sa.size + sb.size - inter) if inter else 0.0)
    cand["jaccard"] = np.round(jac, 6)
    out = cand[cand["jaccard"] >= threshold].sort_values(["doc_a", "doc_b"])
    return out.reset_index(drop=True)


# --- n-gram Jaccard vs a reference doc (rows-only) ---


def ngram_jaccard_vs_doc0(sf_dir: str):
    docs = read(sf_dir, "documents", columns=["doc_id", "text", "source"])
    first = tokenize_batch(
        pa.Table.from_pandas(read_small_doc0(sf_dir))
    )
    ref = _shingles(np.asarray(first["tokens"][0].as_py()))

    def fn(batch: pa.Table) -> pa.Table:
        tok = tokenize_batch(batch)
        out = np.empty(tok.num_rows)
        for i, t in enumerate(tok["tokens"].to_pylist()):
            s = _shingles(np.asarray(t))
            inter = np.intersect1d(s, ref, assume_unique=True).size
            out[i] = inter / (s.size + ref.size - inter) if inter else 0.0
        return pa.table({"doc_id": tok["doc_id"], "jaccard_vs_doc0": pa.array(np.round(out, 6))})

    return docs.map_batches(fn, batch_format="pyarrow")


# Oracle computes Jaccard over DISTINCT token-trigram strings; the engine
# computes it over distinct splitmix64-hashed trigrams. Equal unless the
# 64-bit hash collides within the involved shingle sets (P ~ 1e-10 at this
# corpus size) — the hash is a set-preserving relabeling of the trigrams.
NGRAM_JACCARD_SQL = f"""
WITH tok AS (
  SELECT doc_id, {TOKENS_SQL_EXPR} AS tokens FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(tokens) - 1),
             i -> concat(tokens[i], '_', tokens[i + 1], '_', tokens[i + 2]))) AS shingles
  FROM tok
), ref AS (
  SELECT shingles AS r FROM sh WHERE doc_id = 0
)
SELECT doc_id,
       round(CASE WHEN len(list_intersect(shingles, r)) = 0 THEN 0.0
                  ELSE len(list_intersect(shingles, r)) * 1.0
                       / (len(shingles) + len(r) - len(list_intersect(shingles, r)))
             END, 6) AS jaccard_vs_doc0
FROM sh, ref
"""


def read_small_doc0(sf_dir: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    return con.sql(
        f"SELECT doc_id, text, source FROM read_parquet('{sf_dir}/documents.parquet') "
        "WHERE doc_id = 0"
    ).df()


# --- rolling-hash fingerprint (winnowing-lite; rows-only) ---


def doc_fingerprints(sf_dir: str):
    docs = read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def fn(batch: pa.Table) -> pa.Table:
        tok = tokenize_batch(batch)
        fp = np.empty(tok.num_rows, dtype=np.int64)
        for i, t in enumerate(tok["tokens"].to_pylist()):
            sh = _shingles(np.asarray(t))
            fp[i] = int(sh.min() if sh.size else 0) - (1 << 63)  # signed fold
        return pa.table({"doc_id": tok["doc_id"], "fingerprint": pa.array(fp)})

    return docs.map_batches(fn, batch_format="pyarrow")


QUERIES = {
    "dedup_exact": dedup_exact,
    "token_counts": token_counts,
    "quality_scores": quality_scores,
    "doc_token_stats": doc_token_stats,
    "lang_id": lang_id,
    "simhash_docs": simhash_docs,
    "minhash_dup_candidates": minhash_dup_candidates,
    "ngram_jaccard_vs_doc0": ngram_jaccard_vs_doc0,
    "doc_fingerprints": doc_fingerprints,
}

ORACLE = {
    "dedup_exact": DEDUP_SQL,
    "token_counts": TOKEN_COUNT_SQL,
    "quality_scores": QUALITY_SQL,
    "doc_token_stats": TOKEN_STATS_SQL,
    "lang_id": LANG_ID_SQL,
    "ngram_jaccard_vs_doc0": NGRAM_JACCARD_SQL,
}
