"""Tokenizer: engine (Arrow-buffer vectorized) == DuckDB SQL == scalar ref."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from mpds_ray.tokenize import TOKENS_SQL_EXPR, tokenize_batch, tokenize_words_py


def test_matches_duckdb_on_testdata():
    path = "/root/testdata/sf0.001/documents.parquet"
    batch = pq.read_table(path)
    got = tokenize_batch(batch)
    con = duckdb.connect()
    want = con.sql(
        f"select doc_id, {TOKENS_SQL_EXPR} as tokens, source "
        f"from read_parquet('{path}') order by doc_id"
    ).fetchall()
    got_df = got.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(got_df) == len(want)
    for (did, toks, src), (_, row) in zip(want, got_df.iterrows()):
        assert row["doc_id"] == did and row["source"] == src
        np.testing.assert_array_equal(np.asarray(row["tokens"]), np.asarray(toks))
    # n_tok consistency
    assert (got_df["n_tok"] == got_df["tokens"].map(len)).all()


def test_scalar_reference():
    batch = pa.table({"doc_id": [1], "text": ["ab cde f"], "source": ["s"]})
    out = tokenize_batch(batch)
    want = [tokenize_words_py(w) for w in ["ab", "cde", "f"]]
    np.testing.assert_array_equal(np.asarray(out["tokens"][0].as_py()), want)


def test_sliced_batch():
    batch = pa.table({"doc_id": [1, 2, 3], "text": ["aa b", "c dd", "e"], "source": list("xyz")})
    out = tokenize_batch(batch.slice(1, 2))
    assert out.num_rows == 2
    np.testing.assert_array_equal(
        np.asarray(out["tokens"][0].as_py()),
        [tokenize_words_py("c"), tokenize_words_py("dd")],
    )
