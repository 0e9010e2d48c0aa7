"""Embedding-cosine near-dup (LSH) finds planted near-duplicate vectors."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_lsh_finds_planted_near_dups(ray_session, tmp_path):
    rng = np.random.default_rng(42)
    base = rng.normal(size=(60, 64)).astype(np.float32)
    # plant: vec 60 ~ vec 0 (tiny perturbation), vec 61 ~ vec 5
    dup_a = base[0] + 0.01 * rng.normal(size=64).astype(np.float32)
    dup_b = base[5] + 0.01 * rng.normal(size=64).astype(np.float32)
    m = np.vstack([base, dup_a, dup_b])
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(m), dtype=np.int64)),
            "embedding": pa.array([row.tolist() for row in m], type=pa.list_(pa.float32())),
            "label": pa.array(np.zeros(len(m), dtype=np.int32)),
        }
    )
    pq.write_table(tbl, tmp_path / "embeddings.parquet")

    from mpds_ray.pipelines.knn import embedding_near_dups

    out = embedding_near_dups(str(tmp_path), threshold=0.95)
    pairs = set(zip(out["vec_a"], out["vec_b"]))
    assert (0, 60) in pairs and (5, 61) in pairs
    # no false positives among random gaussians at 0.95
    assert len(pairs) == 2


def test_no_dups_in_random_corpus(ray_session, sf_dir):
    from mpds_ray.pipelines.knn import embedding_near_dups

    out = embedding_near_dups(sf_dir, threshold=0.99)
    assert isinstance(out, pd.DataFrame)
    assert len(out) == 0  # random embeddings share no 0.99-cosine pairs


def test_lsh_recall_vs_exact(ray_session, tmp_path):
    """The LSH scale path finds every planted high-cosine pair the exact
    block-pair baseline finds (recall 1.0 at 0.95 with 8x8-bit tables), and
    reports identical cos_sim values for them."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(80, 64)).astype(np.float32)
    dups = [base[i] + 0.02 * rng.normal(size=64).astype(np.float32) for i in (0, 3, 11, 40)]
    m = np.vstack([base] + dups)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(m), dtype=np.int64)),
            "embedding": pa.array([r.tolist() for r in m], type=pa.list_(pa.float32())),
            "label": pa.array(np.zeros(len(m), dtype=np.int32)),
        }
    )
    pq.write_table(tbl, tmp_path / "embeddings.parquet")

    from mpds_ray.pipelines.knn import embedding_near_dups, embedding_near_dups_lsh

    exact = embedding_near_dups(str(tmp_path), threshold=0.95)
    lsh = embedding_near_dups_lsh(str(tmp_path), threshold=0.95)
    exact_pairs = dict(zip(zip(exact["vec_a"], exact["vec_b"]), exact["cos_sim"]))
    lsh_pairs = dict(zip(zip(lsh["vec_a"], lsh["vec_b"]), lsh["cos_sim"]))
    assert len(exact_pairs) == 4
    assert lsh_pairs == exact_pairs  # full recall AND identical verified sims




def test_embedding_quant_error_hand_values(ray_session, tmp_path):
    """A vector spanning [0, 255] quantizes losslessly at integer points
    (scale exactly 1); a constant vector has zero range -> zero error; a
    two-point vector {0, 1} also reconstructs exactly (scale 1/255 hits the
    endpoints)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mpds_ray.pipelines.knn import embedding_quant_error

    vecs = [
        np.arange(256, dtype=np.float32),          # label 0: exact grid
        np.full(16, 3.25, dtype=np.float32),       # label 1: constant
        np.array([0.0, 1.0] * 8, dtype=np.float32),  # label 2: endpoints
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array([0, 1, 2], pa.int32()),
        }
    )
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    out = embedding_quant_error(str(tmp_path))
    got = dict(zip(out.label, out.mean_max_err))
    assert got == {0: 0.0, 1: 0.0, 2: 0.0}
    assert dict(zip(out.label, out.n_vecs)) == {0: 1, 1: 1, 2: 1}


def test_knn_label_vote_consistent_with_top10(ray_session, sf_dir):
    import pyarrow.parquet as pq

    from mpds_ray.pipelines.knn import knn_cosine_top10, knn_label_vote

    top = knn_cosine_top10(sf_dir)
    emb = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"]
    ).to_pandas()
    expected = (
        top.merge(emb, on="vec_id").groupby("label").size().to_dict()
    )
    out = knn_label_vote(sf_dir)
    assert dict(zip(out.label, out.n_neighbors)) == expected
    assert out.n_neighbors.sum() == len(top)


def test_exact_path_refuses_beyond_baseline_bound(tmp_path):
    """The exact all-pairs miner is baseline-only: past 250k vectors it must
    fail loudly (pointing at the LSH scale path) instead of launching an
    O(B^2) block-pair task storm (VERDICT r4 'What's wrong' #4). The guard
    reads parquet METADATA only, so the oversized fixture is one cheap
    int column."""
    import pytest

    from mpds_ray.pipelines.knn import embedding_near_dups

    pq.write_table(
        pa.table({"vec_id": pa.array(np.arange(250_001, dtype=np.int64))}),
        str(tmp_path / "embeddings.parquet"),
    )
    with pytest.raises(ValueError, match="embedding_near_dups_lsh"):
        embedding_near_dups(str(tmp_path))
