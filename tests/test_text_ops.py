"""Dedup / sketch / ANN / multimodal operator tests (beyond the DuckDB gate):
MinHash-LSH recall on crafted near-duplicates, SimHash Hamming locality,
IVF recall vs brute force, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mpds_ray.pipelines.text import (
    _shingles,
    minhash_signature,
    _splitmix64,
    simhash_batch,
    N_HASHES,
)
from mpds_ray.stages.multimodal import DecodeImage, FrameSampler, decode_pipeline, synth_media_table

rng = np.random.default_rng(42)
SEEDS = _splitmix64(np.arange(1, N_HASHES + 1, dtype=np.uint64) * np.uint64(0x9E3779B9))


def jaccard(a, b):
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / (a.size + b.size - inter)


class TestMinHash:
    def test_signature_similarity_estimates_jaccard(self):
        base = rng.integers(0, 50257, 300)
        near = base.copy()
        near[::10] = rng.integers(0, 50257, near[::10].size)  # ~10% perturbed
        sa, sb = _shingles(base), _shingles(near)
        true_j = jaccard(sa, sb)
        siga = minhash_signature(sa, SEEDS)
        sigb = minhash_signature(sb, SEEDS)
        est = (siga == sigb).mean()
        assert est == pytest.approx(true_j, abs=0.15)

    def test_lsh_finds_planted_dups(self, ray_session, tmp_path):
        """Plant near-duplicate docs in a corpus; the LSH candidate pass must
        surface the planted pair with high Jaccard."""
        words = np.array(["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"])
        texts = [" ".join(rng.choice(words, 60)) for _ in range(40)]
        dup = texts[0].split(" ")
        dup[3] = "changed"
        texts.append(" ".join(dup))  # doc 40 ~ doc 0
        df = pd.DataFrame(
            {"doc_id": np.arange(41, dtype=np.int64), "text": texts, "source": "s",
             "lang": "en", "n_chars": [len(t) for t in texts]}
        )
        d = tmp_path / "documents.parquet"
        pq.write_table(pa.Table.from_pandas(df), d)
        from mpds_ray.pipelines.text import minhash_dup_candidates

        out = minhash_dup_candidates(str(tmp_path), threshold=0.5)
        pairs = set(zip(out["doc_a"], out["doc_b"]))
        assert (0, 40) in pairs
        got = out.loc[(out["doc_a"] == 0) & (out["doc_b"] == 40), "jaccard"].iloc[0]
        assert got > 0.7

    def test_pairwise_jaccard_kernel_matches_loop(self):
        """The exchange-routed verify kernel (vectorized, no per-pair loop)
        must equal the naive per-pair intersect1d reference on random
        sorted-unique sets, including disjoint and identical pairs."""
        from mpds_ray.pipelines.text import _pairwise_jaccard

        sets = [
            np.unique(rng.integers(0, 200, rng.integers(1, 60)).astype(np.uint64))
            for _ in range(30)
        ]
        sets.append(sets[0].copy())  # identical pair target
        sets.append(np.array([10**6], dtype=np.uint64))  # disjoint target
        flat = np.concatenate(sets)
        offs = np.r_[0, np.cumsum([s.size for s in sets])]
        pa_idx = np.array([0, 3, 7, 0, 5, 30], dtype=np.int64)
        pb_idx = np.array([30, 4, 8, 31, 5, 31], dtype=np.int64)
        got = _pairwise_jaccard(flat, offs, pa_idx, pb_idx)
        want = np.array([jaccard(sets[i], sets[j]) for i, j in zip(pa_idx, pb_idx)])
        np.testing.assert_allclose(got, want, rtol=1e-12)


class TestSimHash:
    def test_deterministic(self):
        toks = [rng.integers(0, 50257, 50) for _ in range(5)]
        a = simhash_batch(toks)
        b = simhash_batch([t.copy() for t in toks])
        np.testing.assert_array_equal(a, b)

    def test_hamming_locality(self):
        base = rng.integers(0, 50257, 400)
        near = base.copy()
        near[:8] = rng.integers(0, 50257, 8)
        far = rng.integers(0, 50257, 400)
        h = simhash_batch([base, near, far])
        d_near = bin(int(h[0]) ^ int(h[1])).count("1")
        d_far = bin(int(h[0]) ^ int(h[2])).count("1")
        assert d_near < d_far


class TestKnn:
    def test_ivf_recall(self, ray_session, sf_dir):
        from mpds_ray.pipelines.knn import knn_cosine_top10, knn_ivf_top10

        brute = knn_cosine_top10(sf_dir)
        ivf = knn_ivf_top10(sf_dir)
        recall = len(set(brute["vec_id"]) & set(ivf["vec_id"])) / len(brute)
        assert recall >= 0.5  # 2 of 8 cells probed; >=50% of true top-10

    def test_brute_force_is_exact(self, ray_session, sf_dir):
        from mpds_ray.pipelines.knn import knn_cosine_top10, _query_vector

        got = knn_cosine_top10(sf_dir)
        emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
        m = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
        q = _query_vector(sf_dir)
        sims = (m @ (q / np.linalg.norm(q))) / np.linalg.norm(m, axis=1)
        emb["cos_sim"] = np.round(sims, 6)
        want = (
            emb[emb["vec_id"] != 0]
            .sort_values(["cos_sim", "vec_id"], ascending=[False, True])
            .head(10)
        )
        np.testing.assert_array_equal(got["vec_id"].to_numpy(), want["vec_id"].to_numpy())


class TestMultimodal:
    def test_decode_raises_on_undecodable_format(self):
        # random bytes / PNG magic: no netpbm, no PIL in this container
        dec = DecodeImage(fake=False)
        with pytest.raises(NotImplementedError):
            dec(synth_media_table(4).to_pandas())

    def test_netpbm_decode_roundtrip(self):
        from mpds_ray.stages.multimodal import decode_netpbm, synth_ppm_payload

        buf = synth_ppm_payload(13, 7, seed=5)
        img = decode_netpbm(buf)
        assert img.shape == (7, 13, 3) and img.dtype == np.uint8
        want = np.random.default_rng(5).integers(0, 256, (7, 13, 3), dtype=np.uint8)
        np.testing.assert_array_equal(img, want)
        # header comments survive parsing
        img2 = decode_netpbm(b"P5\n# c\n2 2\n255\n" + bytes([1, 2, 3, 4]))
        np.testing.assert_array_equal(img2, np.array([[1, 2], [3, 4]], dtype=np.uint8))

    def test_wav_decode_roundtrip(self):
        from mpds_ray.stages.multimodal import decode_wav, synth_wav_payload

        buf = synth_wav_payload(1600, 16_000, seed=3)
        x, sr = decode_wav(buf)
        assert sr == 16_000 and x.shape == (1600, 1)
        # 0.5-amplitude sine + small noise -> rms ~ 0.5/sqrt(2)
        assert abs(float(np.sqrt((x**2).mean())) - 0.3536) < 0.03

    def test_real_decode_pipeline(self, ray_session):
        """REAL codecs end-to-end through the actor pool: PPM images decode
        to true (h, w) and pixel means; WAV audio decodes to true duration
        and RMS."""
        import pyarrow.compute as pc
        import ray.data as rd

        from mpds_ray.stages.multimodal import DecodeAudio, decode_netpbm, decode_wav

        t = synth_media_table(36, seed=9, real=True)
        imgs = t.filter(pc.equal(t["kind"], "image"))
        out = decode_pipeline(rd.from_arrow(imgs), fake=False, batch_size=8).to_pandas()
        assert len(out) == imgs.num_rows > 0
        ref = decode_netpbm(bytes(imgs["payload"][0].as_py()))
        got0 = out.loc[out["media_id"] == imgs["media_id"][0].as_py()].iloc[0]
        assert got0["decoded_mean"] == pytest.approx(float(ref.mean()), abs=1e-6)
        assert got0["thumb_height"] == min(ref.shape[0], 64)

        auds = t.filter(pc.equal(t["kind"], "audio"))
        aout = (
            rd.from_arrow(auds)
            .map_batches(DecodeAudio, batch_format="pandas", batch_size=8, concurrency=2)
            .to_pandas()
        )
        assert len(aout) == auds.num_rows > 0
        x, sr = decode_wav(bytes(auds["payload"][0].as_py()))
        got0 = aout.loc[aout["media_id"] == auds["media_id"][0].as_py()].iloc[0]
        assert got0["duration_s"] == pytest.approx(x.shape[0] / sr, abs=1e-6)
        assert got0["rms"] == pytest.approx(float(np.sqrt((x**2).mean())), abs=1e-6)
        assert got0["sample_rate"] == 16_000

    def test_fake_decode_pipeline(self, ray_session):
        import ray.data as rd

        media = rd.from_arrow(synth_media_table(32))
        out = decode_pipeline(media, fake=True, batch_size=8, concurrency=2).to_pandas()
        assert len(out) == 32
        assert {"media_id", "decoded_mean", "thumb_width"} <= set(out.columns)
        # deterministic across runs
        out2 = decode_pipeline(
            rd.from_arrow(synth_media_table(32)), fake=True, batch_size=8, concurrency=2
        ).to_pandas()
        pd.testing.assert_frame_equal(
            out.sort_values("media_id").reset_index(drop=True),
            out2.sort_values("media_id").reset_index(drop=True),
        )

    def test_frame_sampler_fanout(self):
        b = synth_media_table(6).to_pandas()
        out = FrameSampler(n_frames=3)(b)
        assert len(out) == 18
        assert out.groupby("media_id")["frame_idx"].nunique().eq(3).all()

    def test_y4m_roundtrip(self):
        from mpds_ray.stages.multimodal import decode_y4m, synth_y4m_payload

        buf = synth_y4m_payload(12, 10, 5, seed=3)
        frames, w, h = decode_y4m(buf)
        assert (frames.shape, w, h) == ((5, 10, 12), 12, 10)
        # frames differ (moving gradient) and are deterministic
        assert not np.array_equal(frames[0], frames[1])
        frames2, _, _ = decode_y4m(synth_y4m_payload(12, 10, 5, seed=3))
        assert np.array_equal(frames, frames2)
        # hand-built mono stream: known luma bytes decode exactly
        mono = b"YUV4MPEG2 W2 H2 F25:1 Cmono\nFRAME\n" + bytes([10, 20, 30, 40])
        f, w2, h2 = decode_y4m(mono)
        assert np.array_equal(f[0], [[10, 20], [30, 40]])
        with pytest.raises(ValueError):
            decode_y4m(b"RIFFxxxx")

    def test_frame_sampler_real_decode(self):
        from mpds_ray.stages.multimodal import synth_y4m_payload

        b = pd.DataFrame(
            {
                "media_id": [1, 2],
                "payload": [
                    synth_y4m_payload(8, 8, 10, seed=1),
                    synth_y4m_payload(6, 4, 2, seed=2),
                ],
            }
        )
        out = FrameSampler(n_frames=4, fake=False)(b)
        # 4 evenly-spaced distinct frames of 10; only 2 exist for media 2
        assert list(out[out.media_id == 1]["frame_idx"]) == [0, 2, 5, 7]
        assert list(out[out.media_id == 2]["frame_idx"]) == [0, 1]
        assert (out[out.media_id == 1]["n_frames_total"] == 10).all()
        # luma stats match a direct recompute
        from mpds_ray.stages.multimodal import decode_y4m

        frames, _, _ = decode_y4m(bytes(b["payload"][0]))
        row = out[(out.media_id == 1) & (out.frame_idx == 2)].iloc[0]
        assert row["y_mean"] == round(float(frames[2].astype(np.float64).mean()), 6)

    def test_frame_sampler_unknown_codec_raises(self):
        b = pd.DataFrame({"media_id": [1], "payload": [b"\x00\x01\x02\x03" * 64]})
        with pytest.raises(NotImplementedError):
            FrameSampler(fake=False)(b)


class TestSegmentVectorizedParity:
    """The segment-vectorized text kernels must equal the scalar references
    doc-for-doc, including short-doc (<3 tokens) and empty-doc edges."""

    def _docs(self):
        import numpy as np

        rng = np.random.default_rng(11)
        docs = [rng.integers(0, 50257, rng.integers(3, 40)).astype(np.int64)
                for _ in range(30)]
        docs += [np.array([5], dtype=np.int64), np.array([7, 9], dtype=np.int64),
                 np.array([], dtype=np.int64)]
        return docs

    def _flat(self, docs):
        import numpy as np

        flat = np.concatenate([d for d in docs]).astype(np.uint64) if docs else np.array([], dtype=np.uint64)
        offs = np.r_[0, np.cumsum([len(d) for d in docs])].astype(np.int64)
        return flat, offs

    def test_shingles_flat_matches_scalar(self):
        import numpy as np

        from mpds_ray.pipelines.text import _shingles, _shingles_flat, _unique_per_segment

        docs = self._docs()
        flat, offs = self._flat(docs)
        sh, sh_offs = _shingles_flat(flat, offs)
        u, seg, n_uniq = _unique_per_segment(sh, sh_offs)
        per_doc = np.split(u, np.cumsum(n_uniq)[:-1])
        for d, got in zip(docs, per_doc):
            want = np.unique(_shingles(d))  # scalar ref (uniqued for parity)
            assert np.array_equal(np.sort(got), want), d

    def test_simhash_flat_matches_scalar(self):
        import numpy as np

        from mpds_ray.pipelines.text import simhash_batch, simhash_flat

        docs = [d for d in self._docs() if len(d)]
        flat, offs = self._flat(docs)
        got = simhash_flat(flat, offs)
        want = simhash_batch([d for d in docs])
        assert np.array_equal(got, want)

    def test_minhash_signature_vector_parity(self):
        """The banded sig path inside sig_batch equals per-doc minhash_signature."""
        import numpy as np

        from mpds_ray.pipelines.text import (
            N_HASHES,
            _segment_reduceat,
            _shingles,
            _shingles_flat,
            _splitmix64,
            minhash_signature,
        )

        seeds = _splitmix64(np.arange(1, N_HASHES + 1, dtype=np.uint64) * np.uint64(0x9E3779B9))
        docs = self._docs()
        flat, offs = self._flat(docs)
        sh, sh_offs = _shingles_flat(flat, offs)
        sig = np.empty((N_HASHES, len(docs)), dtype=np.uint64)
        for s_i in range(N_HASHES):
            sig[s_i] = _segment_reduceat(
                np.minimum, _splitmix64(sh ^ seeds[s_i]), sh_offs, np.iinfo(np.uint64).max
            )
        for i, d in enumerate(docs):
            want = minhash_signature(_shingles(d), seeds)
            assert np.array_equal(sig[:, i], want), i


def test_similar_pairs_exact_complete_vs_brute(ray_session, tmp_path):
    """The prefix-filter join must find EVERY pair with shingle-Jaccard >=
    t (lossless, unlike LSH): compare to a scalar brute-force all-pairs
    reference on a corpus salted with near-dup chains."""
    from mpds_ray.pipelines.text import _shingles, similar_pairs_exact
    from mpds_ray.tokenize import tokenize_words_py

    rng2 = np.random.default_rng(11)
    vocab = [chr(ord("a") + i) + chr(ord("a") + j) for i in range(26) for j in range(5)]
    texts = []
    for i in range(40):
        words = list(rng2.choice(vocab, 30))
        texts.append(" ".join(words))
        if i % 4 == 0:  # near-dup: mutate a few words -> J straddles 0.5
            mut = words.copy()
            for p in rng2.integers(0, 30, rng2.integers(1, 8)):
                mut[p] = str(rng2.choice(vocab))
            texts.append(" ".join(mut))
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts, "source": "s"}
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")

    # scalar reference: per-doc shingle set via the scalar tokenizer
    sets = []
    for t in texts:
        toks = np.array([tokenize_words_py(w) for w in t.split(" ")], dtype=np.int64)
        sets.append(set(_shingles(toks).tolist()))
    # threshold 0.3 is NOT binary-representable — regression for the float
    # ceil/size-filter bugs (np.ceil(0.07*100)==8 class); 0.5 is the default
    for t in (0.5, 0.3):
        want = set()
        for i in range(len(sets)):
            for j in range(i + 1, len(sets)):
                inter = len(sets[i] & sets[j])
                if inter and inter / (len(sets[i]) + len(sets[j]) - inter) >= t:
                    want.add((i, j))
        assert want, "fixture must plant qualifying pairs"

        out = similar_pairs_exact(str(tmp_path), threshold=t)
        got = set(zip(out["doc_a"], out["doc_b"]))
        assert got == want
        assert (out["jaccard"] >= t).all()


def test_repeated_ngram_stats_planted(ray_session, tmp_path):
    from mpds_ray.pipelines.text import repeated_ngram_stats

    # tokenizer hashes (first char, word len): every word below differs in
    # its FIRST character, so all tokens are distinct (fixture rule)
    w = [chr(ord("a") + i) * 2 for i in range(26)]  # aa bb cc ...
    texts = [
        " ".join(w[0:10]),              # doc0: 3 grams; gram@0 shared w/ doc1
        " ".join(w[0:8] + w[20:22]),    # doc1: 3 grams; gram@0 == doc0 gram@0
        " ".join(w[10:18] + w[10:18]),  # doc2: 9 grams; gram@0 == gram@8 (self)
        " ".join(w[18:20]),             # doc3: < k tokens -> no output row
    ]
    df = pd.DataFrame(
        {"doc_id": np.arange(4, dtype=np.int64), "text": texts, "source": "s"}
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")
    out = repeated_ngram_stats(str(tmp_path), num_buckets=4).set_index("doc_id")
    assert list(out.index) == [0, 1, 2]
    assert out.loc[0, "n_grams"] == 3 and out.loc[0, "n_repeated"] == 1
    assert out.loc[1, "n_grams"] == 3 and out.loc[1, "n_repeated"] == 1
    assert out.loc[2, "n_grams"] == 9 and out.loc[2, "n_repeated"] == 2
    assert out.loc[2, "repeated_frac"] == pytest.approx(round(2 / 9, 6))


def test_doc_repetition_ratio_hand_values(ray_session, tmp_path):
    from mpds_ray.pipelines.text import doc_repetition_ratio

    texts = [
        "a b a b a b",          # trigrams aba,bab,aba,bab -> 4 total, 2 distinct -> 0.5
        "one two three four",   # 2 distinct trigrams of 2 -> 0.0
        "x y",                  # < 3 tokens -> 0.0 by definition
        "w w w w w",            # all trigrams identical -> 1 distinct of 3 -> 2/3
    ]
    df = pd.DataFrame(
        {"doc_id": np.arange(4, dtype=np.int64), "text": texts, "source": "s",
         "lang": "en", "n_chars": [len(t) for t in texts]}
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")
    out = doc_repetition_ratio(str(tmp_path)).to_pandas().sort_values("doc_id")
    got = dict(zip(out.doc_id, out.rep_ratio))
    assert got[0] == pytest.approx(0.5)
    assert got[1] == 0.0
    assert got[2] == 0.0
    assert got[3] == pytest.approx(round(2 / 3, 6))


def test_unigram_logprob_reference(ray_session, tmp_path):
    """Distributed two-pass unigram LM == in-process NumPy reference on the
    same tokenizer output; the repetitive (common-token) doc must score
    higher than the diverse one."""
    from mpds_ray.pipelines.text import _flat_tokens, unigram_logprob
    from mpds_ray.tokenize import VOCAB, tokenize_batch

    texts = ["common common common common", "rare words all different here"]
    df = pd.DataFrame(
        {"doc_id": np.arange(2, dtype=np.int64), "text": texts, "source": "s",
         "lang": "en", "n_chars": [len(t) for t in texts]}
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")
    out = unigram_logprob(str(tmp_path)).to_pandas().sort_values("doc_id")

    flat, offs = _flat_tokens(tokenize_batch(pa.table(
        {"doc_id": df.doc_id.to_numpy(), "text": texts, "source": ["s", "s"]}
    )))
    counts = np.bincount(flat.astype(np.int64), minlength=VOCAB)
    lp = np.log((counts + 1.0) / (counts.sum() + VOCAB))
    exp = [round(lp[flat[offs[i]:offs[i + 1]].astype(np.int64)].mean(), 6)
           for i in range(2)]
    assert list(out.mean_logprob) == pytest.approx(exp, abs=1e-9)
    assert out.mean_logprob.iloc[0] > out.mean_logprob.iloc[1]


def test_contained_pairs_exact_complete_vs_brute(ray_session, tmp_path):
    """The containment join must find EVERY ordered pair with
    round(|Sa∩Sb|/|Sa|, 6) >= t — including near-SUBSET pairs whose
    Jaccard is far below t (the asymmetric case the symmetric join
    misses by design)."""
    from mpds_ray.pipelines.text import _shingles, contained_pairs_exact
    from mpds_ray.tokenize import tokenize_words_py

    rng = np.random.default_rng(23)
    vocab = [chr(ord("a") + i) + chr(ord("a") + j) for i in range(26) for j in range(5)]
    texts = []
    for i in range(30):
        words = list(rng.choice(vocab, 40))
        texts.append(" ".join(words))
        if i % 5 == 0:
            # plant a SHORT near-subset: 12 consecutive words of the long
            # doc -> containment(short -> long) ~ 1.0, Jaccard ~ 0.25
            texts.append(" ".join(words[3:15]))
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts, "source": "s"}
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")

    sets = []
    for t in texts:
        toks = np.array([tokenize_words_py(w) for w in t.split(" ")], dtype=np.int64)
        sets.append(set(_shingles(toks).tolist()))
    for thr in (0.5, 0.8):
        want = set()
        for i in range(len(sets)):
            for j in range(len(sets)):
                if i == j or not sets[i]:
                    continue
                c = len(sets[i] & sets[j]) / len(sets[i])
                if round(c, 6) >= thr:
                    want.add((i, j))
        assert want, "fixture must plant qualifying ordered pairs"
        # the planted subset pairs must be among them at thr=0.8
        if thr == 0.8:
            assert any(a > b for (a, b) in want), "subset (short->long) pair missing"

        out = contained_pairs_exact(str(tmp_path), threshold=thr)
        got = set(zip(out["doc_a"], out["doc_b"]))
        assert got == want
        # ordered semantics: containment is NOT symmetric on the planted
        # subset pairs (short in long, not vice versa)
        if thr == 0.8:
            asym = [(a, b) for (a, b) in want if (b, a) not in want]
            assert asym
