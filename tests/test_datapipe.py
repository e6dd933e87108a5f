"""Property tests for the training-data pipeline layer: the dedup families
must actually FIND the planted duplicates (recall), the multimodal
mapInPandas path must be deterministic and schema-stable, and the ANN
baseline must agree with an exact NumPy computation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from real_big_data_project_spark.datapipe import corpus as CP
from real_big_data_project_spark.datapipe import dedup_text as DT
from real_big_data_project_spark.datapipe import multimodal as MM
from real_big_data_project_spark.datapipe import similarity as SIM
from real_big_data_project_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def corpus(docs):
    return CP.with_near_duplicates(docs)


def _planted_pairs(docs, mod):
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    offset = max(ids) + 1  # with_near_duplicates derives it the same way
    return {(i, i + offset) for i in ids if i % 3 == mod}


def test_exact_dedup_finds_planted_exact_copies(docs, corpus):
    groups = DT.exact_dedup_groups(corpus).filter(F.col("n_docs") > 1).collect()
    n_exact = len(_planted_pairs(docs, 0))
    assert len(groups) == n_exact
    assert all(g.n_docs == 2 for g in groups)


def test_minhash_lsh_recalls_planted_near_dups(docs, corpus):
    cand = DT.minhash_lsh_candidates(corpus)
    found = {(r.doc_a, r.doc_b) for r in cand.collect()}
    exact = _planted_pairs(docs, 0)   # identical text ⇒ always collide
    assert exact <= found
    near = _planted_pairs(docs, 1)    # jaccard ≈ 0.9 ⇒ nearly always
    recall = len(near & found) / max(len(near), 1)
    assert recall > 0.9, f"near-dup recall {recall}"


def test_jaccard_verification_bounds(docs, corpus):
    cand = DT.minhash_lsh_candidates(corpus)
    verified = DT.ngram_jaccard_pairs(corpus, cand, threshold=0.6)
    rows = verified.collect()
    assert rows, "no verified near-duplicates"
    assert all(0.6 <= r.jaccard <= 1.0 for r in rows)
    # exact copies verify at jaccard == 1.0
    exact = _planted_pairs(docs, 0)
    ones = {(r.doc_a, r.doc_b) for r in rows if r.jaccard == 1.0}
    assert exact <= ones


def test_exploded_shingles_match_reference_column_impl(corpus):
    """The window-lead shingle construction (fast path) must produce the
    exact shingle SETS of the HOF reference word_shingles — the oracle SQL
    is written against the latter's definition."""
    from pyspark.sql import functions as F

    from real_big_data_project_spark.functions.hashing import word_shingles

    fast = {
        r.doc_id: set(r.shingles)
        for r in DT.shingle_sets(corpus, 3).collect()
    }
    ref = {
        r.doc_id: set(r.sh)
        for r in corpus.select(
            "doc_id", word_shingles("text", 3).alias("sh")).collect()
    }
    assert fast == ref


def test_simhash_df_impl_matches_reference_column_impl(docs):
    """The explode/aggregate SimHash (fast path) must produce the exact
    fingerprint of the HOF reference implementation — the oracle SQL is
    written against the latter's definition."""
    from pyspark.sql import functions as F

    from real_big_data_project_spark.functions.hashing import simhash32_bits

    fast = {r.doc_id: r.sig for r in DT.simhash_signatures(docs).collect()}
    ref = {
        r.doc_id: r.sig
        for r in docs.select("doc_id", simhash32_bits("text").alias("sig"))
        .limit(50).collect()
    }
    assert ref and all(fast[k] == v for k, v in ref.items())


def test_simhash_finds_exact_copies_at_zero_hamming(docs, corpus):
    pairs = DT.simhash_near_pairs(corpus, max_hamming=3)
    zero = {(r.doc_a, r.doc_b) for r in pairs.collect() if r.hamming == 0}
    assert _planted_pairs(docs, 0) <= zero


def test_embedding_near_dups_are_exactly_the_planted_copies(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = SIM.embedding_near_duplicates(emb, threshold=0.9).collect()
    all_ids = [r.vec_id for r in emb.select("vec_id").collect()]
    offset = max(all_ids) + 1  # with_perturbed_copies derives it the same way
    found = {(r.vec_a, r.vec_b) for r in pairs}
    expected = {(i, i + offset) for i in all_ids if i % 2 == 0}
    assert found == expected  # natural max cosine ≈ 0.51 ≪ 0.9
    assert all(r.sim > 0.99 for r in pairs)


def test_ann_brute_topk_matches_numpy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    got = SIM.ann_brute_topk(emb, [0], k=5).orderBy("rank").collect()
    pdf = emb.toPandas()
    mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    ids = pdf["vec_id"].to_numpy()
    q = mat[ids == 0][0]
    sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = sorted(
        [(round(s, 5), int(i)) for s, i in zip(sims, ids) if i != 0],
        key=lambda t: (-t[0], t[1]),
    )[:5]
    assert [(r.neighbor_id, r.sim) for r in got] == [(i, s) for s, i in order]


def test_multimodal_features_deterministic_and_shaped(docs):
    assets = MM.synthetic_assets(docs)
    f1 = MM.extract_features(assets).orderBy("asset_id").collect()
    f2 = MM.extract_features(assets).orderBy("asset_id").collect()
    assert f1 == f2, "mapInPandas feature extraction must be deterministic"
    assert all(len(r.features) == MM.FEATURE_DIM for r in f1)
    assert all(16 <= r.width <= 255 and 16 <= r.height <= 255 for r in f1)
    assert {r.modality for r in f1} == {"image", "audio", "video"}


def test_frame_sample_counts(docs):
    assets = MM.synthetic_assets(docs)
    frames = MM.frame_sample(assets, every_n_bytes=64)
    agg = frames.groupBy("asset_id").agg(
        F.count("*").alias("n"), F.max("n_bytes").alias("b")
    ).collect()
    assert agg
    for r in agg:
        assert r.n == max(r.b // 64, 1)
