"""Dedup tiers: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from advanced_data_profile_spark.operators import dedup as D


@pytest.fixture(scope="module")
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = "the quick brown fox jumps over the lazy dog near the river bank tonight"
    far = "completely different content about spark distributed aggregation engines"
    pdf = pd.DataFrame({
        "id": list(range(6)),
        "text": [base, "  THE quick   brown fox jumps over the lazy dog near the river bank today!",
                 near, far, base, "unrelated short text"],
    })
    return spark.createDataFrame(pdf)


def test_exact_dup_groups(corpus):
    groups = D.exact_dup_groups(corpus, "id", "text").collect()
    # ids 0, 1, 4 normalize to identical text -> one group of 3
    assert len(groups) == 1
    assert groups[0].dup_cnt == 3
    assert groups[0].min_id == 0


def test_dedup_exact_keep_first(corpus):
    kept = D.dedup_exact_keep_first(corpus, "id", "text")
    ids = sorted(r.id for r in kept.collect())
    assert ids == [0, 2, 3, 5]


def test_minhash_pipeline_finds_near_dups(corpus):
    out = D.minhash_dedup(corpus, "id", "text", k=16, bands=8, threshold=0.5)
    pairs = {(r.id_a, r.id_b): r.est_jaccard for r in out.collect()}
    assert (0, 4) in pairs and pairs[(0, 4)] == 1.0   # exact dups
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0   # normalization dups
    near = [p for p in pairs if p in ((0, 2), (2, 4), (1, 2))]
    assert near, "one-word-changed docs must be LSH candidates at b=8"
    assert all(p not in pairs for p in ((0, 3), (3, 5)))


def test_minhash_signature_determinism(corpus):
    s1 = {r.id: (r.mh0, r.mh1) for r in D.minhash_signatures(corpus, "id", "text", k=2).collect()}
    s2 = {r.id: (r.mh0, r.mh1) for r in D.minhash_signatures(corpus, "id", "text", k=2).collect()}
    assert s1 == s2
    assert s1[0] == s1[4]  # identical docs -> identical signatures


def test_simhash_near_dups(corpus):
    sigs = D.simhash(corpus, "id", "text", bits=32)
    by = {r.id: r.simhash for r in sigs.collect()}
    assert by[0] == by[1] == by[4]
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in D.simhash_near_dups(sigs, max_hamming=6, prefix_bits=4).collect()}
    assert pairs.get((0, 4)) == 0
    assert (0, 3) not in pairs


def test_ngram_jaccard(corpus):
    pairs = corpus.sparkSession.createDataFrame(
        pd.DataFrame({"id_a": [0, 0], "id_b": [4, 3]})
    )
    out = {(r.id_a, r.id_b): r.jaccard
           for r in D.ngram_jaccard(corpus, pairs, "id", "text", 3).collect()}
    assert out[(0, 4)] == 1.0
    assert out[(0, 3)] < 0.2


def test_embedding_near_dups(spark):
    pdf = pd.DataFrame({
        "id": [1, 2, 3, 4],
        "v": [[1.0, 0.1, 0.2, 0.3, 0.1, 0.2, 0.1, 0.4]] * 2   # identical pair
             + [[-1.0, 0.5, -0.2, 0.3, 0.1, -0.2, 0.1, 0.4]]  # different bucket
             + [[1.0, 0.1, 0.2, 0.3, 0.1, 0.2, 0.1, -0.4]],   # same-ish, sign flip in dim 8
    })
    df = spark.createDataFrame(pdf)
    out = {(r.id_a, r.id_b): r.cosine
           for r in D.embedding_near_dups(df, "id", "v", threshold=0.9, sign_bits=4).collect()}
    assert out.get((1, 2)) == 1.0
    assert (1, 3) not in out  # bucketed out (different signs)
