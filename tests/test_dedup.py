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
             for r in D.simhash_near_dups(sigs, max_hamming=6, bits=32).collect()}
    assert pairs.get((0, 4)) == 0
    assert (0, 3) not in pairs


def test_simhash_block_lsh_recall_is_exact(spark):
    """Pigeonhole guarantee: planted signatures within hamming <= 3 of a
    base MUST all be found — including pairs whose differing bits fall
    inside any single block (the case the old fixed-prefix probe lost)."""
    import itertools

    base = 0x0F0F0F0F0F0F0F0 & ((1 << 60) - 1)
    rows = [(0, base)]
    rid = 1
    # flip every 1-, 2- and a sweep of 3-bit combinations across the
    # whole 60-bit range, including all-in-one-block patterns
    for b in range(60):
        rows.append((rid, base ^ (1 << b))); rid += 1
    for b1, b2 in itertools.combinations(range(0, 60, 7), 2):
        rows.append((rid, base ^ (1 << b1) ^ (1 << b2))); rid += 1
    for trio in [(0, 1, 2), (14, 13, 12), (15, 16, 17), (57, 58, 59), (0, 29, 59)]:
        m = 0
        for b in trio:
            m ^= 1 << b
        rows.append((rid, base ^ m)); rid += 1
    far = base ^ ((1 << 10) - 1)  # hamming 10 from base
    rows.append((rid, far))
    sigs = spark.createDataFrame(rows, "id long, simhash long")
    got = {(r.id_a, r.id_b) for r in D.simhash_near_dups(sigs, 3, bits=60).collect()}
    # brute-force expectation
    sig_by = dict(rows)
    want = {
        (a, b)
        for a in sig_by for b in sig_by if a < b
        and bin(sig_by[a] ^ sig_by[b]).count("1") <= 3
    }
    assert got == want  # recall AND precision exactly 1.0


def test_lsh_candidate_growth_is_linear(spark):
    """Doubling n with n-scaled bits (auto_sign_bits) must not blow up
    candidate pairs quadratically — the 100 TB shape check."""
    import numpy as np

    rng = np.random.default_rng(7)

    def mk(n):
        vecs = rng.normal(size=(n, 64)).astype(float).tolist()
        return spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)], "id long, v array<double>"
        )

    def n_candidates(df, n):
        bits = D.auto_sign_bits(n, 64, n_bands=4)
        b = D.embedding_band_buckets(df, "id", "v", 4, bits)
        return (
            b.alias("l")
            .join(
                b.alias("r"),
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bkt") == F.col("r.bkt"))
                & (F.col("l.id") < F.col("r.id")),
            )
            .select("l.id", "r.id")
            .distinct()
            .count()
        )

    c1 = n_candidates(mk(256), 256)
    c2 = n_candidates(mk(512), 512)
    # quadratic would be ~4x; linear-with-extra-bit is ~<=2.5x
    assert c2 <= max(4 * c1, 60) if c1 < 20 else c2 <= 3.0 * c1


def test_dup_clusters_chain_and_keep_min(spark):
    """Multi-hop components: a chain a-b-c-d must collapse to one
    cluster (exercises >1 propagation round), disjoint pairs stay
    separate; dedup keeps exactly the min id per cluster."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "id_a long, id_b long",
    )
    got = {r.id: r.cluster for r in D.dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}

    df = spark.createDataFrame(
        [(i, f"doc{i}") for i in [1, 2, 3, 4, 5, 10, 11, 99]],
        "doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in
                  D.dedup_keep_cluster_min(df, "doc_id", pairs).collect())
    # 5 and 99 untouched (no near-dups); 1 and 10 are cluster keepers
    assert kept == [1, 5, 10, 99]


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
           for r in D.embedding_near_dups(df, "id", "v", threshold=0.9,
                                          n_bands=2, bits_per_band=4).collect()}
    assert out.get((1, 2)) == 1.0
    assert (1, 3) not in out  # no band collides (sign flips in both halves)


def test_embedding_banded_recall_on_planted_pairs(spark):
    """Planted near-identical vectors must survive banding + verify;
    auto bits path (bits_per_band=None) must also find them."""
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.normal(size=(20, 32))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, v.tolist()))
        rows.append((100 + i, (v + rng.normal(scale=0.01, size=32)).tolist()))
    df = spark.createDataFrame(rows, "id long, v array<double>")
    out = D.embedding_near_dups(df, "id", "v", threshold=0.99,
                                n_bands=4, bits_per_band=None)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert {(i, 100 + i) for i in range(20)} <= got


def test_dup_clusters_raises_when_unconverged(spark):
    """A component whose diameter exceeds max_iter must FAIL LOUDLY —
    returning partially-propagated labels would silently split it."""
    chain = [(i, i + 1) for i in range(6)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        D.dup_clusters(pairs, max_iter=2)
    # enough rounds: one component labeled 0
    got = {r.cluster for r in D.dup_clusters(pairs, max_iter=10).collect()}
    assert got == {0}


def test_embedding_near_dups_defaults_scale_bits_with_n(spark):
    """The DEFAULTS path (bits_per_band=None) derives ~log2(n) bits —
    a 100 TB caller on defaults must never get a fixed 256-bucket band.
    Result equals the explicitly-pinned construction at the derived
    bits (same bucket function, just auto-sized)."""
    import numpy as np

    rng = np.random.default_rng(11)

    def mk(n):
        vecs = rng.normal(size=(n, 64)).astype(float).tolist()
        return spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)], "id long, v array<double>"
        )

    small, big = mk(256), mk(4096)
    b_small = D.resolve_sign_bits(small, "v")
    b_big = D.resolve_sign_bits(big, "v")
    assert b_small == 8 and b_big == 12  # ceil(log2(n))
    # n_rows hint (manifest/scan stats) must skip the count() job
    from unittest.mock import patch

    with patch.object(type(big), "count", side_effect=AssertionError("count ran")):
        assert D.resolve_sign_bits(big, "v", n_rows=4096) == 12
    got = {
        (r.id_a, r.id_b)
        for r in D.embedding_near_dups(small, "id", "v", threshold=0.2).collect()
    }
    pinned = {
        (r.id_a, r.id_b)
        for r in D.embedding_near_dups(
            small, "id", "v", threshold=0.2, bits_per_band=b_small
        ).collect()
    }
    assert got == pinned


def test_dup_clusters_long_chain_converges_logarithmically(spark):
    """Pointer jumping: a 200-node path (diameter 199) must converge
    within the DEFAULT max_iter (25) — min-propagation alone would need
    ~199 rounds. Also checks exactness on a branchy graph."""
    chain = [(i, i + 1) for i in range(199)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    got = {r.id: r.cluster for r in D.dup_clusters(pairs).collect()}
    assert set(got.values()) == {0} and len(got) == 200

    # two stars sharing a bridge + an isolated pair
    edges = (
        [(100, 100 + i) for i in range(1, 6)]
        + [(200, 200 + i) for i in range(1, 6)]
        + [(105, 201)]  # bridge joins both stars
        + [(500, 501)]
    )
    pairs2 = spark.createDataFrame(edges, "id_a long, id_b long")
    got2 = {r.id: r.cluster for r in D.dup_clusters(pairs2).collect()}
    star = {n for n in got2 if n < 300}
    assert {got2[n] for n in star} == {100}
    assert got2[500] == 500 and got2[501] == 500


def test_decontaminate_flags_planted_overlap(spark):
    """A corpus doc containing a benchmark passage verbatim (>= n
    shared tokens) is flagged; clean docs are not; docs shorter than n
    tokens are clean by definition; the benchmark side never needs to
    be part of the corpus."""
    from advanced_data_profile_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "intro text then the quick brown fox jumps over the lazy "
                "dog tonight and more trailing words"),
            (2, "a completely unrelated document about distributed "
                "query engines and shuffle strategies"),
            (3, "too short"),
        ],
        "doc_id long, text string",
    )
    out = {r.id: r for r in decontaminate(
        corpus, bench, "doc_id", "text", n=8
    ).collect()}
    assert out[1].contaminated is True and out[1].n_overlaps >= 1
    assert out[2].contaminated is False and out[2].n_overlaps == 0
    assert out[3].contaminated is False


def test_decontaminate_plan_broadcasts_benchmark(spark):
    """Scale contract: the benchmark hash set (small by construction)
    is broadcast-hinted so the corpus grams semi-join without a corpus
    shuffle. The HIT relation is one row per contaminated corpus doc —
    unbounded by the benchmark — so it must NOT carry a forced
    broadcast hint: AQE picks its strategy from runtime size."""
    from advanced_data_profile_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame([(0, "a b c d e f g h")],
                                  "doc_id long, text string")
    corpus = spark.createDataFrame([(1, "a b c d e f g h i j")],
                                   "doc_id long, text string")
    out = decontaminate(corpus, bench, "doc_id", "text", n=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 1  # banned-gram semi-join
    # the forced hint on hits is gone: the optimized logical plan keeps
    # exactly ONE explicit broadcast hint (the banned side)
    logical = out._jdf.queryExecution().optimizedPlan().toString()
    assert logical.count("strategy=broadcast") == 1


def test_decontaminate_benchmark_with_different_schema(spark):
    """Eval sets rarely share the corpus's column names: bench_id_col /
    bench_text_col must make any (id, text)-shaped benchmark usable."""
    from advanced_data_profile_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [("q1", "the quick brown fox jumps over the lazy dog tonight")],
        "qid string, question string",
    )
    corpus = spark.createDataFrame(
        [(1, "padding then the quick brown fox jumps over the lazy dog "
             "tonight closes it")],
        "doc_id long, text string",
    )
    out = decontaminate(
        corpus, bench, "doc_id", "text",
        bench_text_col="question", bench_id_col="qid", n=8,
    ).collect()
    assert out[0].contaminated is True


def test_neardup_index_build_check_append(spark, tmp_path):
    """Incremental LSH index lifecycle: build from a corpus, check an
    incoming batch (exact copy found at est 1.0, token-shuffled
    near-dup found, novel doc clean), append, and a SECOND batch must
    see the first batch's appended state — all without rescanning
    corpus text at check time."""
    from advanced_data_profile_spark.operators.dedup import (
        neardup_index_build,
        neardup_index_check,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight again"),
            (2, "distributed query engines shuffle data between executors"),
            (3, "completely unrelated text about cooking pasta with basil"),
        ],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "lsh_index")
    neardup_index_build(corpus, "doc_id", "text", idx)

    batch1 = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog tonight again"),
            (11, "dog lazy the over jumps fox brown quick the tonight again"),
            (12, "a totally novel document about quantum chemistry methods"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.id_new: r
        for r in neardup_index_check(
            batch1, "doc_id", "text", idx, threshold=0.5, append=True
        ).collect()
    }
    assert out[10].id_indexed == 1 and out[10].est_jaccard == 1.0
    # token-set identical (minhash over DISTINCT tokens) -> also 1.0
    assert out[11].id_indexed == 1 and out[11].est_jaccard == 1.0
    assert 12 not in out

    # second batch: duplicates a FIRST-BATCH doc (not in the original
    # corpus) — only findable through the append
    batch2 = spark.createDataFrame(
        [(20, "a totally novel document about quantum chemistry methods")],
        "doc_id long, text string",
    )
    out2 = neardup_index_check(
        batch2, "doc_id", "text", idx, threshold=0.5
    ).collect()
    assert {(r.id_new, r.id_indexed) for r in out2} == {(20, 12)}


def test_neardup_index_check_plan_broadcasts_batch(spark, tmp_path):
    """Scale contract: the stored bucket relation joins against the
    BROADCAST batch keys — the index side is scanned, never shuffled
    for the candidate join."""
    from advanced_data_profile_spark.operators.dedup import (
        neardup_index_build,
        neardup_index_check,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    idx = str(tmp_path / "lsh_plan_index")
    neardup_index_build(corpus, "doc_id", "text", idx)
    out = neardup_index_check(
        spark.createDataFrame(
            [(2, "alpha beta gamma delta epsilon zeta")],
            "doc_id long, text string",
        ),
        "doc_id", "text", idx,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2  # bucket join + sig fetch


def test_neardup_index_build_append_buckets_linear(spark, tmp_path):
    """mode='append' derives buckets ONLY from the newly written
    signatures: bucket state grows linearly over repeated appends
    (the full-read-back bug re-appended every pre-existing bucket row,
    quadratic growth), and matches still see every generation."""
    from advanced_data_profile_spark.operators.dedup import (
        neardup_index_build,
        neardup_index_check,
    )

    gen1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    gen2 = spark.createDataFrame(
        [(3, "red orange yellow green blue indigo violet colors")],
        "doc_id long, text string",
    )
    gen3 = spark.createDataFrame(
        [(4, "north south east west compass directions map travel")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "lsh_append_index")
    neardup_index_build(gen1, "doc_id", "text", idx, bands=4)
    neardup_index_build(gen2, "doc_id", "text", idx, bands=4, mode="append")
    neardup_index_build(gen3, "doc_id", "text", idx, bands=4, mode="append")

    # 4 docs x 4 bands = 16 bucket rows; the full-read-back bug gave
    # 8 + 12 + 16 = 36 (every append re-wrote all prior buckets)
    assert spark.read.parquet(f"{idx}/buckets").count() == 16
    assert spark.read.parquet(f"{idx}/signatures").count() == 4

    # every generation is matchable
    batch = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta theta"),
         (11, "red orange yellow green blue indigo violet colors"),
         (12, "north south east west compass directions map travel")],
        "doc_id long, text string",
    )
    out = {(r.id_new, r.id_indexed)
           for r in neardup_index_check(batch, "doc_id", "text", idx).collect()}
    assert out == {(10, 1), (11, 3), (12, 4)}


def test_neardup_index_check_missing_index_raises(spark, tmp_path):
    """Checking against a never-built index raises a clear error (not
    a raw Hadoop FileNotFoundException or an 'unable to infer schema'
    from an empty path splat)."""
    import pytest

    from advanced_data_profile_spark.operators.dedup import neardup_index_check

    batch = spark.createDataFrame(
        [(1, "some text here")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="index not built"):
        neardup_index_check(
            batch, "doc_id", "text", str(tmp_path / "never_built")
        )


def test_hadoop_list_files_raises_on_subdirectories(spark, tmp_path):
    """The snapshot primitive guards the flat-layout contract: a
    partitioned (subdirectory) layout under the path raises instead of
    silently snapshotting zero data files; flat paths list normally."""
    import pytest

    from advanced_data_profile_spark.session import hadoop_list_files

    flat = str(tmp_path / "flat")
    spark.range(5).write.parquet(flat)
    files = hadoop_list_files(spark, flat)
    assert files and all(f.endswith(".parquet") for f in files)

    parted = str(tmp_path / "parted")
    spark.range(5).withColumn("p", F.col("id") % 2).write.partitionBy(
        "p"
    ).parquet(parted)
    with pytest.raises(ValueError, match="subdirector"):
        hadoop_list_files(spark, parted)


def test_remove_duplicate_spans_c4(spark):
    """Global span dedup is a TRANSFORM: the repeated boilerplate line
    survives only at its first occurrence (smallest (id, pos)), short
    lines never dedup, unique lines are untouched, structure and
    delimiter are preserved on rebuild, NULL text stays NULL."""
    from advanced_data_profile_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    boiler = "subscribe to our newsletter today"
    rows = [
        (1, f"first article body\n{boiler}\nunique closing one"),
        (2, f"{boiler}\nsecond article body"),
        (3, f"third body\n{boiler}"),
        (4, "the\nthe\nthe"),          # short spans repeat freely
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r.text for r in remove_duplicate_spans(
        df, "doc_id", "text").collect()}
    assert out[1] == f"first article body\n{boiler}\nunique closing one"
    assert out[2] == "second article body"
    assert out[3] == "third body"
    assert out[4] == "the\nthe\nthe"
    assert out[5] is None
    # within-doc repetition of a long span also collapses to first use
    df2 = spark.createDataFrame(
        [(1, f"{boiler}\nmiddle line here\n{boiler}")],
        "doc_id long, text string",
    )
    out2 = remove_duplicate_spans(df2, "doc_id", "text").first().text
    assert out2 == f"{boiler}\nmiddle line here"


def test_remove_duplicate_spans_matches_python_reference(spark):
    """Differential test vs a direct Python transcription of the
    semantics over a randomized 40-doc corpus (seeded): global
    first-occurrence-wins at (id, pos), short-span passthrough,
    pos-ordered rebuild."""
    import random

    from advanced_data_profile_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    rng = random.Random(41)
    vocab = [
        "alpha beta gamma", "delta line", "repeated boilerplate block",
        "x", "", "another long unique-ish span", "short", "tail words",
    ]
    rows = [
        (i, "\n".join(rng.choice(vocab) for _ in range(rng.randint(0, 6))))
        for i in range(40)
    ]

    def py_ref(rows, min_chars=15):
        segs = []
        for i, t in rows:
            for p, s in enumerate(t.split("\n")):
                segs.append((i, p, s))
        first, cnt = {}, {}
        for i, p, s in segs:
            if len(s) >= min_chars:
                cnt[s] = cnt.get(s, 0) + 1
                first.setdefault(s, (i, p))
        out = {}
        for i, t in rows:
            kept = [
                s for p, s in enumerate(t.split("\n"))
                if len(s) < min_chars or cnt[s] == 1 or first[s] == (i, p)
            ]
            out[i] = "\n".join(kept)
        return out

    expected = py_ref(rows)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r.text for r in remove_duplicate_spans(
        df, "doc_id", "text").collect()}
    assert got == expected


def test_corpus_dup_ngrams_signal(spark):
    """Cross-document duplication fractions on crafted docs: an exact
    copy scores 1.0 on both members, a contained copy scores 1.0 while
    its superset scores partially, fresh text scores 0, and short
    (< n words) docs report zero n-grams."""
    from advanced_data_profile_spark.operators.dedup import corpus_dup_ngrams

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, base),                           # copied by 2
        (2, base),                           # exact copy -> 1.0
        (3, base + " iota kappa"),           # superset: shares a prefix
        (4, "one two three four five six seven eight nine"),  # fresh
        (5, "tiny doc"),                     # < n words
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    by = {r.id: r for r in corpus_dup_ngrams(df, "doc_id", "text", n=5).collect()}
    assert by[1].frac_dup == 1.0 and by[2].frac_dup == 1.0
    assert by[1].n_ngrams == 4  # 8 words -> 4 distinct 5-grams
    # doc 3 has 6 grams, the 4 from base are shared -> 4/6
    assert by[3].n_ngrams == 6 and by[3].n_dup == 4
    assert by[3].frac_dup == round(4 / 6, 6)
    assert by[4].frac_dup == 0.0 and by[4].n_dup == 0
    assert by[5].n_ngrams == 0 and by[5].frac_dup == 0.0


def test_neardup_index_check_rejects_append_with_tagged_layout(spark, tmp_path):
    """append=True writes flat files; exclude_batch_tag implies the
    batch_tag-partitioned layout — the combination must fail loudly
    instead of corrupting the index layout."""
    from advanced_data_profile_spark.operators.dedup import (
        neardup_index_build,
        neardup_index_check,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            [(1, "alpha beta gamma delta epsilon zeta")],
            columns=["doc_id", "text"],
        )
    )
    idx = str(tmp_path / "idx")
    neardup_index_build(docs, "doc_id", "text", idx, batch_tag="b1")
    with pytest.raises(ValueError, match="batch_tag-PARTITIONED"):
        neardup_index_check(
            docs, "doc_id", "text", idx,
            append=True, exclude_batch_tag="b2",
        )
