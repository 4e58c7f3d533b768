"""ANN / similarity search: brute-force cosine top-k + LSH/IVF variants."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from advanced_data_profile_spark.operators import similarity as S


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def query(emb):
    return [float(x) for x in emb.where(F.col("vec_id") == 0).first().embedding]


def _numpy_topk(emb, query, k):
    pdf = emb.toPandas()
    q = np.array(query)
    sims = []
    for _, r in pdf.iterrows():
        v = np.array(r.embedding, dtype=np.float64)
        sims.append((round(float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q))), 6), r.vec_id))
    sims.sort(key=lambda t: (-t[0], t[1]))
    return sims[:k]


def test_knn_bruteforce_matches_numpy(emb, query):
    got = [(r.cosine, r.id) for r in S.knn_bruteforce(emb, "vec_id", "embedding", query, 10).collect()]
    expected = _numpy_topk(emb, query, 10)
    assert got == expected
    assert got[0] == (1.0, 0)  # the query vector itself


def test_knn_bruteforce_plan_is_take_ordered(emb, query):
    plan = S.knn_bruteforce(emb, "vec_id", "embedding", query, 10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # partial top-k, no global sort


def test_knn_lsh_recall(emb, query):
    exact = {id_ for _, id_ in _numpy_topk(emb, query, 10)}
    approx = {r.id for r in S.knn_lsh(emb, "vec_id", "embedding", query, 10, bits=6, probe_hamming=2).collect()}
    # multi-probe LSH at hamming<=2 over 6 bits should recover most of top-10
    assert len(exact & approx) >= 5
    assert 0 in approx


def test_knn_ivf(emb, query):
    out = S.knn_ivf(emb, "vec_id", "embedding", "label", query, k=5, n_probe=10)
    got = [(r.cosine, r.id) for r in out.collect()]
    # probing ALL clusters == exact brute force
    assert got == _numpy_topk(emb, query, 5)


def test_ivf_centroids_shape(emb):
    cents = S.ivf_centroids(emb, "embedding", "label").collect()
    labels = {r.label for r in cents}
    assert len(cents) == len(labels)
    dim = len(emb.first().embedding)
    assert all(len(r.centroid) == dim for r in cents)
    assert sum(r.n for r in cents) == emb.count()


def test_sign_bucket_deterministic(spark):
    df = spark.createDataFrame(pd.DataFrame({"v": [[1.0, -1.0, 1.0], [-1.0, 1.0, 1.0]]}))
    b = [r.b for r in df.select(S.sign_bucket(F.col("v"), 3).alias("b")).collect()]
    assert b == [0b101, 0b110]


def test_ivf_kmeans_recall(spark):
    """Learned-quantizer IVF: KMeans labels + knn_ivf must recover most
    of the exact brute-force top-k with a few probes."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first().embedding]
    labeled = S.ivf_kmeans_labels(emb, "embedding", k=8, seed=1).persist()
    got = {r.id for r in
           S.knn_ivf(labeled, "vec_id", "embedding", "__ivf_label",
                     q, k=10, n_probe=3).collect()}
    exact = {r.id for r in S.knn_bruteforce(emb, "vec_id", "embedding", q, 10).collect()}
    labeled.unpersist()
    assert len(got) == 10
    assert len(got & exact) >= 7  # >=70% recall at 3/8 probes


def test_auto_probe_bits_scales_with_n():
    """Default knn_lsh code width grows with n so the probed fraction
    SHRINKS instead of a fixed-bits bucket growing to n/2^const."""
    b1k = S.auto_probe_bits(1_000, 64)
    b1m = S.auto_probe_bits(1_000_000, 64)
    b1g = S.auto_probe_bits(1_000_000_000, 64)
    assert b1k < b1m < b1g
    # expected probed candidates stay near the target at every scale
    import math
    for n, b in ((1_000, b1k), (1_000_000, b1m), (1_000_000_000, b1g)):
        probes = sum(math.comb(b, i) for i in range(2))
        assert n * probes / (1 << b) >= 64  # never starves below target
    assert b1g <= 24  # clamped


def test_knn_lsh_defaults_path(emb, query):
    """bits=None derives the code width from a count; the query's own
    bucket always probes itself, so vec 0 (cosine 1.0) must top the
    result."""
    rows = S.knn_lsh(emb, "vec_id", "embedding", query, k=10).collect()
    assert 1 <= len(rows) <= 10
    assert rows[0].id == 0 and rows[0].cosine == 1.0


def test_knn_lsh_n_rows_hint_skips_count(emb, query, monkeypatch):
    """With an n_rows hint (manifest/scan stats) the auto-bits path
    must run NO count() job at query-build time — pipelines already
    know the row count, and on non-parquet sources count() is a full
    scan."""
    from pyspark.sql import DataFrame

    def boom(self):
        raise AssertionError("count() ran despite n_rows hint")

    monkeypatch.setattr(DataFrame, "count", boom)
    df = S.knn_lsh(emb, "vec_id", "embedding", query, k=10, n_rows=500)
    monkeypatch.undo()
    rows = df.collect()
    assert rows[0].id == 0 and rows[0].cosine == 1.0


# ------------------------------------------------------- embedding QA


def test_embedding_profile_catches_failure_modes(spark):
    from advanced_data_profile_spark.operators.similarity import (
        embedding_profile,
    )

    rows = [
        (1, [3.0, 4.0]),          # norm 5
        (2, [0.0, 0.0]),          # zero vector
        (3, [float("nan"), 1.0]),  # non-finite
        (4, [1.0, 2.0, 2.0]),     # dimension drift (3 dims)
        (5, None),                # null vector
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r = embedding_profile(df, "embedding").collect()[0]
    assert r.n_rows == 5 and r.n_null == 1
    assert r.n_dims_distinct == 2 and r.dim_min == 2 and r.dim_max == 3
    assert r.n_nonfinite == 1 and r.n_zero == 1
    # norm stats over finite rows only: norms {5, 0, 3}
    assert r.norm_p50 == 3.0 and r.norm_mean == round(8.0 / 3, 6)


def test_dimension_stats_finds_dead_dimension(spark):
    import random

    from advanced_data_profile_spark.operators.similarity import (
        dimension_stats,
    )

    rng = random.Random(9)
    rows = [
        (i, [rng.uniform(-1, 1), 0.0, 7.0]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    by = {r.dim: r for r in dimension_stats(df, "embedding").collect()}
    assert set(by) == {0, 1, 2}
    assert by[0].std > 0.3 and by[0].zero_frac == 0.0
    assert by[1].zero_frac == 1.0 and by[1].std == 0.0  # dead dim
    assert by[2].mean == 7.0 and by[2].std == 0.0       # collapsed dim
    assert all(r.n == 200 for r in by.values())


def test_embedding_drift_from_stored_dimension_stats(spark):
    import numpy as np

    from advanced_data_profile_spark.operators.similarity import (
        dimension_stats,
        embedding_drift,
    )

    rng = np.random.default_rng(33)

    def emb_df(shift):
        rows = [
            (i, (rng.normal(0, 1, 8) + shift).astype(float).tolist())
            for i in range(3000)
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    base = dimension_stats(emb_df(np.zeros(8)), "embedding")
    same = dimension_stats(emb_df(np.zeros(8)), "embedding")
    shift = np.zeros(8); shift[3] = 0.5   # one coordinate drifts
    moved = dimension_stats(emb_df(shift), "embedding")

    ok = embedding_drift(base, same).collect()[0]
    assert ok.n_dims == 8 and ok.n_dims_shifted == 0

    bad = embedding_drift(base, moved).collect()[0]
    assert bad.n_dims_shifted >= 1 and bad.max_abs_z > 10
    # centroid direction changed (means are near zero, so the cosine is
    # noisy in magnitude — the shifted case must read clearly lower)
    assert bad.centroid_cosine < 0.9


# --- Persisted IVF index ---------------------------------------------------

@pytest.fixture()
def two_cluster_df(spark):
    """40 vectors in two well-separated 4-d clusters: ids 0-19 around
    (+10, i/10, 0, 0), ids 20-39 around (-10, 0, i/10, 0)."""
    rows = [(i, [10.0, i / 10.0, 0.0, 1.0]) for i in range(20)] + [
        (i, [-10.0, 0.0, (i - 20) / 10.0, 1.0]) for i in range(20, 40)
    ]
    return spark.createDataFrame(rows, "vid bigint, v array<double>")


def test_ivf_index_build_search_roundtrip(spark, two_cluster_df, tmp_path):
    idx = str(tmp_path / "ivf")
    S.ivf_index_build(two_cluster_df, "vid", "v", idx, k=2, seed=1)
    # stored state: 2 centroids summing to 40 members, label-partitioned
    cents = spark.read.parquet(f"{idx}/centroids").collect()
    assert len(cents) == 2 and sum(r.n for r in cents) == 40
    # a query in the +10 cluster with 1 probe returns only that cluster
    got = S.ivf_index_search(spark, idx, [10.0, 0.5, 0.0, 1.0], k=5,
                             n_probe=1).collect()
    assert len(got) == 5 and all(r.id < 20 for r in got)
    # probing ALL clusters == brute force over the original frame
    full = S.ivf_index_search(spark, idx, [10.0, 0.5, 0.0, 1.0], k=5,
                              n_probe=2).collect()
    brute = S.knn_bruteforce(
        two_cluster_df, "vid", "v", [10.0, 0.5, 0.0, 1.0], k=5
    ).collect()
    assert [(r.cosine, r.id) for r in full] == [
        (r.cosine, r.id) for r in brute
    ]


def test_ivf_index_append_assigns_nearest_and_refreshes_counts(
    spark, two_cluster_df, tmp_path
):
    idx = str(tmp_path / "ivf")
    S.ivf_index_build(two_cluster_df, "vid", "v", idx, k=2, seed=1)
    labels = {
        r.label: r.n for r in spark.read.parquet(f"{idx}/centroids").collect()
    }
    batch = spark.createDataFrame(
        [(100, [11.0, 0.0, 0.0, 1.0]), (101, [-11.0, 0.0, 0.0, 1.0])],
        "vid bigint, v array<double>",
    )
    S.ivf_index_append(batch, "vid", "v", idx)
    # counts refreshed: one appended row per cluster, means unchanged
    after = {
        r.label: r for r in spark.read.parquet(f"{idx}/centroids").collect()
    }
    assert {k: r.n for k, r in after.items()} == {
        k: n + 1 for k, n in labels.items()
    }
    asg = spark.read.parquet(f"{idx}/assignments")
    assert asg.count() == 42
    # each appended vector landed in its nearest centroid's partition,
    # and search now finds it without any rebuild
    by_id = {r.id: r.label for r in asg.select(
        "id", "label").where(F.col("id") >= 100).collect()}
    plus = asg.where(F.col("id") == 0).first().label
    assert by_id[100] == plus and by_id[101] != plus
    got = {r.id for r in S.ivf_index_search(
        spark, idx, [11.0, 0.0, 0.0, 1.0], k=3, n_probe=1).collect()}
    assert 100 in got


def test_ivf_index_search_plan_prunes_partitions(
    spark, two_cluster_df, tmp_path
):
    """Scale contract: the probe filter must reach the scan as a
    PARTITION filter (label is the partition column), so at 10^12
    vectors a 1-of-k probe reads 1/k of the files."""
    import re

    idx = str(tmp_path / "ivf")
    S.ivf_index_build(two_cluster_df, "vid", "v", idx, k=2, seed=1)
    out = S.ivf_index_search(spark, idx, [10.0, 0.5, 0.0, 1.0], k=5,
                             n_probe=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*label", plan), plan
    assert "TakeOrderedAndProject" in plan


def test_ivf_index_requires_build(spark, two_cluster_df, tmp_path):
    with pytest.raises(ValueError, match="not built"):
        S.ivf_index_search(spark, str(tmp_path / "missing"), [1.0, 0.0], k=3)
    with pytest.raises(ValueError, match="not built"):
        S.ivf_index_append(
            two_cluster_df, "vid", "v", str(tmp_path / "missing")
        )


def test_ivf_stream_ingestion_replay_idempotent(
    spark, two_cluster_df, tmp_path
):
    """Streaming ANN ingestion: micro-batches assign to the SEED
    build's stored centroids and land in batch_id+label partitions; a
    crash replay (same batch_id) overwrites its own partitions instead
    of double-ingesting; search unions the streamed leg with the
    batch-built leg, with label partition pruning reaching BOTH."""
    import re

    from advanced_data_profile_spark.streaming.incremental import (
        ivf_batch_writer,
    )

    idx = str(tmp_path / "ivf")
    S.ivf_index_build(two_cluster_df, "vid", "v", idx, k=2, seed=1)
    wb = ivf_batch_writer(idx, id_col="vid", vec_col="v")
    b1 = spark.createDataFrame(
        [(100, [11.0, 0.0, 0.0, 1.0]), (101, [-11.0, 0.0, 0.0, 1.0])],
        "vid bigint, v array<double>",
    )
    wb(b1, 0)
    wb(b1, 0)  # crash replay with the same batch_id
    wb(spark.createDataFrame(
        [(102, [12.0, 0.0, 0.0, 1.0])], "vid bigint, v array<double>"
    ), 1)
    stream = spark.read.parquet(f"{idx}/assignments_stream")
    assert stream.count() == 3  # replay did not double-ingest
    out = S.ivf_index_search(spark, idx, [11.0, 0.0, 0.0, 1.0], k=4,
                             n_probe=1)
    got = {r.id for r in out.collect()}
    assert {100, 102} <= got
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"PartitionFilters: \[[^\]]*label", plan)) == 2


def test_ivf_stream_requires_built_quantizer(spark, two_cluster_df, tmp_path):
    from advanced_data_profile_spark.streaming.incremental import (
        ivf_batch_writer,
    )

    wb = ivf_batch_writer(str(tmp_path / "missing"), "vid", "v")
    import pytest as _pt

    with _pt.raises(ValueError, match="not built"):
        wb(two_cluster_df, 0)


# --- scale-safe centroid assignment (broadcast-relation argmin) ------------

def _fake_cents(k: int, d: int):
    """Deterministic (seeded) centroid rows shaped like the collected
    relation."""
    from collections import namedtuple

    import numpy as np

    Row = namedtuple("Row", ["label", "centroid", "n"])
    rng = np.random.RandomState(7)
    return [
        Row(label=i, centroid=[round(float(x), 3) for x in rng.randn(d)], n=1)
        for i in range(k)
    ]


def _fake_vecs(spark, n: int, d: int, seed: int = 11):
    import numpy as np

    rng = np.random.RandomState(seed)
    rows = [
        (i, [round(float(x), 3) for x in rng.randn(d)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vid bigint, v array<double>")


def _numpy_labels(df, cents):
    import numpy as np

    C = np.array([list(r.centroid) for r in cents], dtype=np.float64)
    out = {}
    for r in df.collect():
        v = np.array(r.v, dtype=np.float64)
        d2 = ((C - v) ** 2).sum(axis=1)
        best = np.lexsort((np.array([r.label for r in cents]), d2))[0]
        out[r.vid] = int(cents[best].label)
    return out


def test_assign_nearest_centroid_broadcast_matches_literal(spark):
    """Differential: the broadcast-relation HOF argmin and the literal
    expression argmin are the same function (metric, tiebreak), row for
    row — including exact-tie vectors where the smallest label wins."""
    cents = _fake_cents(5, 6)
    df = _fake_vecs(spark, 60, 6)
    lit = {
        r.vid: r.label
        for r in S.assign_nearest_centroid(df, "v", cents, mode="literal").collect()
    }
    bc = {
        r.vid: r.label
        for r in S.assign_nearest_centroid(df, "v", cents, mode="broadcast").collect()
    }
    assert lit == bc == _numpy_labels(df, cents)
    # exact tie between centroid 0 and a duplicate at a higher label
    from collections import namedtuple

    Row = namedtuple("Row", ["label", "centroid", "n"])
    tie = [Row(0, [1.0, 0.0], 1), Row(1, [1.0, 0.0], 1), Row(2, [9.0, 9.0], 1)]
    one = spark.createDataFrame([(7, [1.0, 0.1])], "vid bigint, v array<double>")
    for mode in ("literal", "broadcast"):
        assert (
            S.assign_nearest_centroid(one, "v", tie, mode=mode).first().label == 0
        )


def test_assign_nearest_centroid_auto_switch_and_plan(spark):
    """Auto mode picks literal under the k*d threshold and broadcast
    above it; the broadcast plan is a BroadcastHashJoin with ZERO
    batch-side shuffle (the only Exchange is the broadcast itself)."""
    df = _fake_vecs(spark, 40, 80)
    small = S.assign_nearest_centroid(df, "v", _fake_cents(8, 80))  # 640 terms
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan_small  # literal projection path
    big_cents = _fake_cents(64, 80)  # 5120 terms > threshold -> broadcast
    big = S.assign_nearest_centroid(df, "v", big_cents)
    plan_big = big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_big, plan_big
    assert "Exchange hashpartitioning" not in plan_big, plan_big
    # and the plan stays O(1) size: no per-centroid literal arrays
    assert plan_big.count("zip_with") <= 4
    # same labels as the ground truth regardless of path
    assert {r.vid: r.label for r in big.collect()} == _numpy_labels(
        df, big_cents
    )


def test_ivf_index_append_large_k_uses_broadcast_path(spark, tmp_path):
    """Append at production-shaped k (64 centroids x 80 dims > the
    literal-terms threshold): assignment flows through the broadcast
    join, every appended vector lands in its numpy-argmin partition,
    and full-probe search over the stored state equals brute force."""
    idx = str(tmp_path / "ivf64")
    corpus = _fake_vecs(spark, 512, 128)
    S.ivf_index_build(corpus, "vid", "v", idx, k=64, seed=1)
    cents = spark.read.parquet(f"{idx}/centroids").collect()
    # KMeans may leave a few clusters empty; the broadcast path must
    # still be the auto-selected one (len(cents)*128 >> 4096)
    assert len(cents) >= 48
    assert (
        len(cents) * 128 > S.NEAREST_CENTROID_LITERAL_MAX_TERMS
    )
    batch = _fake_vecs(spark, 16, 128).withColumn(
        "vid", F.col("vid") + 1000
    )
    S.ivf_index_append(batch, "vid", "v", idx)
    got = {
        r.id: r.label
        for r in spark.read.parquet(f"{idx}/assignments")
        .where(F.col("id") >= 1000)
        .select("id", "label")
        .collect()
    }
    want = {
        vid + 1000: lbl
        for vid, lbl in _numpy_labels(_fake_vecs(spark, 16, 128), cents).items()
    }
    assert got == want
    q = [float(x) for x in batch.where(F.col("vid") == 1000).first().v]
    full = S.ivf_index_search(spark, idx, q, k=5, n_probe=64)
    brute = S.knn_bruteforce(
        corpus.unionByName(batch), "vid", "v", q, k=5
    )
    assert [(r.cosine, r.id) for r in full.collect()] == [
        (r.cosine, r.id) for r in brute.collect()
    ]


def test_ivf_index_stats_exposes_streamed_leg(spark, two_cluster_df, tmp_path):
    """centroids.n deliberately excludes stream-ingested vectors;
    ivf_index_stats derives the streamed-leg counts at read time so the
    true occupancy (and the staleness) are visible."""
    from advanced_data_profile_spark.streaming.incremental import (
        ivf_batch_writer,
    )

    idx = str(tmp_path / "ivf")
    S.ivf_index_build(two_cluster_df, "vid", "v", idx, k=2, seed=1)
    S.ivf_index_append(
        spark.createDataFrame(
            [(100, [11.0, 0.0, 0.0, 1.0])], "vid bigint, v array<double>"
        ),
        "vid", "v", idx,
    )
    wb = ivf_batch_writer(idx, id_col="vid", vec_col="v")
    wb(spark.createDataFrame(
        [(200, [12.0, 0.0, 0.0, 1.0]), (201, [-12.0, 0.0, 0.0, 1.0])],
        "vid bigint, v array<double>",
    ), 0)
    stats = {r.label: r for r in S.ivf_index_stats(spark, idx).collect()}
    assert sum(r.n_batch for r in stats.values()) == 41
    assert sum(r.n_stream for r in stats.values()) == 2
    assert all(
        r.n_total == r.n_batch + r.n_stream for r in stats.values()
    )
    # the stale column mirrors the centroid relation's own n (41: the
    # batch append refreshed it, the streamed batch did not)
    cent_n = {
        r.label: r.n for r in spark.read.parquet(f"{idx}/centroids").collect()
    }
    assert {k: r.n_centroid_stale for k, r in stats.items()} == cent_n
    # a no-stream index reports a zero streamed leg, not an error
    idx2 = str(tmp_path / "ivf2")
    S.ivf_index_build(two_cluster_df, "vid", "v", idx2, k=2, seed=1)
    s2 = S.ivf_index_stats(spark, idx2).collect()
    assert sum(r.n_stream for r in s2) == 0 and sum(r.n_batch for r in s2) == 40


def test_semdedup_drops_same_cluster_near_copies(spark):
    """SemDeDup contract: a near-copy (cosine >= threshold) of a
    smaller-id document in the SAME cluster is dropped; orthogonal
    documents and near-copies that land in DIFFERENT clusters survive
    (the method's documented recall limit — cross-cluster near-dups
    are invisible by design)."""
    rows = [
        (1, [10.0, 0.0, 0.0, 0.1]),    # cluster +x, canonical
        (2, [9.8, 0.1, 0.0, 0.1]),     # near-copy of 1 -> dropped
        (3, [10.1, -0.1, 0.0, 0.2]),   # another near-copy -> dropped
        (4, [0.0, 10.0, 0.0, 0.1]),    # orthogonal, same-ish region
        (10, [-10.0, 0.0, 0.0, 0.1]),  # cluster -x, canonical
        (11, [-9.9, 0.0, 0.1, 0.1]),   # near-copy of 10 -> dropped
    ]
    df = spark.createDataFrame(rows, "vid bigint, v array<double>")
    out = {
        r.id: (r.keep, r.label)
        for r in S.semdedup(df, "vid", "v", threshold=0.95, k=2).collect()
    }
    assert out[1][0] and out[10][0]            # canonicals kept
    assert not out[2][0] and not out[3][0] and not out[11][0]
    assert out[4][0]                           # orthogonal kept
    # near-copies clustered WITH their canonicals (KMeans on separable
    # data), so the drop decisions came from within-cluster pairs only
    assert out[2][1] == out[1][1] and out[11][1] == out[10][1]
    # injected deterministic labels: cross-cluster near-dup survives
    lab = df.withColumn("lb", (F.col("vid") >= 10).cast("int"))
    out2 = {
        r.id: r.keep
        for r in S.semdedup(
            lab, "vid", "v", threshold=0.95, label_col="lb"
        ).collect()
    }
    assert not out2[2] and not out2[3] and out2[1] and out2[4]
    # force the near-copy pair APART: id 2 alone in its own label —
    # its near-dup relation to 1 becomes cross-cluster and invisible
    apart = df.withColumn("lb", (F.col("vid") == 2).cast("int"))
    out3 = {
        r.id: r.keep
        for r in S.semdedup(
            apart, "vid", "v", threshold=0.95, label_col="lb"
        ).collect()
    }
    assert out3[2]  # survives: SemDeDup is blind across clusters
