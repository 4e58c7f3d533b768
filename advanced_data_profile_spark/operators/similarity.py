"""Similarity search over embedding columns: brute-force cosine top-k
(baseline) and LSH/IVF-bucketed approximate variants (scale path).

Brute force is a single scan + TakeOrderedAndProject (Catalyst turns
orderBy+limit into a per-partition top-k merge — no full sort, no full
shuffle). The bucketed variant prunes the scan to the query's bucket;
at 10^12 rows the bucket column would be the table's partition/cluster
key so pruning happens at the file level.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from advanced_data_profile_spark.operators.dedup import cosine_expr


def _query_lit(query_vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in query_vec])


def knn_bruteforce(
    df: DataFrame, id_col: str, vec_col: str, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact cosine top-k against a literal query vector. The cosine is
    a codegen'd zip_with/aggregate; orderBy+limit executes as
    TakeOrderedAndProject (partial top-k per partition, merged on the
    driver) — the correct brute-force plan at any scale."""
    cos = cosine_expr(F.col(vec_col).cast("array<double>"), _query_lit(query_vec))
    return (
        df.select(F.col(id_col).alias("id"), F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def sign_bucket(vec: Column, bits: int = 8, offset: int = 0) -> Column:
    """Axis-aligned sign-LSH bucket from components [offset, offset+bits):
    bit i set iff component offset+i >= 0. The single Spark-side source
    for the construction (dedup's banded LSH uses the offset variants;
    DuckDB parity via oracle_fragments.sql_sign_bucket)."""
    b: Column = F.lit(0).cast("bigint")
    for i in range(bits):
        b = b + F.when(vec.getItem(offset + i) >= 0, F.lit(1 << i)).otherwise(0)
    return b


def auto_probe_bits(
    n_rows: int, dims: int, k: int = 10, probe_hamming: int = 1,
    target_mult: int = 8,
) -> int:
    """Widest sign-LSH code whose probed buckets still hold enough
    expected candidates (max(64, target_mult*k)): expected candidates
    ≈ n * Σ_{i<=probe} C(bits, i) / 2^bits. More bits prune harder, so
    pick the largest bits that keeps the candidate pool above target —
    the scan fraction then SHRINKS as n grows instead of a fixed-bits
    bucket growing to n/2^const rows."""
    import math

    target = max(64, target_mult * k)
    best = 1
    for bits in range(1, min(dims, 24) + 1):
        probes = sum(math.comb(bits, i) for i in range(probe_hamming + 1))
        if n_rows * probes / (1 << bits) >= target:
            best = bits
        else:
            break
    return best


def knn_lsh(
    df: DataFrame, id_col: str, vec_col: str, query_vec: list[float],
    k: int = 10, bits: int | None = None, probe_hamming: int = 1,
    n_rows: int | None = None,
) -> DataFrame:
    """Approximate top-k: search only rows whose sign-LSH bucket is
    within `probe_hamming` bit flips of the query's bucket (multi-probe
    LSH). Filter prunes before the cosine; with the bucket as a
    partition key this becomes partition pruning at the scan.

    bits=None (the default) derives the code width via auto_probe_bits,
    so the probed fraction scales down with n; pass an explicit int
    only to pin the construction (oracles). n_rows supplies the row
    count from manifest/scan stats so no count() job runs at
    query-build time (parquet answers counts from footer metadata, but
    other sources pay a full scan)."""
    if bits is None:
        bits = auto_probe_bits(
            df.count() if n_rows is None else n_rows,
            len(query_vec), k, probe_hamming,
        )
    qb = 0
    for i in range(bits):
        if query_vec[i] >= 0:
            qb |= 1 << i
    bkt = sign_bucket(F.col(vec_col), bits)
    probe = F.bit_count(bkt.bitwiseXOR(F.lit(qb))) <= probe_hamming
    cos = cosine_expr(F.col(vec_col).cast("array<double>"), _query_lit(query_vec))
    return (
        df.where(probe)
        .select(F.col(id_col).alias("id"), F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def ivf_centroids(
    df: DataFrame, vec_col: str, label_col: str
) -> DataFrame:
    """Per-cluster mean vectors (IVF coarse quantizer): posexplode to
    (label, dim, value), per-dimension avg (partial agg collapses the
    fan-out map-side), reassemble ordered arrays. Shuffle volume is
    O(labels x dims), never O(rows). With a provided cluster/label
    column this is one pass; production IVF would k-means first
    (pyspark.ml.clustering.KMeans) — same downstream shape."""
    ex = df.select(
        F.col(label_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "val"),
    )
    per_dim = ex.groupBy(label_col, "pos").agg(F.avg("val").alias("m"))
    cents = per_dim.groupBy(label_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("centroid")
    )
    counts = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("n"))
    return cents.join(counts, label_col)


def ivf_kmeans_labels(
    df: DataFrame, vec_col: str, k: int = 8, seed: int = 1,
    label_col: str = "__ivf_label", max_iter: int = 20,
    init_mode: str = "k-means||",
) -> DataFrame:
    """Learned coarse quantizer: pyspark.ml KMeans over the embedding
    column, returning df + cluster label. This is the production IVF
    build step (one cached fit over a sample-or-full pass; assignment
    is a broadcast of k centroids + argmin per row). Downstream search
    is knn_ivf with label_col=this column; at 10^12 rows the label
    becomes the table's cluster/partition key so probing prunes files."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.withColumn(
        "__feat", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    model = KMeans(
        k=k, seed=seed, featuresCol="__feat", predictionCol=label_col,
        maxIter=max_iter, initMode=init_mode,
    ).fit(feat)
    return model.transform(feat).drop("__feat")


def knn_ivf(
    df: DataFrame, id_col: str, vec_col: str, label_col: str,
    query_vec: list[float], k: int = 10, n_probe: int = 1,
) -> DataFrame:
    """IVF search: rank cluster centroids by cosine to the query, scan
    only the best n_probe clusters, brute-force within. The centroid
    table is tiny → computed once, collected, and pushed down as an
    isin filter (partition pruning when label is the partition key)."""
    cents = ivf_centroids(df, vec_col, label_col)
    q = _query_lit(query_vec)
    ranked = cents.select(
        F.col(label_col), cosine_expr(F.col("centroid"), q).alias("ccos")
    ).orderBy(F.desc("ccos")).limit(n_probe)
    probe_labels = [r[label_col] for r in ranked.collect()]
    cos = cosine_expr(F.col(vec_col).cast("array<double>"), q)
    return (
        df.where(F.col(label_col).isin(probe_labels))
        .select(F.col(id_col).alias("id"), F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


# --- Persisted IVF index ---------------------------------------------------

def ivf_index_build(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    index_path: str,
    k: int = 8,
    seed: int = 1,
    max_iter: int = 10,
    init_mode: str = "random",
) -> None:
    """Persist the IVF state — coarse-quantizer centroids + cluster
    assignments — so searches and appends never refit the quantizer or
    rescan the corpus (the ANN member of the stored-state family:
    same discipline as dedup.neardup_index_build and the sketch
    rollups; derived state is computed from the WRITTEN state, the raw
    corpus is scanned once).

    Layout under index_path:
      assignments/  (id, vec, label) parquet PARTITIONED BY label —
                    the probe filter becomes FILE-LEVEL partition
                    pruning at search time (plan-asserted in tests);
      centroids/    (label, centroid, n) — KB-sized (k rows).

    The quantizer is fit once here (pyspark.ml KMeans via
    ivf_kmeans_labels); the classic IVF contract is that appends
    assign to the nearest stored centroid and never move centroids, so
    stored assignments stay valid forever. Centroids are the ACTUAL
    per-cluster means of the written assignments (one pass over state,
    not raw corpus) — tighter probe ranking than the model's own
    centers after the final assignment step."""
    spark = df.sparkSession
    labeled = ivf_kmeans_labels(
        df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("vec"),
        ),
        "vec", k=k, seed=seed, max_iter=max_iter, init_mode=init_mode,
        label_col="label",
    )
    labeled.write.mode("overwrite").partitionBy("label").parquet(
        f"{index_path}/assignments"
    )
    stored = spark.read.parquet(f"{index_path}/assignments")
    ivf_centroids(stored, "vec", "label").select(
        "label", "centroid", "n"
    ).write.mode("overwrite").parquet(f"{index_path}/centroids")


def _require_ivf_index(spark, index_path: str) -> list:
    from advanced_data_profile_spark.session import hadoop_path_exists

    cpath = f"{index_path}/centroids"
    if not hadoop_path_exists(spark, cpath):
        raise ValueError(
            f"IVF index not built at {index_path!r} — run ivf_index_build "
            "first."
        )
    cents = spark.read.parquet(cpath).collect()  # k rows, KB-sized
    if not cents:
        raise ValueError(
            f"IVF index at {index_path!r} has an empty centroid relation."
        )
    return cents


def nearest_centroid_expr(vec: Column, cents: list) -> Column:
    """Nearest-stored-centroid label as a k-term literal argmin
    expression (squared euclidean — the quantizer's own metric): no
    join, no shuffle, pure codegen'd projection. `cents` is the
    collected KB-sized centroid relation. zip_with's inputs are
    evaluated ONCE outside the lambda (the HOF capture trap applies to
    captured outer expressions, not lambda ARGUMENTS).

    SMALL-k path only: the expression tree is O(k*d) literal nodes, so
    plan construction/analysis collapses long before the data does at
    production IVF widths (k ~ 4096 x d ~ 768 is millions of nodes).
    assign_nearest_centroid auto-switches to the broadcast-relation
    path above NEAREST_CENTROID_LITERAL_MAX_TERMS — use it instead of
    calling this directly."""
    def d2(centroid) -> Column:
        arr = F.array(*[F.lit(float(x)) for x in centroid])
        return F.aggregate(
            F.zip_with(vec, arr, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x,
        )

    return F.array_sort(
        F.array(*[
            F.struct(
                d2(r.centroid).alias("d"), F.lit(int(r.label)).alias("l")
            )
            for r in cents
        ])
    )[0]["l"]


# Above this many k*d argmin terms the literal expression path is
# replaced by the broadcast-relation path: the literal tree's py4j
# construction + Catalyst analysis cost grows linearly in k*d (seconds
# at ~10^5 terms, unusable at the ~10^6.5 of a production 4096x768
# index), while the broadcast path's plan is O(1) size regardless of k.
# 4096 terms keeps the tested small-k contract (k=8 x d<=512) on the
# join-free projection.
NEAREST_CENTROID_LITERAL_MAX_TERMS = 4096


def assign_nearest_centroid(
    df: DataFrame,
    vec_col: str,
    cents: list,
    label_col: str = "label",
    mode: str | None = None,
) -> DataFrame:
    """Attach the nearest-stored-centroid label to every row of `df`,
    auto-selecting the plan by argmin width k*d:

    - "literal" (k*d <= NEAREST_CENTROID_LITERAL_MAX_TERMS): the
      k-term literal argmin projection (nearest_centroid_expr) — no
      join, no shuffle, the right plan while the expression tree stays
      small;
    - "broadcast" (k*d above the threshold — production IVF widths):
      the ENTIRE centroid relation rides ONE broadcast row as an
      array<struct<l,c>> column, equi-joined on a constant key
      (BroadcastHashJoin — k rows never expand the batch), and the
      argmin runs as JVM higher-order functions (transform + zip_with
      + array_sort) over that array column. Zero batch-side shuffle,
      zero row expansion, O(1) expression-tree size at ANY k*d: the
      per-row work is the same O(k*d) arithmetic, but it lives in data
      (one ~k*d*8-byte broadcast) instead of in the plan. Same
      squared-euclidean metric and smallest-label tiebreak as the
      literal path (differential-tested in tests/test_similarity.py).

    `cents` is the collected centroid relation (rows with .label and
    .centroid). `df[vec_col]` must already be array<double>."""
    k = len(cents)
    d = len(cents[0].centroid) if k else 0
    if mode is None:
        mode = (
            "literal"
            if k * d <= NEAREST_CENTROID_LITERAL_MAX_TERMS
            else "broadcast"
        )
    v = F.col(vec_col)
    if mode == "literal":
        return df.withColumn(label_col, nearest_centroid_expr(v, cents))
    spark = df.sparkSession
    payload = [
        (
            [
                (int(r.label), [float(x) for x in r.centroid])
                for r in cents
            ],
            0,
        )
    ]
    # Join key: constant-VALUED (always 0) but non-FOLDABLE on BOTH
    # sides. A key Catalyst can fold to a literal gets constant-folded
    # out of the join condition and the planner downgrades to a
    # BroadcastNestedLoopJoin; keeping a real equi-key preserves the
    # BroadcastHashJoin physical shape (single-bucket probe against the
    # one-row build side, still zero batch-side shuffle). Build side:
    # the 0 rides IN the row data, opaque to the optimizer. Stream
    # side: sz - sz over a null-guarded size() — value-identical to 0,
    # no simplification rule applies, and NULL vectors keep their row
    # (NULL label), matching the literal path.
    crel = spark.createDataFrame(
        payload, "__cents array<struct<l:bigint,c:array<double>>>, __j int"
    )
    lbl = F.array_sort(
        F.transform(
            F.col("__cents"),
            lambda ce: F.struct(
                F.aggregate(
                    F.zip_with(v, ce["c"], lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("d"),
                ce["l"].alias("l"),
            ),
        )
    )[0]["l"]
    sz = F.coalesce(F.size(v), F.lit(-1))
    return (
        df.withColumn("__j", (sz - sz).cast("int"))
        .join(F.broadcast(crel), "__j")
        .withColumn(label_col, lbl)
        .drop("__j", "__cents")
    )


def ivf_index_append(
    batch: DataFrame, id_col: str, vec_col: str, index_path: str
) -> None:
    """Append vectors to a built index WITHOUT refitting or rescanning:
    each batch row is assigned to the nearest stored centroid by
    assign_nearest_centroid (literal argmin projection at small k*d;
    broadcast-relation HOF argmin above the threshold — either way no
    batch-side shuffle), then appended to the label-partitioned
    assignments. Distance is squared euclidean, the quantizer's own
    metric. Centroid means stay FIXED (the IVF contract); the
    informational n counts are refreshed from the batch's per-label
    counts (one batch-sized agg + a rewrite of the KB-sized centroid
    relation)."""
    spark = batch.sparkSession
    cents = _require_ivf_index(spark, index_path)
    v = F.col(vec_col).cast("array<double>")
    asg = assign_nearest_centroid(
        batch.select(F.col(id_col).alias("id"), v.alias("vec")),
        "vec", cents,
    ).select("id", "vec", "label")
    asg.write.mode("append").partitionBy("label").parquet(
        f"{index_path}/assignments"
    )
    # refresh n from the batch side only (recomputing the batch-sized
    # assignment once more — the batch is small by contract; the stored
    # state is NOT rescanned)
    delta = {r["label"]: r["n"] for r in
             asg.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()}
    rows = [
        (int(r.label), list(r.centroid), int(r.n) + delta.get(int(r.label), 0))
        for r in cents
    ]
    spark.createDataFrame(
        rows, "label bigint, centroid array<double>, n bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_path}/centroids")


def ivf_index_search(
    spark,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 1,
) -> DataFrame:
    """Search the stored index: rank the KB-sized centroid relation by
    cosine to the query DRIVER-side (k rows — no Spark job), then read
    ONLY the best n_probe label partitions of the assignments (label
    is the partition column, so the isin filter is file-level
    partition pruning — at 10^12 vectors the scan touches
    n_probe/k of the files) and brute-force cosine within
    (TakeOrderedAndProject)."""
    import math

    cents = _require_ivf_index(spark, index_path)
    qn = math.sqrt(sum(x * x for x in query_vec))

    def ccos(c) -> float:
        cn = math.sqrt(sum(x * x for x in c))
        if cn == 0 or qn == 0:
            return float("-inf")
        return sum(a * b for a, b in zip(c, query_vec)) / (cn * qn)

    ranked = sorted(cents, key=lambda r: (-ccos(r.centroid), int(r.label)))
    labels = [int(r.label) for r in ranked[:n_probe]]
    from advanced_data_profile_spark.session import hadoop_path_exists

    # two stored legs share the label partition column, so BOTH prune
    # to the probed files: the batch-built layout (label) and, when
    # present, the streaming-ingested layout (batch_id, label) written
    # by streaming.incremental.ivf_batch_writer
    legs = [f"{index_path}/assignments"]
    stream_dir = f"{index_path}/assignments_stream"
    if hadoop_path_exists(spark, stream_dir):
        legs.append(stream_dir)
    asg = None
    for leg in legs:
        part = (
            spark.read.parquet(leg)
            .where(F.col("label").isin(labels))
            .select("id", "vec")
        )
        asg = part if asg is None else asg.unionByName(part)
    cos = cosine_expr(F.col("vec"), _query_lit(query_vec))
    return (
        asg.select(F.col("id"), F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def ivf_index_stats(spark, index_path: str) -> DataFrame:
    """Per-label occupancy of the stored index with the streamed leg
    made VISIBLE: the centroid relation's informational `n` column
    counts only batch-API writes (the streaming writer deliberately
    never rewrites it — a per-micro-batch count rewrite would
    double-count on replay), so a user reading `centroids.n` after
    streaming sees stale totals. This helper derives the streamed-leg
    counts at read time — one count-only agg per leg over the
    assignment files, column-pruned to the label partition column, so
    no vectors are read — and returns per label:

      (label, n_batch, n_stream, n_total, n_centroid_stale)

    n_batch counts the batch-built + batch-appended leg, n_stream the
    streaming-ingested leg, n_total their sum (the true occupancy),
    and n_centroid_stale echoes the centroid relation's own n so the
    staleness is explicit rather than silent. Search-cost planning
    (which probe reads how many vectors) should use n_total."""
    from advanced_data_profile_spark.session import hadoop_path_exists

    cents = _require_ivf_index(spark, index_path)
    crel = spark.createDataFrame(
        [(int(r.label), int(r.n)) for r in cents],
        "label bigint, n_centroid_stale bigint",
    )

    def leg_counts(path: str, out: str) -> DataFrame:
        if not hadoop_path_exists(spark, path):
            return spark.createDataFrame([], f"label bigint, {out} bigint")
        return (
            spark.read.parquet(path)
            .groupBy("label")
            .agg(F.count(F.lit(1)).alias(out))
            .select(F.col("label").cast("bigint").alias("label"), out)
        )

    batch = leg_counts(f"{index_path}/assignments", "n_batch")
    stream = leg_counts(f"{index_path}/assignments_stream", "n_stream")
    return (
        crel.join(batch, "label", "left")
        .join(stream, "label", "left")
        .select(
            "label",
            F.coalesce("n_batch", F.lit(0)).alias("n_batch"),
            F.coalesce("n_stream", F.lit(0)).alias("n_stream"),
            (
                F.coalesce("n_batch", F.lit(0))
                + F.coalesce("n_stream", F.lit(0))
            ).alias("n_total"),
            "n_centroid_stale",
        )
        .orderBy("label")
    )


def semdedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    k: int = 8,
    seed: int = 1,
    label_col: str | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by embedding — cluster the embedding space coarsely,
    then drop documents whose cosine similarity to another document IN
    THE SAME CLUSTER reaches `threshold`. Near-duplicate MEANING (same
    boilerplate paraphrased, same article re-hosted) dedups even when
    every n-gram tier misses it. Returns (id, label, keep): keep=False
    iff a smaller-id same-cluster neighbor has round(cosine,6) >=
    threshold — the same deterministic smallest-id-wins canonicality
    as every other dedup tier here.

    Clustering: pyspark.ml KMeans by default (the paper's choice);
    pass `label_col` to supply precomputed labels instead — any
    deterministic coarse bucketing (e.g. sign_bucket) makes the whole
    operator SQL-replayable, which is exactly what the DuckDB value
    oracle does (semdedup_embeddings).

    Scale shape (the paper's own cost model): candidate generation is
    a self-equi-join ON THE CLUSTER LABEL, so pair work is
    sum_c(n_c^2) — never all-pairs across the corpus. k chosen ~
    n/target_cluster_size bounds the quadratic term (the paper uses
    ~50k clusters at 100M docs); an oversized cluster is a skewed join
    key, split by AQE. Vectors ride the label shuffle once per side;
    only (label, id) pairs survive the similarity filter."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        *([F.col(label_col).alias("label")] if label_col else []),
    )
    if label_col is None:
        base = ivf_kmeans_labels(base, "v", k=k, seed=seed, label_col="label")
    a = base.select(
        "label", F.col("id").alias("id_a"), F.col("v").alias("va")
    )
    b = base.select(
        "label", F.col("id").alias("id_b"), F.col("v").alias("vb")
    )
    sim = F.round(cosine_expr(F.col("va"), F.col("vb")), 6)
    dup_ids = (
        a.join(b, "label")
        .where(F.col("id_a") < F.col("id_b"))
        .where(sim >= threshold)
        .select(F.col("id_b").alias("id"))
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    return (
        base.join(dup_ids, "id", "left")
        .select(
            "id", "label",
            F.col("__dup").isNull().alias("keep"),
        )
    )


def embedding_profile(
    df: DataFrame, emb_col: str, group_by: str | None = None
) -> DataFrame:
    """Embedding-column QA in ONE aggregation pass — the vector
    analogue of the scalar profile, catching the failure modes that
    break ANN/dedup downstream: NULL vectors, dimension drift (mixed
    lengths from a bad backfill), NaN/Inf components, zero vectors,
    and norm-distribution shifts (a normalization bug moves the norm
    quantiles immediately).

    Per (group?): n_rows, n_null, n_dims_distinct, dim_min/dim_max,
    n_nonfinite (rows with any NaN/Inf), n_zero (all-zero vectors),
    norm_mean/norm_p25/p50/p75 (L2, finite rows only). All JVM array
    HOFs over the scan — no explode, no shuffle beyond the group agg."""
    v = F.col(emb_col)
    sq = F.aggregate(
        v, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
    )
    norm = F.sqrt(sq)
    finite = F.isnotnull(v) & ~F.exists(
        v, lambda x: F.isnan(x) | (F.abs(x) == float("inf"))
    )
    zero = F.isnotnull(v) & F.forall(v, lambda x: x == 0.0)
    fnorm = F.when(finite, norm)
    keys = [group_by] if group_by else []
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(v.isNull().cast("long")).alias("n_null"),
        F.count_distinct(F.when(v.isNotNull(), F.size(v))).alias(
            "n_dims_distinct"
        ),
        # size(NULL) is -1 under non-ANSI legacy semantics — guard so
        # null vectors never pollute the dimension range (the DuckDB
        # oracle's len(NULL) is NULL and aggregate-skipped)
        F.min(F.when(v.isNotNull(), F.size(v))).alias("dim_min"),
        F.max(F.when(v.isNotNull(), F.size(v))).alias("dim_max"),
        F.sum((F.isnotnull(v) & ~finite).cast("long")).alias("n_nonfinite"),
        F.sum(zero.cast("long")).alias("n_zero"),
        F.round(F.avg(fnorm), 6).alias("norm_mean"),
        F.round(F.percentile(fnorm, F.lit(0.25)), 6).alias("norm_p25"),
        F.round(F.percentile(fnorm, F.lit(0.5)), 6).alias("norm_p50"),
        F.round(F.percentile(fnorm, F.lit(0.75)), 6).alias("norm_p75"),
    ]
    return (df.groupBy(*keys) if keys else df).agg(*aggs)


def dimension_stats(df: DataFrame, emb_col: str) -> DataFrame:
    """Per-dimension (dim, mean, std, zero_frac, n) — collapsed or
    dead dimensions (zero variance, all-zero) degrade every cosine
    downstream and are invisible in whole-vector stats. posexplode +
    one groupBy(dim): shuffle volume is n_rows x dim narrow rows,
    partial-aggregated map-side; dim cardinality is tiny so the final
    agg is trivially parallel."""
    ex = df.select(
        F.posexplode(F.col(emb_col)).alias("dim", "x")
    ).withColumn("x", F.col("x").cast("double"))
    return ex.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("x"), 6).alias("mean"),
        F.round(F.coalesce(F.stddev_pop("x"), F.lit(0.0)), 6).alias("std"),
        F.round(F.avg((F.col("x") == 0.0).cast("double")), 6).alias("zero_frac"),
    )


def embedding_drift(base_dims: DataFrame, cur_dims: DataFrame) -> DataFrame:
    """Embedding drift from two STORED dimension_stats relations — no
    raw vectors in scope at check time (the vector analogue of
    drift_from_sketches): per snapshot pair,

    - centroid_cosine: cosine of the two per-dimension mean vectors —
      a direction change of the embedding centroid (retrained encoder,
      normalization change) drops it below ~0.99 immediately;
    - n_dims: dimensions compared (inner join on dim);
    - n_dims_shifted: dims whose mean moved by more than
      3 * pooled-std / sqrt(harmonic n) — the two-sample z-test at the
      3-sigma level, per coordinate;
    - max_abs_z: the largest such standardized shift.

    Operates on two n_dims-row relations; returns one row."""
    b = base_dims.select(
        "dim", F.col("mean").alias("bm"), F.col("std").alias("bs"),
        F.col("n").alias("bn"),
    )
    c = cur_dims.select(
        "dim", F.col("mean").alias("cm"), F.col("std").alias("cs"),
        F.col("n").alias("cn"),
    )
    j = b.join(c, "dim")
    se = F.sqrt(
        (F.col("bs") * F.col("bs")) / F.col("bn")
        + (F.col("cs") * F.col("cs")) / F.col("cn")
    )
    z = F.when(se > 0, F.abs(F.col("cm") - F.col("bm")) / se)
    dot = F.sum(F.col("bm") * F.col("cm"))
    nb = F.sqrt(F.sum(F.col("bm") * F.col("bm")))
    nc = F.sqrt(F.sum(F.col("cm") * F.col("cm")))
    return j.agg(
        F.round(
            F.when((nb > 0) & (nc > 0), dot / (nb * nc)), 6
        ).alias("centroid_cosine"),
        F.count(F.lit(1)).alias("n_dims"),
        F.sum((F.coalesce(z, F.lit(0.0)) > 3.0).cast("long")).alias(
            "n_dims_shifted"
        ),
        F.round(F.max(F.coalesce(z, F.lit(0.0))), 6).alias("max_abs_z"),
    )
