"""Incremental cross-run global uniqueness via a maintained bucketed
id-index (north_rule: uniqueness of image_id at 10^12-image scale).

The dedicated full-table pass (pipeline.global_uniqueness_check) has
the right semantics but the wrong cost model at design scale: every
invocation rescans the whole payload table. This module replaces the
rescan with a MAINTAINED INDEX:

- at validation time each run APPENDS its partitions' per-(key,
  partition) counts to a parquet table bucketed by the key
  (``bucketBy(N, key)`` — the Spark-catalog spelling of Iceberg's
  ``bucket(N, image_id)`` partition transform). Append cost is one
  narrow agg over rows the run already scanned; payload bytes are
  never touched.
- the global check is then a PER-BUCKET SELF-CHECK over the index:
  every occurrence of a key lives in the same bucket by construction,
  so the duplicate-detection aggregations plan with ZERO Exchange
  (asserted in tests/test_id_index.py) and never re-read the payload
  table. At 10^12 rows this turns an O(table) rescan per check into
  O(index) = O(distinct keys) with no shuffle.

Crash safety: the append runs BEFORE the manifest commit; a crash
between them makes the rerun append the same partition again under a
new stamp. The check dedupes by keeping the LATEST append per
(key, partition) — max_by(n, (appended_at, run_id)) so wall-clock ties
between replays break deterministically by run_id — and replays never
create false duplicates, while genuine same-partition duplicate keys
(n > 1 within one append) are preserved.

APPEND-ONLY PRECONDITION: latest-append-wins assumes a partition's key
set only gets re-APPENDED identically (crash replay), never
regenerated with keys removed or moved. If a partition is ever
backfilled/regenerated (e.g. rerun with --no-resume over changed
payload), ``index_compact(..., supersede_parts=True)`` must run
afterwards: it drops every index row not written by each partition's
LATEST run, so the regenerated partition fully supersedes its stale
state. plans.pipeline WIRES THIS AUTOMATICALLY — it detects
re-validation (pending partitions that already have 'done' manifest
rows, an O(partitions) driver-side manifest read) and runs the
supersede compaction right after its index append, so a backfill needs
no manual compact call (tests/test_id_index.py::
test_pipeline_auto_supersedes_on_revalidation). Routine compaction
(supersede_parts=False) keeps only the latest row per (key,
partition), bounding the check's cost at O(distinct keys) no matter
how many runs have appended.

Lifecycle guards: every append asserts the bucket count matches the
existing table's spec — a silent mismatch would break the per-bucket
clustering the zero-Exchange check rests on. DEFAULT_BUCKETS=16 is a
sandbox number: size buckets so each holds O(10^7-10^8) keys at design
scale (10^12 keys -> O(10^4-10^5) buckets), and keep the count FIXED
for the table's lifetime — changing it requires a full rewrite.

Outputs are IDENTICAL in shape and values to the full-pass check
(equivalence-tested): kind='unique_global' RESULT_COLUMNS rows per
partition into constraint_results_global, violation rows with
duplicate_count detail into violations_global, one part_id='__global__'
manifest lineage row.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from advanced_data_profile_spark.operators.constraints import (
    RESULT_COLUMNS,
    VIOLATION_COLUMNS,
)
from advanced_data_profile_spark.plans.manifest import Manifest, new_run_id

DEFAULT_BUCKETS = 16

def _append_order():
    """latest-append-wins ordering: wall-clock stamp, ties broken by
    run_id so two replays within clock resolution still pick ONE
    deterministic winner (they write identical counts, but determinism
    should hold on paper, not just in practice)."""
    return F.struct(F.col("appended_at"), F.col("run_id"))


def _existing_bucket_spec(
    spark: SparkSession, table_name: str
) -> tuple[int, str] | None:
    """(num_buckets, bucket_column) of an existing table, or None if the
    table does not exist. Read from DESCRIBE EXTENDED — the catalog's
    own record of the physical spec."""
    if not spark.catalog.tableExists(table_name):
        return None
    rows = {
        r.col_name: r.data_type
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table_name}").collect()
    }
    n = rows.get("Num Buckets")
    cols = rows.get("Bucket Columns", "")
    if n is None:
        return None
    return int(n), cols.strip("[]` ")


def index_append(
    df: DataFrame,
    table_name: str,
    location: str,
    key_col: str = "image_id",
    part_col: str = "part_id",
    run_id: str | None = None,
    buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Append per-(key, partition) counts for df's rows to the bucketed
    index table, creating it (external, at ``location``) on first use.
    One narrow aggregation over columns the caller already scanned —
    never reads payload bytes.

    Raises ValueError if the existing table's bucket spec differs from
    ``buckets``: mixed bucket counts would silently break the
    per-bucket key clustering the zero-Exchange check depends on (see
    module docstring for bucket sizing — the count is fixed for the
    table's lifetime)."""
    spark = df.sparkSession
    exists = spark.catalog.tableExists(table_name)
    existing = _existing_bucket_spec(spark, table_name)
    if exists and existing is None:
        raise ValueError(
            f"table {table_name} exists but carries no bucket spec — "
            "not an id-index table; refusing to append."
        )
    if existing is not None and existing != (buckets, "key"):
        raise ValueError(
            f"index table {table_name} is bucketed as {existing[0]} x "
            f"({existing[1]}); appending with buckets={buckets} would "
            "break bucket clustering. Pass the table's own bucket count "
            "(changing it requires a full rewrite)."
        )
    rows = (
        df.groupBy(
            F.col(key_col).alias("key"),
            F.col(part_col).cast("string").alias("part_id"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("run_id", F.lit(run_id or new_run_id()))
        .withColumn("appended_at", F.lit(float(time.time())))
    )
    writer = rows.write.format("parquet").bucketBy(buckets, "key").sortBy("key")
    if exists:
        writer.mode("append").saveAsTable(table_name)
    else:
        writer.option("path", location).saveAsTable(table_name)


def duplicate_keys(spark: SparkSession, table_name: str) -> DataFrame:
    """(key, cnt) for every key whose latest-per-partition counts sum
    past 1 — the core check. Both aggregations cluster on `key`, which
    the bucketed scan already provides, so the plan carries ZERO
    Exchange and never touches the payload table."""
    latest = _latest_per_part(spark, table_name)
    per_key = latest.groupBy("key").agg(F.sum("n").alias("cnt"))
    return per_key.where(F.col("cnt") > 1)


def _latest_per_part(spark: SparkSession, table_name: str) -> DataFrame:
    idx = spark.table(table_name)
    return idx.groupBy("key", "part_id").agg(
        F.max_by("n", _append_order()).alias("n")
    )


def index_compact(
    spark: SparkSession,
    table_name: str,
    staging_dir: str,
    supersede_parts: bool = False,
) -> int:
    """Rewrite the index keeping only the winning rows, so the check
    stays O(distinct keys) after any number of appends (without this,
    one append per (partition, run) accumulates forever and the
    "O(index)" check degrades toward O(appends)).

    - supersede_parts=False (routine): keep the latest append per
      (key, partition) — exactly the rows the check already reduces to.
    - supersede_parts=True (after a partition backfill/regeneration):
      keep only rows written by each PARTITION's latest run, so a
      regenerated partition fully supersedes its previous index state
      — stale keys from older runs disappear (see the append-only
      precondition in the module docstring).

    The rewrite preserves the table's bucket spec (read from the
    catalog) and its external location. Compacted rows are staged to
    ``staging_dir`` and fully materialized BEFORE the table is
    overwritten — a self-overwrite would otherwise read and truncate
    the same files. Returns the compacted row count.

    Scale shape: one shuffle-free pass for the routine mode (both aggs
    cluster on the bucketed key); the supersede mode adds an O(runs x
    partitions) broadcast join. The rewrite itself is O(index), run it
    on the cadence index growth warrants, not per-append."""
    spec = _existing_bucket_spec(spark, table_name)
    if spec is None:
        raise ValueError(f"{table_name} is not an existing bucketed index table")
    buckets, _ = spec
    location = next(
        r.data_type
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table_name}").collect()
        if r.col_name == "Location"
    )
    idx = spark.table(table_name)
    if supersede_parts:
        latest_run = idx.groupBy("part_id").agg(
            F.max_by("run_id", _append_order()).alias("run_id")
        )
        kept = idx.join(F.broadcast(latest_run), ["part_id", "run_id"])
    else:
        kept = idx.groupBy("key", "part_id").agg(
            F.max_by(
                F.struct("n", "run_id", "appended_at"), _append_order()
            ).alias("w")
        ).select("key", "part_id", "w.n", "w.run_id", "w.appended_at")
    kept = kept.select("key", "part_id", "n", "run_id", "appended_at")
    kept.write.mode("overwrite").parquet(staging_dir)
    staged = spark.read.parquet(staging_dir)
    n_rows = staged.count()
    # overwrite IN PLACE (no explicit DROP): saveAsTable(Overwrite)
    # drops and recreates within one command, so there is no window in
    # which the catalog entry is gone while files remain — a crash
    # mid-rewrite leaves either the old table or the new one, and the
    # staging parquet survives for a manual re-run either way
    (
        staged.write.format("parquet")
        .bucketBy(buckets, "key")
        .sortBy("key")
        .option("path", location)
        .mode("overwrite")
        .saveAsTable(table_name)
    )
    return n_rows


def global_uniqueness_from_index(
    spark: SparkSession,
    table_name: str,
    output_dir: str,
    constraint: str = "image_id_unique_global",
    key_col: str = "image_id",
) -> dict:
    """The index-backed twin of pipeline.global_uniqueness_check: same
    result/violation tables (overwritten — a global pass supersedes the
    previous one), same manifest lineage row, same summary dict; the
    data pass is the shuffle-free per-bucket self-check above instead
    of a full payload-table rescan."""
    t0 = time.time()
    latest = _latest_per_part(spark, table_name)
    per_key = latest.groupBy("key").agg(F.sum("n").alias("cnt"))
    dup = per_key.where(F.col("cnt") > 1)
    # attribute duplicates to every partition holding the key. The dup
    # set is NORMALLY tiny (it is the violation set) and AQE broadcasts
    # it from its runtime size, keeping the index side Exchange-free —
    # but it is NOT forced: a pathologically duplicated corpus makes
    # the violation set O(keys), where a broadcast hint would OOM the
    # driver outright instead of degrading to a shuffle join (the same
    # adversarial-cardinality discipline as decontaminate's hit
    # relation)
    dup_parts = (
        latest.join(
            dup.withColumnRenamed("key", "__dkey"),
            F.col("key").eqNullSafe(F.col("__dkey")),
        )
        .drop("__dkey")
        .persist()
    )
    viol_per_part = dup_parts.groupBy("part_id").agg(
        F.sum("n").alias("n_violations")
    )

    # per-partition row totals from the manifest (latest done row wins)
    # — collected driver-side, it is O(partitions), never a data scan
    manifest = Manifest(spark, f"{output_dir}/manifest")
    m = manifest.read().where(
        (F.col("status") == "done") & (F.col("part_id") != "__global__")
    )
    totals = m.groupBy("part_id").agg(
        F.max_by("n_rows", F.coalesce("finished_at", "started_at")).alias(
            "n_rows"
        )
    )
    # FULL outer: a partition indexed but not yet manifest-committed
    # (the crash window between index append and manifest commit) must
    # still appear here — otherwise its rows would show in
    # violations_global but vanish from constraint_results_global and
    # the two artifacts would disagree transiently. Such partitions
    # carry NULL n_rows until their manifest row lands.
    res = (
        totals.join(viol_per_part, "part_id", "full")
        .withColumn("n_violations", F.coalesce("n_violations", F.lit(0)))
        .select(
            F.col("part_id"),
            F.lit(constraint).alias("constraint"),
            F.lit("unique_global").alias("kind"),
            F.col("n_rows"),
            F.col("n_violations"),
            (F.col("n_violations") == 0).alias("passed"),
        )
        .persist()
    )
    res_rows = res.collect()  # tiny: one row per partition
    res.select(*RESULT_COLUMNS).coalesce(1).write.mode("overwrite").parquet(
        f"{output_dir}/constraint_results_global"
    )
    violations = dup_parts.select(
        F.col("part_id"),
        F.lit(constraint).alias("constraint"),
        F.col("key").cast("string").alias("key"),
        F.to_json(F.struct(F.col("cnt").alias("duplicate_count"))).alias(
            "detail"
        ),
    )
    violations.select(*VIOLATION_COLUMNS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{output_dir}/violations_global")
    res.unpersist()
    dup_parts.unpersist()

    n_violations = sum(r.n_violations for r in res_rows)
    failed_parts = sorted({r.part_id for r in res_rows if not r.passed})
    table_rows = sum(r.n_rows or 0 for r in res_rows)
    run_id = new_run_id()
    manifest.record(
        run_id, "__global__", "done", started_at=t0,
        n_rows=int(table_rows),
        metrics={
            "kind": "unique_global",
            "key_cols": [key_col],
            "mode": "index",
            "index_table": table_name,
            "n_violations": int(n_violations),
            "failed_partitions": failed_parts,
            "elapsed_sec": round(time.time() - t0, 3),
        },
    )
    return {
        "run_id": run_id,
        "n_violations": int(n_violations),
        "failed_partitions": failed_parts,
        "passed": n_violations == 0,
        "elapsed_sec": round(time.time() - t0, 3),
    }
