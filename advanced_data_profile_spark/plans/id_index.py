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
(key, partition) — max_by(n, appended_at) — so replays never create
false duplicates, while genuine same-partition duplicate keys (n > 1
within one append) are preserved.

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
    never reads payload bytes."""
    spark = df.sparkSession
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
    if spark.catalog.tableExists(table_name):
        writer.mode("append").saveAsTable(table_name)
    else:
        writer.option("path", location).saveAsTable(table_name)


def duplicate_keys(spark: SparkSession, table_name: str) -> DataFrame:
    """(key, cnt) for every key whose latest-per-partition counts sum
    past 1 — the core check. Both aggregations cluster on `key`, which
    the bucketed scan already provides, so the plan carries ZERO
    Exchange and never touches the payload table."""
    idx = spark.table(table_name)
    latest = idx.groupBy("key", "part_id").agg(
        F.max_by("n", "appended_at").alias("n")
    )
    per_key = latest.groupBy("key").agg(F.sum("n").alias("cnt"))
    return per_key.where(F.col("cnt") > 1)


def _latest_per_part(spark: SparkSession, table_name: str) -> DataFrame:
    idx = spark.table(table_name)
    return idx.groupBy("key", "part_id").agg(
        F.max_by("n", "appended_at").alias("n")
    )


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
    # attribute duplicates to every partition holding the key: the dup
    # set is tiny (it is the violation set), broadcast it back onto the
    # bucket-clustered per-(key, part) counts — still no Exchange on
    # the index side
    dup_parts = (
        latest.join(
            F.broadcast(dup.withColumnRenamed("key", "__dkey")),
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
    res = (
        totals.join(viol_per_part, "part_id", "left")
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
