"""Incremental global uniqueness (plans.id_index): the bucketed
id-index check must (a) plan with ZERO Exchange, (b) equal the
full-table rescan's results and violations exactly, (c) still catch
the cross-run late-duplicate case, and (d) stay correct when a crash
replays an append."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from advanced_data_profile_spark.plans.id_index import (
    duplicate_keys,
    global_uniqueness_from_index,
    index_append,
)
from advanced_data_profile_spark.plans.pipeline import (
    PipelineConfig,
    global_uniqueness_check,
    run_pipeline,
)

N_PARTS, ROWS = 4, 250


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def dup_setup(spark, images_path, tmp_path_factory):
    """Two runs with the index maintained: the second run's late
    partition duplicates 5 of partition 0's ids (the incremental
    check's documented blind spot)."""
    base = tmp_path_factory.mktemp("idx")
    imgs = str(base / "imgs")
    out = str(base / "out")
    table = "idx_test_ids"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.read.parquet(images_path).withColumn(
        "part_id", F.col("part_id").cast("int")
    ).write.partitionBy("part_id").parquet(imgs)
    cfg = PipelineConfig(id_index_table=table)
    s1 = run_pipeline(spark, imgs, out, cfg=cfg)
    assert s1["partitions"] == N_PARTS

    src = spark.read.parquet(imgs)
    late = (
        src.where((F.col("part_id") == 0) & (F.col("w") > 0))
        .orderBy("image_id").limit(5).dropDuplicates(["image_id"])
        .withColumn("part_id", F.lit(N_PARTS).cast("int"))
    )
    late.write.mode("append").partitionBy("part_id").parquet(imgs)
    s2 = run_pipeline(spark, imgs, out, cfg=cfg)
    assert s2["partitions"] == 1
    yield imgs, out, table
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_duplicate_check_plans_with_zero_exchange(spark, dup_setup):
    """The core scale claim: every occurrence of a key lives in one
    bucket, so duplicate detection over the index needs NO shuffle and
    never re-reads the payload table."""
    _, _, table = dup_setup
    plan = _plan(duplicate_keys(spark, table))
    assert "Exchange" not in plan
    assert "Scan" in plan  # it is a real scan of the index, not a stub


def test_index_check_catches_cross_run_duplicates(spark, dup_setup):
    imgs, out, table = dup_setup
    g = global_uniqueness_from_index(spark, table, out)
    assert g["passed"] is False
    assert str(N_PARTS) in g["failed_partitions"]
    assert "0" in g["failed_partitions"]
    assert g["n_violations"] >= 10  # 5 ids x 2 rows each (at least)


def test_index_check_equals_full_rescan(spark, dup_setup):
    """Equivalence: identical results rows AND violation rows as the
    full-table pass, on a fixture with planted within-partition AND
    cross-run duplicates."""
    imgs, out, table = dup_setup
    g_idx = global_uniqueness_from_index(spark, table, out)
    res_idx = {
        (r.part_id, r.constraint, r.kind, r.n_rows, r.n_violations, r.passed)
        for r in spark.read.parquet(f"{out}/constraint_results_global").collect()
    }
    vio_idx = {
        (r.part_id, r.constraint, r.key, r.detail)
        for r in spark.read.parquet(f"{out}/violations_global").collect()
    }
    g_full = global_uniqueness_check(spark, imgs, out)
    res_full = {
        (r.part_id, r.constraint, r.kind, r.n_rows, r.n_violations, r.passed)
        for r in spark.read.parquet(f"{out}/constraint_results_global").collect()
    }
    vio_full = {
        (r.part_id, r.constraint, r.key, r.detail)
        for r in spark.read.parquet(f"{out}/violations_global").collect()
    }
    assert res_idx == res_full
    assert vio_idx == vio_full
    assert g_idx["n_violations"] == g_full["n_violations"]
    assert g_idx["failed_partitions"] == g_full["failed_partitions"]
    assert g_idx["passed"] == g_full["passed"] is False


def test_replayed_append_creates_no_false_duplicates(spark, tmp_path_factory):
    """Crash between index append and manifest commit => the rerun
    appends the same partition again. Latest-append-wins dedupe keeps
    the check clean, while a genuine within-partition duplicate (n=2 in
    ONE append) is preserved."""
    base = tmp_path_factory.mktemp("idxr")
    table = "idx_test_replay"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    df = spark.createDataFrame(
        [("a", 0), ("b", 0), ("c", 0), ("c", 0)], "image_id string, part_id int"
    )
    index_append(df, table, str(base / "idx"), run_id="r1")
    index_append(df, table, str(base / "idx"), run_id="r1-replay")  # crash replay
    dups = {(r.key, r.cnt) for r in duplicate_keys(spark, table).collect()}
    # 'c' is a real duplicate (2 rows in one partition); 'a'/'b' must
    # NOT surface from the replay
    assert dups == {("c", 2)}
    spark.sql(f"DROP TABLE IF EXISTS {table}")
