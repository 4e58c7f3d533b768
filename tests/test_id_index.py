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


def test_bucket_spec_mismatch_raises(spark, tmp_path_factory):
    """Appending with a different bucket count than the table's spec
    must fail loudly — a silent mismatch would break the per-bucket
    clustering the zero-Exchange check rests on."""
    base = tmp_path_factory.mktemp("idxb")
    table = "idx_test_buckets"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    df = spark.createDataFrame([("a", 0)], "image_id string, part_id int")
    index_append(df, table, str(base / "idx"), buckets=8)
    with pytest.raises(ValueError, match="bucket"):
        index_append(df, table, str(base / "idx"), buckets=16)
    # matching spec still appends fine
    index_append(df, table, str(base / "idx"), buckets=8, run_id="r2")
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_compaction_equivalence_and_plan(spark, tmp_path_factory):
    """index_compact must not change duplicate_keys' answer, must
    shrink the row count to one row per (key, partition), and the
    compacted table must still plan the check with zero Exchange."""
    from advanced_data_profile_spark.plans.id_index import index_compact

    base = tmp_path_factory.mktemp("idxc")
    table = "idx_test_compact"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    df = spark.createDataFrame(
        [("a", 0), ("b", 0), ("c", 0), ("c", 0)], "image_id string, part_id int"
    )
    df2 = spark.createDataFrame(
        [("a", 1), ("d", 1)], "image_id string, part_id int"
    )
    for rid in ("r1", "r1-replay", "r1-replay2"):
        index_append(df, table, str(base / "idx"), run_id=rid)
    index_append(df2, table, str(base / "idx"), run_id="r2")
    before = {(r.key, r.cnt) for r in duplicate_keys(spark, table).collect()}
    n = index_compact(spark, table, str(base / "staging"))
    after = {(r.key, r.cnt) for r in duplicate_keys(spark, table).collect()}
    assert before == after == {("c", 2), ("a", 2)}
    assert n == 5  # (a,0) (b,0) (c,0) (a,1) (d,1) — one row per key-part
    assert spark.table(table).count() == 5
    plan = _plan(duplicate_keys(spark, table))
    assert "Exchange" not in plan
    # appends still work against the compacted table (spec preserved)
    index_append(df2, table, str(base / "idx"), run_id="r3")
    assert duplicate_keys(spark, table).count() == 2
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_compaction_supersede_regenerated_partition(spark, tmp_path_factory):
    """A regenerated partition (keys removed/moved) leaves stale rows
    under latest-append-wins; supersede_parts=True compaction drops
    every row not written by the partition's latest run, restoring
    full-rescan equivalence after a backfill."""
    from advanced_data_profile_spark.plans.id_index import index_compact

    base = tmp_path_factory.mktemp("idxs")
    table = "idx_test_supersede"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    v1 = spark.createDataFrame(
        [("a", 0), ("b", 0)], "image_id string, part_id int"
    )
    index_append(v1, table, str(base / "idx"), run_id="r1")
    other = spark.createDataFrame([("a", 1)], "image_id string, part_id int")
    index_append(other, table, str(base / "idx"), run_id="r2")
    # partition 0 regenerated WITHOUT key 'a' — but r1's (a,0) row is
    # stale in the index, so the check still reports 'a' duplicated
    v2 = spark.createDataFrame([("b", 0), ("e", 0)], "image_id string, part_id int")
    index_append(v2, table, str(base / "idx"), run_id="r3")
    stale = {r.key for r in duplicate_keys(spark, table).collect()}
    assert stale == {"a"}  # the documented precondition violation
    index_compact(spark, table, str(base / "staging"), supersede_parts=True)
    assert duplicate_keys(spark, table).count() == 0
    rows = {(r.key, r.part_id) for r in spark.table(table).collect()}
    assert rows == {("b", "0"), ("e", "0"), ("a", "1")}
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_pipeline_auto_supersedes_on_revalidation(spark, tmp_path_factory):
    """Backfill scenario end-to-end (the append-only precondition,
    wired): partition 0 is regenerated with 3 of its ids MOVED to
    partition 1, then the pipeline reruns with resume=False. The rerun
    must detect the re-validation (pending partitions with prior 'done'
    manifest rows) and auto-compact with supersede_parts=True, so
    duplicate_keys reports no stale false duplicates without any
    manual compact call."""
    from advanced_data_profile_spark.sources.images import (
        generate_images,
        write_images,
    )

    base = tmp_path_factory.mktemp("idxauto")
    imgs = str(base / "imgs")
    out = str(base / "out")
    table = "idx_test_autosupersede"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    write_images(generate_images(spark, n_parts=3, rows_per_part=40), imgs)
    cfg = PipelineConfig(id_index_table=table)
    s1 = run_pipeline(spark, imgs, out, cfg=cfg)
    assert s1["partitions"] == 3
    # the generator plants duplicate ids by design — they are REAL
    # duplicates and must keep being reported; the backfill must not
    # ADD stale false ones on top
    baseline_dups = {r.key for r in duplicate_keys(spark, table).collect()}

    # backfill: move 3 non-duplicate ids from partition 0 to partition 1
    src = spark.read.parquet(imgs)
    moved = {
        r.image_id
        for r in src.where(
            (F.col("part_id") == 0)
            & ~F.col("image_id").isin(list(baseline_dups))
        ).limit(3).collect()
    }
    regen = src.withColumn(
        "part_id",
        F.when(F.col("image_id").isin(list(moved)), F.lit(1)).otherwise(
            F.col("part_id")
        ),
    )
    imgs2 = str(base / "imgs2")
    regen.write.partitionBy("part_id").parquet(imgs2)

    s2 = run_pipeline(spark, imgs2, out, cfg=cfg, resume=False)
    assert s2["partitions"] == 3
    assert "id_index_supersede" in s2["timings"]
    # without the auto-supersede, the moved ids would each show cnt=2
    # (stale part-0 row + new part-1 row); the planted real duplicates
    # must still be reported
    after = {r.key for r in duplicate_keys(spark, table).collect()}
    assert after == baseline_dups
    assert not (after & moved)
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_crashed_supersede_healed_by_next_run(spark, tmp_path_factory):
    """Crash window: a backfill run appends its regenerated partitions'
    index rows and dies BEFORE its supersede compaction. The old runs'
    'done' manifest rows make everything look finished, so a plain
    resume=True retry has nothing pending — it must still heal via the
    durable marker and compact before early-returning."""
    from advanced_data_profile_spark.plans.id_index import index_append
    from advanced_data_profile_spark.sources.images import (
        generate_images,
        write_images,
    )

    base = tmp_path_factory.mktemp("idxheal")
    imgs = str(base / "imgs")
    out = str(base / "out")
    table = "idx_test_heal"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    write_images(generate_images(spark, n_parts=2, rows_per_part=30), imgs)
    cfg = PipelineConfig(id_index_table=table)
    run_pipeline(spark, imgs, out, cfg=cfg)
    baseline_dups = {r.key for r in duplicate_keys(spark, table).collect()}

    # simulate the crashed backfill: move 2 clean ids from part 0 to
    # part 1, append the regenerated index rows and write the marker
    # (exactly the state run_pipeline leaves if it dies after its
    # append, before its compact) — no compaction
    src = spark.read.parquet(imgs)
    moved = [
        r.image_id
        for r in src.where(
            (F.col("part_id") == 0)
            & ~F.col("image_id").isin(list(baseline_dups))
        ).limit(2).collect()
    ]
    regen = src.withColumn(
        "part_id",
        F.when(F.col("image_id").isin(moved), F.lit(1)).otherwise(
            F.col("part_id")
        ),
    )
    index_append(
        regen.select("image_id", "part_id"), table, str(base / "loc"),
        run_id="backfill-crashed",
    )
    with open(f"{out}/id_index_compact_pending", "w") as mf:
        mf.write("\n".join(["0", "1"]))
    # without healing, the moved ids are now false duplicates
    assert {r.key for r in duplicate_keys(spark, table).collect()} >= set(moved)

    # plain retry: nothing pending, but the marker must trigger the
    # supersede compaction before the early return
    s = run_pipeline(spark, imgs, out, cfg=cfg, resume=True)
    assert s["partitions"] == 0
    import os

    assert not os.path.exists(f"{out}/id_index_compact_pending")
    assert {r.key for r in duplicate_keys(spark, table).collect()} == baseline_dups
    spark.sql(f"DROP TABLE IF EXISTS {table}")
