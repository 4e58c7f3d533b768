"""Constraint engine vs the fixture's modulo-rule ground truth."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from advanced_data_profile_spark.operators import constraints as C
from advanced_data_profile_spark.sources.images import (
    ground_truth,
    phash_reference,
    read_images,
)

N_PARTS, ROWS = 4, 250


@pytest.fixture(scope="module")
def images(spark, images_path):
    return read_images(spark, images_path)


@pytest.fixture(scope="module")
def results(spark, images):
    checks = [
        C.not_null("caption_not_null", "caption"),
        C.domain("w_domain", (F.col("w") > 0) & (F.col("w") <= 8192), "w"),
        C.domain("fmt_known", F.col("fmt").isin("raw", "bmp"), "fmt"),
        C.unique("image_id_unique", "image_id"),
        C.referential("phash_ref", "phash", phash_reference(images), "phash"),
    ]
    res, vio = C.evaluate(images, checks, part_col="part_id")
    return res.collect(), vio.collect()


def test_verdicts_match_ground_truth(results):
    res, _ = results
    gt = ground_truth(N_PARTS, ROWS)
    by = {(int(r.part_id), r.constraint): r for r in res}
    for p in range(N_PARTS):
        assert by[(p, "caption_not_null")].n_violations == gt[p]["caption_violations"]
        assert by[(p, "w_domain")].n_violations == gt[p]["w_domain_violations"]
        assert by[(p, "fmt_known")].n_violations == gt[p]["fmt_violations"]
        assert by[(p, "phash_ref")].n_violations == gt[p]["orphan_phash"]
        # each within-part dup pair involves 2 rows, plus 1 row per part
        # for the cross-partition duplicate (row 0 of parts > 0 copies
        # part 0's row-0 id): uniqueness is GLOBAL with per-partition
        # attribution
        assert by[(p, "image_id_unique")].n_violations == \
            gt[p]["dup_id_pairs"] * 2 + 1
        for name in ("caption_not_null", "w_domain", "fmt_known",
                     "image_id_unique", "phash_ref"):
            r = by[(p, name)]
            assert r.passed == (r.n_violations == 0)
            assert r.n_rows == ROWS


def test_violation_rows(results):
    _, vio = results
    dup = [r for r in vio if r.constraint == "image_id_unique"]
    # per partition: the within-part dup keys plus the cross-partition
    # key (attributed to every partition holding it, global count 4)
    assert len(dup) == N_PARTS * 3
    within = [r for r in dup if '"duplicate_count":2' in r.detail]
    cross = [r for r in dup if '"duplicate_count":4' in r.detail]
    assert len(within) == N_PARTS * 2
    assert len(cross) == N_PARTS
    orphans = [r for r in vio if r.constraint == "phash_ref"]
    assert len(orphans) == N_PARTS
    assert all(int(r.key) < 0 for r in orphans)


def test_global_uniqueness_catches_cross_partition_dup(images):
    res, vio = C.evaluate(
        images, [C.unique("gid", "image_id")], part_col=None
    )
    keys = {r.key for r in vio.collect()}
    # row 0 of parts 1..3 duplicates part 0's row 0 id
    assert "img-0000-00000000" in keys


def test_passing_constraints(spark, images):
    res, _ = C.evaluate(
        images,
        [C.domain("h_domain", (F.col("h") > 0) & (F.col("h") <= 8192), "h")],
        part_col="part_id",
    )
    assert all(r.passed for r in res.collect())


def test_dedup_exact(spark):
    pdf = pd.DataFrame({"k": ["a", "a", "b", "c", "c", "c"], "v": range(6)})
    out = C.dedup_exact(spark.createDataFrame(pdf), "k")
    assert out.count() == 3
    assert {r.k for r in out.collect()} == {"a", "b", "c"}
    # deterministic winner
    again = C.dedup_exact(spark.createDataFrame(pdf), "k")
    assert sorted((r.k, r.v) for r in out.collect()) == \
           sorted((r.k, r.v) for r in again.collect())


def test_referential_tpch(spark):
    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    customer = spark.read.parquet(f"{sf}/customer.parquet")
    res, vio = C.evaluate(
        orders,
        [C.referential("cust_fk", "o_custkey", customer, "c_custkey")],
        part_col=None,
    )
    r = res.collect()[0]
    # TPC-H referential integrity holds
    assert r.passed and r.n_violations == 0


def test_unique_counts_duplicate_null_keys(spark):
    """NULL is a key group too: duplicated NULL keys must be violations
    in BOTH the partitioned and unpartitioned paths (the attribution
    join is null-safe)."""
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({
        "part_id": [0, 0, 1, 1],
        "k": pd.array([None, None, 7, 8], dtype="Int64"),
    }))
    res_p, vio_p = C.evaluate(df, [C.unique("u", "k")], part_col="part_id")
    by = {int(r.part_id): r for r in res_p.collect()}
    assert by[0].n_violations == 2 and by[0].passed is False
    assert by[1].n_violations == 0 and by[1].passed is True
    assert any(r.key is None for r in vio_p.collect())

    res_g, _ = C.evaluate(df, [C.unique("u", "k")], part_col=None)
    assert res_g.first().n_violations == 2
