"""Count-min sketch state codec (functions/cmsketch) + frequency-
sketch operators: the parse/merge/estimate tier Spark doesn't ship,
verified against Spark's own aggregate output."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from advanced_data_profile_spark.functions.cmsketch import (
    estimate_cms,
    merge_cms,
    parse_cms,
    serialize_cms,
)


def _sketch(df, col, seed=7):
    r = df.agg(
        F.count_min_sketch(col, F.lit(0.001), F.lit(0.99), F.lit(seed)).alias("s")
    ).collect()[0]
    return bytes(r.s)


@pytest.fixture(scope="module")
def items_df(spark):
    items = {f"item{i}": (i + 1) * 3 for i in range(25)}
    rows = [it for it, c in items.items() for _ in range(c)]
    return items, spark.createDataFrame(pd.DataFrame({"x": rows}))


def test_parse_roundtrip_and_estimates_match_exact(spark, items_df):
    items, df = items_df
    b = _sketch(df, "x")
    s = parse_cms(b)
    assert s.total == sum(items.values())
    assert serialize_cms(s) == b  # byte-identical roundtrip
    # collision-free at this width: estimates EQUAL exact counts
    for it, c in items.items():
        assert estimate_cms(s, it) == c
    assert estimate_cms(s, "never-seen") == 0


def test_merge_of_parts_equals_whole(spark, items_df):
    items, df = items_df
    whole = _sketch(df, "x")
    parts = [
        _sketch(df.where(F.crc32(F.col("x")) % 3 == i), "x") for i in range(3)
    ]
    merged = merge_cms(parts)
    assert serialize_cms(merged) == whole  # elementwise merge is exact


def test_merge_spec_mismatch_raises(spark, items_df):
    _, df = items_df
    a = _sketch(df, "x")
    r = df.agg(
        F.count_min_sketch("x", F.lit(0.01), F.lit(0.99), F.lit(7)).alias("s")
    ).collect()[0]
    with pytest.raises(ValueError, match="incompatible"):
        merge_cms([a, bytes(r.s)])


def test_estimate_never_undercounts(spark):
    # adversarial: tiny width forces collisions; CMS may overcount,
    # must never undercount
    pdf = pd.DataFrame({"x": [f"v{i % 50}" for i in range(5000)]})
    df = spark.createDataFrame(pdf)
    r = df.agg(
        F.count_min_sketch("x", F.lit(0.5), F.lit(0.9), F.lit(1)).alias("s")
    ).collect()[0]
    s = parse_cms(bytes(r.s))
    for i in range(50):
        assert estimate_cms(s, f"v{i}") >= 100


def test_heavy_hitters_from_state_end_to_end(spark):
    from advanced_data_profile_spark.operators.sketches import (
        heavy_hitters_from_state,
        partition_frequency_sketches,
    )

    rows = (
        [("p0", "big")] * 300 + [("p1", "big")] * 200
        + [("p0", "mid")] * 50 + [("p1", "small")] * 5
    )
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["part_id", "cat"]))
    sk = partition_frequency_sketches(df, ["cat"], "part_id")
    cands = df.select(
        F.lit("cat").alias("column"), F.col("cat").alias("value")
    ).distinct()
    hh = heavy_hitters_from_state(sk, cands, min_count=10)
    assert [(h["value"], h["est_count"]) for h in hh] == [
        ("big", 500), ("mid", 50)
    ]


def test_heavy_hitters_nonstring_candidates_use_spark_rendering(spark):
    """Sketches hash Spark's cast('string') rendering ('true', not
    Python's 'True'); candidate values must be stringified IN SPARK or
    boolean/double heavy hitters would estimate 0 and vanish."""
    from advanced_data_profile_spark.operators.sketches import (
        heavy_hitters_from_state,
        partition_frequency_sketches,
    )

    df = spark.createDataFrame(
        [(i % 2, bool(i % 2 == 0)) for i in range(100)],
        "part_id int, flag boolean",
    )
    sk = partition_frequency_sketches(df, ["flag"], "part_id")
    cands = df.select(
        F.lit("flag").alias("column"), F.col("flag").alias("value")
    ).distinct()
    hh = heavy_hitters_from_state(sk, cands)
    assert sorted((h["value"], h["est_count"]) for h in hh) == [
        ("false", 50), ("true", 50)
    ]
