"""Mergeable-sketch operators for incremental / hierarchical rollups.

At 10^12 rows you never recompute table-level stats from raw data:
each partition keeps a mergeable sketch (HyperLogLog for distinct,
GK/percentile_approx summaries for quantiles), and any rollup —
table-level, snapshot-over-snapshot, cluster-of-partitions — is a
merge of sketches. PySpark 4.x exposes Datasketches HLL natively:
``hll_sketch_agg`` (partial per group) + ``hll_union_agg`` (merge)
+ ``hll_sketch_estimate``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_distinct_sketches(
    df: DataFrame, columns: list[str], group_by: str = "part_id",
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch per (partition, column) — stored as binary, so it
    can be persisted next to column_profiles and merged later without
    touching raw data."""
    agg = df.groupBy(group_by).agg(
        *[F.hll_sketch_agg(F.col(c).cast("string"), lg_k).alias(f"__s_{c}")
          for c in columns]
    )
    melted = agg.select(
        F.col(group_by),
        F.explode(
            F.array(*[
                F.struct(F.lit(c).alias("column"), F.col(f"__s_{c}").alias("sketch"))
                for c in columns
            ])
        ).alias("s"),
    )
    return melted.select(group_by, "s.column", "s.sketch")


def merge_distinct_sketches(sketches: DataFrame) -> DataFrame:
    """Roll partition sketches up to table level: (column, n_distinct_est).
    Operates on the tiny sketch relation only — NO raw-data scan."""
    return (
        sketches.groupBy("column")
        .agg(F.hll_union_agg("sketch").alias("merged"))
        .select(
            "column",
            F.hll_sketch_estimate("merged").cast("bigint").alias("n_distinct_est"),
        )
    )


def distinct_rollup(
    df: DataFrame, columns: list[str], group_by: str = "part_id"
) -> tuple[DataFrame, DataFrame]:
    """(per-partition estimates, table-level estimates from merged
    sketches) — the two-level rollup in one pass over raw data."""
    sk = partition_distinct_sketches(df, columns, group_by)
    sk = sk.persist()
    per_part = sk.select(
        group_by, "column",
        F.hll_sketch_estimate("sketch").cast("bigint").alias("n_distinct_est"),
    )
    return per_part, merge_distinct_sketches(sk)
