"""Top-k value counts, Shannon entropy and categorical confidence.

The reference computes ``value_counts().head(10)`` and
``scipy.stats.entropy`` per column in a Python loop (reference
Profiler.py:634, 262-282). Here ALL columns share one melt pipeline:

    explode(array(struct(col_name, value) ...))      -- one scan
      -> groupBy(column, value).count()              -- partial agg map-side
      -> row_number() over (partition by column order by count desc, value)

Scale notes: the explode multiplies rows by n_columns but partial
aggregation collapses them before the shuffle, so shuffle volume is
O(n_columns * n_distinct_values), not O(rows). Tie-break is pinned to
(count desc, value asc) — pandas' tie order is unspecified, we make it
deterministic (SURVEY.md A9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def melt_value_counts(
    df: DataFrame,
    columns: list[str],
    group_by: str | None = None,
) -> DataFrame:
    """(group?, column, value, cnt) — value cast to string; nulls dropped
    (reference value_counts drops NaN)."""
    keys = [F.col(group_by)] if group_by else []
    pairs = F.explode(
        F.array(*[
            F.struct(
                F.lit(c).alias("column"),
                F.col(c).cast("string").alias("value"),
            )
            for c in columns
        ])
    ).alias("kv")
    return (
        df.select(*keys, pairs)
        .select(*keys, "kv.column", "kv.value")
        .where(F.col("value").isNotNull())
        .groupBy(*([group_by] if group_by else []), "column", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def top_k_values(
    df: DataFrame,
    columns: list[str],
    k: int = 10,
    group_by: str | None = None,
) -> DataFrame:
    """Top-k most frequent values per column (A9), deterministic ties."""
    counts = melt_value_counts(df, columns, group_by)
    parts = ([group_by] if group_by else []) + ["column"]
    w = Window.partitionBy(*parts).orderBy(F.desc("cnt"), F.asc("value"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(*parts, "value", "cnt", "rank")
    )


def entropy(
    df: DataFrame,
    columns: list[str],
    group_by: str | None = None,
    round_floats: int | None = None,
) -> DataFrame:
    """Shannon entropy (natural log) of each column's value distribution
    (A19; reference Profiler.py:262-265 uses scipy.stats.entropy).

    round_floats: reference rounds float columns to 2 dp before counting
    (Profiler.py:272-274); pass 2 to replicate for those columns.
    """
    src = df
    if round_floats is not None:
        src = df.select(*[
            F.round(F.col(c), round_floats).alias(c) if t in ("double", "float")
            else F.col(c)
            for c, t in df.dtypes
        ])
    counts = melt_value_counts(src, columns, group_by)
    keys = ([group_by] if group_by else []) + ["column"]
    return (
        counts.groupBy(*keys)
        .agg(
            (
                F.log(F.sum("cnt"))
                - F.sum(F.col("cnt") * F.log(F.col("cnt"))) / F.sum("cnt")
            ).alias("entropy")
        )
    )


def categorical_confidence(
    df: DataFrame,
    columns: list[str],
    group_by: str | None = None,
) -> DataFrame:
    """Reference Profiler.py:268-282: confidence = 0 if nunique <= 1 or
    unique_ratio >= 0.1, else max(0, 100 - entropy*10), rounded 2 dp.
    Float columns rounded to 2 dp before counting."""
    src = df.select(*([group_by] if group_by else []), *[
        F.round(F.col(c), 2).alias(c) if dict(df.dtypes)[c] in ("double", "float")
        else F.col(c)
        for c in columns
    ])
    counts = melt_value_counts(src, columns, group_by)
    keys = ([group_by] if group_by else []) + ["column"]
    per_col = counts.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum("cnt").alias("n"),
        (
            F.log(F.sum("cnt"))
            - F.sum(F.col("cnt") * F.log(F.col("cnt"))) / F.sum("cnt")
        ).alias("entropy"),
    )
    conf = (
        F.when(
            (F.col("n_distinct") <= 1)
            | (F.col("n_distinct") / F.col("n") >= 0.1),
            F.lit(0.0),
        )
        .otherwise(
            F.greatest(F.lit(0.0), F.round(100.0 - F.col("entropy") * 10.0, 2))
        )
    )
    return per_col.select(*keys, F.round("entropy", 6).alias("entropy"),
                          conf.alias("categorical_confidence"))
