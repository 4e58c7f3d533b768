"""CSV source parity with the reference (S1: Profiler.py:525 reads the
input with pandas.read_csv). Spark-first: header row honored, NO
inferSchema — every column arrives as string and the engine's own
type-inference operator (operators.typeinfer.infer_types) is the
authority, exactly like the reference's custom inference replaces
pandas dtype sniffing. inferSchema would also cost a second full scan
at 100 TB; the sampled voting pass is the scalable replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_csv(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    header: bool = True,
    multiline: bool = False,
) -> DataFrame:
    """All-string CSV read (schema inference is infer_types' job)."""
    return (
        spark.read.option("header", header)
        .option("sep", delimiter)
        .option("multiLine", multiline)
        .option("inferSchema", False)
        .csv(path)
    )


def read_csv_typed(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    sample_rows: int | None = 100_000,
) -> tuple[DataFrame, dict]:
    """read_csv + the engine's own inference applied: returns the typed
    DataFrame and the per-column InferredType decisions — the analogue
    of the reference's load-then-convert phase (Profiler.py:525-537)."""
    from advanced_data_profile_spark.operators.typeinfer import (
        apply_types,
        infer_types,
    )

    raw = read_csv(spark, path, delimiter=delimiter)
    decisions = infer_types(raw, sample_rows=sample_rows)
    return apply_types(raw, decisions), decisions
