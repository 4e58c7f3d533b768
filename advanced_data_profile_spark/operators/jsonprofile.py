"""Semi-structured (JSON string column) profiling — the schema-on-read
twin of the tabular profiler: per top-level key, presence counts and a
type census (integer / double / boolean / string), without requiring a
schema up front.

Two-phase shape (the same discipline as operators.typeinfer):
  1. key DISCOVERY: explode json_object_keys → one count aggregation;
     the distinct key set of a metadata column is bounded by schema
     size, so collecting the top-max_keys keys driver-side is O(schema),
     never O(rows).
  2. per-key CENSUS: ONE wide aggregation over a second scan, with
     get_json_object + try_cast expressions per discovered key (all
     JVM-side) — melted back to one row per key.

The reference profiles flat CSVs only (Profiler.py); web-scale image
tables carry JSON metadata columns (exif blobs, crawl headers), so this
is an engine extension per the task brief. Mirrored 1:1 in DuckDB
(json_keys / json_extract_string) for the value oracle.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SAFE_KEY = re.compile(r"^[A-Za-z0-9_]+$")

PROFILE_COLUMNS = [
    "key", "n_present", "present_ratio", "n_numeric", "n_integer",
    "n_boolean", "min_num", "max_num", "inferred_type",
]


DISCOVERY_SAMPLE_THRESHOLD = 1_000_000
DISCOVERY_SAMPLE_FRACTION = 0.01


def discover_keys(
    df: DataFrame,
    col: str,
    max_keys: int = 200,
    n_rows: int | None = None,
    sample_threshold: int = DISCOVERY_SAMPLE_THRESHOLD,
    sample_fraction: float = DISCOVERY_SAMPLE_FRACTION,
) -> list[str]:
    """Top-level keys by presence count (ties broken by key), capped at
    max_keys. Keys with characters outside [A-Za-z0-9_] are skipped
    BEFORE the cap (same order as the DuckDB oracle's pre-LIMIT filter)
    — they would need escaped JSONPath, documented limitation.

    At scale, key DISCOVERY runs on a deterministic hash-sample of the
    column value (sampling.sample_hash — partition-layout independent)
    once the table exceeds ``sample_threshold`` rows: the key *set* of a
    metadata column is schema-bounded, so a 1% sample sees every key
    that appears in ≳0.01% of rows; a rarer key can still be profiled by
    passing it explicitly to json_key_profile(keys=...) — the census
    pass is always full-table. ``n_rows`` skips the sizing count when
    the caller already knows it (manifest/scan stats)."""
    from advanced_data_profile_spark.operators.sampling import (
        _HASH_SPACE, sample_hash,
    )

    if n_rows is None:
        n_rows = df.count()  # parquet sources answer from footer metadata
    src = df
    if n_rows > sample_threshold:
        src = df.where(
            sample_hash(F.col(col), salt="jsonkeys")
            < int(sample_fraction * _HASH_SPACE)
        )
    rows = (
        src.select(F.explode(F.json_object_keys(F.col(col))).alias("key"))
        .where(F.col("key").rlike(r"^[A-Za-z0-9_]+$"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("key"))
        .limit(max_keys)
        .collect()
    )
    return [r.key for r in rows if _SAFE_KEY.match(r.key)]


def json_key_profile(
    df: DataFrame,
    col: str,
    max_keys: int = 200,
    keys: list[str] | None = None,
) -> DataFrame:
    """One row per discovered key:
      n_present      rows where the key exists with a non-null value
      present_ratio  n_present / total rows (NULL/absent props count)
      n_numeric      values that cast to double
      n_integer      numeric values that are integral
      n_boolean      values that are JSON true/false
      min_num/max_num  numeric range
      inferred_type  integer | double | boolean | string | empty
                     (all-of-kind wins, else string — the reference's
                     all-or-nothing type vote, typeinfer parity)

    ``keys`` overrides discovery — pass it to profile a key rarer than
    the discovery sample rate (the census pass is always full-table).
    """
    if keys is None:
        keys = discover_keys(df, col, max_keys)
    else:
        keys = [k for k in keys if _SAFE_KEY.match(k)]
    spark = df.sparkSession
    if not keys:
        return spark.createDataFrame(
            [],
            "key string, n_present bigint, present_ratio double, "
            "n_numeric bigint, n_integer bigint, n_boolean bigint, "
            "min_num double, max_num double, inferred_type string",
        )
    # ONE JSON parse per row (from_json to map<string,string> — scalars
    # keep their raw token text, nested values their JSON text, matching
    # get_json_object semantics), then O(1) map lookups per key — not
    # O(keys) full JSON parses per row, which dominates at 100s of keys
    parsed = F.from_json(F.col(col), "map<string,string>")
    exprs = [F.count(F.lit(1)).alias("__n")]
    for i, k in enumerate(keys):
        v = parsed.getItem(k)
        d = v.try_cast("double")
        exprs += [
            F.count(v).alias(f"__p_{i}"),
            F.sum(d.isNotNull().cast("long")).alias(f"__num_{i}"),
            F.sum((d.isNotNull() & (d == F.floor(d))).cast("long")).alias(f"__int_{i}"),
            F.sum(v.isin("true", "false").cast("long")).alias(f"__bool_{i}"),
            F.min(d).alias(f"__mn_{i}"),
            F.max(d).alias(f"__mx_{i}"),
        ]
    wide = df.agg(*exprs)
    melted = wide.select(
        "__n",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(k).alias("key"),
                    F.col(f"__p_{i}").alias("n_present"),
                    F.col(f"__num_{i}").alias("n_numeric"),
                    F.col(f"__int_{i}").alias("n_integer"),
                    F.col(f"__bool_{i}").alias("n_boolean"),
                    F.col(f"__mn_{i}").alias("min_num"),
                    F.col(f"__mx_{i}").alias("max_num"),
                )
                for i, k in enumerate(keys)
            ])
        ).alias("s"),
    )
    p, num, intg, boo = (
        F.col("s.n_present"), F.col("s.n_numeric"),
        F.col("s.n_integer"), F.col("s.n_boolean"),
    )
    inferred = (
        F.when(p == 0, "empty")
        .when(num == p, F.when(intg == p, "integer").otherwise("double"))
        .when(boo == p, "boolean")
        .otherwise("string")
    )
    return melted.select(
        F.col("s.key").alias("key"),
        p.alias("n_present"),
        F.round(p / F.col("__n"), 6).alias("present_ratio"),
        num.alias("n_numeric"),
        intg.alias("n_integer"),
        boo.alias("n_boolean"),
        F.round(F.col("s.min_num"), 6).alias("min_num"),
        F.round(F.col("s.max_num"), 6).alias("max_num"),
        inferred.alias("inferred_type"),
    )
