"""Logical type inference — the reference's six types, Spark-first.

Reference semantics (Profiler.py:203-220):
  empty     — all values null
  integer   — numeric and every non-null value % 1 == 0
  float     — numeric otherwise
  date      — string column fully parseable as datetime, time parts all 0
  timestamp — string column fully parseable, has a time part
  string    — fallback

The reference tries ~4k strptime formats per value in Python
(Profiler.py:97-123, 189-193). Here the vote is columnar: for each
candidate format, ONE aggregate expression
``sum(try_to_timestamp(c, fmt) is not null) == count(c)`` decides
whether the whole column parses — all candidates for all string
columns are evaluated in a single wide agg (one scan). A persistent
frequency cache orders candidates so common formats are tried first
(reference Profiler.py:126-135, 180-186); at scale, voting runs on a
row sample first and only winning candidates are confirmed full-column.

Parsed dates are validated to year in [1900, 2100]
(reference Profiler.py:139-144).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Spark datetime-pattern candidates, common-first (reference's 16
# hard-coded formats, Profiler.py:161-178, translated to Spark dialect;
# the Cartesian generator's useful combinations collapse into these).
COMMON_FORMATS: list[str] = [
    "yyyy-MM-dd",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy/MM/dd",
    "MM/dd/yyyy",
    "dd/MM/yyyy",
    "dd-MM-yyyy",
    "MM-dd-yyyy",
    "yyyyMMdd",
    "MM/dd/yyyy HH:mm:ss",
    "dd/MM/yyyy HH:mm:ss",
    "yyyy/MM/dd HH:mm:ss",
    "yyyy-MM-dd HH:mm",
    "dd MMM yyyy",
    "MMM dd, yyyy",
    "HH:mm:ss",
    # the reference's pace quirk: "5:30" parses as a time -> timestamp
    # (observed in the golden report, SURVEY.md §1.2); kept deliberately.
    "H:mm",
]

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


@dataclass
class InferredType:
    logical: str               # empty|integer|float|double|date|timestamp|string
    datetime_format: str | None = None


class FormatCache:
    """Frequency-ordered persistent format cache (reference S6,
    Profiler.py:126-135, 1109-1110) — JSON instead of pickle."""

    def __init__(self, path: str | None):
        self.path = path
        self.freq: dict[str, int] = {}
        if path and os.path.exists(path):
            try:
                with open(path) as f:
                    self.freq = {k: int(v) for k, v in json.load(f).items()}
            except (json.JSONDecodeError, OSError, ValueError):
                self.freq = {}

    def ordered(self, candidates: list[str]) -> list[str]:
        return sorted(candidates, key=lambda f: -self.freq.get(f, 0))

    def record(self, fmt: str) -> None:
        self.freq[fmt] = self.freq.get(fmt, 0) + 1

    def save(self) -> None:
        if self.path:
            with open(self.path, "w") as f:
                json.dump(self.freq, f)


def _fmt_exprs(col: str, i: int, fmt: str) -> list:
    """Three aggregates per (string column, format): parse hit count,
    all-dates-valid (year 1900-2100), all-time-parts-zero."""
    ts = F.try_to_timestamp(F.col(col), F.lit(fmt))
    hit = F.sum(ts.isNotNull().cast("long")).alias(f"__f{i}_hits_{col}")
    valid = F.min(
        F.when(
            ts.isNotNull(),
            (F.year(ts).between(1900, 2100)).cast("int"),
        )
    ).alias(f"__f{i}_valid_{col}")
    datelike = F.min(
        F.when(
            ts.isNotNull(),
            ((F.hour(ts) == 0) & (F.minute(ts) == 0) & (F.second(ts) == 0)).cast("int"),
        )
    ).alias(f"__f{i}_date_{col}")
    return [hit, valid, datelike]


def infer_types(
    df: DataFrame,
    columns: list[str] | None = None,
    formats: list[str] | None = None,
    cache: FormatCache | None = None,
    sample_rows: int | None = 100_000,
) -> dict[str, InferredType]:
    """Infer the reference's logical type per column. Driver-side dict
    result (it drives which stat expressions are emitted downstream).

    sample_rows: vote on a row-limited slice first; a format that wins
    on the sample is confirmed on the full column in a second agg. At
    test scale the sample covers the table and the confirm pass is the
    same size; at 100 TB it turns ~17 full scans of format trials into
    one small scan + one confirming scan.
    """
    cache = cache or FormatCache(None)
    formats = cache.ordered(list(formats or COMMON_FORMATS))
    if columns is None:
        columns = [
            f.name for f in df.schema.fields
            if not isinstance(f.dataType, (T.BinaryType, T.ArrayType, T.MapType, T.StructType))
        ]
    dtypes = {f.name: f.dataType for f in df.schema.fields}

    exprs: list = []
    string_cols: list[str] = []
    for c in columns:
        dt = dtypes[c]
        exprs.append(F.count(F.col(c)).alias(f"__n_{c}"))
        if isinstance(dt, _NUMERIC_TYPES):
            exprs.append(
                F.min((F.col(c) == F.floor(F.col(c))).cast("int")).alias(f"__int_{c}")
            )
            exprs.append(
                F.max(
                    F.coalesce(
                        F.length(F.split(F.col(c).cast("string"), r"\.").getItem(1)),
                        F.lit(0),
                    )
                ).alias(f"__dec_{c}")
            )
        elif isinstance(dt, T.StringType):
            string_cols.append(c)
            d = F.col(c).try_cast("double")
            exprs.append(F.sum(d.isNotNull().cast("long")).alias(f"__numhits_{c}"))
            exprs.append(
                F.min(F.when(d.isNotNull(), (d == F.floor(d)).cast("int"))).alias(
                    f"__numint_{c}"
                )
            )
            for i, fmt in enumerate(formats):
                exprs.extend(_fmt_exprs(c, i, fmt))

    voter = df.limit(sample_rows) if sample_rows else df
    row = voter.agg(*exprs).collect()[0].asDict()

    def _decide(c: str, r: dict) -> InferredType:
        dt = dtypes[c]
        n = r[f"__n_{c}"]
        if n == 0:
            return InferredType("empty")
        if isinstance(dt, _NUMERIC_TYPES):
            if not isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
                return InferredType("integer")
            if r[f"__int_{c}"] == 1:
                # reference downcasts all-integral floats (Profiler.py:533-535)
                return InferredType("integer")
            # "double" = float with > 6 decimal places (Profiler.py:587-588)
            return InferredType("double" if (r[f"__dec_{c}"] or 0) > 6 else "float")
        if isinstance(dt, (T.DateType,)):
            return InferredType("date")
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            return InferredType("timestamp")
        if isinstance(dt, T.StringType):
            for i, fmt in enumerate(formats):
                if r[f"__f{i}_hits_{c}"] == n and r[f"__f{i}_valid_{c}"] == 1:
                    cache.record(fmt)
                    logical = "date" if r[f"__f{i}_date_{c}"] == 1 else "timestamp"
                    return InferredType(logical, datetime_format=fmt)
            if r[f"__numhits_{c}"] == n:
                return InferredType("integer" if r[f"__numint_{c}"] == 1 else "float")
            return InferredType("string")
        return InferredType("string")

    decisions = {c: _decide(c, row) for c in columns}

    # confirm sample-voted datetime formats on the full column
    if sample_rows is not None:
        confirm = [
            (c, t) for c, t in decisions.items()
            if t.datetime_format and t.logical in ("date", "timestamp")
        ]
        if confirm:
            cexprs = []
            for c, t in confirm:
                ts = F.try_to_timestamp(F.col(c), F.lit(t.datetime_format))
                cexprs.append(
                    (
                        F.sum(ts.isNotNull().cast("long")) == F.count(F.col(c))
                    ).alias(f"__ok_{c}")
                )
            crow = df.agg(*cexprs).collect()[0].asDict()
            for c, t in confirm:
                if not crow[f"__ok_{c}"]:
                    decisions[c] = InferredType("string")
    cache.save()
    return decisions


def apply_types(df: DataFrame, decisions: dict[str, InferredType]) -> DataFrame:
    """Cast string columns to their inferred types (the analogue of the
    reference's in-place dtype mutation, Profiler.py:533-537)."""
    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        t = decisions.get(f.name)
        if t and isinstance(f.dataType, T.StringType):
            if t.logical in ("date", "timestamp") and t.datetime_format:
                parsed = F.try_to_timestamp(c, F.lit(t.datetime_format))
                c = parsed.cast("date") if t.logical == "date" else parsed
            elif t.logical == "integer":
                c = c.try_cast("bigint")
            elif t.logical in ("float", "double"):
                c = c.try_cast("double")
        cols.append(c.alias(f.name))
    return df.select(*cols)
