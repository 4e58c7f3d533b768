"""Logical type inference — the reference's six types, Spark-first.

Reference semantics (Profiler.py:203-220):
  empty     — all values null
  integer   — numeric and every non-null value % 1 == 0
  float     — numeric otherwise
  date      — string column fully parseable as datetime, time parts all 0
  timestamp — string column fully parseable, has a time part
  string    — fallback

The reference tries ~4k strptime formats per value in Python
(Profiler.py:97-123, 189-193). Here the candidate list is the same
Cartesian product (component orders x separators x time suffixes)
translated to Spark's DateTimeFormatter dialect, and the vote is
DATA-PARALLEL rather than plan-wide: the sampled string values are
exploded to (column, value) rows, cross-joined with a broadcast
formats relation, and ``try_to_timestamp(value, fmt)`` is evaluated
once per (value, format) pair — one shuffle of (column, fmt) partial
counts, never a 4000-expression aggregate. Winning formats are then
confirmed on the full column in one narrow agg. A persistent
frequency cache orders candidates so common formats are tried first
(reference Profiler.py:126-135, 180-186).

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

# Spark datetime-pattern candidates, common-first (the reference's 16
# hard-coded formats, Profiler.py:161-178, translated to Spark dialect).
# generate_format_candidates() appends the Cartesian sweep behind these.
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

# sentinel: vote with Spark's DEFAULT timestamp parser (no pattern) —
# lenient ISO-8601 family, the reference's pd.to_datetime fallback (T4)
LENIENT_FORMAT = "<lenient>"

# time suffixes for the Cartesian sweep ('' = date-only)
_TIME_SUFFIXES = [
    "",
    " HH:mm:ss",
    " HH:mm",
    " HH:mm:ss.SSS",
    "'T'HH:mm:ss",
    "'T'HH:mm:ss.SSS",
    " h:mm a",
    " hh:mm:ss a",
]


def generate_format_candidates() -> list[str]:
    """The T1 Cartesian generator (reference Profiler.py:97-123 builds
    ~4k strptime permutations): component orders x separators x year
    widths x time suffixes, in Spark pattern dialect. Single-letter
    M/d/H subsume their zero-padded forms in Java's DateTimeFormatter,
    so ~250 Spark patterns cover the reference's ~4k strptime strings.
    COMMON_FORMATS stay at the head so the vote's first-match tie-break
    is stable with the small list."""
    dates: list[str] = []
    for sep in ("-", "/", ".", " "):
        for order in ("ymd", "dmy", "mdy"):
            parts = {"y": "yyyy", "m": "M", "d": "d"}
            dates.append(sep.join(parts[ch] for ch in order))
        for order in ("dmy", "mdy"):
            parts = {"y": "yy", "m": "M", "d": "d"}
            dates.append(sep.join(parts[ch] for ch in order))
    dates += [
        "yyyyMMdd",
        "d MMM yyyy",
        "MMM d yyyy",
        "MMM d, yyyy",
        "MMMM d, yyyy",
        "d MMMM yyyy",
    ]
    out = list(COMMON_FORMATS)
    out += [d + t for d in dates for t in _TIME_SUFFIXES]
    out += ["HH:mm:ss.SSS", "h:mm a"]
    # LENIENT_FORMAT last: Spark's default parser (ISO-8601 family,
    # variable fractional seconds, offsets) — the T4 analogue of the
    # reference's pd.to_datetime fallback (Profiler.py:196-200), tried
    # only when no explicit pattern wins
    out += [LENIENT_FORMAT]
    seen: set[str] = set()
    res: list[str] = []
    for f in out:
        if f not in seen:
            seen.add(f)
            res.append(f)
    return res


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


def _ts_expr(c, fmt: str):
    """try_to_timestamp for an explicit pattern or the lenient default."""
    col = F.col(c) if isinstance(c, str) else c
    if fmt == LENIENT_FORMAT:
        return F.try_to_timestamp(col)
    return F.try_to_timestamp(col, F.lit(fmt))


def _seeded_sample(df: DataFrame, sample_rows: int | None, seed: int = 42) -> DataFrame:
    """Seeded uniform row sample (~sample_rows rows) — replaces head
    sampling (df.limit reads only the first file's rows and funnels the
    vote through one task after a GlobalLimit; SURVEY O3 prescribes a
    seeded sample). One count() sizes the fraction — parquet/iceberg
    answer it from row-group metadata; a non-columnar source pays a
    scan here, in which case callers should pass the row count from
    their catalog/manifest instead (the pipeline's manifest carries
    n_rows per partition)."""
    if sample_rows is None:
        return df
    n = df.count()
    if n <= sample_rows:
        return df
    return df.sample(fraction=min(1.0, 1.2 * sample_rows / n), seed=seed)


def _literal_ts(val: "F.Column", fmt: str) -> "F.Column":
    """try_to_timestamp with a LITERAL pattern — Spark caches the
    compiled DateTimeFormatter per literal, while a pattern arriving as
    a data column rebuilds the formatter per row (measured ~10x)."""
    if fmt == LENIENT_FORMAT:
        return F.try_to_timestamp(val)
    return F.try_to_timestamp(val, F.lit(fmt))


def vote_datetime_formats(
    voter: DataFrame, string_cols: list[str], formats: list[str]
) -> dict[str, tuple[str, bool]]:
    """For each string column, the first format (in `formats` order)
    that parses EVERY non-null sampled value with all years in
    [1900, 2100]; the bool says whether all time parts are zero (date
    vs timestamp).

    Shape: melt the sampled values to (col, val), cross-join the tiny
    broadcast formats relation, aggregate per (col, fmt_id) — ONE job
    regardless of candidate-list length (a chunked wide-agg loop was
    measured paying more in repeated planning + past-codegen-limit
    interpreted aggregation than the data pass itself). The parse
    dispatches through a CASE chain of LITERAL patterns keyed by
    fmt_id, not the joined fmt string: Spark caches the compiled
    DateTimeFormatter per literal pattern, while a pattern arriving as
    a data column rebuilds the formatter per row."""
    if not string_cols or voter.isEmpty():
        return {}
    spark = voter.sparkSession
    melted = voter.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(c).alias("col"), F.col(c).alias("val"))
                for c in string_cols
            ])
        ).alias("s")
    ).select("s.col", "s.val")
    fmts = spark.createDataFrame(
        [(i,) for i in range(len(formats))], "fmt_id int"
    )
    ts = None
    for i, fmt in enumerate(formats):
        parsed = _literal_ts(F.col("val"), fmt)
        ts = (
            F.when(F.col("fmt_id") == i, parsed) if ts is None
            else ts.when(F.col("fmt_id") == i, parsed)
        )
    agg = (
        melted.crossJoin(F.broadcast(fmts))
        .groupBy("col", "fmt_id")
        .agg(
            F.count("val").alias("n"),
            F.sum(ts.isNotNull().cast("long")).alias("hits"),
            F.min(
                F.when(ts.isNotNull(), F.year(ts).between(1900, 2100).cast("int"))
            ).alias("valid"),
            F.min(
                F.when(
                    ts.isNotNull(),
                    ((F.hour(ts) == 0) & (F.minute(ts) == 0) & (F.second(ts) == 0)).cast("int"),
                )
            ).alias("datelike"),
        )
        .where((F.col("hits") == F.col("n")) & (F.col("n") > 0) & (F.col("valid") == 1))
    )
    rows = agg.collect()  # <= len(string_cols) * len(formats) tiny rows
    best: dict[str, tuple[int, str, bool]] = {}
    for r in rows:
        cur = best.get(r["col"])
        if cur is None or r["fmt_id"] < cur[0]:
            best[r["col"]] = (r["fmt_id"], formats[r["fmt_id"]], r["datelike"] == 1)
    return {c: (f, d) for c, (_, f, d) in best.items()}


def infer_types(
    df: DataFrame,
    columns: list[str] | None = None,
    formats: list[str] | None = None,
    cache: FormatCache | None = None,
    sample_rows: int | None = 100_000,
) -> dict[str, InferredType]:
    """Infer the reference's logical type per column. Driver-side dict
    result (it drives which stat expressions are emitted downstream).

    sample_rows: vote on a seeded uniform sample first; winning
    datetime formats and string-numeric verdicts are confirmed on the
    full column in one narrow agg. At test scale the sample covers the
    table; at 100 TB it turns ~250 full-column format trials into one
    small sampled vote + one confirming scan.
    """
    cache = cache or FormatCache(None)
    formats = cache.ordered(list(formats or generate_format_candidates()))
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

    voter = _seeded_sample(df, sample_rows)
    if sample_rows is not None:
        voter = voter.persist()
    row = voter.agg(*exprs).collect()[0].asDict()
    dt_votes = vote_datetime_formats(voter, string_cols, formats)
    if sample_rows is not None:
        voter.unpersist()

    def _decide(c: str) -> InferredType:
        dt = dtypes[c]
        n = row[f"__n_{c}"]
        if n == 0:
            return InferredType("empty")
        if isinstance(dt, _NUMERIC_TYPES):
            if not isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
                return InferredType("integer")
            if row[f"__int_{c}"] == 1:
                # reference downcasts all-integral floats (Profiler.py:533-535)
                return InferredType("integer")
            # "double" = float with > 6 decimal places (Profiler.py:587-588)
            return InferredType("double" if (row[f"__dec_{c}"] or 0) > 6 else "float")
        if isinstance(dt, (T.DateType,)):
            return InferredType("date")
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            return InferredType("timestamp")
        if isinstance(dt, T.StringType):
            if c in dt_votes:
                fmt, datelike = dt_votes[c]
                cache.record(fmt)
                return InferredType(
                    "date" if datelike else "timestamp", datetime_format=fmt
                )
            if row[f"__numhits_{c}"] == n:
                return InferredType("integer" if row[f"__numint_{c}"] == 1 else "float")
            return InferredType("string")
        return InferredType("string")

    decisions = {c: _decide(c) for c in columns}

    # confirm sample-voted verdicts on the full column (datetime format
    # must parse every row; string-numeric must cast every row)
    if sample_rows is not None:
        confirm_dt = [
            (c, t) for c, t in decisions.items()
            if t.datetime_format and t.logical in ("date", "timestamp")
        ]
        confirm_num = [
            c for c, t in decisions.items()
            if t.logical in ("integer", "float")
            and isinstance(dtypes[c], T.StringType)
        ]
        # a sample-declared 'empty' column needs a full-column confirm
        # too: a sparse column that happens to be all-NULL in the seeded
        # sample must not be typed 'empty' when the full column has
        # values (the datetime/numeric verdicts already get this pass)
        confirm_empty = [c for c, t in decisions.items() if t.logical == "empty"]
        if confirm_dt or confirm_num or confirm_empty:
            cexprs = []
            for c in confirm_empty:
                cexprs.append(F.count(F.col(c)).alias(f"__en_{c}"))
                if isinstance(dtypes[c], _NUMERIC_TYPES):
                    cexprs.append(
                        F.min((F.col(c) == F.floor(F.col(c))).cast("int")).alias(
                            f"__eint_{c}"
                        )
                    )
                    cexprs.append(
                        F.max(
                            F.coalesce(
                                F.length(
                                    F.split(F.col(c).cast("string"), r"\.").getItem(1)
                                ),
                                F.lit(0),
                            )
                        ).alias(f"__edec_{c}")
                    )
                elif isinstance(dtypes[c], T.StringType):
                    d = F.col(c).try_cast("double")
                    cexprs.append(
                        (F.sum(d.isNotNull().cast("long")) == F.count(F.col(c))).alias(
                            f"__enum_{c}"
                        )
                    )
                    cexprs.append(
                        F.min(
                            F.when(d.isNotNull(), (d == F.floor(d)).cast("int"))
                        ).alias(f"__enumint_{c}")
                    )
            for c, t in confirm_dt:
                ts = _ts_expr(c, t.datetime_format)
                cexprs.append(
                    (
                        F.sum(ts.isNotNull().cast("long")) == F.count(F.col(c))
                    ).alias(f"__ok_{c}")
                )
            for c in confirm_num:
                d = F.col(c).try_cast("double")
                cexprs.append(
                    (
                        F.sum(d.isNotNull().cast("long")) == F.count(F.col(c))
                    ).alias(f"__ok_{c}")
                )
                cexprs.append(
                    F.min(F.when(d.isNotNull(), (d == F.floor(d)).cast("int"))).alias(
                        f"__int_{c}"
                    )
                )
            crow = df.agg(*cexprs).collect()[0].asDict()
            for c in confirm_empty:
                if crow[f"__en_{c}"] == 0:
                    continue  # confirmed empty on the full column
                dt = dtypes[c]
                if isinstance(dt, _NUMERIC_TYPES):
                    if not isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
                        decisions[c] = InferredType("integer")
                    elif crow[f"__eint_{c}"] == 1:
                        decisions[c] = InferredType("integer")
                    else:
                        decisions[c] = InferredType(
                            "double" if (crow[f"__edec_{c}"] or 0) > 6 else "float"
                        )
                elif isinstance(dt, T.DateType):
                    decisions[c] = InferredType("date")
                elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
                    decisions[c] = InferredType("timestamp")
                elif isinstance(dt, T.StringType):
                    # no sampled values means no datetime vote happened;
                    # the numeric confirm aggregates decide, else fall
                    # back to the string path (never 'empty')
                    if crow[f"__enum_{c}"]:
                        decisions[c] = InferredType(
                            "integer" if crow[f"__enumint_{c}"] == 1 else "float"
                        )
                    else:
                        decisions[c] = InferredType("string")
                else:
                    decisions[c] = InferredType("string")
            for c, t in confirm_dt:
                if not crow[f"__ok_{c}"]:
                    decisions[c] = InferredType("string")
            for c in confirm_num:
                if not crow[f"__ok_{c}"]:
                    decisions[c] = InferredType("string")
                else:
                    decisions[c] = InferredType(
                        "integer" if crow[f"__int_{c}"] == 1 else "float"
                    )
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
                parsed = _ts_expr(c, t.datetime_format)
                c = parsed.cast("date") if t.logical == "date" else parsed
            elif t.logical == "integer":
                c = c.try_cast("bigint")
            elif t.logical in ("float", "double"):
                c = c.try_cast("double")
        cols.append(c.alias(f.name))
    return df.select(*cols)
