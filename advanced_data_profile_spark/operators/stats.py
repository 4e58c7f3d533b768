"""One-pass wide-aggregation column profiler.

The reference profiles columns one at a time in Python loops
(reference Profiler.py:576, 627, 695) — one full-table pass per column
per metric. Here every per-column statistic for every column is emitted
as one expression list into a single ``df.agg(...)`` (optionally
``groupBy(partition_col)``), so Catalyst executes ONE scan with
map-side partial aggregation before any shuffle. The wide result is
then melted to one row per (group, column) — the `column_profiles`
shape of SURVEY.md §1.3.

Scale notes (100 TB design point):
- the agg is a straight HashAggregate: partials per input partition,
  one shuffle keyed by the (low-cardinality) group column. No skew risk
  because group keys are table partitions, each roughly equal sized.
- exact mode uses ``count_distinct`` / ``percentile`` (expands to extra
  shuffles) and exists for oracle parity at test scale; ``approx`` mode
  (default for scale) uses Datasketches HLL distincts
  (``hll_sketch_agg``) and KLL sketch quantiles
  (``kll_sketch_agg_double``), both single-pass and MERGEABLE — the
  north_star's per-partition 'KLL-sketch quantiles + HyperLogLog
  distinct counts' state. ``sketch_state_struct`` emits the SAME
  aggregates as binary state (shared buffers when fused), which
  plans.pipeline persists to {out}/profile_sketches and
  operators/sketches.rollup_stored_profile_sketches merges — profile
  rollups never rescan raw data.
- column pruning: only profiled columns are read; profiling an image
  table never touches the ``bytes`` payload column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from advanced_data_profile_spark.functions.numeric import (
    decimal_places,
    sample_kurtosis,
    sample_skewness,
)

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_TIME_TYPES = (T.DateType, T.TimestampType, T.TimestampNTZType)
# column types profile() skips — the single source of truth for the
# "profilable column" policy (pipeline/profile_report import these)
SKIP_PROFILE_TYPES = (T.BinaryType, T.ArrayType, T.MapType, T.StructType)
NUMERIC_TYPES = _NUMERIC_TYPES

# Schema of one melted profile row (field order = output column order).
PROFILE_FIELDS = [
    ("column", "string"),
    ("n_rows", "bigint"),
    ("n_nonnull", "bigint"),
    ("n_null", "bigint"),
    ("null_ratio", "double"),
    ("n_distinct", "bigint"),
    ("unique_ratio", "double"),
    ("mean", "double"),
    ("stddev", "double"),          # sample, ddof=1 (reference parity)
    ("stddev_pop", "double"),
    ("min_num", "double"),
    ("max_num", "double"),
    ("p25", "double"),
    ("p50", "double"),
    ("p75", "double"),
    ("skewness", "double"),        # pandas-parity G1
    ("kurtosis", "double"),        # pandas-parity excess G2
    ("min_str", "string"),
    ("max_str", "string"),
    ("max_length", "bigint"),      # A15
    ("max_decimals", "bigint"),    # A16
    ("has_non_ascii", "boolean"),  # P4
]


# Schema of one melted sketch-state row (pipeline profile_sketches
# output): the PER-PARTITION mergeable state behind the approx profile
# (north_star: per-partition KLL quantiles + HLL distincts, merged) —
# persisting it makes any later rollup (table-level, snapshot-over-
# snapshot) a merge over stored sketches, never a raw rescan
# (operators/sketches.rollup_stored_profile_sketches).
SKETCH_FIELDS = [
    ("column", "string"),
    ("kll", "binary"),    # numeric columns only; NULL otherwise
    ("hll", "binary"),
]

KLL_K = 2048      # ~0.2% normalized rank error
HLL_LG_K = 12     # ~1.6% distinct-count error


def sketch_state_struct(name: str, dt: T.DataType) -> Column:
    """One column's mergeable sketch state as a struct-valued aggregate
    — built with the IDENTICAL aggregate expressions
    column_profile_struct(approx=True) uses for its quantile/distinct
    stats, so when both are fused into one agg Catalyst dedupes them
    into shared buffers: persisting the state costs (almost) nothing
    beyond the profile scan itself."""
    c = F.col(name)
    if _is_numeric(dt):
        kll = F.kll_sketch_agg_double(c.cast("double"), F.lit(KLL_K))
    else:
        kll = F.first(F.lit(None).cast("binary"))
    hll = F.hll_sketch_agg(c.cast("string"), HLL_LG_K)
    return F.struct(
        F.lit(name).alias("column"), kll.alias("kll"), hll.alias("hll")
    ).alias(f"__sk_{name}")


def _is_numeric(dt: T.DataType) -> bool:
    return isinstance(dt, _NUMERIC_TYPES)


# types whose cast to double is injective, so the exact-quantile value
# histogram doubles as an exact distinct count (long/decimal can collapse
# above 2^53 / 15 significant digits and keep the dedicated pass)
_HIST_DISTINCT_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.FloatType, T.DoubleType,
)


def _is_time(dt: T.DataType) -> bool:
    return isinstance(dt, _TIME_TYPES)


def _null_d() -> Column:
    return F.lit(None).cast("double")


def column_profile_struct(
    name: str, dt: T.DataType, approx: bool, with_quantiles: bool = True,
    fields: set[str] | None = None,
) -> Column:
    """All stats for one column as a single struct-valued aggregate.

    n_distinct note: exact ``count_distinct`` must NOT live in this
    struct — mixing DISTINCT aggregates with the heavy percentile /
    moment aggregates makes Catalyst rewrite the whole agg through an
    EXPAND (one replicated input copy per distinct group), multiplying
    the cost of every other aggregate (measured 10x at sf0.1). Exact
    mode therefore computes distincts in a separate scan (see
    ``profile``); approx HLL sketches are expand-free and stay fused.

    ``fields`` (None = all) limits which stats are COMPUTED; the struct
    always carries every PROFILE_FIELDS slot (unrequested ones as
    NULL), so the melted schema is stable. The expensive off-menu items
    are the string-cast aggregates (max_length/max_decimals render
    every numeric value as a string — ~1.2s of a 1.6s fused agg on
    4 double columns at sf1.0) and skew/kurt's higher power sums;
    callers that only read a subset (the profile_lineitem contract
    reads 9 of 22 fields) shouldn't pay for the rest.
    """

    def need(f: str) -> bool:
        return fields is None or f in fields

    c = F.col(name)
    n_rows = F.count(F.lit(1))
    n_nonnull = F.count(c)

    if not (need("n_distinct") or need("unique_ratio")):
        distinct = F.lit(None).cast("bigint")
    elif approx:
        # Datasketches HLL (same construction as sketch_state_struct, so
        # a fused agg shares ONE buffer for the estimate and the
        # persisted state; estimate error ~1.6% at lg_k=12)
        distinct = F.hll_sketch_estimate(
            F.hll_sketch_agg(c.cast("string"), HLL_LG_K)
        ).cast("bigint")
    else:
        distinct = F.lit(None).cast("bigint")  # filled by the distinct pass

    numeric = _is_numeric(dt)
    timey = _is_time(dt)
    stringy = isinstance(dt, T.StringType)

    want_q = need("p25") or need("p50") or need("p75")
    if numeric:
        cd = c.cast("double")
        if not want_q:
            q = F.array(_null_d(), _null_d(), _null_d())
        elif approx:
            # KLL sketch quantiles (north_star: per-partition stats via
            # 'KLL-sketch quantiles'): the sketch aggregate appears once
            # (Catalyst dedupes identical aggregate expressions into one
            # buffer), the three quantile reads are scalar post-steps.
            # Unlike percentile_approx's GK summary, the KLL state is
            # MERGEABLE (kll_merge_agg_double — see operators/sketches),
            # so per-partition profile state rolls up without rescans.
            # k=KLL_K → ~0.2% normalized rank error.
            sk = F.kll_sketch_agg_double(cd, F.lit(KLL_K))
            q = F.array(*[
                F.kll_sketch_get_quantile_double(sk, F.lit(p))
                for p in (0.25, 0.5, 0.75)
            ])
        elif with_quantiles:
            q = F.percentile(cd, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
        else:
            # exact quantiles come from the distributed histogram pass
            # (_exact_quantile_relation) and are joined back; Percentile
            # is a TypedImperativeAggregate whose boxed value->count map
            # merges single-threaded — measured 13s of an 18.9s profile
            # on one 4.5M-distinct double column at sf1.0
            q = F.array(_null_d(), _null_d(), _null_d())
        mean = F.avg(cd) if need("mean") else _null_d()
        stddev = F.stddev_samp(cd) if need("stddev") else _null_d()
        stddev_pop = F.stddev_pop(cd) if need("stddev_pop") else _null_d()
        mn = F.min(cd) if need("min_num") else _null_d()
        mx = F.max(cd) if need("max_num") else _null_d()
        skew = sample_skewness(cd, n_nonnull) if need("skewness") else _null_d()
        kurt = sample_kurtosis(cd, n_nonnull) if need("kurtosis") else _null_d()
        p25, p50, p75 = q.getItem(0), q.getItem(1), q.getItem(2)
        max_dec = (
            F.max(decimal_places(c)).cast("bigint")
            if need("max_decimals")
            else F.lit(None).cast("bigint")
        )
    else:
        mean = stddev = stddev_pop = mn = mx = skew = kurt = _null_d()
        p25 = p50 = p75 = _null_d()
        max_dec = F.lit(None).cast("bigint")

    want_minmax_str = need("min_str") or need("max_str")
    if not want_minmax_str:
        min_str = max_str = F.lit(None).cast("string")
    elif numeric or timey:
        min_str = F.min(c).cast("string")
        max_str = F.max(c).cast("string")
    elif stringy:
        min_str, max_str = F.min(c), F.max(c)
    else:
        min_str = max_str = F.lit(None).cast("string")

    if stringy:
        max_len = (
            F.max(F.length(c)).cast("bigint")
            if need("max_length")
            else F.lit(None).cast("bigint")
        )
        non_ascii = (
            F.coalesce(
                F.max(c.rlike(r"[^\x00-\x7F]").cast("int")) == 1, F.lit(False)
            )
            if need("has_non_ascii")
            else F.lit(None).cast("boolean")
        )
    else:
        max_len = (
            F.max(F.length(c.cast("string"))).cast("bigint")
            if need("max_length")
            else F.lit(None).cast("bigint")
        )
        non_ascii = F.lit(False)

    return F.struct(
        F.lit(name).alias("column"),
        n_rows.alias("n_rows"),
        n_nonnull.alias("n_nonnull"),
        (n_rows - n_nonnull).alias("n_null"),
        F.when(n_rows > 0, (n_rows - n_nonnull) / n_rows).alias("null_ratio"),
        distinct.cast("bigint").alias("n_distinct"),
        F.when(n_rows > 0, distinct / n_rows).alias("unique_ratio"),
        mean.alias("mean"),
        stddev.alias("stddev"),
        stddev_pop.alias("stddev_pop"),
        mn.alias("min_num"),
        mx.alias("max_num"),
        p25.alias("p25"),
        p50.alias("p50"),
        p75.alias("p75"),
        skew.alias("skewness"),
        kurt.alias("kurtosis"),
        min_str.alias("min_str"),
        max_str.alias("max_str"),
        max_len.alias("max_length"),
        max_dec.alias("max_decimals"),
        non_ascii.alias("has_non_ascii"),
    ).alias(f"__p_{name}")


_QUANTILE_BUCKETS = 1024
_QUANTILE_PROBS = (0.25, 0.5, 0.75)


def _exact_quantile_relation(
    df: DataFrame,
    columns: list[str],
    probs: tuple[float, ...] = _QUANTILE_PROBS,
    buckets: int = _QUANTILE_BUCKETS,
) -> DataFrame | None:
    """Exact p25/p50/p75 (and exact distinct counts) for numeric columns
    as a tiny relation ``(column, __hq25, __hq50, __hq75, __hnd)`` —
    the distributed replacement for ``F.percentile`` in ungrouped exact
    profiles.

    Why not ``F.percentile``: it is a TypedImperativeAggregate over a
    boxed value->count OpenHashMap whose partial buffers serialize and
    merge single-threaded; on one 4.5M-distinct double column at sf1.0
    it costs ~13s even when fed a pre-aggregated histogram. Here every
    step is whole-stage-codegen:

    1. one metadata-sized job collects (count, min, max) per column so
       rank positions and bucket bounds become literals;
    2. melt -> ``groupBy(column, value).count()`` builds the exact value
       histogram (one narrow shuffle, map-side partial agg);
    3. histogram values are range-bucketed by the DETERMINISTIC
       ``width_bucket`` on the literal bounds (monotone in v, so bucket
       order == value order); per-bucket totals re-aggregate the SAME
       histogram (the physical plan shares one Exchange via
       ReusedExchange — no second scan), and a tiny window over them
       yields each bucket's global rank offset;
    4. the cumulative count inside each bucket is a window partitioned
       by (column, bucket) — parallel across ~1k buckets per column,
       never the one-task-per-column sort that a plain
       ``Window.partitionBy(column)`` cumsum would be (measured 6s for
       the 4.5M-row column);
    5. the rows bracketing each literal rank are picked by conditional
       aggregation and interpolated with the exact formula Spark's
       Percentile.getPercentile uses ((hi - pos) * v_lo +
       (pos - lo) * v_hi), so results are bit-identical to the old
       plan's.

    The histogram row count doubles as the exact distinct count
    (``__hnd``); callers use it only for types whose double cast is
    injective (_HIST_DISTINCT_TYPES).

    Scale shape: the widest anything gets is the histogram shuffle
    (bounded by distinct values, not rows); the collected stats row is
    one row of literals; per-bucket skew is bounded by the value
    distribution between literal min/max (uniform-ish for real numeric
    data; a pathological single-value-heavy column just degrades toward
    the old single-task behavior for that bucket).

    Columns with zero non-null values are left out (callers coalesce
    their distinct count to 0; quantiles stay NULL). Returns None when
    nothing remains.
    """
    import math

    if not columns:
        return None
    spark = df.sparkSession
    stats_row = df.select([
        e
        for c in columns
        for e in (
            F.count(F.col(c)).alias(f"n_{c}"),
            F.min(F.col(c).cast("double")).alias(f"mn_{c}"),
            F.max(F.col(c).cast("double")).alias(f"mx_{c}"),
        )
    ]).collect()[0]

    live = [c for c in columns if stats_row[f"n_{c}"] > 0]
    if not live:
        return None

    def bucket_expr(c: str, v: Column) -> Column:
        mn, mx = stats_row[f"mn_{c}"], stats_row[f"mx_{c}"]
        if (
            mn is None or mx is None or mn == mx
            or not (math.isfinite(mn) and math.isfinite(mx))
        ):
            return F.lit(1)
        b = F.width_bucket(v, F.lit(mn), F.lit(mx), F.lit(buckets))
        # NaN sorts greatest in SQL ordering; keep it monotone past +max
        return F.when(F.isnan(v), F.lit(buckets + 2)).otherwise(b)

    # melt once with an INT column id (string ids would widen both
    # shuffles) and the deterministic bucket attached
    melt = (
        df.select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(i).alias("cid"),
                        F.col(c).cast("double").alias("v"),
                    )
                    for i, c in enumerate(live)
                ])
            ).alias("s")
        )
        .select("s.*")
        .where(F.col("v").isNotNull())
    )
    bucket = None
    for i, c in enumerate(live):
        e = bucket_expr(c, F.col("v"))
        bucket = F.when(F.col("cid") == i, e) if bucket is None else bucket.when(
            F.col("cid") == i, e
        )
    hist = melt.groupBy("cid", "v").agg(F.count(F.lit(1)).alias("f")).withColumn(
        "b", bucket
    )

    # per-bucket totals -> global rank offset of each bucket (tiny).
    # Derived from the SAME histogram aggregation as the main path, so
    # the physical plan shares one Exchange (ReusedExchange) instead of
    # paying a second melt scan for the broadcast side.
    per_bucket = hist.groupBy("cid", "b").agg(F.sum("f").alias("bf"))
    w_off = (
        Window.partitionBy("cid")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.select(
        "cid", "b", F.coalesce(F.sum("bf").over(w_off), F.lit(0)).alias("off")
    )

    w_cum = (
        Window.partitionBy("cid", "b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # explicit partition count: the rows are narrow (int, double, long),
    # so AQE's byte-targeted coalescing would fold the whole histogram
    # into one or two partitions and serialize the CPU-bound sort+window
    # (measured 2.1s -> ~0.6s at sf1.0 with the explicit count, which
    # AQE leaves alone); (cid, bucket) grain keeps it skew-free
    n_par = df.sparkSession.sparkContext.defaultParallelism
    cum = (
        hist.join(F.broadcast(offsets), ["cid", "b"])
        .repartition(n_par, "cid", "b")
        .select(
            "cid", "v", "f", "b",
            (F.col("off") + F.sum("f").over(w_cum)).alias("c"),
        )
        .drop("b")
    )

    # bracketing positions per column as literals (0-indexed sorted rank)
    sel: list[Column] = [F.count(F.lit(1)).alias("__hnd")]
    finals: list[Column] = [
        F.element_at(
            F.array(*[F.lit(c) for c in live]), F.col("cid") + 1
        ).alias("column")
    ]
    for j, p in enumerate(probs):
        vlo_cases, vhi_cases = None, None
        for i, c in enumerate(live):
            n = stats_row[f"n_{c}"]
            pos = (n - 1) * p
            lo, hi = math.floor(pos), math.ceil(pos)
            in_lo = (F.col("c") - F.col("f") <= F.lit(lo)) & (F.lit(lo) < F.col("c"))
            in_hi = (F.col("c") - F.col("f") <= F.lit(hi)) & (F.lit(hi) < F.col("c"))
            cm = F.col("cid") == i
            vlo_cases = (
                F.when(cm & in_lo, F.col("v"))
                if vlo_cases is None
                else vlo_cases.when(cm & in_lo, F.col("v"))
            )
            vhi_cases = (
                F.when(cm & in_hi, F.col("v"))
                if vhi_cases is None
                else vhi_cases.when(cm & in_hi, F.col("v"))
            )
        sel.append(F.max(vlo_cases).alias(f"__vlo_{j}"))
        sel.append(F.max(vhi_cases).alias(f"__vhi_{j}"))

    agg = cum.groupBy("cid").agg(*sel)

    for j, p in enumerate(probs):
        val = None
        for i, c in enumerate(live):
            n = stats_row[f"n_{c}"]
            pos = (n - 1) * p
            lo, hi = math.floor(pos), math.ceil(pos)
            if lo == hi:
                expr = F.col(f"__vlo_{j}")
            else:
                # Spark Percentile.getPercentile interpolation, literal
                # fractions computed in the same double arithmetic
                expr = (
                    F.lit(float(hi) - pos) * F.col(f"__vlo_{j}")
                    + F.lit(pos - float(lo)) * F.col(f"__vhi_{j}")
                )
            val = F.when(F.col("cid") == i, expr) if val is None else val.when(
                F.col("cid") == i, expr
            )
        finals.append(val.alias(f"__hq_{j}"))
    finals.append(F.col("__hnd"))
    return agg.select(*finals)


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    group_by: str | None = None,
    approx: bool = False,
    fields: list[str] | None = None,
) -> DataFrame:
    """Profile columns in one aggregation pass (plus, in exact mode, a
    second distinct-count pass — see column_profile_struct); melt to
    long format.

    Returns one row per (group_by?, column) with PROFILE_FIELDS.
    Binary columns are skipped by default (never scan image payloads
    for stats — reference stats are never over raw bytes either).

    ``fields`` (None = all) restricts which stats are computed —
    manual projection pushdown into the aggregate. The output schema is
    unchanged (unrequested fields come back NULL); the savings are the
    string-cast aggregates, the skew/kurt power sums, and whole side
    passes (distinct scan, quantile histogram) when their fields are
    not requested. Catalyst cannot prune these itself: the stats live
    inside struct-valued aggregates that are exploded before the
    caller's select.
    """
    if fields is not None:
        known = {f for f, _ in PROFILE_FIELDS}
        bad = set(fields) - known
        if bad:
            raise ValueError(f"unknown profile fields: {sorted(bad)}")
    fset = set(fields) if fields is not None else None

    def need(f: str) -> bool:
        return fset is None or f in fset

    if columns is None:
        columns = [
            f.name for f in df.schema.fields
            if not isinstance(f.dataType, SKIP_PROFILE_TYPES)
            and f.name != group_by
        ]
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    # ungrouped exact mode: numeric quantiles (and, where the double
    # cast is injective, distinct counts) come from the distributed
    # histogram pass instead of Percentile / count_distinct aggregates —
    # see _exact_quantile_relation. Grouped exact mode keeps Percentile:
    # its per-group maps are small (grouping is partition-grained by
    # contract) and rank literals are unavailable per group.
    want_q = need("p25") or need("p50") or need("p75")
    want_nd = need("n_distinct") or need("unique_ratio")
    hist_cols = (
        [c for c in columns if _is_numeric(dtypes[c])]
        if (not approx and group_by is None and want_q)
        else []
    )
    structs = [
        column_profile_struct(
            c, dtypes[c], approx,
            with_quantiles=c not in hist_cols, fields=fset,
        )
        for c in columns
    ]

    if not approx and group_by is not None:
        # grouped exact percentile is a sort-heavy aggregate whose
        # parallelism is capped by input splits (parquet row groups);
        # when the source is under-split, a cheap narrow-projection
        # shuffle buys full-width parallelism (~35% faster at sf0.1).
        # Approx mode is single-pass mergeable sketches, and ungrouped
        # exact mode is moments-only codegen; neither needs this.
        sc = df.sparkSession.sparkContext
        keep_cols = [group_by] + columns
        narrow = df.select(*keep_cols)
        if narrow.rdd.getNumPartitions() < sc.defaultParallelism:
            df = narrow.repartition(sc.defaultParallelism)

    if group_by is not None:
        agg = df.groupBy(group_by).agg(*structs)
        keep = [F.col(group_by)]
    else:
        agg = df.agg(*structs)
        keep = []

    melted = agg.select(
        *keep,
        F.explode(F.array(*[F.col(f"__p_{c}") for c in columns])).alias("s"),
    )
    out = melted.select(*keep, *[F.col(f"s.{f}").alias(f) for f, _ in PROFILE_FIELDS])
    if approx:
        return out

    # exact quantiles for numeric columns (ungrouped mode): distributed
    # histogram pass joined back; its histogram row count is the exact
    # distinct count for types whose double cast is injective, so those
    # columns skip the count_distinct scan entirely.
    qrel = _exact_quantile_relation(df, hist_cols) if hist_cols else None
    hist_nd_cols = (
        {c for c in hist_cols if isinstance(dtypes[c], _HIST_DISTINCT_TYPES)}
        if qrel is not None and want_nd
        else set()
    )
    joined = out
    if qrel is not None:
        joined = joined.drop("p25", "p50", "p75").join(
            F.broadcast(qrel), on=["column"], how="left"
        )
        for j, name in enumerate(("p25", "p50", "p75")):
            joined = joined.withColumn(name, F.col(f"__hq_{j}"))
        joined = joined.drop("__hq_0", "__hq_1", "__hq_2")
    if not want_nd:
        # distinct stats not requested: skip the count_distinct pass and
        # leave the struct's NULL placeholders in place
        order = ([group_by] if group_by else []) + [f for f, _ in PROFILE_FIELDS]
        return joined.drop("__hnd").select(*order)

    # exact distinct counts for the remaining columns: dedicated scan,
    # melted and joined back. Kept OUT of the main agg to avoid the
    # EXPAND rewrite (docstring above); this agg has only
    # count_distincts so the expand carries no heavy expressions.
    # Round-5 A/B vs a melt-shuffle variant (explode to (column, value)
    # rows, count_distinct per column — no EXPAND but shuffles
    # n_rows x n_cols rows): 3.242s vs 3.299s at sf0.1 x 32 cores, and
    # the melt's distinct is over string casts. The dedicated scan stays.
    cd_cols = [c for c in columns if c not in hist_nd_cols]
    keys = [group_by] if group_by else []
    if cd_cols:
        dagg = (df.groupBy(*keys) if keys else df).agg(
            *[F.count_distinct(F.col(c)).alias(f"__d_{c}") for c in cd_cols]
        )
        dmelt = dagg.select(
            *keys,
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"__d_{c}").cast("bigint").alias("__nd"),
                    )
                    for c in cd_cols
                ])
            ).alias("d"),
        ).select(*keys, "d.column", "d.__nd")
        joined = joined.join(F.broadcast(dmelt), on=keys + ["column"], how="left")
    else:
        joined = joined.withColumn("__nd", F.lit(None).cast("bigint"))
    if qrel is not None and hist_nd_cols:
        # histogram distinct where available; 0 (not NULL) for all-null
        # columns, which the histogram omits
        nd = F.when(
            F.col("column").isin(*hist_nd_cols),
            F.coalesce(F.col("__hnd"), F.lit(0)),
        ).otherwise(F.col("__nd"))
    else:
        nd = F.col("__nd")
    joined = joined.withColumn("n_distinct", nd.cast("bigint")).withColumn(
        "unique_ratio",
        F.when(F.col("n_rows") > 0, F.col("n_distinct") / F.col("n_rows")),
    ).drop("__nd", "__hnd")
    order = ([group_by] if group_by else []) + [f for f, _ in PROFILE_FIELDS]
    return joined.select(*order)


def outlier_pct(
    df: DataFrame,
    columns: list[str],
    group_by: str | None = None,
    threshold: float = 3.0,
) -> DataFrame:
    """% of non-null values with |z| > threshold (population sigma),
    per column — reference Profiler.py:359-362 / P3 in SURVEY.md.

    Two fused aggregation passes over the same scan: pass 1 computes
    (mu, sigma) for every column at once; pass 2 computes all ratios at
    once. At scale this is 2 scans total for ANY number of columns —
    versus the reference's 2 scans *per column*.

    The broadcast moment relation is groups x 2*columns doubles —
    fine for partition-grained group_by (the profiling contract here);
    a group_by in the many-millions would need the hint dropped in
    favor of an AQE-chosen join.
    """
    keys = [group_by] if group_by else []
    m1 = (df.groupBy(*keys) if keys else df).agg(
        *[F.avg(c).alias(f"mu_{c}") for c in columns],
        *[F.stddev_pop(c).alias(f"sd_{c}") for c in columns],
    )
    if keys:
        joined = df.join(F.broadcast(m1), on=keys)
    else:
        joined = df.crossJoin(F.broadcast(m1))
    outlier_exprs = []
    for c in columns:
        z_hit = (
            F.abs(F.col(c) - F.col(f"mu_{c}")) / F.col(f"sd_{c}") > threshold
        ).cast("int")
        pct = F.when(
            F.count(c) > 0,
            F.round(F.sum(F.coalesce(z_hit, F.lit(0))) * 100.0 / F.count(c), 4),
        ).otherwise(0.0)
        outlier_exprs.append(pct.alias(f"__o_{c}"))
    agg2 = (joined.groupBy(*keys) if keys else joined).agg(*outlier_exprs)
    melted = agg2.select(
        *[F.col(k) for k in keys],
        F.explode(
            F.array(*[
                F.struct(F.lit(c).alias("column"), F.col(f"__o_{c}").alias("outlier_pct"))
                for c in columns
            ])
        ).alias("s"),
    )
    return melted.select(*keys, "s.column", "s.outlier_pct")


def estimated_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the relation (A4 'memory usage' —
    plan statistics instead of the reference's pandas deep memory scan;
    report-only metadata, never an exact byte count)."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def table_summary(df: DataFrame, group_by: str | None = None) -> DataFrame:
    """Table-level stats: row/col counts, duplicate flag, null totals
    (reference first_phase/second_phase, Profiler.py:514-622)."""
    cols = [f.name for f in df.schema.fields if f.name != group_by]
    n_cols = len(cols)
    null_counts = [F.count(F.lit(1)) - F.count(F.col(c)) for c in cols]
    total_nulls = None
    for e in null_counts:
        total_nulls = e if total_nulls is None else total_nulls + e
    # duplicate-row detection via 64-bit hash inequality (A3): exact
    # count_distinct over the hash — collision odds negligible for a
    # verdict, and it avoids a groupBy over full-width rows.
    row_hash = F.xxhash64(*[F.col(c) for c in cols])
    agg = (df.groupBy(group_by) if group_by else df).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(row_hash).alias("n_distinct_rows"),
        total_nulls.alias("n_nulls_total"),
    )
    return agg.select(
        *([group_by] if group_by else []),
        "n_rows",
        F.lit(n_cols).alias("n_cols"),
        (F.col("n_rows") > F.col("n_distinct_rows")).alias("has_duplicates"),
        "n_nulls_total",
        (F.col("n_rows") * n_cols - F.col("n_nulls_total")).alias("n_nonnull_total"),
    )
