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
# max exact-histogram rows the final quantile job may collect per
# bracketing region; a needed region with more DISTINCT values than
# this is sub-bucketed in another (cheap, filter-pushed) pass instead —
# bounds driver memory by CAP x (a few regions) regardless of scale
_QUANTILE_COLLECT_CAP = 1 << 17
# max region ROW count for which the guarded distinct collect is tried
# before sub-bucket refinement: under this bound a wasted attempt (the
# region turns out to hold > CAP distinct values) costs one bounded
# sub-second aggregation, while a successful one saves the whole
# refinement cascade a hot value would otherwise cause
# (log_buckets(range/ulp) raw scans); above it, refinement goes first
# so an over-cap-distinct region never aggregates unboundedly many
# values just to trip the limit
_QUANTILE_ATTEMPT_ROW_CAP = 1 << 22


def _exact_quantiles_driver(
    df: DataFrame,
    live: list[str],
    stats: dict[str, tuple[int, float | None, float | None]],
    probs: tuple[float, ...] = _QUANTILE_PROBS,
    buckets: int = _QUANTILE_BUCKETS,
) -> dict[str, tuple[float, ...]] | None:
    """Exact quantiles for numeric columns via a bucketed rank search
    over RAW value scans, finished DRIVER-side — the replacement for
    ``F.percentile`` (a TypedImperativeAggregate whose boxed
    value->count map merges single-threaded: ~13s on one 4.5M-distinct
    double at sf1.0), for the r8 window/join formulation (whose
    per-bucket-offset side re-built the melt histogram from raw
    because diverging pushed filters broke the intended ReusedExchange
    — two full extra passes, 4.9s of a 5.0s profile at sf1.0), and for
    the first r9 draft that materialized the full exact value
    histogram (groupBy(value), persisted): building + caching a
    distincts-sized relation cost ~1.5-1.8s on the 5.8M-distinct
    column at sf1.0, while the rank search only ever needs ~1k-row
    bucket summaries and CAP-bounded bracketing regions — both
    computable from raw scans with map-side combine (0.27s + 0.3s
    measured), and the exact distinct count now comes from the
    caller's concurrent count_distinct leg instead of the histogram's
    row count. At 100 TB the difference is starker still: no
    distincts-sized cached relation exists at any point.

    ``stats[c] = (n_nonnull, min, max)`` — supplied by the caller, who
    already has them from the wide profile aggregate (no extra job).
    ``live`` must only contain columns with n_nonnull > 0.

    Per column (columns run as CONCURRENT driver jobs — an in-session
    A/B beat the r9-draft single melted 4x-explode job 1.04s vs 1.61s
    at sf0.1 and 1.44s vs 2.2s at sf1.0: the per-column scans read one
    column chunk each and overlap, and the rows never carry a column
    id):

    1. ONE scan aggregates per-range-bucket row counts (~1k rows, from
       the DETERMINISTIC ``width_bucket`` on the literal bounds —
       monotone in v, so bucket order == value order; 1k groups means
       map-side partial aggregation collapses the shuffle to ~1k rows
       per task). The driver walks the cumulative bucket counts to
       find which bucket holds each bracketing rank (floor/ceil of
       (n-1)*p) and that bucket's global rank offset.
    2. A needed bucket with more than _QUANTILE_COLLECT_CAP ROWS but
       at most _QUANTILE_ATTEMPT_ROW_CAP of them is first resolved by
       a GUARDED distinct collect (one fused groupBy(v).count() job
       over all such regions, limited to regions x CAP + 1 rows):
       over-cap row counts at in-cap row volume are the HOT-VALUE
       signature (a low-cardinality column concentrates its whole
       mass on a few buckets), and sub-bucketing a hot value would
       recurse log_buckets(range/ulp) levels for nothing. Only a
       region that genuinely holds more distinct values than the cap
       (the guarded collect overflows), or more rows than the attempt
       bound (so the wasted aggregation would not be cheap), is
       sub-bucketed by another width_bucket pass over just that
       bucket's value range (a raw scan with the same membership
       predicate; log_buckets levels — 2 cover 10^9 rows). An
       unsplittable over-cap region (NaN / boundary cells, or a range
       narrowed below 1 ulp) whose guarded collect overflows falls
       back.
    3. a final job aggregates ONLY the needed regions' (value, count)
       rows from raw (CAP-bounded: each region holds <= CAP rows, so
       <= CAP distinct values); the driver walks them to the exact
       bracketing values and interpolates with the same formula
       Spark's Percentile.getPercentile uses ((hi - pos) * v_lo +
       (pos - lo) * v_hi) in the same IEEE double arithmetic, so
       results are bit-identical to the in-plan formulation's.

    Returns ``{column: (q_per_prob...)}``, or None for the
    pathological case it cannot bound (a needed unsplittable region
    with more distinct values than the collect cap) — the caller
    falls back to _exact_quantile_relation_windowed, correct at any
    size.

    A pre-histogram repartition of under-split sources was
    A/B-measured and REJECTED (sf1.0 summary job 1.87s -> 3.74s): the
    hash-aggregate exchange, not the single-task map side, bounds this
    job.

    Scale shape: every Spark job here is a raw scan + a
    map-side-combined aggregation whose group count is <= buckets per
    refinement level (plus the CAP-bounded final/guarded collects);
    nothing distincts-sized is ever shuffled, cached, or collected; no
    windows, no joins.
    """
    import math
    from concurrent.futures import ThreadPoolExecutor

    if not live:
        return {}

    def one_column(c: str):
        n, mn, mx = stats[c]
        v = F.col(c).cast("double")
        degenerate = (
            mn is None or mx is None or mn == mx
            or not (math.isfinite(mn) and math.isfinite(mx))
        )
        raw = df.where(v.isNotNull()).select(v.alias("v"))
        hv = F.col("v")

        def bucket_over(lo: float, hi: float) -> Column:
            b = F.width_bucket(hv, F.lit(lo), F.lit(hi), F.lit(buckets))
            # NaN sorts greatest in SQL ordering; keep it monotone
            # past +max
            return F.when(F.isnan(hv), F.lit(buckets + 2)).otherwise(b)

        def sub_bounds(lo, hi, b):
            # value range of width_bucket cell b over [lo, hi] — used
            # only to DEFINE the next sub-bucketing grid, never for
            # membership (membership is always the same width_bucket
            # expression == literal, so float rounding here cannot
            # misplace a value)
            if not 1 <= b <= buckets:
                return None  # boundary/NaN cells hold few values
            w = (hi - lo) / buckets
            slo, shi = lo + (b - 1) * w, lo + b * w
            if not (math.isfinite(slo) and math.isfinite(shi) and slo < shi):
                return None
            return slo, shi

        rs = set()
        for p in probs:
            pos = (n - 1) * p
            rs.add(math.floor(pos))
            rs.add(math.ceil(pos))
        need = sorted(rs)

        rank_val: dict[int, float] = {}

        def walk(region, rows):
            # rows: (value, count) pairs covering the region; assign
            # the region's needed global ranks by cumulative count in
            # value order
            cum = region["offset"]
            it = iter(region["ranks"])
            want = next(it, None)
            for vv, f in sorted(rows, key=lambda t: (math.isnan(t[0]), t[0])):
                while want is not None and cum <= want < cum + f:
                    rank_val[want] = vv
                    want = next(it, None)
                cum += f

        def attempt(region) -> bool:
            # guarded distinct collect for one over-cap region:
            # succeeds iff the region's DISTINCT count fits the cap
            # (hot-value regions: huge row count, few values)
            rows = (
                raw.where(region["pred"])
                .groupBy("v")
                .agg(F.count(F.lit(1)).alias("f"))
                .limit(_QUANTILE_COLLECT_CAP + 1)
                .collect()
            )
            if len(rows) > _QUANTILE_COLLECT_CAP:
                return False
            walk(region, [(r.v, r.f) for r in rows])
            return True

        def attempt_many(regions) -> list:
            # fused guarded distinct collect (ONE job for all
            # candidate regions); returns the regions it could NOT
            # resolve. If the fused limit trips, each region is
            # retried alone so a single over-cap-distinct region does
            # not drag its hot-value siblings into refinement.
            pred = regions[0]["pred"]
            for r in regions[1:]:
                pred = pred | r["pred"]
            rid = None
            for k, r in enumerate(regions):
                rid = (F.when(r["pred"], F.lit(k)) if rid is None
                       else rid.when(r["pred"], F.lit(k)))
            bound = len(regions) * _QUANTILE_COLLECT_CAP
            rows = (
                raw.where(pred)
                .groupBy(rid.alias("rid"), "v")
                .agg(F.count(F.lit(1)).alias("f"))
                .limit(bound + 1)
                .collect()
            )
            if len(rows) <= bound:
                vals: dict[int, list] = {k: [] for k in range(len(regions))}
                for r in rows:
                    vals[r.rid].append((r.v, r.f))
                for k, region in enumerate(regions):
                    walk(region, vals[k])
                return []
            return [r for r in regions if not attempt(r)]

        bexpr = F.lit(1) if degenerate else bucket_over(mn, mx)
        cells = (
            raw.groupBy(bexpr.alias("b"))
            .agg(F.count(F.lit(1)).alias("bf"))
            .collect()
        )
        cells = sorted((r.b, r.bf) for r in cells)

        # regions: pred is the exact width_bucket membership chain;
        # offset the region's global rank offset; ranks the needed
        # global ranks inside it
        pending = []
        cum = 0
        it = iter(need)
        want = next(it, None)
        for b, bf in cells:
            inside = []
            while want is not None and cum <= want < cum + bf:
                inside.append(want)
                want = next(it, None)
            if inside:
                pending.append({
                    "pred": bexpr == F.lit(int(b)),
                    "bounds": None if degenerate
                    else sub_bounds(mn, mx, int(b)),
                    "bf": bf,
                    "offset": cum,
                    "ranks": inside,
                })
            cum += bf

        # resolve/refine oversized regions (at most two jobs per
        # level: one fused guarded collect, one fused sub-bucket
        # pass); the loop terminates because each level divides a
        # finite double range by `buckets` until sub_bounds
        # degenerates (-> guarded collect or fallback)
        final_regions = []
        while pending:
            final_regions.extend(
                r for r in pending if r["bf"] <= _QUANTILE_COLLECT_CAP
            )
            over = [r for r in pending if r["bf"] > _QUANTILE_COLLECT_CAP]
            att = [
                r for r in over
                if r["bounds"] is None
                or r["bf"] <= _QUANTILE_ATTEMPT_ROW_CAP
            ]
            att_ids = {id(r) for r in att}
            big = [r for r in over if id(r) not in att_ids]
            for r in (attempt_many(att) if att else []):
                if r["bounds"] is None:
                    return None  # over-cap distincts, unsplittable
                big.append(r)
            if not big:
                break
            pred = big[0]["pred"]
            for r in big[1:]:
                pred = pred | r["pred"]
            rid = None
            sub = None
            subs = [bucket_over(*r["bounds"]) for r in big]
            for k, r in enumerate(big):
                rid = (F.when(r["pred"], F.lit(k)) if rid is None
                       else rid.when(r["pred"], F.lit(k)))
                sub = (F.when(r["pred"], subs[k]) if sub is None
                       else sub.when(r["pred"], subs[k]))
            rows = (
                raw.where(pred)
                .groupBy(rid.alias("rid"), sub.alias("sb"))
                .agg(F.count(F.lit(1)).alias("bf"))
                .collect()
            )
            sub_cells: dict[int, list] = {k: [] for k in range(len(big))}
            for r in rows:
                sub_cells[r.rid].append((r.sb, r.bf))
            for cl in sub_cells.values():
                cl.sort()
            pending = []
            for k, parent in enumerate(big):
                cum = parent["offset"]
                it = iter(parent["ranks"])
                want = next(it, None)
                for sb, bf in sub_cells[k]:
                    inside = []
                    while want is not None and cum <= want < cum + bf:
                        inside.append(want)
                        want = next(it, None)
                    if inside:
                        pending.append({
                            "pred": parent["pred"]
                            & (subs[k] == F.lit(int(sb))),
                            "bounds": sub_bounds(*parent["bounds"], int(sb)),
                            "bf": bf,
                            "offset": cum,
                            "ranks": inside,
                        })
                    cum += bf

        # final job: the needed regions' exact (value, count) rows,
        # aggregated from raw (each region <= CAP rows by construction)
        if final_regions:
            pred = final_regions[0]["pred"]
            for r in final_regions[1:]:
                pred = pred | r["pred"]
            rid = None
            for k, r in enumerate(final_regions):
                rid = (F.when(r["pred"], F.lit(k)) if rid is None
                       else rid.when(r["pred"], F.lit(k)))
            rows = (
                raw.where(pred)
                .groupBy(rid.alias("rid"), "v")
                .agg(F.count(F.lit(1)).alias("f"))
                .collect()
            )
            vals: dict[int, list] = {k: [] for k in range(len(final_regions))}
            for r in rows:
                vals[r.rid].append((r.v, r.f))
            for k, region in enumerate(final_regions):
                walk(region, vals[k])

        qs = []
        for p in probs:
            # Spark Percentile.getPercentile interpolation, identical
            # IEEE double arithmetic driver-side
            pos = (n - 1) * p
            lo, hi = math.floor(pos), math.ceil(pos)
            if lo not in rank_val or hi not in rank_val:
                # cross-job count drift: the bucket summary and the
                # region collects are separate jobs over `df`, so a
                # source whose file set changes between them (e.g.
                # concurrent appends to the scanned path) can leave a
                # needed rank unresolved. Degrade to the windowed
                # fallback instead of a KeyError; callers profiling a
                # moving table get the same racy-but-defined snapshot
                # semantics every multi-job formulation here has.
                return None
            if lo == hi:
                qs.append(float(rank_val[lo]))
            else:
                qs.append(
                    (float(hi) - pos) * float(rank_val[lo])
                    + (pos - float(lo)) * float(rank_val[hi])
                )
        return tuple(qs)

    with ThreadPoolExecutor(max_workers=min(len(live), 8)) as pool:
        results = list(pool.map(one_column, live))
    if any(r is None for r in results):
        return None
    return dict(zip(live, results))


def _exact_quantile_relation_windowed(
    df: DataFrame,
    columns: list[str],
    probs: tuple[float, ...] = _QUANTILE_PROBS,
    buckets: int = _QUANTILE_BUCKETS,
) -> DataFrame | None:
    """The r8 distributed-window formulation of the exact quantile
    relation — kept as the any-size fallback for the pathological case
    the driver-finished path cannot bound (a needed bracketing region
    with non-finite bounds AND more distinct values than the collect
    cap). Output contract identical to _exact_quantile_relation.

    Shape: the melt histogram is range-bucketed; per-bucket totals give
    each bucket's global rank offset via a tiny window; the cumulative
    count inside each bucket is a window partitioned by (column,
    bucket) — parallel across ~1k buckets per column; bracketing rows
    are picked by conditional aggregation and interpolated in-plan.
    Costs two extra melt passes vs the driver-finished path (the
    per-bucket-offset side's pushed filters diverge from the main
    path's, which breaks Exchange reuse)."""
    import math

    if not columns:
        return None
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

    Execution shape by mode:
    - approx (any grouping): one fused sketch aggregation, melted
      in-plan — single scan, mergeable state.
    - exact grouped: fused aggregation incl. per-group Percentile
      (per-group maps are small — grouping is partition-grained by
      contract) + a count_distinct pass joined back.
    - exact ungrouped (r9): assembled DRIVER-side as a local relation
      (_profile_exact_ungrouped_local) from three CONCURRENT legs —
      the wide struct agg (one collected row), exact distinct counts
      (per-column count_distinct jobs, or one fused agg when many
      columns), and the bucketed rank search over raw scans
      (_exact_quantiles_driver). No melt/explode plan, no broadcast
      joins, no materialized value histogram, and no separate
      (count, min, max) pre-job — the collected structs already carry
      those.
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
    want_q = need("p25") or need("p50") or need("p75")
    want_nd = need("n_distinct") or need("unique_ratio")

    if not approx and group_by is None:
        return _profile_exact_ungrouped_local(
            df, columns, dtypes, fset, want_q, want_nd
        )

    structs = [
        column_profile_struct(
            c, dtypes[c], approx, with_quantiles=True, fields=fset,
        )
        for c in columns
    ]

    if not approx:
        # grouped exact percentile is a sort-heavy aggregate whose
        # parallelism is capped by input splits (parquet row groups);
        # when the source is under-split, a cheap narrow-projection
        # shuffle buys full-width parallelism (~35% faster at sf0.1).
        # Approx mode is single-pass mergeable sketches and skips this.
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

    if not want_nd:
        # distinct stats not requested: skip the count_distinct pass and
        # leave the struct's NULL placeholders in place
        order = [group_by] + [f for f, _ in PROFILE_FIELDS]
        return out.select(*order)

    # exact distinct counts (grouped): dedicated scan, melted and
    # joined back. Kept OUT of the main agg to avoid the EXPAND
    # rewrite (docstring above); this agg has only count_distincts so
    # the expand carries no heavy expressions. Round-5 A/B vs a
    # melt-shuffle variant (explode to (column, value) rows,
    # count_distinct per column — no EXPAND but shuffles
    # n_rows x n_cols rows): 3.242s vs 3.299s at sf0.1 x 32 cores, and
    # the melt's distinct is over string casts. The dedicated scan
    # stays.
    keys = [group_by]
    dagg = df.groupBy(*keys).agg(
        *[F.count_distinct(F.col(c)).alias(f"__d_{c}") for c in columns]
    )
    dmelt = dagg.select(
        *keys,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(f"__d_{c}").cast("bigint").alias("__nd"),
                )
                for c in columns
            ])
        ).alias("d"),
    ).select(*keys, "d.column", "d.__nd")
    joined = out.join(F.broadcast(dmelt), on=keys + ["column"], how="left")
    joined = joined.withColumn(
        "n_distinct", F.col("__nd").cast("bigint")
    ).withColumn(
        "unique_ratio",
        F.when(F.col("n_rows") > 0, F.col("n_distinct") / F.col("n_rows")),
    ).drop("__nd")
    order = [group_by] + [f for f, _ in PROFILE_FIELDS]
    return joined.select(*order)


def _profile_exact_ungrouped_local(
    df: DataFrame,
    columns: list[str],
    dtypes: dict,
    fset: set[str] | None,
    want_q: bool,
    want_nd: bool,
) -> DataFrame:
    """Ungrouped exact profile assembled driver-side (r9).

    Three CONCURRENT legs (driver threads — the multi-job pattern used
    throughout plans/pipeline.py), then a LOCAL relation:

    - wide struct agg -> one collected row (counts/moments/min/max);
    - exact distinct counts: a count_distinct scan per column when few
      columns (the per-column jobs overlap each other and both other
      legs; no EXPAND), or ONE fused count_distinct agg when many (the
      r5 A/B-kept expand scan — 22 per-column scans would thrash);
      this leg depends on nothing and nothing depends on it until
      assembly, so it runs entirely under the other legs' wall time
      minus contention;
    - the bucketed rank search of _exact_quantiles_driver (bucket
      summary + bounded final collect from raw scans), which needs
      only (n_nonnull, min, max) from the wide row.

    The result rows are values in PROFILE_FIELDS order — callers'
    selects/rounds apply to literals, and the values are bit-identical
    to the in-plan formulation's (same aggregate expressions, same
    interpolation arithmetic; collect round-trips IEEE doubles
    exactly). n_distinct semantics per column are count_distinct over
    the ORIGINAL column values for every column (the pre-r9 split —
    histogram row count for injective-cast types, count_distinct for
    the rest — computed the same numbers: a cast that is injective
    preserves distinct counts, and groupBy/count_distinct normalize
    NaN and -0.0 identically).

    Replaces the r8 plan: agg -> explode -> broadcast-join(quantile
    relation) -> broadcast-join(distinct melt), whose quantile side
    cost two redundant melt passes (broken ReusedExchange) plus a
    dedicated (count, min, max) job. Measured at sf1.0 (local[32],
    min-of-N): profile_lineitem 5.94s -> see OPTIMIZATION_r09.md.
    """
    from concurrent.futures import ThreadPoolExecutor

    spark = df.sparkSession
    hist_cols = (
        [c for c in columns if _is_numeric(dtypes[c])] if want_q else []
    )
    aug = fset
    if fset is not None and hist_cols:
        # the rank search needs (n_nonnull, min, max); n_nonnull is
        # always computed — make sure min/max are too (they are cheap
        # fused aggregates), and null them back out below if the
        # caller did not ask for them
        aug = fset | {"min_num", "max_num"}
    structs = [
        column_profile_struct(
            c, dtypes[c], approx=False, with_quantiles=False, fields=aug,
        )
        for c in columns
    ]

    cd_cols = list(columns) if want_nd else []
    cd_vals: dict[str, int] = {}

    def _cd_one(c: str) -> int:
        return df.agg(F.count_distinct(F.col(c))).collect()[0][0]

    def _cd_fused() -> dict[str, int]:
        drow = df.agg(
            *[
                F.count_distinct(F.col(c)).alias(f"__d_{i}")
                for i, c in enumerate(cd_cols)
            ]
        ).collect()[0]
        return {c: drow[i] for i, c in enumerate(cd_cols)}

    with ThreadPoolExecutor(max_workers=min(8, max(1, len(cd_cols)))) as pool:
        cd_futs = fused_fut = None
        if cd_cols:
            if len(cd_cols) <= 8:
                cd_futs = {c: pool.submit(_cd_one, c) for c in cd_cols}
            else:
                fused_fut = pool.submit(_cd_fused)
        # the wide agg runs inline on THIS thread — the cd futures
        # above already overlap it from the pool
        wide = df.agg(*structs).collect()[0]
        srows = {c: wide[f"__p_{c}"] for c in columns}

        stats = {
            c: (srows[c]["n_nonnull"], srows[c]["min_num"], srows[c]["max_num"])
            for c in hist_cols
        }
        live = [c for c in hist_cols if stats[c][0] > 0]
        qres = _exact_quantiles_driver(df, live, stats)
        if qres is None:
            # pathological fallback (unsplittable over-cap region): the
            # windowed relation is n_cols rows — collect and merge the
            # same way (its __hnd column is ignored; distincts come
            # from the count_distinct leg)
            rel = _exact_quantile_relation_windowed(df, hist_cols)
            rows = rel.collect() if rel is not None else []
            qres = {
                r["column"]: (r["__hq_0"], r["__hq_1"], r["__hq_2"])
                for r in rows
            }
        if cd_futs is not None:
            cd_vals = {c: f.result() for c, f in cd_futs.items()}
        elif fused_fut is not None:
            cd_vals = fused_fut.result()

    rows_out = []
    for c in columns:
        d = srows[c].asDict()
        if fset is not None:
            for f, _ in PROFILE_FIELDS:
                if f == "column" or f in fset:
                    continue
                if want_q and f in ("p25", "p50", "p75"):
                    continue
                if want_nd and f in ("n_distinct", "unique_ratio"):
                    continue
                d[f] = None
        if want_q and c in qres:
            d["p25"], d["p50"], d["p75"] = qres[c]
        if want_nd:
            nd = cd_vals[c]
            nd = int(nd) if nd is not None else None
            n_rows = d["n_rows"]
            d["n_distinct"] = nd
            d["unique_ratio"] = (
                nd / n_rows if nd is not None and n_rows and n_rows > 0
                else None
            )
        rows_out.append(tuple(d[f] for f, _ in PROFILE_FIELDS))
    ddl = ", ".join(f"{f} {t}" for f, t in PROFILE_FIELDS)
    return spark.createDataFrame(rows_out, ddl)


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
