"""Custom join operators Spark lacks natively: as-of join and range
join — expressed as compositions of built-in DataFrame ops (no UDFs),
per the preference order scan > composition > pandas kernel.

As-of join (backward): for each left row, the latest right row with
right.ts <= left.ts within the same key. Implementation is the classic
union-tag-sort-window construction:

    union(left tagged 0, right tagged 1)
      -> window over (key) ordered by (ts, tag DESC)
      -> last_value of right's payload, ignoring nulls
      -> keep left rows

One shuffle on the key — the same cost as a regular co-partitioned
join; no per-key pandas, no cross product. Right rows at the exact
same ts sort BEFORE the left row (tag DESC), so ties resolve to
"right value at ts is visible at ts" (pd.merge_asof default).

Range join: equi-bucket the range dimension so each right interval is
replicated into the buckets it spans and each left point joins only
its bucket — turning an inequality join (cross-product in naive Spark)
into an equi-join + residual filter. Bucket width trades replication
against selectivity; AQE handles residual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """left rows + matched right values as of left.on, per `by` key.

    value_cols: right columns to carry (default: all except on/by).
    direction (pd.merge_asof semantics, verified against it in tests):
    - 'backward': latest right with right.on <= left.on (the default);
    - 'forward':  earliest right with right.on >= left.on — the same
      union-tag-window construction mirrored (order (on ASC, tag ASC),
      frame [current, unbounded following], first_value): right rows at
      the exact same on sort AFTER the left row but inside its frame,
      so exact matches are visible, and cost stays ONE shuffle;
    - 'nearest': closer of the two by |right.on - left.on|, ties to
      backward — composed from both passes over the same union (two
      window specs, still one shuffle: both windows partition by the
      same key, Catalyst plans one Exchange).

    NULL-value contract: each right row rides the window as ONE struct
    (its `on` plus all value cols together), so every carried field
    comes from the same matched row. A matched right row whose value
    column is NULL therefore yields NULL — exactly pd.merge_asof,
    which carries the matched row's NaN — instead of back-filling the
    value from an older right row (the failure mode of per-column
    last/first ignorenulls, where __b_<col> could come from a
    different row than the matched timestamp).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, by)]
    if "__on" in value_cols:
        raise ValueError("value col name '__on' collides with the carry struct")

    # one struct per right row: matched `on` + the value cols from THAT
    # row; left rows carry a NULL struct so ignorenulls skips them
    rv = F.struct(
        F.col(on).alias("__on"), *[F.col(c) for c in value_cols]
    )
    rv_type = right.select(rv.alias("__rv")).schema["__rv"].dataType
    row = F.struct(*[F.col(c) for c in left.columns])
    row_type = left.select(row.alias("__row")).schema["__row"].dataType
    lhs = left.select(
        F.col(by), F.col(on), F.lit(0).alias("__tag"),
        F.lit(None).cast(rv_type).alias("__rv"), row.alias("__row"),
    )
    rhs = right.select(
        F.col(by), F.col(on), F.lit(1).alias("__tag"),
        rv.alias("__rv"), F.lit(None).cast(row_type).alias("__row"),
    )
    unioned = lhs.unionByName(rhs)
    w_back = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__tag").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__tag").asc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    back = F.last("__rv", ignorenulls=True).over(w_back)
    fwd = F.first("__rv", ignorenulls=True).over(w_fwd)

    if direction == "backward":
        filled = unioned.select("__tag", "__row", back.alias("__m"))
    elif direction == "forward":
        filled = unioned.select("__tag", "__row", fwd.alias("__m"))
    else:
        both = unioned.select(
            "__tag", "__row", F.col(on).alias("__pt"),
            back.alias("__b"), fwd.alias("__f"),
        )
        db = F.abs(F.col("__pt") - F.col("__b.__on"))
        df_ = F.abs(F.col("__f.__on") - F.col("__pt"))
        # forward wins only when strictly closer AND present; a missing
        # backward match falls through to forward
        use_fwd = F.col("__f").isNotNull() & (F.col("__b").isNull() | (df_ < db))
        filled = both.select(
            "__tag", "__row",
            F.when(use_fwd, F.col("__f")).otherwise(F.col("__b")).alias("__m"),
        )
    out = filled.where(F.col("__tag") == 0).select(
        *[F.col(f"__row.{c}").alias(c) for c in left.columns],
        *[F.col(f"__m.{c}").alias(c) for c in value_cols],
    )
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    how: str = "inner",
    interval_id_col: str | None = None,
    interval_count_hint: int | None = None,
    broadcast_id_limit: int = 5_000_000,
) -> DataFrame:
    """Join each point row to interval rows with start <= point < end,
    via bucketization: intervals are exploded into the buckets they
    overlap (sequence/explode — bounded by interval_len/bucket_width),
    points map to one bucket, equi-join on bucket, exact filter after.

    how='right'/'full' preserve the INTERVAL side and require
    `interval_id_col` (a UNIQUE, NON-NULL interval key): an unmatched
    interval was replicated into several buckets, and deciding it
    matched nothing needs an identity to aggregate the replicas under —
    an anti-join of intervals against the matched id set, null-extended
    and unioned in. NULL ids are rejected AT RUNTIME (a null key never
    matches in left_anti, so a matched null-id interval would be
    emitted twice — once matched, once null-extended); the check rides
    the anti-join's key expression, costing no extra scan. Duplicate
    ids are the caller's hazard: replicas of distinct intervals sharing
    an id collapse in unmatched detection, silently marking all of them
    matched if any is. Empty/inverted intervals (end <= start) match
    nothing but ARE preserved on the interval side of right/full.

    Cost: the inner bucketized join + one anti-join on the matched-id
    relation. The matched-id set is bounded by the interval count; it
    is broadcast only when `interval_count_hint` (caller's estimate of
    the interval-side row count) is unset or <= broadcast_id_limit —
    with 10^8+ intervals a forced broadcast would fail outright, so a
    large hint falls back to a shuffle anti-join. Never a cross
    product."""
    if how not in (
        "inner", "left", "left_outer", "leftouter",
        "right", "right_outer", "rightouter", "full", "full_outer", "outer",
    ):
        raise ValueError(f"unsupported how={how!r}")
    preserve_intervals = how in (
        "right", "right_outer", "rightouter", "full", "full_outer", "outer",
    )
    if preserve_intervals and interval_id_col is None:
        raise ValueError(
            "how='right'/'full' need interval_id_col: unmatched detection "
            "must aggregate the bucket replicas under a unique interval key"
        )
    p = points.withColumn(
        "__bkt_p", F.floor(F.col(point_col) / bucket_width).cast("long")
    )
    lo_b = F.floor(F.col(start_col) / bucket_width).cast("long")
    hi_b = F.floor((F.col(end_col) - 1e-9) / bucket_width).cast("long")
    # empty/inverted intervals match nothing and would otherwise produce
    # a descending (negative-step) sequence replicating them into wrong
    # buckets; filter them out before the explode
    iv = intervals.where(F.col(end_col) > F.col(start_col)).withColumn(
        "__bkt_i", F.explode(F.sequence(lo_b, F.greatest(lo_b, hi_b)))
    )
    # the range predicate belongs IN the join condition: applying it as
    # a post-join .where() would drop the null-extended rows of outer
    # joins, silently turning how='left' into inner
    cond = (
        (p["__bkt_p"] == iv["__bkt_i"])
        & (p[point_col] >= iv[start_col])
        & (p[point_col] < iv[end_col])
    )
    # no post-join dedupe needed for the matched part: a point lives in
    # exactly one bucket, so it can meet each interval at most once
    # even after replication
    if not preserve_intervals:
        return p.join(iv, cond, how).drop("__bkt_p", "__bkt_i")

    inner_how = "left" if how in ("full", "full_outer", "outer") else "inner"
    matched = p.join(iv, cond, inner_how).drop("__bkt_p", "__bkt_i")
    matched_ids = matched.where(
        F.col(interval_id_col).isNotNull()
    ).select(interval_id_col).distinct()
    if interval_count_hint is None or interval_count_hint <= broadcast_id_limit:
        matched_ids = F.broadcast(matched_ids)
    # the preserved side uses the ORIGINAL intervals (no empty-interval
    # pre-filter, no replication). The anti-join key goes through
    # coalesce(id, raise_error(...)): evaluated for every preserved-side
    # row during the join itself, so any NULL id fails the job instead
    # of silently double-emitting — no extra validation scan
    checked = intervals.withColumn(
        interval_id_col,
        F.coalesce(
            F.col(interval_id_col),
            F.raise_error(
                f"range_join how={how!r}: NULL {interval_id_col!r} on the "
                "interval side — unmatched detection requires unique "
                "non-null interval ids"
            ).cast(dict(intervals.dtypes)[interval_id_col]),
        ),
    )
    unmatched = checked.join(
        matched_ids, interval_id_col, "left_anti"
    ).select(
        *[
            F.lit(None).cast(dict(points.dtypes)[c]).alias(c)
            for c in points.columns
        ],
        *intervals.columns,
    )
    return matched.unionByName(unmatched)
