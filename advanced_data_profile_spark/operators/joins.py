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
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, by)]

    # right's own `on` rides along as a hidden value column: 'nearest'
    # needs the matched timestamps to compare distances
    carry = list(value_cols) + ([on] if direction == "nearest" else [])
    lhs = left.select(
        F.col(by), F.col(on), F.lit(0).alias("__tag"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in carry],
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
    )
    rhs = right.select(
        F.col(by), F.col(on), F.lit(1).alias("__tag"),
        *[F.col(c).alias(f"__r_{c}") for c in carry],
        F.lit(None).cast(lhs.schema["__row"].dataType).alias("__row"),
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

    def _pick(c: str, which: str):
        if which == "backward":
            return F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w_back)
        return F.first(F.col(f"__r_{c}"), ignorenulls=True).over(w_fwd)

    if direction in ("backward", "forward"):
        filled = unioned.select(
            "__tag", "__row",
            *[_pick(c, direction).alias(f"__r_{c}") for c in value_cols],
        )
    else:
        both = unioned.select(
            "__tag", "__row", F.col(on).alias("__on"),
            *[_pick(c, "backward").alias(f"__b_{c}") for c in carry],
            *[_pick(c, "forward").alias(f"__f_{c}") for c in carry],
        )
        db = F.abs(F.col("__on") - F.col(f"__b_{on}"))
        df_ = F.abs(F.col(f"__f_{on}") - F.col("__on"))
        # forward wins only when strictly closer AND present; a missing
        # backward match falls through to forward via coalesce order
        use_fwd = F.col(f"__f_{on}").isNotNull() & (
            F.col(f"__b_{on}").isNull() | (df_ < db)
        )
        filled = both.select(
            "__tag", "__row",
            *[
                F.when(use_fwd, F.col(f"__f_{c}"))
                .otherwise(F.col(f"__b_{c}"))
                .alias(f"__r_{c}")
                for c in value_cols
            ],
        )
    out = filled.where(F.col("__tag") == 0).select(
        *[F.col(f"__row.{c}").alias(c) for c in left.columns],
        *[F.col(f"__r_{c}").alias(c) for c in value_cols],
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
) -> DataFrame:
    """Join each point row to interval rows with start <= point < end,
    via bucketization: intervals are exploded into the buckets they
    overlap (sequence/explode — bounded by interval_len/bucket_width),
    points map to one bucket, equi-join on bucket, exact filter after.

    how='right'/'full' preserve the INTERVAL side and require
    `interval_id_col` (a unique interval key): an unmatched interval
    was replicated into several buckets, and deciding it matched
    nothing needs an identity to aggregate the replicas under — an
    anti-join of intervals against the matched id set, null-extended
    and unioned in. Empty/inverted intervals (end <= start) match
    nothing but ARE preserved on the interval side of right/full.
    Cost: the inner bucketized join + one broadcast-sized anti-join on
    the matched-id relation; never a cross product."""
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
    # matched-id relation is bounded by the interval count — broadcast
    # anti-join; the preserved side uses the ORIGINAL intervals (no
    # empty-interval pre-filter, no replication)
    unmatched = intervals.join(
        F.broadcast(matched_ids), interval_id_col, "left_anti"
    ).select(
        *[
            F.lit(None).cast(dict(points.dtypes)[c]).alias(c)
            for c in points.columns
        ],
        *intervals.columns,
    )
    return matched.unionByName(unmatched)
