"""As-of join and range join vs pandas/naive references."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from advanced_data_profile_spark.operators.joins import asof_join, range_join


@pytest.fixture(scope="module")
def trades_quotes(spark):
    rng = np.random.default_rng(0)
    n_t, n_q = 400, 300
    trades = pd.DataFrame({
        "sym": rng.choice(["A", "B", "C"], n_t),
        "ts": np.sort(rng.integers(0, 10_000, n_t)).astype("int64"),
        "qty": rng.integers(1, 100, n_t).astype("int64"),
    })
    quotes = pd.DataFrame({
        "sym": rng.choice(["A", "B", "C"], n_q),
        "ts": np.sort(rng.integers(0, 10_000, n_q)).astype("int64"),
        "px": np.round(rng.uniform(10, 20, n_q), 2),
    })
    # merge_asof requires global sort by key column
    return trades, quotes


def test_asof_join_matches_pandas(spark, trades_quotes):
    trades, quotes = trades_quotes
    got = asof_join(
        spark.createDataFrame(trades),
        spark.createDataFrame(quotes),
        on="ts", by="sym",
    ).toPandas().sort_values(["sym", "ts", "qty"]).reset_index(drop=True)
    want = pd.merge_asof(
        trades.sort_values("ts"), quotes.sort_values("ts"),
        on="ts", by="sym", direction="backward",
    ).sort_values(["sym", "ts", "qty"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["sym", "ts", "qty", "px"]], want[["sym", "ts", "qty", "px"]],
        check_dtype=False,
    )


def test_asof_join_no_prior_quote_is_null(spark):
    trades = pd.DataFrame({"sym": ["A"], "ts": [5], "qty": [1]})
    quotes = pd.DataFrame({"sym": ["A"], "ts": [10], "px": [9.9]})
    out = asof_join(
        spark.createDataFrame(trades), spark.createDataFrame(quotes),
        on="ts", by="sym",
    ).collect()
    assert out[0].px is None


def test_asof_join_tie_takes_same_ts(spark):
    trades = pd.DataFrame({"sym": ["A"], "ts": [10], "qty": [1]})
    quotes = pd.DataFrame({"sym": ["A", "A"], "ts": [10, 3], "px": [1.5, 9.9]})
    out = asof_join(
        spark.createDataFrame(trades), spark.createDataFrame(quotes),
        on="ts", by="sym",
    ).collect()
    assert out[0].px == 1.5  # quote AT ts is visible (merge_asof default)


def test_range_join_matches_naive(spark):
    rng = np.random.default_rng(1)
    pts = pd.DataFrame({"pid": range(200), "x": rng.uniform(0, 100, 200)})
    starts = rng.uniform(0, 95, 40)
    ivs = pd.DataFrame({
        "iid": range(40), "lo": starts, "hi": starts + rng.uniform(1, 10, 40),
    })
    got = range_join(
        spark.createDataFrame(pts), spark.createDataFrame(ivs),
        "x", "lo", "hi", bucket_width=5.0,
    ).select("pid", "iid").collect()
    got_set = {(r.pid, r.iid) for r in got}
    want = {
        (p.pid, i.iid)
        for _, p in pts.iterrows() for _, i in ivs.iterrows()
        if i.lo <= p.x < i.hi
    }
    assert got_set == want


def test_range_join_left_keeps_unmatched_points(spark):
    # how='left' must keep points outside every interval (the range
    # predicate lives in the join condition, not a post-join filter)
    pts = pd.DataFrame({"pid": [1, 2, 3], "x": [5.0, 500.0, 45.0]})
    ivs = pd.DataFrame({"iid": [7], "lo": [0.0], "hi": [50.0]})
    out = range_join(
        spark.createDataFrame(pts), spark.createDataFrame(ivs),
        "x", "lo", "hi", bucket_width=10.0, how="left",
    ).select("pid", "iid").collect()
    got = sorted((r.pid, r.iid) for r in out)
    assert got == [(1, 7), (2, None), (3, 7)]


def test_range_join_ignores_inverted_intervals(spark):
    pts = pd.DataFrame({"pid": [1], "x": [5.0]})
    ivs = pd.DataFrame({"iid": [1, 2], "lo": [10.0, 0.0], "hi": [0.0, 10.0]})
    out = range_join(
        spark.createDataFrame(pts), spark.createDataFrame(ivs),
        "x", "lo", "hi", bucket_width=2.0,
    ).select("pid", "iid").collect()
    assert [(r.pid, r.iid) for r in out] == [(1, 2)]


def test_range_join_no_duplicate_pairs(spark):
    # an interval spanning many buckets must still match each point once
    pts = pd.DataFrame({"pid": [1, 2], "x": [5.0, 45.0]})
    ivs = pd.DataFrame({"iid": [7], "lo": [0.0], "hi": [50.0]})
    out = range_join(
        spark.createDataFrame(pts), spark.createDataFrame(ivs),
        "x", "lo", "hi", bucket_width=2.0,
    ).select("pid", "iid").collect()
    assert sorted((r.pid, r.iid) for r in out) == [(1, 7), (2, 7)]


def test_asof_forward_and_nearest_match_pandas(spark):
    """All three directions verified against pandas.merge_asof itself
    on randomized keyed series (incl. exact-timestamp ties)."""
    import numpy as np
    import pandas as pd

    from advanced_data_profile_spark.operators.joins import asof_join

    rng = np.random.default_rng(31)
    lpd = pd.DataFrame({
        "k": rng.integers(0, 3, 120),
        "t": rng.integers(0, 200, 120).astype("int64"),
        "lv": np.arange(120),
    }).sort_values("t").reset_index(drop=True)
    rpd = pd.DataFrame({
        "k": rng.integers(0, 3, 80),
        "t": rng.integers(0, 200, 80).astype("int64"),
        "rv": np.arange(80) * 10,
    }).sort_values("t").reset_index(drop=True)
    # exact ties: copy a few left timestamps into the right side
    rpd.loc[:5, "t"] = lpd.loc[:5, "t"].values
    rpd = rpd.sort_values("t").reset_index(drop=True)

    ldf = spark.createDataFrame(lpd)
    rdf = spark.createDataFrame(rpd)
    for direction in ("backward", "forward", "nearest"):
        want = pd.merge_asof(
            lpd, rpd, on="t", by="k", direction=direction
        ).sort_values(["k", "t", "lv"]).reset_index(drop=True)
        got = (
            asof_join(ldf, rdf, on="t", by="k", direction=direction)
            .toPandas().sort_values(["k", "t", "lv"]).reset_index(drop=True)
        )
        pd.testing.assert_series_equal(
            got["rv"].astype("float64"), want["rv"].astype("float64"),
            check_names=False, obj=direction,
        )


def test_asof_one_shuffle_all_directions(spark):
    import pandas as pd

    from advanced_data_profile_spark.operators.joins import asof_join

    ldf = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [5], "lv": [0]}))
    rdf = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [4], "rv": [1]}))
    for direction in ("backward", "forward", "nearest"):
        plan = (
            asof_join(ldf, rdf, on="t", by="k", direction=direction)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange") <= 2, direction  # union sides only
        assert "Join" not in plan, direction


def test_range_join_right_and_full_outer(spark):
    """right/full preserve the interval side (incl. empty intervals and
    intervals no point hits), verified against a naive cross-join
    reference; the guard demands interval_id_col."""
    import pandas as pd
    import pytest

    from advanced_data_profile_spark.operators.joins import range_join

    pts = spark.createDataFrame(
        pd.DataFrame({"x": [1.0, 5.0, 12.0, 40.0], "pid": [1, 2, 3, 4]})
    )
    ivs = spark.createDataFrame(pd.DataFrame({
        "iid": [10, 11, 12, 13],
        "lo": [0.0, 4.0, 20.0, 7.0],
        "hi": [2.0, 6.0, 25.0, 7.0],   # 13 is empty (hi == lo)
    }))
    ref = (
        pts.crossJoin(ivs)
        .where((F.col("x") >= F.col("lo")) & (F.col("x") < F.col("hi")))
    )
    matched_pairs = {(r.pid, r.iid) for r in ref.collect()}

    right = range_join(pts, ivs, "x", "lo", "hi", 3.0, how="right",
                       interval_id_col="iid").collect()
    assert {(r.pid, r.iid) for r in right if r.pid is not None} == matched_pairs
    # every interval appears; unmatched ones (12: no point in [20,25);
    # 13: empty) exactly once, null-extended
    unmatched = sorted(r.iid for r in right if r.pid is None)
    assert unmatched == [12, 13]

    full = range_join(pts, ivs, "x", "lo", "hi", 3.0, how="full",
                      interval_id_col="iid").collect()
    assert {(r.pid, r.iid) for r in full if r.pid and r.iid} == matched_pairs
    assert sorted(r.iid for r in full if r.pid is None) == [12, 13]
    # points 12.0 and 40.0 hit nothing -> preserved with null interval
    assert sorted(r.pid for r in full if r.iid is None) == [3, 4]

    with pytest.raises(ValueError, match="interval_id_col"):
        range_join(pts, ivs, "x", "lo", "hi", 3.0, how="right")


def test_asof_null_right_values_carry_matched_row(spark):
    """A matched right row whose value col is NULL must yield NULL
    (pd.merge_asof carries the matched row's NaN), NOT a value
    back-filled from an older/newer right row — the struct-carry
    contract, all three directions."""
    lpd = pd.DataFrame({"k": ["A"] * 3, "t": [5, 10, 15], "lv": [1, 2, 3]})
    # right: t=4 has px=7.0, t=9 has px=NULL, t=14 has px=NULL, t=20 px=9.0
    rpd = pd.DataFrame({
        "k": ["A"] * 4,
        "t": [4, 9, 14, 20],
        "px": [7.0, np.nan, np.nan, 9.0],
    })
    ldf, rdf = spark.createDataFrame(lpd), spark.createDataFrame(rpd)
    for direction in ("backward", "forward", "nearest"):
        want = pd.merge_asof(
            lpd, rpd, on="t", by="k", direction=direction
        ).sort_values("t").reset_index(drop=True)
        got = (
            asof_join(ldf, rdf, on="t", by="k", direction=direction)
            .toPandas().sort_values("t").reset_index(drop=True)
        )
        pd.testing.assert_series_equal(
            got["px"].astype("float64"), want["px"].astype("float64"),
            check_names=False, obj=direction,
        )


def test_range_join_outer_null_interval_id_raises(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    pts = spark.createDataFrame(pd.DataFrame({"x": [1.0], "pid": [1]}))
    ivs = spark.createDataFrame(
        pd.DataFrame({"iid": [10.0, None], "lo": [0.0, 4.0], "hi": [2.0, 6.0]})
    )
    out = range_join(pts, ivs, "x", "lo", "hi", 3.0, how="right",
                     interval_id_col="iid")
    with pytest.raises(SparkRuntimeException, match="non-null interval ids"):
        out.collect()


def test_range_join_outer_broadcast_guard(spark):
    """interval_count_hint above the broadcast limit must switch the
    matched-id anti-join off the forced broadcast (shuffle anti-join
    instead) with identical results."""
    pts = spark.createDataFrame(
        pd.DataFrame({"x": [1.0, 5.0, 12.0], "pid": [1, 2, 3]})
    )
    ivs = spark.createDataFrame(pd.DataFrame({
        "iid": [10, 11, 12], "lo": [0.0, 4.0, 20.0], "hi": [2.0, 6.0, 25.0],
    }))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hinted = range_join(pts, ivs, "x", "lo", "hi", 3.0, how="right",
                            interval_id_col="iid")
        guarded = range_join(pts, ivs, "x", "lo", "hi", 3.0, how="right",
                             interval_id_col="iid", interval_count_hint=10**9)
        def anti_is_broadcast(df):
            plan = df._jdf.queryExecution().executedPlan().toString()
            return any(
                "Broadcast" in ln for ln in plan.splitlines() if "LeftAnti" in ln
            )
        assert anti_is_broadcast(hinted)
        assert not anti_is_broadcast(guarded)
        assert (
            {(r.pid, r.iid) for r in hinted.collect()}
            == {(r.pid, r.iid) for r in guarded.collect()}
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
