"""Wide-agg profiler vs independently computed (pandas/duckdb) values.

pandas-parity cases pin the ddof adjustments (SURVEY.md A11-A13):
reference uses pandas describe()/skew()/kurtosis() semantics.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from advanced_data_profile_spark.operators.stats import outlier_pct, profile, table_summary


@pytest.fixture(scope="module")
def li_profile(lineitem):
    rows = profile(lineitem).collect()
    return {r.column: r for r in rows}


def test_counts_and_nulls(lineitem, li_profile):
    pdf = lineitem.toPandas()
    for col in ("l_orderkey", "l_extendedprice", "l_returnflag"):
        r = li_profile[col]
        assert r.n_rows == len(pdf)
        assert r.n_null == int(pdf[col].isna().sum())
        assert r.n_distinct == pdf[col].nunique()


def test_moments_pandas_parity(lineitem, li_profile):
    pdf = lineitem.toPandas()
    for col in ("l_extendedprice", "l_quantity", "l_discount"):
        r = li_profile[col]
        s = pdf[col]
        assert r.mean == pytest.approx(s.mean(), rel=1e-9)
        assert r.stddev == pytest.approx(s.std(ddof=1), rel=1e-9)
        assert r.stddev_pop == pytest.approx(s.std(ddof=0), rel=1e-9)
        assert r.skewness == pytest.approx(s.skew(), rel=1e-6)
        assert r.kurtosis == pytest.approx(s.kurtosis(), rel=1e-6)
        assert r.min_num == s.min()
        assert r.max_num == s.max()


def test_exact_percentiles_linear_interpolation(lineitem, li_profile):
    pdf = lineitem.toPandas()
    s = pdf["l_extendedprice"]
    r = li_profile["l_extendedprice"]
    assert r.p25 == pytest.approx(s.quantile(0.25), rel=1e-12)
    assert r.p50 == pytest.approx(s.quantile(0.50), rel=1e-12)
    assert r.p75 == pytest.approx(s.quantile(0.75), rel=1e-12)


def test_string_column_profile(li_profile):
    r = li_profile["l_returnflag"]
    assert r.mean is None and r.p50 is None
    assert r.min_str == "A" and r.max_str == "R"
    assert r.max_length == 1
    assert r.has_non_ascii is False


def test_max_decimals(li_profile):
    assert li_profile["l_discount"].max_decimals == 2
    assert li_profile["l_orderkey"].max_decimals == 0


def test_profile_grouped(spark):
    pdf = pd.DataFrame({
        "g": ["a"] * 4 + ["b"] * 4,
        "x": [1.0, 2.0, None, 4.0, 10.0, 20.0, 30.0, 40.0],
    })
    out = profile(spark.createDataFrame(pdf), group_by="g").collect()
    by = {(r.g, r.column): r for r in out}
    assert by[("a", "x")].n_null == 1
    assert by[("a", "x")].mean == pytest.approx(7.0 / 3)
    assert by[("b", "x")].mean == pytest.approx(25.0)
    assert by[("b", "x")].null_ratio == 0.0


def test_outlier_pct_zscore(spark):
    # 99 values at 0, one at 100 -> z of the spike >> 3
    vals = [0.0] * 99 + [100.0]
    df = spark.createDataFrame(pd.DataFrame({"x": vals}))
    r = outlier_pct(df, ["x"]).collect()[0]
    assert r.outlier_pct == pytest.approx(1.0)  # 1 of 100 rows


def test_outlier_pct_none(lineitem):
    # uniform-ish TPC-H columns have no |z|>3 points
    rows = outlier_pct(lineitem, ["l_quantity"]).collect()
    assert rows[0].outlier_pct == 0.0


def test_table_summary(spark, lineitem):
    r = table_summary(lineitem).collect()[0]
    assert r.n_rows == lineitem.count()
    assert r.n_cols == len(lineitem.columns)
    assert r.n_nulls_total == 0
    dup = spark.createDataFrame(pd.DataFrame({"a": [1, 1, 2], "b": ["x", "x", "y"]}))
    assert table_summary(dup).collect()[0].has_duplicates is True


def test_approx_mode_close(lineitem):
    rows = profile(lineitem, columns=["l_extendedprice"], approx=True).collect()
    r = rows[0]
    exact = profile(lineitem, columns=["l_extendedprice"]).collect()[0]
    assert r.n_distinct == pytest.approx(exact.n_distinct, rel=0.05)
    assert r.p50 == pytest.approx(exact.p50, rel=0.01)


def test_empty_column(spark):
    df = spark.createDataFrame(pd.DataFrame({"x": [None, None, None]}), "x double")
    r = profile(df).collect()[0]
    assert r.n_nonnull == 0 and r.null_ratio == 1.0
    assert r.mean is None


def test_profile_survives_nan_and_inf(spark):
    """Real corpora carry NaN/Inf doubles: the KLL quantile path must
    not throw, and quantiles stay on the finite values (Spark's KLL
    aggregate skips NaN; Inf is an ordinary orderable value)."""
    df = spark.sql(
        "SELECT x FROM VALUES (1.0D),(double('NaN')),(2.0D),"
        "(double('Infinity')),(3.0D),(CAST(NULL AS DOUBLE)) AS t(x)"
    )
    r = profile(df, approx=True).collect()[0]
    assert r.n_nonnull == 5 and r.n_null == 1
    assert (r.p25, r.p50, r.p75) == (1.0, 2.0, 3.0)
    # exact mode must also not throw (NaN sorts beyond Inf)
    profile(df, approx=False).collect()


def test_skew_kurt_small_n_guards(spark):
    df = spark.createDataFrame(pd.DataFrame({"x": [1.0, 2.0]}))
    r = profile(df).collect()[0]
    assert r.skewness is None and r.kurtosis is None  # pandas returns NaN too


def test_estimated_size_bytes(lineitem):
    from advanced_data_profile_spark.operators.stats import estimated_size_bytes

    size = estimated_size_bytes(lineitem)
    assert size > 100_000  # 6k rows x 11 cols is at least ~100KB


def test_exact_quantiles_hot_value_and_refinement_paths(spark, monkeypatch):
    """Exercise the r9 raw-scan rank search's guard paths, which real
    data sizes never hit at the production CAP (1<<17 rows): shrink
    the caps so (a) a hot value concentrates more ROWS than the
    collect cap in its bucket (resolved by the fused guarded distinct
    collect, NOT by refinement), (b) a dense many-distinct bucket
    exceeds the cap AND the attempt row bound (resolved by sub-bucket
    refinement), and assert the quantiles still match F.percentile's
    in-plan exact interpolation bit-for-bit."""
    import pyspark.sql.functions as F

    from advanced_data_profile_spark.operators import stats as S

    monkeypatch.setattr(S, "_QUANTILE_COLLECT_CAP", 50)
    monkeypatch.setattr(S, "_QUANTILE_ATTEMPT_ROW_CAP", 400)

    # hot: one value repeated 3000x (>> both caps) + a spread tail;
    # dense: 5000 distinct values packed into a narrow range so its
    # buckets hold > 50 distincts and > 400 rows at the shrunken caps
    hot = spark.range(0, 3000).select(F.lit(7.5).alias("hot")).unionAll(
        spark.range(0, 1000).select((F.col("id") * 0.01).alias("hot"))
    )
    dense = spark.range(0, 5000).select(
        (F.col("id") * 1e-7 + 3.0).alias("dense")
    )
    for name, df in (("hot", hot), ("dense", dense)):
        got = {
            r.column: r
            for r in S.profile(
                df, fields=["n_rows", "n_nonnull", "p25", "p50", "p75"]
            ).collect()
        }[name]
        exact = df.agg(
            F.percentile(
                F.col(name).cast("double"),
                F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)),
            )
        ).collect()[0][0]
        assert (got.p25, got.p50, got.p75) == tuple(exact), name
