"""Reference-parity tests (SURVEY.md §5.4).

The reference ships no tests and its goldens can't be re-run (LFS
pointer input), so parity is pinned by re-implementing its formulas in
pandas HERE (from the documented semantics at Profiler.py:203-220,
624-726 — formulas re-derived, no code copied) and asserting our Spark
engine agrees on the FIXTURES.md §2 profiler_parity table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from advanced_data_profile_spark.operators.stats import outlier_pct, profile, table_summary
from advanced_data_profile_spark.operators.topk import categorical_confidence, top_k_values
from advanced_data_profile_spark.operators.typeinfer import infer_types


@pytest.fixture(scope="module")
def parity_pdf():
    rng = np.random.default_rng(42)
    n = 508  # the golden report's row count
    ratio = rng.normal(0, 1, n)
    ratio[::7] = np.round(ratio[::7], 2)  # mixed precision, some >6 decimals
    skewed = np.exp(rng.normal(0, 1, n))
    skewed[5] = 1e5  # planted |z|>3 outlier
    sparse = rng.normal(10, 2, n)
    sparse[rng.random(n) < 0.4] = np.nan
    dates = pd.date_range("2023-01-01", periods=n, freq="D")
    pdf = pd.DataFrame({
        "id_str": [f"row-{i:05d}" for i in range(n)],
        "count_int": rng.integers(0, 1000, n),
        "ratio_float": ratio,
        "int_as_float": rng.integers(0, 50, n).astype(float),
        "event_date": dates.strftime("%Y-%m-%d"),
        "event_ts": dates.strftime("%Y-%m-%d 12:30:%S"),
        "category": rng.choice(["a", "b", "c", "d", "e"], n),
        "sparse_col": sparse,
        "all_null": [None] * n,
        "skewed_num": skewed,
        "pace_like": [f"{rng.integers(4, 8)}:{rng.integers(10, 59):02d}" for _ in range(n)],
    })
    return pdf


@pytest.fixture(scope="module")
def parity_df(spark, parity_pdf):
    return spark.createDataFrame(parity_pdf)


def test_type_inference_matches_reference_semantics(parity_df):
    t = {k: v.logical for k, v in infer_types(parity_df).items()}
    assert t == {
        "id_str": "string",
        "count_int": "integer",
        "ratio_float": "double",       # >6 decimal places
        "int_as_float": "integer",     # all-integral float downcast
        "event_date": "date",
        "event_ts": "timestamp",
        "category": "string",
        "sparse_col": "double",
        "all_null": "empty",
        "skewed_num": "double",
        "pace_like": "timestamp",      # the reference's pace quirk
    }


def test_phase3_per_column_stats(parity_df, parity_pdf):
    rows = {r.column: r for r in profile(parity_df).collect()}
    for col in ("count_int", "ratio_float", "sparse_col", "skewed_num"):
        r, s = rows[col], parity_pdf[col]
        # third_phase: null count, distinct, uniqueness index
        assert r.n_null == int(s.isna().sum())
        assert r.n_distinct == s.nunique()
        assert round(100 * r.unique_ratio, 2) == round(100 * s.nunique() / len(s), 2)
        # fourth_phase describe(): pandas semantics (ddof=1, linear quantiles)
        assert r.mean == pytest.approx(s.mean(), rel=1e-9)
        assert r.stddev == pytest.approx(s.std(ddof=1), rel=1e-9)
        assert r.p25 == pytest.approx(s.quantile(0.25), rel=1e-9)
        assert r.p50 == pytest.approx(s.quantile(0.5), rel=1e-9)
        assert r.p75 == pytest.approx(s.quantile(0.75), rel=1e-9)
        assert r.skewness == pytest.approx(s.skew(), rel=1e-6)
        assert r.kurtosis == pytest.approx(s.kurtosis(), rel=1e-6)


def test_outlier_pct_matches_reference_formula(parity_df, parity_pdf):
    out = {r.column: r.outlier_pct
           for r in outlier_pct(parity_df, ["skewed_num", "count_int"]).collect()}
    for col in ("skewed_num", "count_int"):
        s = parity_pdf[col].dropna()
        z = (s - s.mean()) / s.std(ddof=0)
        expected = round(100 * (abs(z) > 3).sum() / len(s), 4)
        assert out[col] == pytest.approx(expected)
    assert out["skewed_num"] > 0  # the planted outlier is caught


def test_top10_and_confidence(parity_df, parity_pdf):
    top = top_k_values(parity_df, ["category"], k=10).collect()
    vc = parity_pdf["category"].value_counts()
    assert {(r.value, r.cnt) for r in top} == {(k, int(v)) for k, v in vc.items()}
    conf = categorical_confidence(parity_df, ["category"]).collect()[0]
    p = vc / vc.sum()
    entropy = float(-(p * np.log(p)).sum())
    expected = max(0.0, round(100 - entropy * 10, 2))
    assert conf.categorical_confidence == pytest.approx(expected)


def test_first_phase_table_stats(parity_df, parity_pdf):
    r = table_summary(parity_df).collect()[0]
    assert r.n_rows == 508
    assert r.n_cols == 11
    assert r.has_duplicates == bool(parity_pdf.duplicated().any())
    assert r.n_nulls_total == int(parity_pdf.isnull().sum().sum())
