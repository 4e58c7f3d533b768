from __future__ import annotations

import math

import pandas as pd
import pytest

from advanced_data_profile_spark.operators.topk import (
    categorical_confidence,
    entropy,
    top_k_values,
)


def test_topk_counts_and_tiebreak(spark):
    pdf = pd.DataFrame({"c": ["b"] * 3 + ["a"] * 3 + ["z"] * 5 + ["q"]})
    out = top_k_values(spark.createDataFrame(pdf), ["c"], k=3).collect()
    assert [(r.value, r.cnt) for r in sorted(out, key=lambda r: r.rank)] == [
        ("z", 5), ("a", 3), ("b", 3)  # tie a/b broken by value asc
    ]


def test_topk_drops_nulls(spark):
    pdf = pd.DataFrame({"c": ["x", None, "x", None, "y"]})
    out = top_k_values(spark.createDataFrame(pdf), ["c"], k=10).collect()
    assert {(r.value, r.cnt) for r in out} == {("x", 2), ("y", 1)}


def test_entropy_matches_scipy_formula(spark):
    # counts 2,3,5 over 10 values; scipy.stats.entropy(p) with natural log
    pdf = pd.DataFrame({"c": ["a"] * 2 + ["b"] * 3 + ["c"] * 5})
    out = entropy(spark.createDataFrame(pdf), ["c"]).collect()[0]
    p = [0.2, 0.3, 0.5]
    expected = -sum(x * math.log(x) for x in p)
    assert out.entropy == pytest.approx(expected, rel=1e-12)


def test_categorical_confidence_reference_semantics(spark):
    # low-cardinality column -> confidence = 100 - entropy*10
    pdf = pd.DataFrame({"c": (["a"] * 50 + ["b"] * 50) * 10})
    r = categorical_confidence(spark.createDataFrame(pdf), ["c"]).collect()[0]
    expected = round(100 - (-(0.5 * math.log(0.5)) * 2) * 10, 2)
    assert r.categorical_confidence == pytest.approx(expected)
    # high uniqueness ratio -> 0 (Profiler.py:268-282 unique_ratio >= 0.1)
    pdf2 = pd.DataFrame({"c": [str(i) for i in range(100)]})
    r2 = categorical_confidence(spark.createDataFrame(pdf2), ["c"]).collect()[0]
    assert r2.categorical_confidence == 0.0
    # single value -> 0
    pdf3 = pd.DataFrame({"c": ["only"] * 100})
    r3 = categorical_confidence(spark.createDataFrame(pdf3), ["c"]).collect()[0]
    assert r3.categorical_confidence == 0.0


def test_multi_column_one_pipeline(lineitem):
    out = top_k_values(lineitem, ["l_returnflag", "l_linestatus"], k=5)
    rows = out.collect()
    cols = {r.column for r in rows}
    assert cols == {"l_returnflag", "l_linestatus"}
    flags = {r.value for r in rows if r.column == "l_returnflag"}
    assert flags == {"A", "N", "R"}
