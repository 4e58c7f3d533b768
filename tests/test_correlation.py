from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from advanced_data_profile_spark.operators.correlation import (
    correlation_matrix,
    embedding_correlation,
    pca_feature_importance,
)


def test_correlation_matrix_exact(spark):
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, 500)
    pdf = pd.DataFrame({"a": x, "b": 2 * x + rng.normal(0, 0.1, 500), "c": rng.normal(0, 1, 500)})
    out = {(r.col_a, r.col_b): r.corr
           for r in correlation_matrix(spark.createDataFrame(pdf), ["a", "b", "c"]).collect()}
    assert out[("a", "b")] == pytest.approx(pdf["a"].corr(pdf["b"]), abs=1e-6)
    assert out[("a", "c")] == pytest.approx(pdf["a"].corr(pdf["c"]), abs=1e-6)
    assert len(out) == 3


def test_pca_importance(spark):
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, 400)
    pdf = pd.DataFrame({
        "big": 10 * x, "alsobig": 10 * x + rng.normal(0, 0.01, 400),
        "noise": rng.normal(0, 1, 400),
    })
    out = pca_feature_importance(spark.createDataFrame(pdf), ["big", "alsobig", "noise"], k=2)
    rows = out.collect()
    assert len(rows) == 3
    assert rows[0].importance >= rows[-1].importance  # sorted desc
    assert all(r.importance >= 0 for r in rows)


def test_embedding_correlation(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = embedding_correlation(emb, "embedding", 4).collect()
    assert len(out) == 6
    assert all(-1.0 <= r.corr <= 1.0 for r in out)


def test_pca_from_scratch_matches_ml(spark):
    """The one-scan moment-algebra + numpy-eigh path must reproduce the
    pyspark.ml Imputer→StandardScaler→PCA recipe (the reference's,
    Profiler.py:1033-1065) — including with NULLs to exercise the
    null-aware cross-moment terms."""
    from advanced_data_profile_spark.operators.correlation import (
        pca_feature_importance_ml,
    )

    rng = np.random.default_rng(5)
    x = rng.normal(0, 1, 300)
    pdf = pd.DataFrame({
        "a": 3 * x + rng.normal(0, 0.5, 300),
        "b": -2 * x + rng.normal(0, 0.8, 300),
        "c": rng.normal(5, 2, 300),
        "d": x ** 2 + rng.normal(0, 0.3, 300),
    })
    # plant NULLs in two columns (different rows)
    pdf.loc[::7, "a"] = np.nan
    pdf.loc[3::11, "c"] = np.nan
    df = spark.createDataFrame(pdf)
    cols = ["a", "b", "c", "d"]
    scratch = {r.feature: r.importance
               for r in pca_feature_importance(df, cols, k=4).collect()}
    ml = {r.feature: r.importance
          for r in pca_feature_importance_ml(df, cols, k=4).collect()}
    assert scratch == ml  # identical after the reference's 2dp rounding


def test_imputed_standardized_cov_vs_numpy(spark):
    """The single-agg covariance equals numpy's impute-then-cov on the
    materialized data, to float precision."""
    from advanced_data_profile_spark.operators.correlation import (
        imputed_standardized_cov,
    )

    rng = np.random.default_rng(9)
    pdf = pd.DataFrame({
        "a": rng.normal(0, 1, 200),
        "b": rng.normal(10, 3, 200),
        "c": rng.normal(-5, 0.5, 200),
    })
    pdf.loc[::5, "b"] = np.nan
    pdf.loc[2::9, "c"] = np.nan
    C = imputed_standardized_cov(spark.createDataFrame(pdf), ["a", "b", "c"])
    X = pdf.to_numpy(dtype=float)
    for j in range(X.shape[1]):
        col = X[:, j]
        col[np.isnan(col)] = np.nanmean(col)
    Z = (X - X.mean(axis=0)) / X.std(axis=0, ddof=1)
    want = (Z.T @ Z) / (len(X) - 1)
    assert np.allclose(C, want, atol=1e-10)


def test_pca_constant_column_sklearn_clamp(spark):
    """A zero-variance column gets scale 1 (sklearn StandardScaler's
    _handle_zeros_in_scale) instead of NaN-poisoning the covariance —
    real tables carry constant columns and the reference recipe
    (SimpleImputer→StandardScaler→PCA) survives them."""
    from advanced_data_profile_spark.operators.correlation import (
        imputed_standardized_cov,
        pca_feature_importance,
    )

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({
        "a": rng.normal(0, 1, 100),
        "k": np.full(100, 3.5),          # constant
        "b": rng.normal(2, 2, 100),
    })
    pdf.loc[::6, "a"] = np.nan
    df = spark.createDataFrame(pdf)
    C = imputed_standardized_cov(df, ["a", "k", "b"])
    assert np.isfinite(C).all()
    # z-scores of a constant column are exactly 0 ⇒ zero row/col
    assert C[1, 0] == C[1, 1] == C[1, 2] == 0.0
    # the numpy mirror of the same clamp agrees
    X = pdf.to_numpy(dtype=float)
    for j in range(X.shape[1]):
        col = X[:, j]
        col[np.isnan(col)] = np.nanmean(col)
    scale = X.std(axis=0, ddof=1)
    scale[scale == 0.0] = 1.0
    Z = (X - X.mean(axis=0)) / scale
    want = (Z.T @ Z) / (len(X) - 1)
    assert np.allclose(C, want, atol=1e-10)
    # and the end-to-end importance is finite for every feature
    imp = {r.feature: r.importance
           for r in pca_feature_importance(df, ["a", "k", "b"], k=3).collect()}
    assert all(np.isfinite(v) for v in imp.values())


def test_pca_all_null_column_raises(spark):
    from advanced_data_profile_spark.operators.correlation import (
        imputed_standardized_cov,
    )

    pdf = pd.DataFrame({
        "a": [1.0, 2.0, 3.0],
        "dead": [np.nan, np.nan, np.nan],
    })
    with pytest.raises(ValueError, match="entirely NULL.*dead"):
        imputed_standardized_cov(spark.createDataFrame(pdf), ["a", "dead"])
