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
