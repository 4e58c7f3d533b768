"""Correlation matrix + PCA feature importance (SURVEY.md A22/A23;
reference Profiler.py:1019-1068).

Correlation: all n*(n-1)/2 pairwise Pearson coefficients in ONE wide
aggregation (fine for the tens-of-columns regime of a profiler; the
reference's pandas .corr() is the same algorithm single-node).

PCA: from scratch — ONE wide Spark aggregation reduces the data to the
mean-imputed standardized covariance matrix (null-aware moment algebra,
no second imputing pass), then numpy eigh on the tiny (p × p) matrix
driver-side; feature importance = sum of |loadings| per feature across
the top-k components, rounded 2 dp, sorted desc — the reference's exact
recipe (Profiler.py:1033-1065). A pyspark.ml mirror
(pca_feature_importance_ml) stays as the cross-check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def correlation_matrix(df: DataFrame, columns: list[str]) -> DataFrame:
    """(col_a, col_b, corr) for every unordered pair, one agg pass."""
    pairs = [(a, b) for i, a in enumerate(columns) for b in columns[i + 1:]]
    exprs = [
        F.round(F.corr(a, b), 6).alias(f"__c_{i}") for i, (a, b) in enumerate(pairs)
    ]
    agg = df.agg(*exprs)
    melted = agg.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.col(f"__c_{i}").alias("corr"),
                )
                for i, (a, b) in enumerate(pairs)
            ])
        ).alias("s")
    )
    return melted.select("s.col_a", "s.col_b", "s.corr")


def imputed_standardized_cov(
    df: DataFrame, columns: list[str]
) -> "np.ndarray":
    """The covariance matrix of mean-imputed, standardized columns (=
    the matrix the reference's SimpleImputer→StandardScaler→PCA recipe
    eigendecomposes, Profiler.py:1033-1055), reduced in ONE wide Spark
    aggregation via null-aware moment algebra:

      Σ x̂i x̂j = Σ_{both} xi xj + mj Σ_{i only} xi + mi Σ_{j only} xj
                 + |neither| · mi mj            (x̂ = mean-imputed column)

    so nulls never need a second imputing scan — the fan-out is
    O(cols²) aggregate expressions over a single pass, never O(rows)
    driver-side. Mean imputation preserves the column mean, hence
    cov(ẑi, ẑj) = (Σ x̂i x̂j − n mi mj) / ((n−1) σi σj)."""
    import numpy as np

    p = len(columns)
    cols = [F.col(c).cast("double") for c in columns]
    exprs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        exprs.append(F.count(c).alias(f"__cnt_{i}"))
        exprs.append(F.sum(c).alias(f"__s_{i}"))
        exprs.append(F.sum(c * c).alias(f"__ss_{i}"))
    for i in range(p):
        for j in range(i + 1, p):
            a, b = cols[i], cols[j]
            exprs.append(F.sum(a * b).alias(f"__sb_{i}_{j}"))
            exprs.append(F.sum(F.when(b.isNull(), a)).alias(f"__sa_{i}_{j}"))
            exprs.append(F.sum(F.when(a.isNull(), b)).alias(f"__so_{i}_{j}"))
            exprs.append(
                F.sum((a.isNull() & b.isNull()).cast("long")).alias(f"__nn_{i}_{j}")
            )
    row = df.agg(*exprs).collect()[0].asDict()

    n = row["__n"]
    all_null = [columns[i] for i in range(p) if row[f"__cnt_{i}"] == 0]
    if all_null:
        raise ValueError(
            f"PCA input columns are entirely NULL: {all_null} — mean "
            "imputation is undefined; drop them before calling"
        )
    m = np.array([
        (row[f"__s_{i}"] or 0.0) / row[f"__cnt_{i}"] for i in range(p)
    ])
    # sample variance of the imputed column: imputed rows add m_i each
    var = np.array([
        ((row[f"__ss_{i}"] or 0.0) + (n - row[f"__cnt_{i}"]) * m[i] ** 2
         - n * m[i] ** 2) / (n - 1)
        for i in range(p)
    ])
    # sklearn StandardScaler parity (_handle_zeros_in_scale): a constant
    # column has sd 0 → scale 1, so it contributes a zero row/col to C
    # (identity diagonal aside) instead of NaNs that break eigh.
    var = np.maximum(var, 0.0)  # float cancellation can dip below zero
    sd = np.where(var <= 0.0, 1.0, np.sqrt(var))
    const = var <= 0.0
    # Z.T@Z/(n-1) semantics: a constant column's z-scores are exactly 0
    # (after the scale-1 clamp), so its diagonal entry is 0, not 1.
    C = np.diag(np.where(const, 0.0, 1.0))
    for i in range(p):
        for j in range(i + 1, p):
            if const[i] or const[j]:
                continue  # z ≡ 0 ⇒ exact 0, skip the float-noise path
            s_hat = (
                (row[f"__sb_{i}_{j}"] or 0.0)
                + m[j] * (row[f"__sa_{i}_{j}"] or 0.0)
                + m[i] * (row[f"__so_{i}_{j}"] or 0.0)
                + (row[f"__nn_{i}_{j}"] or 0) * m[i] * m[j]
            )
            C[i, j] = C[j, i] = (s_hat - n * m[i] * m[j]) / (
                (n - 1) * sd[i] * sd[j]
            )
    return C


def pca_feature_importance(
    df: DataFrame, columns: list[str], k: int | None = None
) -> DataFrame:
    """Mean-impute → standardize → PCA(k) → per-feature sum of absolute
    loadings, rounded 2 dp, sorted desc (reference Profiler.py:1056-1065).

    FROM SCRATCH, no pyspark.ml: the data pass is one wide Spark
    aggregation (imputed_standardized_cov — the only part that touches
    rows); the eigendecomposition is numpy eigh on the tiny (p × p)
    matrix driver-side. Deterministic (single LAPACK path), one scan
    instead of ml's imputer-fit + scaler-fit + pca-fit passes, and
    value-oracled: the driver's DuckDB oracle recomputes the same
    recipe independently (DuckDB reduction + numpy eigh)."""
    import numpy as np

    k = k or min(10, len(columns))
    C = imputed_standardized_cov(df, columns)
    eigvals, eigvecs = np.linalg.eigh(C)
    order = np.argsort(eigvals)[::-1][:k]
    pc = eigvecs[:, order]  # (features, k), columns = top-k components
    importance = [
        (columns[i], round(float(np.abs(pc[i]).sum()), 2))
        for i in range(len(columns))
    ]
    importance.sort(key=lambda t: (-t[1], t[0]))
    spark = df.sparkSession
    return spark.createDataFrame(importance, "feature string, importance double")


def pca_feature_importance_ml(
    df: DataFrame, columns: list[str], k: int | None = None
) -> DataFrame:
    """The same recipe via pyspark.ml (Imputer → StandardScaler → PCA) —
    kept as the independent cross-check of the from-scratch path (test
    asserts both agree; loadings are sign/rotation-free only within
    degenerate eigenvalue subspaces, which |·|-sums of well-separated
    spectra do not hit)."""
    from pyspark.ml.feature import PCA, Imputer, StandardScaler, VectorAssembler

    k = k or min(10, len(columns))
    imputed_cols = [f"__i_{c}" for c in columns]
    imputer = Imputer(strategy="mean", inputCols=columns, outputCols=imputed_cols)
    assembler = VectorAssembler(inputCols=imputed_cols, outputCol="__vec")
    scaler = StandardScaler(
        inputCol="__vec", outputCol="__scaled", withMean=True, withStd=True
    )
    pca = PCA(k=k, inputCol="__scaled", outputCol="__pca")

    src = df.select(*[F.col(c).cast("double").alias(c) for c in columns])
    stage = imputer.fit(src).transform(src)
    stage = assembler.transform(stage)
    stage = scaler.fit(stage).transform(stage)
    model = pca.fit(stage)
    pc = model.pc.toArray()  # (features, k)
    importance = [
        (columns[i], round(float(abs(pc[i]).sum()), 2)) for i in range(len(columns))
    ]
    importance.sort(key=lambda t: (-t[1], t[0]))
    spark = df.sparkSession
    return spark.createDataFrame(importance, "feature string, importance double")


def embedding_correlation(df: DataFrame, vec_col: str, dims: int) -> DataFrame:
    """Pairwise correlation of the first `dims` embedding components —
    the A22 path over array columns (projection of array elements into
    plain columns keeps it one agg)."""
    cols = [f"e{i}" for i in range(dims)]
    proj = df.select(*[
        F.col(vec_col).getItem(i).cast("double").alias(cols[i]) for i in range(dims)
    ])
    return correlation_matrix(proj, cols)
