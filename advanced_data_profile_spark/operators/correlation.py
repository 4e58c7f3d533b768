"""Correlation matrix + PCA feature importance (SURVEY.md A22/A23;
reference Profiler.py:1019-1068).

Correlation: all n*(n-1)/2 pairwise Pearson coefficients in ONE wide
aggregation (fine for the tens-of-columns regime of a profiler; the
reference's pandas .corr() is the same algorithm single-node).

PCA: pyspark.ml pipeline (mean-impute → standard-scale → PCA),
feature importance = sum of |loadings| per feature across components,
sorted desc — the reference's exact recipe (Profiler.py:1033-1065),
distributed by ml's RowMatrix SVD instead of sklearn.
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


def pca_feature_importance(
    df: DataFrame, columns: list[str], k: int | None = None
) -> DataFrame:
    """Mean-impute → standardize → PCA(k) → per-feature sum of absolute
    loadings, rounded 2 dp, sorted desc (reference Profiler.py:1056-1065).
    Driver-side math only on the (features x k) loading matrix."""
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
