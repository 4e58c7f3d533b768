"""Plot-data operators (SURVEY.md A24-A28): the reference ships raw
values to plotly client-side (Profiler.py:735-767); at scale the engine
must emit REDUCED plot data — five-number summaries, (bin, count)
pairs, quantile grids — never row-level values.

A24 histograms live in operators.drift (shared infrastructure).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def box_plot_stats(
    df: DataFrame, columns: list[str], approx: bool = False
) -> DataFrame:
    """Five-number summary + Tukey whiskers + outlier count per column
    (A25), all columns in one agg pass + one outlier-count pass."""
    def q(c):
        cd = F.col(c).cast("double")
        arr = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
        return F.percentile_approx(cd, arr, 10000) if approx else F.percentile(cd, arr)

    agg = df.agg(
        *[e for c in columns for e in (
            q(c).alias(f"__q_{c}"),
            F.min(F.col(c).cast("double")).alias(f"__mn_{c}"),
            F.max(F.col(c).cast("double")).alias(f"__mx_{c}"),
        )]
    )
    melted = agg.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(f"__q_{c}").getItem(0).alias("q1"),
                    F.col(f"__q_{c}").getItem(1).alias("median"),
                    F.col(f"__q_{c}").getItem(2).alias("q3"),
                    F.col(f"__mn_{c}").alias("min"),
                    F.col(f"__mx_{c}").alias("max"),
                )
                for c in columns
            ])
        ).alias("s")
    ).select("s.*")
    iqr = F.col("q3") - F.col("q1")
    return melted.select(
        "column", "q1", "median", "q3", "min", "max",
        F.greatest(F.col("q1") - 1.5 * iqr, F.col("min")).alias("lo_whisker"),
        F.least(F.col("q3") + 1.5 * iqr, F.col("max")).alias("hi_whisker"),
    )


def quantile_grid(
    df: DataFrame, column: str, n: int = 21, approx: bool = False
) -> DataFrame:
    """(p, sample_quantile) at n evenly spaced probabilities — the
    sample side of a Q-Q plot (A26) and the reduced ECDF (A27, as the
    inverse function). One agg regardless of n."""
    ps = [i / (n - 1) for i in range(n)]
    cd = F.col(column).cast("double")
    arr = F.array(*[F.lit(p) for p in ps])
    qexpr = F.percentile_approx(cd, arr, 10000) if approx else F.percentile(cd, arr)
    agg = df.agg(qexpr.alias("__qs"))
    return agg.select(
        F.posexplode("__qs").alias("idx", "sample_q")
    ).select(
        (F.col("idx") / (n - 1)).alias("p"),
        F.col("sample_q"),
    )


def _norm_ppf(p: float) -> float:
    """Acklam's rational approximation of the standard normal inverse
    CDF (public algorithm) — numpy/scipy-free so both engine and tests
    share the exact same constant."""
    if not 0.0 < p < 1.0:
        return float("nan")
    a = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00]
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        qv = math.sqrt(-2 * math.log(p))
        return (((((c[0] * qv + c[1]) * qv + c[2]) * qv + c[3]) * qv + c[4]) * qv + c[5]) / \
               ((((d[0] * qv + d[1]) * qv + d[2]) * qv + d[3]) * qv + 1)
    if p > phigh:
        qv = math.sqrt(-2 * math.log(1 - p))
        return -(((((c[0] * qv + c[1]) * qv + c[2]) * qv + c[3]) * qv + c[4]) * qv + c[5]) / \
               ((((d[0] * qv + d[1]) * qv + d[2]) * qv + d[3]) * qv + 1)
    qv = p - 0.5
    r = qv * qv
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * qv / \
           (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1)


def qq_plot_data(df: DataFrame, column: str, n: int = 21,
                 approx: bool = False) -> DataFrame:
    """(theoretical_q, sample_q) pairs for a normal Q-Q plot (A26).
    Theoretical quantiles are driver-side constants joined in as
    literals — no scipy dependency, no extra scan."""
    grid = quantile_grid(df, column, n, approx)
    # build a literal map p -> ppf(p) on the driver (n tiny)
    ps = [i / (n - 1) for i in range(n)]
    mapping = F.map_from_arrays(
        F.array(*[F.lit(round(p, 12)) for p in ps]),
        F.array(*[F.lit(_norm_ppf(p)) for p in ps]),
    )
    return grid.select(
        F.col("p"),
        mapping.getItem(F.round(F.col("p"), 12)).alias("theoretical_q"),
        F.col("sample_q"),
    )


def ecdf_points(df: DataFrame, column: str, n_bins: int = 100) -> DataFrame:
    """Reduced ECDF via histogram cumsum (A27): (upper_edge, cum_frac).
    One min/max agg + one histogram agg; never a full sort."""
    from pyspark.sql import Window

    from advanced_data_profile_spark.operators.drift import histogram, shared_bins

    bounds = shared_bins(df, [column], n_bins)
    hist = histogram(
        df.select(F.lit(1).alias("__g"), F.col(column)), [column], "__g",
        bounds, n_bins,
    )
    lo, hi = bounds[column]
    width = ((hi - lo) / n_bins) if hi is not None and hi > lo else 1.0
    w = Window.orderBy("bin")
    total = F.sum("cnt").over(Window.partitionBy(F.lit(1)))
    return hist.select(
        (F.lit(lo) + F.col("bin") * F.lit(width)).alias("upper_edge"),
        (F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0)) / total)
        .alias("cum_frac"),
    )
