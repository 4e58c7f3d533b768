"""Distribution-drift checks: two-sample KS statistic + PSI over
shared-bin histograms (north_rule; SURVEY.md §2.9).

Design for scale: raw data is reduced ONCE per (group, column) to a
fixed-width histogram — a single wide aggregation over the scan (bin
edges from a prior global min/max agg, so 2 scans total for any number
of columns/groups). Histograms are tiny (n_groups × n_cols × n_bins
rows) and mergeable, so KS/PSI between any pair of snapshots is
computed over the histogram table alone — no second pass over raw
data, and re-checking a new partition against an old baseline needs
only the stored histogram, not the old data.

KS here is the binned approximation D = max|ECDF1 - ECDF2| over shared
bin boundaries (exact KS needs full sorts of both samples — not viable
at 10^12 rows; the binned D converges to exact D as bins grow and is
a documented tolerance). PSI uses the standard sum((p-q)*ln(p/q)) with
epsilon smoothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def shared_bins(
    df: DataFrame, columns: list[str], n_bins: int = 50
) -> dict[str, tuple[float, float]]:
    """Global (min, max) per column — one agg, driver-side dict."""
    exprs = []
    for c in columns:
        exprs.append(F.min(F.col(c).cast("double")).alias(f"__mn_{c}"))
        exprs.append(F.max(F.col(c).cast("double")).alias(f"__mx_{c}"))
    row = df.agg(*exprs).collect()[0].asDict()
    return {c: (row[f"__mn_{c}"], row[f"__mx_{c}"]) for c in columns}


def histogram(
    df: DataFrame,
    columns: list[str],
    group_by: str,
    bounds: dict[str, tuple[float, float]] | None = None,
    n_bins: int = 50,
) -> DataFrame:
    """(group, column, bin, cnt) with shared bins across groups.

    bin = width_bucket(value, lo, hi, n_bins) ∈ [0, n_bins+1]
    (0/n_bins+1 are underflow/overflow so snapshots with outliers
    still share edges). All columns in one melt + one aggregation.
    """
    bounds = bounds or shared_bins(df, columns, n_bins)
    structs = []
    for c in columns:
        lo, hi = bounds[c]
        if lo is None or hi is None or hi <= lo:
            lo, hi = (lo or 0.0), (lo or 0.0) + 1.0
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.width_bucket(
                    F.col(c).cast("double"), F.lit(float(lo)), F.lit(float(hi)), F.lit(n_bins)
                ).alias("bin"),
                # bin-grid metadata rides along so a stored histogram is
                # self-describing: a later run comparing against it can
                # REUSE these edges instead of recomputing bounds from
                # different data (bins from different edges are not
                # comparable — the resume path depends on this)
                F.lit(float(lo)).alias("lo"),
                F.lit(float(hi)).alias("hi"),
                # interior-bin count rides along too: max(bin) can't pin
                # it (width_bucket sends max-valued rows to the overflow
                # bin n_bins+1), and figure midpoints need the true grid
                F.lit(int(n_bins)).alias("n_bins"),
            )
        )
    return (
        df.select(F.col(group_by).alias("grp"), F.explode(F.array(*structs)).alias("s"))
        .select("grp", "s.column", "s.bin", "s.lo", "s.hi", "s.n_bins")
        .where(F.col("bin").isNotNull())
        .groupBy("grp", "column", "bin", "lo", "hi", "n_bins")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ks_psi(
    hist: DataFrame,
    baseline_grp: str | int,
    eps: float = 1e-6,
) -> DataFrame:
    """KS statistic + PSI of every group vs the baseline group, per
    column, from the histogram table alone.

    Returns (grp, column, ks, psi). Operates entirely on the tiny
    histogram relation: a broadcast join on (column, bin) + window
    cumsums.
    """
    base = (
        hist.where(F.col("grp") == baseline_grp)
        .groupBy("column", "bin")
        .agg(F.sum("cnt").alias("bcnt"))
    )
    other = hist.where(F.col("grp") != baseline_grp)
    joined = other.join(F.broadcast(base), ["column", "bin"], "full_outer").select(
        F.col("grp"), F.col("column"), F.col("bin"),
        F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        F.coalesce(F.col("bcnt"), F.lit(0)).alias("bcnt"),
    )
    # full_outer leaves grp null where a bin exists only in baseline;
    # those bins must appear for EVERY group — cross-fill via the
    # (grp) × (column, bin) frame
    grps = other.select("grp").distinct()
    frame = grps.crossJoin(
        hist.select("column", "bin").distinct()
    )
    counts = frame.join(joined.drop("bcnt"), ["grp", "column", "bin"], "left").select(
        "grp", "column", "bin", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    ).join(F.broadcast(base), ["column", "bin"], "left").select(
        "grp", "column", "bin", "cnt", F.coalesce(F.col("bcnt"), F.lit(0)).alias("bcnt")
    )
    wtot = Window.partitionBy("grp", "column")
    wcum = wtot.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    # a column with an EMPTY baseline (all-NULL in the baseline
    # partition, or drift_columns grew after the baseline was stored)
    # has sum(bcnt)=0 → q and psi would be NULL and the verdict a
    # silent NULL-coerced FAIL; such columns are unscorable, so drop
    # them here — callers emit an explicit skipped marker (the same
    # contract as the no-baseline-at-all path in plans.pipeline)
    counts = (
        counts.withColumn("__btot", F.sum("bcnt").over(wtot))
        .withColumn("__ctot", F.sum("cnt").over(wtot))
        .where((F.col("__btot") > 0) & (F.col("__ctot") > 0))
    )
    p = F.col("cnt") / F.sum("cnt").over(wtot)
    q = F.col("bcnt") / F.sum("bcnt").over(wtot)
    # unnormalized epsilon smoothing (same convention as the
    # oracle-checked q_drift_psi_events): renormalizing by
    # (1 + eps * n_bins) would need the actual bin count — a hard-coded
    # constant silently biases the (ps - qs) term when bins differ
    ps = p + eps
    qs = q + eps
    scored = counts.select(
        "grp", "column", "bin",
        F.abs(F.sum(p).over(wcum) - F.sum(q).over(wcum)).alias("cdf_gap"),
        ((ps - qs) * F.log(ps / qs)).alias("psi_term"),
    )
    return scored.groupBy("grp", "column").agg(
        F.round(F.max("cdf_gap"), 6).alias("ks"),
        F.round(F.sum("psi_term"), 6).alias("psi"),
    )


def drift_verdicts(
    scores: DataFrame,
    ks_threshold: float = 0.1,
    psi_threshold: float = 0.2,
) -> DataFrame:
    """constraint_results-shaped rows: one per (group, column)."""
    return scores.select(
        F.col("grp").cast("string").alias("part_id"),
        F.concat(F.lit("drift_"), F.col("column")).alias("constraint"),
        F.lit("drift").alias("kind"),
        F.lit(None).cast("bigint").alias("n_rows"),
        F.lit(None).cast("bigint").alias("n_violations"),
        ((F.col("ks") <= ks_threshold) & (F.col("psi") <= psi_threshold)).alias("passed"),
        F.col("ks"), F.col("psi"),
    )
