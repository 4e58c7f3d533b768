"""Numeric statistic expressions with explicit parity semantics.

The reference computes moments with pandas defaults: sample stddev
(ddof=1), sample-adjusted skewness G1 and excess kurtosis G2
(reference Profiler.py:706-726). Spark's built-ins are population
(g1, g2), so the adjustment factors are applied explicitly here —
as Column expressions, so they stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sample_skewness(c: Column, n: Column) -> Column:
    """pandas-style G1 = g1 * sqrt(n*(n-1)) / (n-2); null when n < 3."""
    g1 = F.skewness(c)
    adj = F.sqrt(n * (n - 1)) / (n - 2)
    return F.when(n >= 3, g1 * adj)


def sample_kurtosis(c: Column, n: Column) -> Column:
    """pandas-style excess G2 = (n-1)/((n-2)(n-3)) * ((n+1)*g2 + 6); null when n < 4."""
    g2 = F.kurtosis(c)
    adj = (n - 1) / ((n - 2) * (n - 3)) * ((n + 1) * g2 + 6)
    return F.when(n >= 4, adj)


def decimal_places(c: Column) -> Column:
    """Max number of digits after the decimal point, as rendered by a
    plain string cast (reference Profiler.py:584-588 splits on '.')."""
    frac = F.split(c.cast("string"), r"\.").getItem(1)
    return F.coalesce(F.length(frac), F.lit(0))


def is_integral(c: Column) -> Column:
    """True iff every non-null value satisfies x % 1 == 0
    (reference Profiler.py:208-210). Aggregate expression."""
    ok = (c == F.floor(c)).cast("int")
    return F.coalesce(F.min(ok) == 1, F.lit(False))
