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


def chi2_sf(chi2: float, dof: int) -> float:
    """Survival function (upper-tail p-value) of the chi-square
    distribution: Q(dof/2, chi2/2) — the regularized upper incomplete
    gamma via the standard series (x < a+1) / Lentz continued fraction
    (x >= a+1) split (the public gammp/gammq algorithm). Pure Python,
    double precision; used driver-side on tiny drift-score relations
    (categorical drift's chi2 grows with sample size, so the p-value —
    not the raw statistic — is the sample-size-aware verdict knob).
    Validated in tests against published chi-square critical values."""
    import math

    if dof <= 0:
        raise ValueError(f"dof must be positive, got {dof}")
    if chi2 <= 0:
        return 1.0
    a, x = dof / 2.0, chi2 / 2.0
    lg = math.lgamma(a)
    if x < a + 1.0:
        # P(a,x) by series; Q = 1 - P
        term = 1.0 / a
        total = term
        n = a
        for _ in range(500):
            n += 1.0
            term *= x / n
            total += term
            if abs(term) < abs(total) * 1e-15:
                break
        p = total * math.exp(-x + a * math.log(x) - lg)
        return max(0.0, min(1.0, 1.0 - p))
    # Q(a,x) by modified-Lentz continued fraction
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    q = math.exp(-x + a * math.log(x) - lg) * h
    return max(0.0, min(1.0, q))
