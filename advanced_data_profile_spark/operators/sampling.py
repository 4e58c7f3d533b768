"""Deterministic hash-based sampling — the repeatable-downsampling
primitives a training-data curation pipeline needs (per-class caps,
fractional corpus cuts) where `rand()` is unusable: a sample must be
REPRODUCIBLE across reruns, resumes and engines (the audit question is
"which exact rows made the cut"), and independent of partitioning.

Both samplers key on md5_int60(salt || id) — bit-identical in Spark,
DuckDB and Python (functions.text.md5_int60), so every sample is
value-oracle-checkable and stable under repartitioning/AQE, unlike
`df.sample(seed=)` whose output depends on the physical split layout.

Scale shapes:
- hash_fraction_sample: a pure FILTER at the scan (md5 is a codegen'd
  JVM expression) — no shuffle,
  no state; composable with any downstream plan.
- hash_sample_per_group: one shuffle on the group key + window top-k
  (rank by hash). A hot group is bounded by k output rows; the rank
  window over a huge group is the same pattern as topk.top_k_values.

No reference counterpart (profiling samples are presentation-only
there, Profiler.py:542); these are the task brief's training-data ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from advanced_data_profile_spark.functions.text import md5_int60

_HASH_SPACE = float(1 << 60)


def sample_hash(id_col, salt: str = ""):
    """The sampling key: uniform 60-bit hash of (salt, id). Changing the
    salt draws an INDEPENDENT sample from the same ids (e.g. train/eval
    splits salt='train' / salt='eval')."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return md5_int60(F.concat(F.lit(salt), F.lit("|"), c.cast("string")))


def hash_fraction_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep a row iff hash(salt|id) < fraction * 2^60 — a deterministic
    ~fraction Bernoulli sample keyed on the id, not the partition
    layout. Duplicate ids sample identically (all copies in or out),
    which is exactly what corpus-cut semantics want."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(sample_hash(id_col, salt) < int(fraction * _HASH_SPACE))


def hash_sample_per_group(
    df: DataFrame, group_col: str, id_col: str, k: int, salt: str = ""
) -> DataFrame:
    """At most k rows per group, chosen by smallest hash(salt|id) —
    deterministic per-class cap (class rebalancing for training data).
    Tie-break on the id keeps the result total-ordered even under hash
    collisions."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = sample_hash(id_col, salt).alias("__h")
    w = Window.partitionBy(group_col).orderBy(F.col("__h"), F.col(id_col))
    return (
        df.withColumn("__h", h)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__h", "__rn")
    )


def mixture_sample(
    df: DataFrame, group_col: str, id_col: str,
    rates: dict[str, float], default_rate: float = 0.0, salt: str = "",
) -> DataFrame:
    """Per-group keep rates — the corpus MIXTURE knob (e.g. keep 100% of
    a curated source, 10% of crawl): row kept iff hash(salt|id) <
    rate(group) * 2^60. Same determinism/nesting guarantees as
    hash_fraction_sample, still a pure scan filter (the rate lookup is
    a literal map, no join). Groups absent from `rates` use
    default_rate (0.0 = drop unknown sources — the safe default for
    curation allowlists)."""
    for g, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {g!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    thresholds = F.create_map(*[
        x for g, r in sorted(rates.items())
        for x in (F.lit(g), F.lit(int(r * _HASH_SPACE)))
    ])
    cut = F.coalesce(
        thresholds.getItem(F.col(group_col).cast("string")),
        F.lit(int(default_rate * _HASH_SPACE)),
    )
    return df.where(sample_hash(id_col, salt) < cut)


def split_train_eval(
    df: DataFrame, id_col: str, eval_fraction: float = 0.05, salt: str = "split"
) -> tuple[DataFrame, DataFrame]:
    """Disjoint deterministic train/eval split on the id hash — the same
    row can never leak into both sides, on any engine, ever."""
    cut = int(eval_fraction * _HASH_SPACE)
    h = sample_hash(id_col, salt)
    return df.where(h >= cut), df.where(h < cut)
