"""Sequence packing: assign documents to token-budgeted packs (the
batch-assembly step before LLM training — concatenate documents up to
a context-window budget).

True greedy first-fit packing is inherently sequential; the
distributed formulation here is CUMSUM PACKING within each group: order
documents deterministically (by id) inside a group, take the running
token total, and cut packs at budget boundaries:

    pack_idx = floor((cumsum - size) / budget)

i.e. a document joins the pack its STARTING offset falls in. Properties
(documented contract, mirrored in the DuckDB oracle):

- deterministic (ordering is (group, id) — no rand, engine-portable);
- every pack's total is <= budget + max_doc_size - 1 ("bounded
  overflow": only the straddling document can exceed the budget — the
  standard streaming-packing relaxation; oversized docs should be
  split/truncated upstream);
- all packs except each group's last are >= budget - max_doc_size + 1
  full (no sliver packs in the middle);
- scale shape: ONE window cumsum per group (shuffle on the group key).
  The group is the parallelism unit — at 10^12 docs the caller packs
  within shards (e.g. part_id), never one global ordering.

No reference counterpart; task-brief training-data op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_by_cumsum(
    df: DataFrame,
    id_col: str,
    size_col: str,
    budget: int,
    group_col: str | None = None,
    pack_col: str = "pack_idx",
) -> DataFrame:
    """df + pack_col: the pack index within the group (0-based). Rows
    with NULL or non-positive size are excluded (size must be a
    positive token count — validate upstream).

    id_col must be UNIQUE within each group: the cumsum is ordered by
    it, and ties would make pack boundaries depend on physical row
    order (nondeterministic across runs)."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    keys = [group_col] if group_col else []
    w = (
        Window.partitionBy(*keys).orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    size = F.col(size_col).cast("bigint")
    cum = F.sum(size).over(w)
    pack = F.floor((cum - size) / budget).cast("bigint")
    return (
        df.where(size > 0)
        .withColumn(pack_col, pack)
    )


def pack_summary(
    packed: DataFrame,
    size_col: str,
    group_col: str | None = None,
    pack_col: str = "pack_idx",
) -> DataFrame:
    """Per-pack docs/token totals + utilization vs the budget is the
    caller's division; this emits (group?, pack_idx, n_docs,
    total_tokens) — the monitoring view of packing efficiency."""
    keys = ([group_col] if group_col else []) + [pack_col]
    return packed.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(size_col).cast("bigint")).alias("total_tokens"),
    )
