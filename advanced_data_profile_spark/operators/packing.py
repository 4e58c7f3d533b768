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

import warnings

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _warn_global_window(fn: str) -> None:
    """group_col=None means ONE window over the whole input — correct,
    but a single-task total order that serializes at scale. Loud by
    design (the docstrings say the group is the parallelism unit; this
    makes the contract unmissable at call time)."""
    warnings.warn(
        f"{fn}(group_col=None) packs the ENTIRE input as one ordered "
        "stream — a single-partition window that serializes at scale. "
        "Pass group_col (e.g. a shard/part id) for any input that "
        "doesn't comfortably fit one task.",
        UserWarning,
        stacklevel=3,
    )


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
    if group_col is None:
        _warn_global_window("pack_by_cumsum")
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


def split_oversized(
    df: DataFrame,
    id_col: str,
    size_col: str,
    budget: int,
    chunk_id_col: str = "chunk_id",
    chunk_idx_col: str = "chunk_idx",
    chunk_size_col: str = "chunk_size",
) -> DataFrame:
    """Deterministically split documents larger than the budget into
    budget-sized chunks (last chunk = remainder); documents within
    budget pass through as their own single chunk. Chunk ids are
    ``<id>#<chunk_idx>`` — stable across runs and partition layouts.

    Closes pack_by_cumsum's documented upstream contract ("oversized
    docs should be split/truncated upstream"): after this pass every
    chunk_size <= budget, so cumsum packing's bounded overflow tightens
    from budget + max_doc - 1 to < 2*budget. For EXACT <=-budget packs
    use split_and_pack, which also cuts at pack boundaries.

    Scale shape: pure per-row explode (no shuffle, no window) — chunk
    count per doc is ceil(size/budget)."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    size = F.col(size_col).cast("bigint")
    n_chunks = F.ceil(size / budget).cast("bigint")
    ex = (
        df.where(size > 0)
        .withColumn("__nc", n_chunks)
        .withColumn(chunk_idx_col, F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("__nc") - 1)))
    )
    idx = F.col(chunk_idx_col)
    return (
        ex.withColumn(
            chunk_size_col,
            F.least(F.lit(budget).cast("bigint"), size - idx * budget),
        )
        .withColumn(
            chunk_id_col,
            F.concat(F.col(id_col).cast("string"), F.lit("#"), idx.cast("string")),
        )
        .drop("__nc")
    )


def split_and_pack(
    df: DataFrame,
    id_col: str,
    size_col: str,
    budget: int,
    group_col: str | None = None,
    pack_col: str = "pack_idx",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Boundary-aligned EXACT packing: treat each group as one token
    stream in (group, id) order, cut the stream at every multiple of
    the budget, and split any document straddling a cut into chunks.
    Result: one row per (document, pack) overlap with the chunk's token
    count; EVERY pack holds exactly `budget` tokens except each group's
    last — no overflow relaxation at all (the property pack_by_cumsum
    cannot give, since its straddling doc overflows).

    Columns added: chunk_id (<id>#<chunk_idx>), chunk_idx (0-based
    within the document), chunk_offset (the chunk's 0-based token
    offset WITHIN its document — what payload slicing needs),
    chunk_size, pack_col. Oversized documents (> budget) need no
    pre-pass — they simply span multiple packs. `carry_cols` ride
    through unchanged (duplicated per chunk) so payload columns reach
    the output without a join back — one shuffle total; duplication
    factor is the chunks-per-document count, ~1 for in-budget docs.

    Scale shape: ONE window cumsum per group + a per-row explode over
    the packs the document overlaps (ceil(size/budget)+1 at most). The
    group is the parallelism unit, as in pack_by_cumsum."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if group_col is None:
        _warn_global_window("split_and_pack")
    keys = [group_col] if group_col else []
    w = (
        Window.partitionBy(*keys).orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    size = F.col(size_col).cast("bigint")
    en = F.sum(size).over(w)
    base = (
        df.where(size > 0)
        .select(
            *keys,
            F.col(id_col),
            *[F.col(c) for c in carry_cols],
            en.alias("__en"),
            (en - size).alias("__st"),
        )
    )
    first_pack = F.floor(F.col("__st") / budget).cast("bigint")
    last_pack = F.floor((F.col("__en") - 1) / budget).cast("bigint")
    ch = base.select(
        *keys,
        F.col(id_col),
        *carry_cols,
        "__st",
        "__en",
        first_pack.alias("__fp"),
        F.explode(F.sequence(first_pack, last_pack)).alias(pack_col),
    )
    p = F.col(pack_col)
    chunk_start = F.greatest(F.col("__st"), p * budget)
    chunk_end = F.least(F.col("__en"), (p + 1) * budget)
    chunk_idx = (p - F.col("__fp")).cast("bigint")
    return ch.select(
        *keys,
        F.col(id_col),
        *carry_cols,
        F.concat(
            F.col(id_col).cast("string"), F.lit("#"), chunk_idx.cast("string")
        ).alias("chunk_id"),
        chunk_idx.alias("chunk_idx"),
        (chunk_start - F.col("__st")).cast("bigint").alias("chunk_offset"),
        (chunk_end - chunk_start).cast("bigint").alias("chunk_size"),
        p,
    )


def slice_chunks(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    group_col: str | None = None,
    pack_col: str = "pack_idx",
    joiner: str = " ",
    chunk_text_col: str = "chunk_text",
) -> DataFrame:
    """split_and_pack WITH the chunk payload materialized: each output
    row carries chunk_text — the document's tokens [chunk_offset,
    chunk_offset + chunk_size) joined by `joiner` — so packs can be
    assembled into actual training sequences, not just (id, size)
    bookkeeping.

    `tokens_col` is a precomputed array<string> column (tokenize
    upstream — e.g. functions.text.tokens for the whitespace/norm
    contract; the operator is tokenizer-agnostic). Reconstruction
    contract (oracle-checked): concatenating a document's chunk_text
    in chunk_idx order with `joiner` equals the tokens joined by
    `joiner` — i.e. the tokenizer-normalized text, NOT raw bytes;
    and size(chunk tokens) == chunk_size exactly.

    Scale shape: the token array rides split_and_pack's single group
    shuffle via carry_cols (no join back to the payload), then one
    F.slice per chunk — JVM array ops end to end, no UDF. Rows with
    empty token arrays are excluded (split_and_pack's size > 0
    contract)."""
    out = split_and_pack(
        df.withColumn("__n_toks", F.size(F.col(tokens_col))),
        id_col,
        "__n_toks",
        budget,
        group_col=group_col,
        pack_col=pack_col,
        carry_cols=(tokens_col,),
    )
    sliced = F.slice(
        F.col(tokens_col),
        (F.col("chunk_offset") + 1).cast("int"),
        F.col("chunk_size").cast("int"),
    )
    return out.withColumn(
        chunk_text_col, F.array_join(sliced, joiner)
    ).drop(tokens_col)


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
