"""Cumsum sequence packing: bounded overflow, middle-pack fill,
determinism, group isolation."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from advanced_data_profile_spark.operators.packing import (
    pack_by_cumsum,
    pack_summary,
    slice_chunks,
    split_and_pack,
)

BUDGET = 100


@pytest.fixture(scope="module")
def sized(spark):
    import random

    rng = random.Random(3)
    rows = [
        (g, i, rng.randint(1, 40))
        for g in ("a", "b") for i in range(300)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["grp", "doc_id", "n_tokens"])
    )


def test_packing_contract(spark, sized):
    packed = pack_by_cumsum(sized, "doc_id", "n_tokens", BUDGET, group_col="grp")
    summ = pack_summary(packed, "n_tokens", group_col="grp").collect()
    max_size = 40
    by_grp = {}
    for r in summ:
        by_grp.setdefault(r.grp, []).append(r)
    for grp, rows in by_grp.items():
        rows.sort(key=lambda r: r.pack_idx)
        # contiguous pack indices from 0
        assert [r.pack_idx for r in rows] == list(range(len(rows)))
        for r in rows:
            # bounded overflow: only a straddling doc exceeds the budget
            assert r.total_tokens <= BUDGET + max_size - 1
        for r in rows[:-1]:
            # no sliver packs before the last one
            assert r.total_tokens >= BUDGET - max_size + 1
    # every positive-size row is packed exactly once
    assert sum(r.n_docs for r in summ) == sized.count()


def test_packing_deterministic_under_repartition(spark, sized):
    a = pack_by_cumsum(sized, "doc_id", "n_tokens", BUDGET, group_col="grp")
    b = pack_by_cumsum(
        sized.repartition(11), "doc_id", "n_tokens", BUDGET, group_col="grp"
    )
    assert {(r.grp, r.doc_id, r.pack_idx) for r in a.collect()} == \
           {(r.grp, r.doc_id, r.pack_idx) for r in b.collect()}


def test_split_oversized_chunks(spark):
    from advanced_data_profile_spark.operators.packing import split_oversized

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2, 3], "n_tokens": [50, 100, 101, 250]})
    )
    out = split_oversized(df, "doc_id", "n_tokens", 100)
    rows = sorted(
        ((r.doc_id, r.chunk_idx, r.chunk_size, r.chunk_id) for r in out.collect())
    )
    assert rows == [
        (0, 0, 50, "0#0"),
        (1, 0, 100, "1#0"),
        (2, 0, 100, "2#0"), (2, 1, 1, "2#1"),
        (3, 0, 100, "3#0"), (3, 1, 100, "3#1"), (3, 2, 50, "3#2"),
    ]
    # per-doc chunk totals reconstruct the original sizes
    assert all(r[2] <= 100 for r in rows)


def test_split_oversized_tightens_cumsum_overflow(spark, sized):
    """split_oversized then pack: every chunk <= budget, so cumsum
    packing's overflow bound tightens to < 2*budget."""
    from advanced_data_profile_spark.operators.packing import split_oversized

    chunks = split_oversized(sized, "doc_id", "n_tokens", 30)
    packed = pack_by_cumsum(chunks, "chunk_id", "chunk_size", BUDGET,
                            group_col="grp")
    summ = pack_summary(packed, "chunk_size", group_col="grp").collect()
    assert all(r.total_tokens < 2 * BUDGET for r in summ)


def test_split_and_pack_exact_budget(spark, sized):
    """The closed contract: boundary-aligned split+pack gives EVERY pack
    exactly the budget except each group's last — no overflow
    relaxation — and chunk sizes reassemble the documents exactly."""
    from advanced_data_profile_spark.operators.packing import split_and_pack

    chunks = split_and_pack(sized, "doc_id", "n_tokens", BUDGET, group_col="grp")
    summ = pack_summary(chunks, "chunk_size", group_col="grp").collect()
    by_grp = {}
    for r in summ:
        by_grp.setdefault(r.grp, []).append(r)
    for rows in by_grp.values():
        rows.sort(key=lambda r: r.pack_idx)
        assert [r.pack_idx for r in rows] == list(range(len(rows)))
        for r in rows[:-1]:
            assert r.total_tokens == BUDGET  # exact, not <=
        assert rows[-1].total_tokens <= BUDGET
    # chunks reassemble each document's token count exactly
    re = {
        (r.grp, r.doc_id): r.total
        for r in chunks.groupBy("grp", "doc_id")
        .agg(F.sum("chunk_size").alias("total"))
        .collect()
    }
    src = {(r.grp, r.doc_id): r.n_tokens for r in sized.collect() if r.n_tokens > 0}
    assert re == src


def test_split_and_pack_deterministic_under_repartition(spark, sized):
    from advanced_data_profile_spark.operators.packing import split_and_pack

    key = lambda r: (r.grp, r.chunk_id, r.pack_idx, r.chunk_size)  # noqa: E731
    a = split_and_pack(sized, "doc_id", "n_tokens", BUDGET, group_col="grp")
    b = split_and_pack(
        sized.repartition(13), "doc_id", "n_tokens", BUDGET, group_col="grp"
    )
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))


def test_split_and_pack_matches_python_reference(spark):
    """Randomized cross-check: 20 random size profiles (mixed tiny /
    budget-sized / oversized docs, one group per case, ONE Spark job)
    against an independent pure-Python streaming reference."""
    import random

    from advanced_data_profile_spark.operators.packing import split_and_pack

    rng = random.Random(7)
    rows = []
    for case in range(20):
        n_docs = rng.randint(1, 40)
        for i in range(n_docs):
            kind = rng.random()
            if kind < 0.3:
                size = rng.randint(1, 10)            # tiny
            elif kind < 0.8:
                size = rng.randint(11, BUDGET)       # within budget
            else:
                size = rng.randint(BUDGET + 1, 5 * BUDGET)  # oversized
            rows.append((f"c{case}", i, size))

    def reference(sizes):
        out, off = [], 0
        for i, size in sizes:
            st_, en = off, off + size
            for p in range(st_ // BUDGET, (en - 1) // BUDGET + 1):
                lo, hi = max(st_, p * BUDGET), min(en, (p + 1) * BUDGET)
                out.append((i, p - st_ // BUDGET, hi - lo, p))
            off = en
        return sorted(out)

    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["grp", "doc_id", "n_tokens"])
    )
    got = {}
    for r in split_and_pack(df, "doc_id", "n_tokens", BUDGET, group_col="grp").collect():
        got.setdefault(r.grp, []).append(
            (r.doc_id, r.chunk_idx, r.chunk_size, r.pack_idx)
        )
    by_case = {}
    for grp, i, size in rows:
        by_case.setdefault(grp, []).append((i, size))
    for grp, sizes in by_case.items():
        assert sorted(got[grp]) == reference(sizes), grp


def test_packing_drops_nonpositive_and_validates(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2], "n_tokens": [10, 0, None]})
    )
    out = pack_by_cumsum(df, "doc_id", "n_tokens", 16)
    assert [r.doc_id for r in out.collect()] == [0]
    with pytest.raises(ValueError):
        pack_by_cumsum(df, "doc_id", "n_tokens", 0)


# ------------------------------------------------------------- slicing


def test_split_and_pack_chunk_offset(spark, sized):
    # chunk_offset is the chunk's token offset within its document:
    # offsets start at 0, advance by chunk_size, and the last chunk
    # ends exactly at the document's size
    chunks = split_and_pack(sized, "doc_id", "n_tokens", BUDGET, group_col="grp")
    sizes = {(r.grp, r.doc_id): r.n_tokens for r in sized.collect()}
    by_doc = {}
    for r in chunks.collect():
        by_doc.setdefault((r.grp, r.doc_id), []).append(r)
    for key, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        off = 0
        for r in rows:
            assert r.chunk_offset == off
            off += r.chunk_size
        assert off == sizes[key]


def test_slice_chunks_reconstructs_documents(spark):
    import random

    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    rows = [
        (g, i, " ".join(rng.choice(words) for _ in range(rng.randint(1, 90))))
        for g in ("a", "b") for i in range(80)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["grp", "doc_id", "text"]))
    toked = df.withColumn("toks", F.split(F.col("text"), " "))
    out = slice_chunks(toked, "doc_id", "toks", 32, group_col="grp")
    # per-chunk token count == chunk_size, exactly
    bad = out.where(
        F.size(F.split(F.col("chunk_text"), " ")) != F.col("chunk_size")
    ).count()
    assert bad == 0
    # concat of chunk texts in chunk_idx order == the original text
    rebuilt = {
        (r.grp, r.doc_id): r.whole
        for r in out.groupBy("grp", "doc_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("chunk_idx", "chunk_text"))
                ).getField("chunk_text"),
                " ",
            ).alias("whole")
        )
        .collect()
    }
    for g, i, text in rows:
        assert rebuilt[(g, i)] == text


def test_slice_chunks_empty_docs_excluded(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            [("a", 0, ["x", "y"]), ("a", 1, [])],
            columns=["grp", "doc_id", "toks"],
        )
    )
    out = slice_chunks(df, "doc_id", "toks", 8, group_col="grp").collect()
    assert [r.doc_id for r in out] == [0]
    assert out[0].chunk_text == "x y"


def test_global_window_warns(spark, sized):
    with pytest.warns(UserWarning, match="serializes at scale"):
        pack_by_cumsum(sized, "doc_id", "n_tokens", BUDGET)
    with pytest.warns(UserWarning, match="serializes at scale"):
        split_and_pack(sized, "doc_id", "n_tokens", BUDGET)
    import warnings as w

    with w.catch_warnings():
        w.simplefilter("error")
        pack_by_cumsum(sized, "doc_id", "n_tokens", BUDGET, group_col="grp")
        split_and_pack(sized, "doc_id", "n_tokens", BUDGET, group_col="grp")
