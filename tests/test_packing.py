"""Cumsum sequence packing: bounded overflow, middle-pack fill,
determinism, group isolation."""

from __future__ import annotations

import pandas as pd
import pytest

from advanced_data_profile_spark.operators.packing import (
    pack_by_cumsum,
    pack_summary,
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


def test_packing_drops_nonpositive_and_validates(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2], "n_tokens": [10, 0, None]})
    )
    out = pack_by_cumsum(df, "doc_id", "n_tokens", 16)
    assert [r.doc_id for r in out.collect()] == [0]
    with pytest.raises(ValueError):
        pack_by_cumsum(df, "doc_id", "n_tokens", 0)
