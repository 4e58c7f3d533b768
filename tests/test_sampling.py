"""Deterministic hash sampling: reproducibility, partition-layout
independence, per-group caps, disjoint splits, plan shape."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from advanced_data_profile_spark.operators.sampling import (
    hash_fraction_sample,
    hash_sample_per_group,
    split_train_eval,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(pd.DataFrame({
        "id": range(2000),
        "grp": [f"g{i % 7}" for i in range(2000)],
    }))


def test_fraction_sample_rate_and_determinism(spark, docs):
    ids1 = {r.id for r in hash_fraction_sample(docs, "id", 0.2).collect()}
    ids2 = {r.id for r in
            hash_fraction_sample(docs.repartition(13), "id", 0.2).collect()}
    assert ids1 == ids2  # partition-layout independent
    assert 0.15 < len(ids1) / 2000 < 0.25  # ~fraction
    # nested property: a smaller cut is a SUBSET of a bigger one
    ids_small = {r.id for r in hash_fraction_sample(docs, "id", 0.05).collect()}
    assert ids_small <= ids1


def test_fraction_sample_salt_independence(spark, docs):
    a = {r.id for r in hash_fraction_sample(docs, "id", 0.2, salt="a").collect()}
    b = {r.id for r in hash_fraction_sample(docs, "id", 0.2, salt="b").collect()}
    assert a != b
    # independent draws overlap ~ fraction^2
    assert len(a & b) < 0.5 * len(a)


def test_per_group_cap_exact(spark, docs):
    out = hash_sample_per_group(docs, "grp", "id", k=5).collect()
    by = {}
    for r in out:
        by.setdefault(r.grp, set()).add(r.id)
    assert set(by) == {f"g{i}" for i in range(7)}
    assert all(len(v) == 5 for v in by.values())
    # deterministic under repartitioning
    out2 = hash_sample_per_group(docs.repartition(17), "grp", "id", k=5).collect()
    assert {(r.grp, r.id) for r in out} == {(r.grp, r.id) for r in out2}


def test_split_train_eval_disjoint_exhaustive(spark, docs):
    train, ev = split_train_eval(docs, "id", eval_fraction=0.1)
    t = {r.id for r in train.collect()}
    e = {r.id for r in ev.collect()}
    assert t & e == set()
    assert t | e == set(range(2000))
    assert 0.05 < len(e) / 2000 < 0.15


def test_fraction_sample_is_scan_filter(spark, docs):
    plan = hash_fraction_sample(docs, "id", 0.2)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan  # pure filter, no shuffle


def test_validation(spark, docs):
    with pytest.raises(ValueError):
        hash_fraction_sample(docs, "id", 1.5)
    with pytest.raises(ValueError):
        hash_sample_per_group(docs, "grp", "id", k=0)


def test_fraction_monotone_nesting_property(spark, docs):
    """Nested-cut property at many fractions: f1 <= f2 implies
    sample(f1) ⊆ sample(f2) (the hash-threshold construction makes cuts
    monotone — resizing a corpus cut never churns previously selected
    rows)."""
    fractions = [0.01, 0.05, 0.2, 0.5, 0.9, 1.0]
    sets = [
        {r.id for r in hash_fraction_sample(docs, "id", f).collect()}
        for f in fractions
    ]
    for small, big in zip(sets, sets[1:]):
        assert small <= big
    assert sets[-1] == set(range(2000))  # fraction 1.0 keeps everything


def test_mixture_sample_rates_and_default(spark):
    from advanced_data_profile_spark.operators.sampling import mixture_sample

    pdf = pd.DataFrame({
        "id": range(3000),
        "src": [f"s{i % 3}" for i in range(3000)],
    })
    df = spark.createDataFrame(pdf)
    out = mixture_sample(df, "src", "id", {"s0": 1.0, "s1": 0.3}).collect()
    by = {}
    for r in out:
        by.setdefault(r.src, set()).add(r.id)
    assert len(by["s0"]) == 1000          # rate 1.0 keeps everything
    assert 200 < len(by.get("s1", set())) < 400  # ~0.3
    assert "s2" not in by                 # default_rate=0 drops unknowns
    # mixture keeps are consistent with the plain fraction sampler
    # (same hash key): s1's keeps are exactly the 0.3 cut of s1 rows
    from advanced_data_profile_spark.operators.sampling import (
        hash_fraction_sample,
    )
    s1 = df.where(F.col("src") == "s1")
    want = {r.id for r in hash_fraction_sample(s1, "id", 0.3).collect()}
    assert by["s1"] == want
    with pytest.raises(ValueError):
        mixture_sample(df, "src", "id", {"s0": 2.0})
