"""Gopher/C4-style quality filter: each rule exercised by a crafted
document, keep/attribution semantics, and the keep-rate aggregate."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from advanced_data_profile_spark.operators.quality import (
    QualityParams,
    keep_rate,
    quality_filter,
)

GOOD = ("the quick brown fox jumps over the lazy dog and then it runs "
        "back home across the wide green field with a happy bark")


@pytest.fixture(scope="module")
def verdicts(spark):
    docs = [
        (0, GOOD),                                       # passes everything
        (1, "too short"),                                # words_in_range
        (2, "the " + "a " * 5 + "it " * 5 + "!?#$%" * 40),  # punct ratio
        (3, "zzzz qqqq wwww eeee rrrr tttt yyyy uuuu iiii oooo pppp ssss"),  # stopwords
        (4, "\n".join(["the same line is here again ok"] * 10)),  # dup lines
        (5, "\n".join([f"- bullet {i} the it and of to in is that" for i in range(10)])),  # bullets
        (6, "\n".join([f"the line {i} trails off and it is..." for i in range(10)])),  # ellipsis
        (7, "the 111 222 333 444 555 666 777 888 999 000 101 202 it"),  # alpha frac
        (8, None),                                       # NULL text
        (9, "the " + "supercalifragilisticexpialidocious " * 30 + "it"),  # mean word len
    ]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    out = quality_filter(df, "text", id_col="doc_id")
    return {r.id: r for r in out.collect()}


def test_good_document_keeps(verdicts):
    r = verdicts[0]
    assert r.keep is True and r.failed_rules == ""


def test_each_rule_fires(verdicts):
    assert not verdicts[1].words_in_range
    assert not verdicts[2].punct_ratio_ok
    assert not verdicts[3].stopword_hits_ok
    assert not verdicts[4].dup_line_frac_ok
    assert not verdicts[5].bullet_line_frac_ok
    assert not verdicts[6].ellipsis_line_frac_ok
    assert not verdicts[7].alpha_word_frac_ok
    assert not verdicts[9].mean_word_len_in_range
    for i in (1, 2, 3, 4, 5, 6, 7, 9):
        assert verdicts[i].keep is False
        assert verdicts[i].failed_rules != ""


def test_null_text_never_keeps(verdicts):
    r = verdicts[8]
    assert r.keep is False
    assert "words_in_range" in r.failed_rules


def test_failed_rules_attribution_sorted(verdicts):
    parts = verdicts[8].failed_rules.split(",")
    assert parts == sorted(parts)  # deterministic order


def test_params_are_tunable(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [GOOD]}))
    strict = quality_filter(
        df, "text", id_col="doc_id",
        params=QualityParams(min_words=1000),
    ).first()
    assert strict.keep is False and "words_in_range" in strict.failed_rules


def test_keep_rate_aggregate(spark, verdicts):
    docs = [(i, v) for i, v in enumerate(
        [GOOD] * 3 + ["too short"] * 1
    )]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    r = keep_rate(df, "text").first()
    assert (r.n_docs, r.n_kept, r.keep_rate) == (4, 3, 0.75)
    assert r.fail_words_in_range == 1 and r.fail_punct_ratio_ok == 0


def test_filter_is_pure_projection(spark):
    """Scale shape: the verdict is a pure JVM projection — no shuffle
    (no Exchange in the physical plan)."""
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [GOOD]}))
    plan = quality_filter(df, "text", id_col="doc_id")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan


def test_quality_invariants_random_text(spark):
    """Property pass over adversarial text shapes: keep == AND(rules),
    failed_rules lists exactly the false rules in sorted order, and the
    filter never throws on weird inputs."""
    import random

    rng = random.Random(7)
    weird = [
        "", " ", "\n\n\n", "....", "• • •", "a" * 5000,
        "1 2 3 4 5 6 7 8 9 10 11 12",
        "\x00\x01\x02", "日本語のテキストです " * 20,
        " ".join(rng.choice(["the", "and", "of", "xyz", "123", "!!!"])
                 for _ in range(200)),
        "- one\n- two\n- three\n- four",
        "line...\nline...\nline...\n",
        None,
    ]
    pdf = pd.DataFrame({"doc_id": range(len(weird)), "text": weird})
    rows = quality_filter(
        spark.createDataFrame(pdf), "text", id_col="doc_id"
    ).collect()
    rule_cols = [c for c in rows[0].asDict()
                 if c not in ("id", "keep", "failed_rules")]
    for r in rows:
        d = r.asDict()
        assert d["keep"] == all(d[c] for c in rule_cols)
        want_failed = sorted(c for c in rule_cols if not d[c])
        got = d["failed_rules"].split(",") if d["failed_rules"] else []
        assert got == want_failed
