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


# ------------------------------------------------------- n-gram repetition


def _py_repetition(text, top_ns=(2, 3, 4), dup_ns=(5, 6, 7, 8, 9, 10)):
    """Streaming pure-Python reference of ngram_repetition's contract
    (normalize -> whitespace tokens -> char-coverage fractions)."""
    import re
    from collections import Counter

    norm = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    toks = norm.split(" ") if norm else []
    if not toks:
        return None
    tc = sum(len(t) for t in toks)
    out = {}
    for kind, ns in (("top", top_ns), ("dup", dup_ns)):
        for n in ns:
            grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
            cnt = Counter(grams)
            if not grams:
                out[f"{kind}_{n}_char_frac"] = 0.0
                continue
            if kind == "top":
                best = max(cnt.items(), key=lambda kv: (
                    kv[1], len(kv[0]) - (n - 1), kv[0]
                ))
                out[f"top_{n}_char_frac"] = round(
                    best[1] * (len(best[0]) - (n - 1)) / tc, 6
                )
            else:
                dup_chars = sum(
                    c * (len(g) - (n - 1)) for g, c in cnt.items() if c > 1
                )
                out[f"dup_{n}_char_frac"] = round(dup_chars / tc, 6)
    return out


def test_ngram_repetition_hand_case(spark):
    from advanced_data_profile_spark.operators.quality import ngram_repetition

    # "ab cd ab cd ef": bigram "ab cd" occurs 2x of 4 bigrams;
    # chars: ab+cd+ab+cd+ef = 10; top-2 coverage = 2*4/10 = 0.8
    df = spark.createDataFrame(
        [(1, "ab cd ab cd ef"), (2, "all tokens unique here now")],
        "doc_id long, text string",
    )
    out = {r.id: r for r in ngram_repetition(
        df, "doc_id", "text", top_ns=(2,), dup_ns=(2,)
    ).collect()}
    assert out[1].top_2_char_frac == 0.8
    assert out[1].dup_2_char_frac == 0.8
    # all bigrams unique: top coverage = the longest bigram's chars
    # over total chars ("tokens unique" = 12 of 22), dup coverage = 0
    assert out[2].top_2_char_frac == round(12 / 22, 6)
    assert out[2].dup_2_char_frac == 0.0


def test_ngram_repetition_matches_python_reference(spark):
    import random

    from advanced_data_profile_spark.operators.quality import ngram_repetition

    rng = random.Random(17)
    words = ["spam", "ham", "eggs", "foo", "bar", "baz", "qux"]
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randint(1, 60)))
        for _ in range(40)
    ] + ["repeat me " * 30, "x", ""]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.id: r.asDict() for r in ngram_repetition(df, "doc_id", "text").collect()}
    for i, t in enumerate(texts):
        want = _py_repetition(t)
        if want is None:
            assert i not in got  # empty docs excluded
            continue
        g = got[i]
        for k, v in want.items():
            assert abs(g[k] - v) < 1e-9, (i, k, g[k], v)


def test_repetition_filter_thresholds(spark):
    from advanced_data_profile_spark.operators.quality import repetition_filter

    # NB: Gopher's top-n-gram thresholds presuppose web-page-length
    # documents (a count-1 n-gram trivially covers >16% of a 15-word
    # doc) — which is why repetition_filter composes with
    # quality_filter's min_words gate rather than replacing it
    varied = " ".join(f"word{i} item{i * 7 % 97}" for i in range(60))
    df = spark.createDataFrame(
        [(1, "the same phrase " * 40), (2, varied)],
        "doc_id long, text string",
    )
    out = {r.id: r for r in repetition_filter(df, "doc_id", "text").collect()}
    assert out[1].repetition_keep is False
    assert out[2].repetition_keep is True


def test_char_lm_perplexity_hand_computed(spark):
    """Add-alpha arithmetic pinned exactly: train on 'ab' alone ->
    model {(##,a):1, (#a,b):1}; scoring 'ab' gives P = (1+0.1)/(1+3.7)
    per position, so ppl = 4.7/1.1 exactly."""
    from advanced_data_profile_spark.operators.quality import (
        char_lm_perplexity,
        train_char_lm,
    )

    ref = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    model = train_char_lm(ref, "text")
    rows = {(r.ctx, r.ch): r.cnt for r in model.collect()}
    assert rows == {("##", "a"): 1, ("#a", "b"): 1}
    out = char_lm_perplexity(
        spark.createDataFrame([(1, "ab")], "doc_id long, text string"),
        "doc_id", "text", model,
    ).collect()[0]
    import math

    expected_logp = math.log(1.1 / 4.7)
    assert out.n_chars == 2
    assert out.avg_logp == pytest.approx(expected_logp, rel=1e-12)
    assert out.ppl == pytest.approx(4.7 / 1.1, rel=1e-12)


def test_char_lm_perplexity_separates_gibberish(spark):
    """The CCNet property: reference-like text scores LOW perplexity,
    character-level gibberish scores HIGH — the quantile cut a
    curation pipeline filters on. Unseen contexts back off to the
    alpha/(alpha*V) floor instead of -inf."""
    from advanced_data_profile_spark.operators.quality import (
        char_lm_perplexity,
        train_char_lm,
    )

    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog and runs "
              "through the green fields today with many friends")
         for i in range(10)],
        "doc_id long, text string",
    )
    model = train_char_lm(ref, "text")
    test = spark.createDataFrame(
        [
            (1, "the brown dog runs through the fields with the fox"),
            (2, "zxqj vwkp qqzx jjvv wxyz kqpz xxjq zzvk pqwz jxqv"),
            (3, ""),  # empty after norm -> no output row
        ],
        "doc_id long, text string",
    )
    out = {r.id: r for r in char_lm_perplexity(
        test, "doc_id", "text", model).collect()}
    assert set(out) == {1, 2}
    assert out[1].ppl < 8 < out[2].ppl
    assert all(r.avg_logp == r.avg_logp for r in out.values())  # no NaN


def test_char_lm_perplexity_plan_broadcasts_model(spark):
    """Scale contract: the model relations join as broadcasts (the
    document side never shuffles for the lookup); the only shuffle is
    the final per-document aggregation."""
    from advanced_data_profile_spark.operators.quality import (
        char_lm_perplexity,
        train_char_lm,
    )

    ref = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    model = train_char_lm(ref, "text")
    out = char_lm_perplexity(
        spark.createDataFrame([(1, "the lazy dog")], "doc_id long, text string"),
        "doc_id", "text", model,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2  # model + ctx totals
    assert "SortMergeJoin" not in plan


def test_train_char_lm_by_lang_partitions_counts(spark):
    """One scan, per-language models: counts land under their own
    language key and never mix."""
    from advanced_data_profile_spark.operators.quality import (
        train_char_lm_by_lang,
    )

    ref = spark.createDataFrame(
        [("en", "ab"), ("fr", "cd")], "lang string, text string"
    )
    model = train_char_lm_by_lang(ref, "text", "lang")
    rows = {(r.lang, r.ctx, r.ch): r.cnt for r in model.collect()}
    assert rows == {
        ("en", "##", "a"): 1, ("en", "#a", "b"): 1,
        ("fr", "##", "c"): 1, ("fr", "#c", "d"): 1,
    }


def test_char_lm_perplexity_by_lang_hand_computed(spark):
    """Same add-alpha arithmetic as the single-model scorer, with the
    language riding the lookup key: a doc of a modeled language scores
    exactly as under its own standalone model (ppl 4.7/1.1 for 'ab'
    under the 'ab' model); a doc of an UNMODELED language misses every
    (lang, ctx, ch) and (lang, ctx) lookup, scoring the smoothed floor
    alpha/(alpha*37) per char — ppl exactly 37 — with modeled=False
    flagging it (the silent-corpus-failure guard)."""
    from advanced_data_profile_spark.operators.quality import (
        char_lm_perplexity_by_lang,
        train_char_lm_by_lang,
    )

    ref = spark.createDataFrame(
        [("en", "ab"), ("fr", "cd")], "lang string, text string"
    )
    model = train_char_lm_by_lang(ref, "text", "lang")
    docs = spark.createDataFrame(
        [(1, "en", "ab"), (2, "de", "ab")],
        "doc_id long, lang string, text string",
    )
    out = {r.id: r for r in char_lm_perplexity_by_lang(
        docs, "doc_id", "text", model, lang_col="lang").collect()}
    assert out[1].modeled and out[1].lang == "en"
    assert out[1].ppl == pytest.approx(4.7 / 1.1, rel=1e-12)
    assert not out[2].modeled and out[2].lang == "de"
    assert out[2].ppl == pytest.approx(37.0, rel=1e-12)


def test_char_lm_perplexity_by_lang_auto_lang_predict(spark):
    """lang_col=None derives labels with lang_predict (the production
    shape): English and Spanish reference corpora train side-by-side
    in one scan, and each test doc is scored under ITS OWN language's
    model — the en doc scores far lower under by-lang scoring than the
    es model would give it, and vice versa."""
    from advanced_data_profile_spark.functions.text import lang_predict
    from advanced_data_profile_spark.operators.quality import (
        char_lm_perplexity_by_lang,
        train_char_lm_by_lang,
    )

    en = "the quick brown fox jumps over the lazy dog and runs today"
    es = "el hombre que vive en la casa con los perros y para ellos"
    ref = spark.createDataFrame(
        [(i, en) for i in range(5)] + [(i + 5, es) for i in range(5)],
        "doc_id long, text string",
    ).withColumn("lang", lang_predict(F.col("text")))
    model = train_char_lm_by_lang(ref, "text", "lang")
    docs = spark.createDataFrame(
        [(1, "the brown dog runs over the fox"),
         (2, "el perro vive en la casa con el hombre")],
        "doc_id long, text string",
    )
    out = {r.id: r for r in char_lm_perplexity_by_lang(
        docs, "doc_id", "text", model).collect()}
    assert out[1].lang == "en" and out[1].modeled
    assert out[2].lang == "es" and out[2].modeled
    assert out[1].ppl < 15 and out[2].ppl < 15


def test_ppl_language_buckets_per_language_cuts(spark):
    """Head/middle/tail are cut at each language's OWN terciles: two
    languages whose ppl scales differ by 100x still split 3/3/3, and a
    language absent from explicit thresholds buckets 'unmodeled'."""
    from advanced_data_profile_spark.operators.quality import (
        ppl_language_buckets,
    )

    rows = [(f"a{i}", "a", float(i)) for i in range(1, 10)] + [
        (f"b{i}", "b", float(i * 100)) for i in range(1, 10)
    ]
    scored = spark.createDataFrame(rows, "id string, lang string, ppl double")
    out = ppl_language_buckets(scored).collect()
    by_lang: dict = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r.bucket)
    for lang in ("a", "b"):
        from collections import Counter

        assert Counter(by_lang[lang]) == {"head": 3, "middle": 3, "tail": 3}
    # explicit stored thresholds: missing language -> 'unmodeled'
    th = spark.createDataFrame(
        [("a", 3.6667, 6.3334)], "lang string, ppl_lo double, ppl_hi double"
    )
    out2 = {r.id: r.bucket for r in ppl_language_buckets(
        scored, thresholds=th).collect()}
    assert out2["a1"] == "head" and out2["a9"] == "tail"
    assert all(out2[f"b{i}"] == "unmodeled" for i in range(1, 10))


def test_char_lm_by_lang_plan_broadcasts_model(spark):
    """Scale contract unchanged from the single-model scorer: model,
    ctx totals, and the modeled-language flag all join as broadcasts;
    no SortMergeJoin anywhere."""
    from advanced_data_profile_spark.operators.quality import (
        char_lm_perplexity_by_lang,
        train_char_lm_by_lang,
    )

    ref = spark.createDataFrame(
        [("en", "the quick brown fox")], "lang string, text string"
    )
    model = train_char_lm_by_lang(ref, "text", "lang")
    out = char_lm_perplexity_by_lang(
        spark.createDataFrame(
            [(1, "en", "the fox")], "doc_id long, lang string, text string"
        ),
        "doc_id", "text", model, lang_col="lang",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_curate_corpus_per_language_ppl_mode(spark):
    """A ppl_model carrying a lang column flips the funnel's fifth
    stage to per-language scoring: reference-like docs of modeled
    languages keep, gibberish fails on ppl, and docs of unmodeled
    languages fail EXPLICITLY (modeled=False) instead of silently
    scoring the floor."""
    from advanced_data_profile_spark.operators.curation import curate_corpus
    from advanced_data_profile_spark.operators.quality import (
        train_char_lm_by_lang,
    )

    en = ("the quick brown fox jumps over the lazy dog and runs through "
          "the green fields today with many friends in the warm sun")
    es = ("el hombre que vive en la casa grande con los perros y para "
          "ellos trabaja cada dia en el campo verde con sus amigos")
    ref = spark.createDataFrame(
        [("en", en), ("es", es)], "lang string, text string"
    )
    model = train_char_lm_by_lang(ref, "text", "lang")
    docs = spark.createDataFrame(
        [
            (1, "en", en + " " + en),
            (2, "es", es + " " + es),
            (3, "en", " ".join(
                "zxqj vwkp qqzx jjvv wxyz kqpz xxjq zzvk".split() * 8
            )),
            (4, "de", ("das ist nicht der fall und ich bin ein mensch mit "
                       "den anderen leuten hier im haus ") * 2),
        ],
        "doc_id long, lang string, text string",
    )
    out = {r.id: r for r in curate_corpus(
        docs, "doc_id", "text", ppl_model=model, max_ppl=15.0,
        ppl_lang_col="lang",
    ).collect()}
    assert out[1].keep_perplexity and out[2].keep_perplexity
    assert not out[3].keep_perplexity   # gibberish: high ppl
    assert not out[4].keep_perplexity   # unmodeled language: explicit fail


def test_ppl_thresholds_from_stored_kll_state(spark, tmp_path):
    """The stored-state threshold path: per-language ppl KLL sketches
    persist to parquet (two batches, merged at read time), and the
    cuts read off the merged state land within the sketch's rank error
    of the exact terciles — so next epoch's buckets need no second
    pass over this epoch's scores."""
    from advanced_data_profile_spark.operators.quality import (
        ppl_language_buckets,
        ppl_sketch_state,
        ppl_thresholds_from_sketches,
    )

    rows = [(f"a{i}", "a", float(i)) for i in range(1, 100)]
    scored = spark.createDataFrame(rows, "id string, lang string, ppl double")
    path = str(tmp_path / "ppl_state")
    # two batches sketched independently -> merged at threshold time
    ppl_sketch_state(scored.where("ppl <= 50")).write.mode(
        "append").parquet(path)
    ppl_sketch_state(scored.where("ppl > 50")).write.mode(
        "append").parquet(path)
    th = ppl_thresholds_from_sketches(spark.read.parquet(path)).collect()
    assert len(th) == 1 and th[0].lang == "a"
    # exact terciles of 1..99 are 33.67/66.33; KLL at k=200 with 99
    # values stores everything, so the cuts are order statistics
    assert abs(th[0].ppl_lo - 33.67) <= 3.0
    assert abs(th[0].ppl_hi - 66.33) <= 3.0
    out = ppl_language_buckets(
        scored, thresholds=spark.read.parquet(path).transform(
            lambda s: ppl_thresholds_from_sketches(s)
        )
    )
    from collections import Counter

    counts = Counter(r.bucket for r in out.collect())
    assert set(counts) == {"head", "middle", "tail"}
    assert all(28 <= c <= 38 for c in counts.values())


def test_merge_char_lm_models_incremental_equals_one_pass(spark, tmp_path):
    """n-gram counts are additive: per-batch models appended to stored
    state and merged are BIT-IDENTICAL to one-pass training on the
    union — the reference LM grows without a corpus rescan. Both model
    shapes (single and per-language)."""
    from advanced_data_profile_spark.operators.quality import (
        char_lm_perplexity,
        merge_char_lm_models,
        train_char_lm,
        train_char_lm_by_lang,
    )

    b1 = spark.createDataFrame(
        [(0, "the quick brown fox"), (1, "jumps over the dog")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(2, "the lazy dog sleeps"), (3, "quick foxes jump")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "lm_state")
    train_char_lm(b1, "text").write.mode("append").parquet(path)
    train_char_lm(b2, "text").write.mode("append").parquet(path)
    merged = merge_char_lm_models(spark.read.parquet(path))
    union = train_char_lm(b1.unionByName(b2), "text")
    assert (
        sorted((r.ctx, r.ch, r.cnt) for r in merged.collect())
        == sorted((r.ctx, r.ch, r.cnt) for r in union.collect())
    )
    # scoring under merged state == scoring under the one-pass model
    docs = spark.createDataFrame([(9, "the dog")], "doc_id long, text string")
    a = char_lm_perplexity(docs, "doc_id", "text", merged).first()
    b = char_lm_perplexity(docs, "doc_id", "text", union).first()
    assert a.ppl == b.ppl and a.avg_logp == b.avg_logp
    # per-language shape merges on (lang, ctx, ch)
    l1 = b1.withColumn("lang", F.lit("en"))
    l2 = b2.withColumn("lang", F.lit("en"))
    m = merge_char_lm_models(
        train_char_lm_by_lang(l1, "text", "lang").unionByName(
            train_char_lm_by_lang(l2, "text", "lang")
        )
    )
    u = train_char_lm_by_lang(l1.unionByName(l2), "text", "lang")
    assert (
        sorted(tuple(r) for r in m.collect())
        == sorted(tuple(r) for r in u.collect())
    )


def test_quality_signals_values(spark):
    """Hand-computed signal values on crafted documents (the RPv2-style
    continuous relation: measurements, no thresholds)."""
    from advanced_data_profile_spark.operators.quality import quality_signals

    docs = [
        (1, "The cat sat. The cat sat again!\nSee the {x} list...\n"
            "- bullet item\nNASA and IBM ship JavaScript today."),
        (2, "lorem ipsum lorem ipsum"),
        (3, ""),
        (4, None),
        (5, "unique words only here"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    by = {r.id: r for r in quality_signals(df, "doc_id", "text").collect()}

    r1 = by[1]
    assert r1.num_lines == 4
    # maximal [.!?]+ runs: "sat.", "again!", "...", "today." -> 4
    assert r1.num_sentences == 4
    assert r1.frac_lines_start_bullet == 0.25   # the "- bullet" line
    assert r1.frac_lines_end_ellipsis == 0.25   # the "..." line
    # lines ending [.!?"]: line1 "!", line4 "." -> 2/4 ("..." ends '.')
    assert r1.frac_lines_end_terminal_punct == 0.75
    assert r1.javascript_count == 1
    assert r1.frac_chars_curly_bracket == round(2 / r1.char_count, 6)
    # raw all-caps words: NASA, IBM of 20 raw whitespace tokens
    assert r1.frac_all_caps_words == round(2 / 20, 6)
    # normalized words: the bare "-" bullet marker normalizes away
    assert r1.word_count == 19 and r1.unigram_entropy > 0

    r2 = by[2]
    assert r2.lorem_ipsum_count == 2
    assert r2.word_count == 4 and r2.frac_unique_words == 0.5
    # two words, two each: entropy = ln 2
    import math
    assert r2.unigram_entropy == round(math.log(2), 6)
    assert r2.stop_word_fraction == 0.0

    for nid in (3, 4):  # empty and NULL text: all-zero row survives
        r = by[nid]
        assert r.word_count == 0 and r.char_count == 0
        assert r.unigram_entropy == 0.0 and r.punct_ratio == 0.0

    r5 = by[5]
    assert r5.frac_unique_words == 1.0
    assert r5.unigram_entropy == round(math.log(4), 6)
    assert r5.frac_no_alpha_words == 0.0
