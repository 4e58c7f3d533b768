"""Heavier text kernels: word frequencies, TF-IDF top n-grams,
readability (SURVEY.md N1-N4; reference Profiler.py:800-864).

Word frequencies and readability are pure column expressions. TF-IDF is
sklearn-PARITY (the reference's TfidfVectorizer(ngram_range=(1,3))
defaults: raw TF, smooth idf = ln((1+n)/(1+df)) + 1, per-document l2
norm, column means over all docs), built from plain DataFrame ops —
explode + aggregations + a window — so the whole pipeline stays
JVM-side and is value-oracled against DuckDB SQL. Only deviation: the
tokenizer's ``\\w`` is interpreted ASCII so Spark and the oracle agree
byte-for-byte (sklearn's unicode ``\\w`` differs on non-ASCII word
chars only).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from advanced_data_profile_spark.functions.text import tokens


def marker_predict_series(texts) -> pd.Series:
    """Python mirror of functions.text.lang_predict (script rules, then
    marker argmax with first-alphabetical tie-break) — the model-absent
    fallback for lang_id_distinct. Same single-source constants, so the
    two paths agree token-for-token."""
    import re

    from advanced_data_profile_spark.functions.text import LANG_MARKERS, SCRIPT_RULES

    markers = {lang: set(ws) for lang, ws in LANG_MARKERS.items()}
    langs = sorted(markers)
    script_res = [(lang, re.compile(p)) for lang, p in SCRIPT_RULES]
    norm_re = re.compile(r"[^a-z0-9]+")

    def one(t) -> str:
        if t is None:
            return "und"
        for lang, rx in script_res:
            if rx.search(t):
                return lang
        toks = [w for w in norm_re.sub(" ", t.lower()).strip().split(" ") if w]
        best_lang, best_score = "und", 0
        for lang in langs:
            s = sum(1 for w in toks if w in markers[lang])
            if s > best_score:
                best_lang, best_score = lang, s
        return best_lang if best_score > 0 else "und"

    return pd.Series([one(t) for t in texts], dtype="object")


# per-Python-worker model cache: mapInPandas reuses worker processes, so
# the ~130 MB lid.176 model loads ONCE per worker, not once per Arrow
# batch; path from ADP_FASTTEXT_MODEL (shipped via --files on a cluster)
_FASTTEXT_MODEL = None


def _fasttext_predict(texts) -> pd.Series:  # pragma: no cover - needs fasttext
    global _FASTTEXT_MODEL
    if _FASTTEXT_MODEL is None:
        import os

        import fasttext

        _FASTTEXT_MODEL = fasttext.load_model(
            os.environ.get("ADP_FASTTEXT_MODEL", "lid.176.bin")
        )
    labels = [
        _FASTTEXT_MODEL.predict(t.replace("\n", " "))[0][0].removeprefix("__label__")
        if t else "und"
        for t in texts
    ]
    return pd.Series(labels, dtype="object")


def lang_id_distinct(
    df: DataFrame,
    text_col: str,
    predict_fn=None,
    out_col: str = "lang_pred",
) -> DataFrame:
    """Language ID over DISTINCT text values via mapInPandas, joined
    back — the SURVEY §2.4 shape mirroring the reference's
    `detect_language` over unique values (Profiler.py:226-259): web
    corpora are duplicate-heavy, so the (expensive, Python-side) model
    runs once per distinct value, and the join back to rows is a plain
    equi-join Catalyst can shuffle-plan.

    predict_fn: pd.Series[str] -> pd.Series[str] batch model. Default:
    fasttext lid.176 when importable (production), else the marker
    heuristic mirror (identical to the JVM-side lang_predict)."""
    if predict_fn is None:
        try:  # pragma: no cover - fasttext absent in this container
            import fasttext  # noqa: F401

            predict_fn = _fasttext_predict
        except ImportError:
            predict_fn = marker_predict_series

    distinct = df.select(F.col(text_col).alias("__text")).distinct()

    def fn(it):
        for pdf in it:
            yield pd.DataFrame({
                "__text": pdf["__text"],
                out_col: predict_fn(pdf["__text"]),
            })

    labeled = distinct.mapInPandas(fn, schema=f"__text string, {out_col} string")
    joined = df.join(labeled, df[text_col] == labeled["__text"], "left").drop("__text")
    # null texts never join (null != null) — they are 'und' by definition
    return joined.withColumn(out_col, F.coalesce(F.col(out_col), F.lit("und")))


def language_profile(df: DataFrame, text_col: str, k: int = 5) -> DataFrame:
    """Per-COLUMN top-k (language, confidence) pairs — the reference's
    "Languages Detected with Confidence" field (Profiler.py:663-673:
    per-unique-text detection, dedup by language keeping the
    highest-confidence entry, top 5 by confidence desc). Spark shape:
    lang_top_k expression (JVM-side projection) → explode → max(conf)
    per language → TakeOrderedAndProject. No distinct() — max(conf) is
    duplicate-insensitive, so the result is identical to the
    reference's per-unique-text pass while the only shuffle is the
    narrow (lang, conf) aggregation with map-side combine; a distinct
    would shuffle full text payloads for nothing.

    Confidence semantics: under the built-in heuristic, conf is a
    normalized marker-hit SHARE, not a calibrated probability — see
    functions.text.lang_top_k's calibration contract for the four
    characterized divergences from fasttext-style probabilities
    (mixture-proportional splits, no length calibration, script-rule
    100s, marker-bearing languages only). Report consumers should
    read the percentage as "share of language evidence", not
    P(lang | text)."""
    from advanced_data_profile_spark.functions.text import lang_top_k

    return (
        df.select(F.col(text_col).alias("__text"))
        .where(F.col("__text").isNotNull())
        .select(F.explode(lang_top_k(F.col("__text"), k)).alias("e"))
        .groupBy(F.col("e.lang").alias("lang"))
        .agg(F.max("e.conf").alias("conf"))
        .orderBy(F.desc("conf"), F.asc("lang"))
        .limit(k)
    )


def word_frequencies(df: DataFrame, text_col: str, top: int = 50) -> DataFrame:
    """Global word counts, top-k (the word-cloud data, N2) — explode +
    partial-agg count + TakeOrderedAndProject."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(top)
    )


def flesch_reading_ease(df: DataFrame, text_col: str) -> DataFrame:
    """Flesch reading ease per the public formula
    206.835 - 1.015*(words/sentences) - 84.6*(syllables/word), with a
    vowel-group syllable approximation (textstat is not in this
    container; the approximation is a documented deviation, SURVEY N3).
    Returns the mean over texts with >= 5 words (reference P5 guard,
    Profiler.py:336-338), else 0."""
    c = F.col(text_col)
    t = tokens(c)
    n_words = F.size(t)
    sentences = F.greatest(
        F.size(F.split(c, r"[.!?]+")) - 1, F.lit(1)
    )
    # syllables ~ number of vowel groups per word (min 1 per word)
    syl = F.aggregate(
        t,
        F.lit(0).cast("bigint"),
        lambda acc, w: acc + F.greatest(
            F.size(F.split(w, "[aeiouy]+")) - 1, F.lit(1)
        ),
    )
    score = (
        F.lit(206.835)
        - 1.015 * (n_words.cast("double") / sentences)
        - 84.6 * (syl.cast("double") / n_words)
    )
    guarded = F.when(n_words >= 5, score).otherwise(0.0)
    return df.agg(F.round(F.avg(guarded), 4).alias("mean_flesch"))


_TS_PUNCT = r"\p{Punct}"  # Java \p{Punct} == Python string.punctuation


def _ts_words(c) -> "F.Column":
    """textstat lexicon: lowercase, strip ASCII punctuation, split on
    whitespace, drop empties (str.split() semantics — the pinned
    interpretation)."""
    return F.filter(
        F.split(F.regexp_replace(F.lower(c), _TS_PUNCT, ""), r"\s+"),
        lambda w: F.length(w) > 0,
    )


def _ts_syllables_word(w) -> "F.Column":
    """The classic public textstat/Lingua::EN syllable heuristic for
    one lowercased punctuation-free word: count vowel-group starts
    (vowels = aeiouy), minus one for a trailing 'e', plus one for a
    trailing consonant+'le', floor at one. split() on vowel runs
    counts exactly the group starts (leading/trailing empties cancel
    in size-1)."""
    base = F.size(F.split(w, "[aeiouy]+")) - 1
    minus_e = F.when(w.endswith("e"), F.lit(1)).otherwise(F.lit(0))
    plus_le = F.when(w.rlike("[^aeiouy]le$"), F.lit(1)).otherwise(F.lit(0))
    return F.greatest(base - minus_e + plus_le, F.lit(1))


def _ts_sentence_count(c) -> "F.Column":
    """textstat sentence_count: regex-find sentence chunks
    (\\b[^.!?]+[.!?]*), ignore chunks of <= 2 words, floor at one.
    ASCII \\b interpretation pinned (Java and Python agree on the
    ASCII fixtures the parity test uses)."""
    sents = F.regexp_extract_all(c, F.lit(r"\b[^.!?]+[.!?]*"), F.lit(0))
    valid = F.filter(sents, lambda s: F.size(_ts_words(s)) > 2)
    return F.greatest(F.size(valid), F.lit(1))


def _py_round(x, digits: int) -> "F.Column":
    """Python round(x, digits) for doubles, as a JVM expression.

    Neither F.bround nor F.rint(x*scale) is a faithful mirror:
    - bround goes through BigDecimal.valueOf (shortest DECIMAL repr),
      so bround(23/20., 1) = 1.2 while CPython rounds the exact BINARY
      value 1.14999999999999995... down to 1.1 — an 8.46-point Flesch
      shift through the 84.6*ASW term;
    - rint(x*10) fails on the same input because the *10 multiply
      itself rounds 11.4999999999999995... up onto exactly 11.5.

    Faithful scheme: y = x*scale; when y is not exactly on a .5
    midpoint, rint(y) agrees with CPython (a disagreement would
    require the multiply to cross the midpoint, which leaves y exactly
    ON it). On the midpoint, recover the true side from an EXACT
    decomposition of the product: scale*x written as a sum of
    power-of-two multiples (8x+2x for 10, 64x+32x+4x for 100), each
    term exact, with the leading subtraction (8x - y) exact by
    Sterbenz. The sign of the compensated sum tells whether the exact
    product sits above or below the midpoint; zero means a true tie ->
    half-even (rint). For scale=100 the three-term sum rounds once
    mid-sum, so a sub-ulp misclassification is possible there — that
    path only decides the final 2-digit rounding of the score (max
    0.01 shift); the impactful 1-digit ASL/ASW roundings are exact."""
    if digits == 1:
        parts = [8.0, 2.0]
    elif digits == 2:
        parts = [64.0, 32.0, 4.0]
    else:
        raise ValueError("only digits 1 and 2 are used here")
    scale = float(10 ** digits)
    y = x * F.lit(scale)
    base = F.rint(y)
    is_half = (y - F.floor(y)) == F.lit(0.5)
    delta = x * F.lit(parts[0]) - y
    for p in parts[1:]:
        delta = delta + x * F.lit(p)
    n = F.when(~is_half, base).otherwise(
        F.when(delta > 0, F.floor(y) + F.lit(1.0))
        .when(delta < 0, F.floor(y).cast("double"))
        .otherwise(base)
    )
    return n / F.lit(scale)


def textstat_flesch_column(c) -> "F.Column":
    """Per-row Flesch reading ease under the textstat-legacy-exact
    discipline (reference Profiler.py:855-860 calls
    textstat.flesch_reading_ease; the pyphen-based modern textstat
    needs hyphenation dictionaries this container lacks, so the
    EXACT mode pins the classic public algorithm the library's legacy
    versions shipped): ASL and ASW each rounded to 1 decimal BEFORE
    the formula and the result to 2, exactly as the library does —
    with CPython's round() semantics mirrored via _py_round (see its
    docstring for why bround would diverge on tie ratios like 23
    syllables / 20 words). NULL when the row has no words."""
    words = _ts_words(c)
    n_words = F.size(words)
    syl = F.aggregate(
        F.transform(words, _ts_syllables_word),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    asl = _py_round(n_words.cast("double") / _ts_sentence_count(c), 1)
    asw = _py_round(syl.cast("double") / n_words, 1)
    score = _py_round(F.lit(206.835) - 1.015 * asl - 84.6 * asw, 2)
    return F.when(n_words > 0, score)


def flesch_reading_ease_textstat(df: DataFrame, text_col: str) -> DataFrame:
    """Exact-mode sibling of flesch_reading_ease: same >= 5 word guard
    and mean aggregation, textstat-legacy-exact per-row scores.
    Parity-pinned in tests against an independent pure-Python
    transcription of the public algorithm (differential test — the
    library itself is not installed here)."""
    c = F.col(text_col)
    guarded = F.when(
        F.size(_ts_words(c)) >= 5, textstat_flesch_column(c)
    ).otherwise(0.0)
    return df.agg(F.round(F.avg(guarded), 4).alias("mean_flesch_textstat"))


def char_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Aggregate character / letter / monosyllable-ish counts (N4) —
    sum of per-row counts (equivalent to the reference's concat-then-
    count for these metrics)."""
    c = F.col(text_col)
    cleaned = F.regexp_replace(c, "[^a-zA-Z\\s]", "")
    t = tokens(c)
    syl_per_word = F.transform(
        t, lambda w: F.greatest(F.size(F.split(w, "[aeiouy]+")) - 1, F.lit(1))
    )
    mono = F.size(F.filter(syl_per_word, lambda s: s == 1))
    poly = F.size(F.filter(syl_per_word, lambda s: s >= 3))
    return df.agg(
        F.sum(F.length(c)).alias("n_chars"),
        F.sum(F.length(cleaned) ).alias("n_letters_ws"),
        F.sum(mono).cast("bigint").alias("n_monosyllable_words"),
        F.sum(poly).cast("bigint").alias("n_polysyllable_words"),
    )


def sklearn_tokens(c) -> "F.Column":
    """The reference's tokenizer (sklearn TfidfVectorizer default
    token_pattern ``\\b\\w\\w+\\b``, lowercase=True), interpreted ASCII:
    maximal runs of [a-z0-9_] of length >= 2 after lowercasing. ASCII
    interpretation is pinned so Spark (Java regex) and the DuckDB
    oracle (RE2) tokenize byte-identically; sklearn's unicode ``\\w``
    differs only on non-ASCII word chars (documented deviation)."""
    return F.filter(
        F.split(F.lower(c), "[^a-z0-9_]+"),
        lambda t: F.length(t) >= 2,
    )


def word_ngrams(toks, n: int):
    """Space-joined word n-grams of a token array — pure JVM-side
    higher-order functions, no ml transformer.

    Elementwise concat fold over n shifted copies (row-scope
    references), not a transform lambda capturing `toks`: interpreted
    HOF lambdas re-evaluate captured outer expressions per element,
    turning the tokenization chain quadratic (see
    functions/text.char_ngrams)."""
    if n == 1:
        return toks
    grams = toks
    for j in range(1, n):
        shifted = F.slice(
            toks, j + 1, F.greatest(F.size(toks) - j, F.lit(1))
        )
        grams = F.zip_with(
            grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.when(
        F.size(toks) >= n, F.slice(grams, 1, F.size(toks) - n + 1)
    ).otherwise(F.array().cast("array<string>"))


def tfidf_top_ngrams(
    df: DataFrame, text_col: str, ngrams: tuple[int, ...] = (1, 2, 3),
    top: int = 20,
) -> DataFrame:
    """Top n-grams by mean TF-IDF across documents, sklearn-PARITY
    (reference Profiler.py:800-809, TfidfVectorizer(ngram_range=(1,3))
    defaults): raw-count TF, smooth idf = ln((1+n_docs)/(1+df)) + 1,
    per-document l2 normalization, mean over ALL docs (zeros included,
    = sum/n_docs), top-k by mean desc then ngram asc (sklearn's stable
    sort over the alphabetical vocabulary).

    Scale shape: explode n-grams -> one (doc, term) count aggregation
    (map-side partial agg collapses the token fan-out), per-term df agg
    joined back on term, per-doc l2 norm via a window on doc, final
    per-term mean + TakeOrderedAndProject. The vocabulary is never
    materialized driver-side (the ml CountVectorizer path collects it);
    only the final top-k rows reach the driver."""
    src = df.where(F.col(text_col).isNotNull())
    n_docs = src.count()
    spark = df.sparkSession
    if n_docs == 0:
        return spark.createDataFrame([], "ngram string, mean_tfidf double")
    toks = sklearn_tokens(F.col(text_col))
    grams = F.flatten(F.array(*[word_ngrams(toks, n) for n in ngrams]))
    # doc id BEFORE the explode (separate projection so the
    # nondeterministic id is pinned per input row, never re-evaluated
    # per exploded row)
    docs = src.select(
        F.monotonically_increasing_id().alias("__doc"), grams.alias("__grams")
    )
    tf = (
        docs.select("__doc", F.explode("__grams").alias("ngram"))
        .groupBy("__doc", "ngram")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = tf.groupBy("ngram").agg(F.count(F.lit(1)).alias("df_t")).select(
        "ngram",
        (F.log(F.lit(float(n_docs + 1)) / (F.col("df_t") + 1)) + 1).alias("idf"),
    )
    w = tf.join(idf, "ngram").select(
        "__doc", "ngram", (F.col("tf") * F.col("idf")).alias("wt")
    )
    wdoc = Window.partitionBy("__doc")
    normed = w.withColumn(
        "u", F.col("wt") / F.sqrt(F.sum(F.col("wt") * F.col("wt")).over(wdoc))
    )
    return (
        normed.groupBy("ngram")
        .agg(F.round(F.sum("u") / n_docs, 6).alias("mean_tfidf"))
        .orderBy(F.desc("mean_tfidf"), F.asc("ngram"))
        .limit(top)
    )
