"""Gopher/C4-style heuristic document quality FILTER — the keep/drop
decision stage of a web-scale training-data pipeline (Rae et al. 2021
"Gopher" §A1.1 repetition/quality rules; Raffel et al. 2020 "C4"
heuristics), built entirely from JVM-side column expressions (regex +
higher-order array functions; the HOF lambdas evaluate outside
whole-stage codegen but stay in the JVM) — one pass over the scan, no
shuffle, no Python.

Distinct from functions.text.quality_score (a 0-1 composite for
profiling): this emits a per-document KEEP verdict plus per-rule
booleans and a deterministic failed-rule attribution string, which is
what a curation pipeline writes back / filters on. Every rule is
mirrored 1:1 in the DuckDB oracle (__spark_entry__._oracle_quality_filter).

No reference counterpart (the reference profiles single tables); this
is a training-data op the task brief's north_star engine needs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from advanced_data_profile_spark.functions.text import (
    STOPWORDS_EN,
    mean_word_length,
    punct_ratio,
    tokens,
    word_ngrams,
)


@dataclass(frozen=True)
class QualityParams:
    """Gopher-flavored defaults, loosened for short-document corpora
    (Gopher's 50-word floor is tuned for web pages; pass your own)."""

    min_words: int = 10
    max_words: int = 100_000
    min_mean_word_len: float = 2.0
    max_mean_word_len: float = 12.0
    max_punct_ratio: float = 0.30
    min_stopword_hits: int = 2       # distinct stopwords present (Gopher: >=2)
    max_dup_line_frac: float = 0.30
    max_bullet_line_frac: float = 0.90
    max_ellipsis_line_frac: float = 0.30
    min_alpha_word_frac: float = 0.70


def quality_rules(c: Column, p: QualityParams | None = None) -> dict[str, Column]:
    """Named rule -> boolean column (True = rule satisfied). Rule set:

    - words_in_range: token count within [min_words, max_words]
    - mean_word_len_in_range: mean token length sane (garbled text and
      minified blobs fall outside)
    - punct_ratio_ok: symbol share of characters bounded
    - stopword_hits_ok: >= k DISTINCT common function words present
      (Gopher's "contains 2 of the stop set" rule)
    - dup_line_frac_ok: share of repeated non-empty lines bounded
      (boilerplate / template spam)
    - bullet_line_frac_ok / ellipsis_line_frac_ok: line-shape rules
      (Gopher: <=90% bullet lines, <=30% ellipsis-terminated lines)
    - alpha_word_frac_ok: share of tokens containing a letter bounded
      below (number/symbol soup)
    """
    p = p or QualityParams()
    t = tokens(c)
    nw = F.size(t)
    lines = F.filter(F.split(c, "\n"), lambda x: F.length(F.trim(x)) > 0)
    nl = F.size(lines)
    sw = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    sw_hits = F.size(
        F.filter(F.array_distinct(t), lambda x: F.array_contains(sw, x))
    )
    dup_line_frac = F.when(
        nl > 0, 1.0 - F.size(F.array_distinct(lines)) / nl
    ).otherwise(F.lit(0.0))
    bullet_frac = F.when(
        nl > 0,
        F.size(
            F.filter(lines, lambda x: F.trim(x).rlike(r"^([-*•]|[0-9]+[.)] )"))
        ) / nl,
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        nl > 0,
        F.size(F.filter(lines, lambda x: F.rtrim(x).rlike(r"(\.\.\.|…)$"))) / nl,
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        nw > 0, F.size(F.filter(t, lambda x: x.rlike("[a-z]"))) / nw
    ).otherwise(F.lit(0.0))
    mwl = mean_word_length(c)
    return {
        "words_in_range": (nw >= p.min_words) & (nw <= p.max_words),
        "mean_word_len_in_range": (mwl >= p.min_mean_word_len)
        & (mwl <= p.max_mean_word_len),
        "punct_ratio_ok": punct_ratio(c) <= p.max_punct_ratio,
        "stopword_hits_ok": sw_hits >= p.min_stopword_hits,
        "dup_line_frac_ok": dup_line_frac <= p.max_dup_line_frac,
        "bullet_line_frac_ok": bullet_frac <= p.max_bullet_line_frac,
        "ellipsis_line_frac_ok": ellipsis_frac <= p.max_ellipsis_line_frac,
        "alpha_word_frac_ok": alpha_frac >= p.min_alpha_word_frac,
    }


def quality_filter(
    df: DataFrame, text_col: str, id_col: str | None = None,
    params: QualityParams | None = None,
) -> DataFrame:
    """Per-document verdict: id (if given), every rule boolean, `keep`
    (all rules pass; NULL text never keeps), and `failed_rules` — the
    comma-joined names of violated rules in sorted order (deterministic,
    hashable attribution a curation pipeline logs and aggregates).

    Scale shape: pure projection — the filter is a codegen'd expression
    over the scan, so `df.where(quality_filter(...).keep)` pushes work
    to the leaves with zero shuffle."""
    c = F.col(text_col)
    rules = quality_rules(c, params)
    names = sorted(rules)
    safe = {n: F.coalesce(rules[n], F.lit(False)) for n in names}
    keep = None
    for n in names:
        keep = safe[n] if keep is None else (keep & safe[n])
    failed = F.concat_ws(
        ",",
        F.filter(
            F.array(*[
                F.when(~safe[n], F.lit(n)).otherwise(F.lit(None)) for n in names
            ]),
            lambda x: x.isNotNull(),
        ),
    )
    cols = [F.col(id_col).alias("id")] if id_col else []
    cols += [safe[n].alias(n) for n in names]
    cols += [keep.alias("keep"), failed.alias("failed_rules")]
    return df.select(*cols)


def quality_signals(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Continuous per-document quality SIGNALS — the RedPajama-V2 /
    Dolma discipline (Together 2023, rps_doc_* signals; Soldaini et
    al. 2024): instead of baking thresholds into a boolean filter,
    emit the raw measurements once and let every downstream mixture
    decide its own cuts (the signals relation is reusable across
    recipes; quality_filter/QualityParams remains the thresholded
    view). One row per document:

      word_count, char_count, num_lines, num_sentences (maximal
      [.!?]+ runs), mean_word_length, frac_unique_words,
      unigram_entropy (natural-log Shannon over the word multiset —
      ln(n) - sum(c*ln c)/n), frac_all_caps_words (raw whitespace
      tokens matching ^[A-Z0-9]*[A-Z]{2,}[A-Z0-9]*$),
      frac_no_alpha_words, stop_word_fraction (occurrence share, not
      distinct hits), frac_lines_start_bullet,
      frac_lines_end_ellipsis, frac_lines_end_terminal_punct (C4's
      keep rule, as a signal), punct_ratio, symbol_to_word_ratio
      (#/ellipsis symbols per word), frac_chars_curly_bracket,
      lorem_ipsum_count, javascript_count.

    All fractions round(6) for cross-engine parity; NULL text is
    treated as '' (all-zero signals, the row survives). Scale shape:
    every signal except unigram_entropy is a pure codegen'd
    projection over the scan; the entropy leg is one explode +
    (id, word) groupBy with map-side partial agg — the same linear
    fan-out class as ngram_repetition — joined back on id. ML-model
    signals from the RPv2 set (wikipedia/books importance) are
    covered by the char-LM perplexity family (char_lm_perplexity,
    CCNet buckets), not here."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    t = tokens(c)
    nw = F.size(t)
    raw = F.filter(F.split(c, r"\s+"), lambda x: F.length(x) > 0)
    nraw = F.size(raw)
    lines = F.filter(F.split(c, "\n"), lambda x: F.length(F.trim(x)) > 0)
    nl = F.size(lines)
    low = F.lower(c)
    sw = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    sw_occ = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))

    def _occurrences(needle: str) -> Column:
        step = len(needle)
        return (
            (F.length(low) - F.length(F.replace(low, F.lit(needle))))
            / F.lit(step)
        ).cast("bigint")

    def frac(num: Column, den: Column) -> Column:
        return F.round(
            F.when(den > 0, num.cast("double") / den).otherwise(0.0), 6
        )

    symbols = F.length(low) - F.length(
        F.regexp_replace(low, r"[#…]|\.\.\.", "")
    )
    base = df.select(
        F.col(id_col).alias("id"),
        nw.cast("bigint").alias("word_count"),
        F.length(c).cast("bigint").alias("char_count"),
        nl.cast("bigint").alias("num_lines"),
        F.regexp_count(c, F.lit(r"[.!?]+")).cast("bigint").alias(
            "num_sentences"
        ),
        F.round(mean_word_length(c), 6).alias("mean_word_length"),
        frac(F.size(F.array_distinct(t)), nw).alias("frac_unique_words"),
        frac(
            F.size(F.filter(raw, lambda x: x.rlike(
                "^[A-Z0-9]*[A-Z][A-Z][A-Z0-9]*$"
            ))),
            nraw,
        ).alias("frac_all_caps_words"),
        frac(
            F.size(F.filter(t, lambda x: ~x.rlike("[a-z]"))), nw
        ).alias("frac_no_alpha_words"),
        frac(sw_occ, nw).alias("stop_word_fraction"),
        frac(
            F.size(F.filter(
                lines, lambda x: F.trim(x).rlike(r"^([-*•]|[0-9]+[.)] )")
            )),
            nl,
        ).alias("frac_lines_start_bullet"),
        frac(
            F.size(F.filter(lines, lambda x: F.rtrim(x).rlike(r"(\.\.\.|…)$"))),
            nl,
        ).alias("frac_lines_end_ellipsis"),
        frac(
            F.size(F.filter(lines, lambda x: F.rtrim(x).rlike("[.!?\"]$"))),
            nl,
        ).alias("frac_lines_end_terminal_punct"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        frac(symbols, nw).alias("symbol_to_word_ratio"),
        frac(
            F.length(low) - F.length(F.regexp_replace(low, r"[{}]", "")),
            F.length(c),
        ).alias("frac_chars_curly_bracket"),
        _occurrences("lorem ipsum").alias("lorem_ipsum_count"),
        _occurrences("javascript").alias("javascript_count"),
        t.alias("__toks"),
    )
    ent = (
        base.select("id", F.explode("__toks").alias("w"))
        .where(F.col("w") != "")
        .groupBy("id", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("id")
        .agg(
            F.sum("cnt").alias("__n"),
            F.sum(F.col("cnt") * F.log(F.col("cnt"))).alias("__clogc"),
        )
        .select(
            "id",
            F.round(
                F.log(F.col("__n")) - F.col("__clogc") / F.col("__n"), 6
            ).alias("unigram_entropy"),
        )
    )
    return (
        base.drop("__toks")
        .join(ent, "id", "left")
        .withColumn(
            "unigram_entropy", F.coalesce("unigram_entropy", F.lit(0.0))
        )
    )


def keep_rate(df: DataFrame, text_col: str, group_by: str | None = None,
              params: QualityParams | None = None) -> DataFrame:
    """Corpus-level keep rate (optionally per group) — one aggregation
    over the same codegen'd rules; the monitoring counterpart of the
    row filter."""
    rules = quality_rules(F.col(text_col), params)
    names = sorted(rules)
    keep = None
    for n in names:
        r = F.coalesce(rules[n], F.lit(False))
        keep = r if keep is None else (keep & r)
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(keep.cast("long")).alias("n_kept"),
        F.round(F.avg(keep.cast("double")), 6).alias("keep_rate"),
        *[
            F.sum((~F.coalesce(rules[n], F.lit(False))).cast("long")).alias(f"fail_{n}")
            for n in names
        ],
    ]
    return df.groupBy(group_by).agg(*aggs) if group_by else df.agg(*aggs)


# Gopher §A1.1 repetition thresholds: max allowed fraction of
# characters in the most-frequent n-gram (top) / in all n-grams
# occurring more than once (dup)
GOPHER_TOP_NGRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_NGRAM_MAX = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def ngram_repetition(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """Gopher's n-gram repetition signals — the half of §A1.1 the
    line-level rules in quality_rules can't see: per document,
    - top_{n}_char_frac: fraction of (normalized, space-free)
      characters covered by the single most frequent n-gram
      (count x its char length / total chars), for n in top_ns;
    - dup_{n}_char_frac: fraction covered by ALL n-grams occurring
      more than once, for n in dup_ns.
    Most-frequent ties break deterministically by (count, char length,
    gram) struct max — the same rule the DuckDB oracle applies.
    Documents with no tokens are excluded; a document shorter than n
    tokens scores 0.0 for that n.

    Scale shape: ONE explode emits every (n, gram) window for all
    requested n (sum_n (len-n+1) rows per doc), then ONE shuffle keyed
    (id, n, gram) -> per-(id, n) aggregation -> per-id conditional agg.
    No quadratic per-row HOF self-joins (transform(grams, g ->
    count_in(grams, g)) is O(len^2) per document and was rejected);
    cost is linear in corpus token count, independent of document
    length skew."""
    all_ns = sorted(set(top_ns) | set(dup_ns))
    t = tokens(F.col(text_col))
    base = (
        df.select(F.col(id_col).alias("id"), t.alias("__toks"))
        .withColumn("__nt", F.size("__toks"))
        .where(F.col("__nt") > 0)
        .withColumn(
            "__tc",
            F.aggregate(
                "__toks", F.lit(0).cast("bigint"),
                lambda a, x: a + F.length(x),
            ),
        )
    )
    def _tag_struct(n: int):
        # closure factory, NOT a defaulted lambda: pyspark dispatches
        # HOF lambdas on arity, so `lambda g, _n=n:` would be treated
        # as an (element, index) lambda and the index would overwrite n
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    # windows from the SHARED functions.text.word_ngrams construction
    # (same grams as dedup.word_ngram_hashes by construction)
    gram_arrays = [
        F.transform(word_ngrams(F.col("__toks"), n), _tag_struct(n))
        for n in all_ns
    ]
    # explode_OUTER: a document shorter than every requested n emits no
    # grams at all, but must still appear in the output (scoring 0.0
    # everywhere) — its null-n row survives the shuffle and the final
    # conditional aggs ignore it
    g = base.select(
        "id", "__tc", F.explode_outer(F.concat(*gram_arrays)).alias("g")
    ).select("id", "__tc", "g.n", "g.gram")
    counts = g.groupBy("id", "__tc", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    gchars = (F.length(F.col("gram")) - (F.col("n") - 1)).cast("bigint")
    per = counts.groupBy("id", "__tc", "n").agg(
        F.max(F.struct(F.col("cnt"), gchars.alias("gc"), F.col("gram"))).alias("top"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt") * gchars).otherwise(0)).alias(
            "__dup_chars"
        ),
    )
    top_frac = F.round(F.col("top.cnt") * F.col("top.gc") / F.col("__tc"), 6)
    dup_frac = F.round(F.col("__dup_chars") / F.col("__tc"), 6)
    scored = per.select("id", "n", top_frac.alias("tf"), dup_frac.alias("df_"))
    zero = F.lit(0.0)
    return scored.groupBy("id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("n") == n, F.col("tf"))), zero
            ).alias(f"top_{n}_char_frac")
            for n in top_ns
        ],
        *[
            F.coalesce(
                F.max(F.when(F.col("n") == n, F.col("df_"))), zero
            ).alias(f"dup_{n}_char_frac")
            for n in dup_ns
        ],
    )


def repetition_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_max: dict[int, float] | None = None,
    dup_max: dict[int, float] | None = None,
) -> DataFrame:
    """ngram_repetition + the Gopher thresholds: per-document
    repetition_keep boolean (every signal within bound) alongside the
    fractions — composes with quality_filter's keep for the full
    Gopher rule set."""
    top_max = GOPHER_TOP_NGRAM_MAX if top_max is None else top_max
    dup_max = GOPHER_DUP_NGRAM_MAX if dup_max is None else dup_max
    rep = ngram_repetition(
        df, id_col, text_col,
        top_ns=tuple(sorted(top_max)), dup_ns=tuple(sorted(dup_max)),
    )
    keep = None
    for n, mx in sorted(top_max.items()):
        c = F.col(f"top_{n}_char_frac") <= mx
        keep = c if keep is None else (keep & c)
    for n, mx in sorted(dup_max.items()):
        c = F.col(f"dup_{n}_char_frac") <= mx
        keep = keep & c
    return rep.withColumn("repetition_keep", keep)


# ------------------------------------------------- char-LM perplexity

LM_PAD = "#"
# the norm_text alphabet: a-z, 0-9, space. The BOS pad '#' occurs only
# inside contexts, never as a predicted character, so it is not part
# of the smoothing vocabulary.
LM_VOCAB = 37


def _char_ngram_pairs(df: DataFrame, text_col: str, n: int,
                      keep: list[str]) -> DataFrame:
    """One row per character position of the BOS-padded normalized
    text: (``keep``..., ctx = preceding n-1 chars, ch = the char).
    Empty-normalized rows emit nothing. The padded string is
    materialized as a COLUMN before the position transform — a lambda
    capturing the normalize expression would re-evaluate it per
    character (functions/text.char_ngrams documents the same trap)."""
    from advanced_data_profile_spark.functions.text import norm_text

    padded = df.select(
        *keep,
        F.concat(F.lit(LM_PAD * (n - 1)), norm_text(F.col(text_col))).alias(
            "__pad"
        ),
    ).where(F.length("__pad") > n - 1)
    grams = padded.select(
        *keep,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("__pad") - (n - 1)),
                lambda i: F.struct(
                    F.substr(F.col("__pad"), i, F.lit(n - 1)).alias("ctx"),
                    F.substr(F.col("__pad"), i + (n - 1), F.lit(1)).alias("ch"),
                ),
            )
        ).alias("g"),
    )
    return grams.select(*keep, "g.ctx", "g.ch")


def train_char_lm(df: DataFrame, text_col: str, n: int = 3) -> DataFrame:
    """Character-level n-gram counts (ctx, ch, cnt) over a REFERENCE
    corpus — the model relation for char_lm_perplexity (the CCNet
    discipline, Wenzek et al. 2020: score documents by LM perplexity
    against a trusted reference; public method). The model is tiny by
    construction (<= 37^(n-1) * 37 rows — ~50k at n=3) regardless of
    corpus size: one scan, one count aggregation with map-side partial
    combine on the gram fan-out."""
    return (
        _char_ngram_pairs(df, text_col, n, [])
        .groupBy("ctx", "ch")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_char_lm_models(models: DataFrame) -> DataFrame:
    """Merge char-LM count relations by summation — n-gram counts are
    exactly additive, so the reference model is TRAINABLE INCREMENTALLY
    with the stored-state discipline of the sketch rollups: train per
    batch (train_char_lm / train_char_lm_by_lang), append the count
    relation to persisted state, and the merged model is BIT-IDENTICAL
    to one-pass training on the union (tested) — no corpus rescan when
    the trusted reference grows. Accepts both the single-model
    (ctx, ch, cnt) and the per-language (lang, ctx, ch, cnt) shapes;
    the group keys are every column except cnt."""
    keys = [c for c in models.columns if c != "cnt"]
    return models.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def char_lm_model_n(model: DataFrame) -> int:
    """Derive the n-gram order from a train_char_lm model relation (ctx
    width + 1), validating the relation on the way: an empty model or
    mixed ctx widths raises instead of letting every (ctx, ch) lookup
    miss downstream — a model trained at n != the scorer's n would
    otherwise score every char at the smoothed floor and silently fail
    the whole corpus at a perplexity threshold. One tiny aggregation
    over the KB-sized model."""
    row = model.agg(
        F.min(F.length("ctx")).alias("lo"), F.max(F.length("ctx")).alias("hi")
    ).first()
    if row is None or row["lo"] is None:
        raise ValueError(
            "char-LM model relation is empty — train_char_lm over a "
            "non-empty reference corpus first."
        )
    if row["lo"] != row["hi"]:
        raise ValueError(
            f"char-LM model has mixed ctx widths {row['lo']}..{row['hi']} — "
            "not a single train_char_lm relation."
        )
    return int(row["hi"]) + 1


def char_lm_perplexity(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: DataFrame,
    n: int = 3,
    alpha: float = 0.1,
) -> DataFrame:
    """Per-document perplexity under the add-alpha-smoothed char n-gram
    model: P(ch|ctx) = (cnt + alpha) / (ctx_total + alpha * 37), ppl =
    exp(-avg log P). Returns (id, n_chars, avg_logp, ppl) — low ppl =
    reference-like text, high ppl = gibberish/ocr-noise/off-domain
    (the CCNet head/middle/tail cut is a quantile over this column).

    Scale shape: the MODEL is broadcast (KB-sized); the document side
    explodes to one row per character, partially aggregated before the
    single shuffle on the document id — linear in corpus characters,
    corpus text scanned once, never joined by payload."""
    ctx_tot = model.groupBy("ctx").agg(F.sum("cnt").alias("ctx_cnt"))
    pairs = _char_ngram_pairs(
        df.select(F.col(id_col).alias("id"), F.col(text_col)),
        text_col, n, ["id"],
    )
    scored = (
        pairs.join(F.broadcast(model), ["ctx", "ch"], "left")
        .join(F.broadcast(ctx_tot), ["ctx"], "left")
        .select(
            "id",
            F.log(
                (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(alpha))
                / (F.coalesce(F.col("ctx_cnt"), F.lit(0))
                   + F.lit(alpha * LM_VOCAB))
            ).alias("__logp"),
        )
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_chars"),
        F.avg("__logp").alias("avg_logp"),
        F.exp(-F.avg("__logp")).alias("ppl"),
    )


def train_char_lm_by_lang(
    df: DataFrame, text_col: str, lang_col: str, n: int = 3
) -> DataFrame:
    """Per-language char n-gram models in ONE corpus scan — the full
    CCNet discipline (Wenzek et al. 2020 §3.3: a SEPARATE LM per
    language, documents scored under their own language's model).
    Returns (lang, ctx, ch, cnt); size <= n_langs * 37^(n-1) * 37 rows
    regardless of corpus size, still broadcastable. Same shape as
    train_char_lm with the language riding the group key."""
    pairs = _char_ngram_pairs(
        df.select(F.col(lang_col).alias("lang"), F.col(text_col)),
        text_col, n, ["lang"],
    )
    return pairs.groupBy("lang", "ctx", "ch").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def char_lm_perplexity_by_lang(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: DataFrame,
    lang_col: str | None = None,
    alpha: float = 0.1,
) -> DataFrame:
    """Per-document perplexity under the document's OWN language model
    (train_char_lm_by_lang relation): lookup keys are (lang, ctx, ch).
    Returns (id, lang, modeled, n_chars, avg_logp, ppl).

    lang_col=None derives the label with functions.text.lang_predict
    (the production shape — corpora rarely arrive pre-labeled); pass an
    explicit column when labels are already materialized. The n-gram
    order is DERIVED from the model's ctx width (char_lm_model_n —
    empty/mixed models raise). A document whose language has no model
    rows scores every char at the smoothed floor (ppl == LM_VOCAB at
    any alpha); the `modeled` flag marks those so callers route
    unmodeled languages instead of silently failing them at a
    threshold (the ADVICE-r6 silent-failure discipline).

    Scale shape identical to char_lm_perplexity: model + ctx totals
    broadcast, one explode linear in corpus characters, partial agg
    before the single shuffle on (id, lang)."""
    from advanced_data_profile_spark.functions.text import lang_predict

    n = char_lm_model_n(model.select("ctx", "ch", "cnt"))
    lang_e = (
        F.col(lang_col) if lang_col is not None
        else lang_predict(F.col(text_col))
    )
    base = df.select(
        F.col(id_col).alias("id"), lang_e.alias("lang"), F.col(text_col)
    )
    pairs = _char_ngram_pairs(base, text_col, n, ["id", "lang"])
    ctx_tot = model.groupBy("lang", "ctx").agg(F.sum("cnt").alias("ctx_cnt"))
    scored = (
        pairs.join(F.broadcast(model), ["lang", "ctx", "ch"], "left")
        .join(F.broadcast(ctx_tot), ["lang", "ctx"], "left")
        .select(
            "id",
            "lang",
            F.log(
                (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(alpha))
                / (F.coalesce(F.col("ctx_cnt"), F.lit(0))
                   + F.lit(alpha * LM_VOCAB))
            ).alias("__logp"),
        )
    )
    agg = scored.groupBy("id", "lang").agg(
        F.count(F.lit(1)).alias("n_chars"),
        F.avg("__logp").alias("avg_logp"),
        F.exp(-F.avg("__logp")).alias("ppl"),
    )
    modeled = model.select("lang").distinct().withColumn(
        "modeled", F.lit(True)
    )
    return agg.join(F.broadcast(modeled), ["lang"], "left").select(
        "id", "lang", F.coalesce("modeled", F.lit(False)).alias("modeled"),
        "n_chars", "avg_logp", "ppl",
    )


def ppl_sketch_state(scored: DataFrame, k: int = 200) -> DataFrame:
    """Per-language KLL sketch of the ppl column — the persistable
    stored state behind ppl_language_buckets' thresholds: (lang,
    sketch), one tiny row per language. Mergeable across epochs and
    batches (kll_merge_agg_double), the same discipline as the
    profile's quantile-sketch state (operators/sketches.py)."""
    return scored.groupBy("lang").agg(
        F.kll_sketch_agg_double(F.col("ppl").cast("double"), F.lit(k)).alias(
            "sketch"
        )
    )


def ppl_thresholds_from_sketches(
    sketches: DataFrame, lo: float = 1.0 / 3, hi: float = 2.0 / 3
) -> DataFrame:
    """(lang, ppl_lo, ppl_hi) read off stored per-language KLL state —
    merge then two quantile getters (rank/quantile args must be
    LITERALS; the getters reject non-foldable expressions). Feed the
    result to ppl_language_buckets(thresholds=...): the 100 TB shape
    scores this epoch's documents against LAST epoch's stored cuts
    with no second pass over this epoch's scores (approximate at the
    sketch's ~1.65% rank error vs the exact in-pass default)."""
    merged = sketches.groupBy("lang").agg(
        F.kll_merge_agg_double("sketch").alias("__m")
    )
    return merged.select(
        "lang",
        F.kll_sketch_get_quantile_double("__m", F.lit(float(lo))).alias(
            "ppl_lo"
        ),
        F.kll_sketch_get_quantile_double("__m", F.lit(float(hi))).alias(
            "ppl_hi"
        ),
    )


def ppl_language_buckets(
    scored: DataFrame,
    lo: float = 1.0 / 3,
    hi: float = 2.0 / 3,
    thresholds: DataFrame | None = None,
) -> DataFrame:
    """CCNet head/middle/tail: cut each language's documents at that
    LANGUAGE'S ppl quantiles (Wenzek et al. 2020 §4.4 — per-language
    cuts, because absolute perplexity is not comparable across
    languages). Input is a char_lm_perplexity_by_lang relation (or any
    (lang, ppl, ...) relation); output appends ppl_lo/ppl_hi/bucket.

    thresholds=None computes exact per-language percentiles from the
    scored relation itself — one n_langs-row aggregate broadcast back
    (the scored relation is metadata-sized: one narrow row per doc).
    Pass a precomputed (lang, ppl_lo, ppl_hi) relation to cut against
    STORED thresholds instead — e.g. quantiles read off persisted
    per-language KLL sketch state (sketches.py) — the drift-family
    discipline: at 100 TB the epoch's cuts come from stored state, not
    a second pass over this epoch's scores. Languages missing from
    `thresholds` get NULL cuts and bucket 'unmodeled'."""
    if thresholds is None:
        thresholds = scored.groupBy("lang").agg(
            F.round(F.percentile("ppl", F.lit(lo)), 6).alias("ppl_lo"),
            F.round(F.percentile("ppl", F.lit(hi)), 6).alias("ppl_hi"),
        )
    bucket = (
        F.when(F.col("ppl_lo").isNull(), "unmodeled")
        .when(F.col("ppl") <= F.col("ppl_lo"), "head")
        .when(F.col("ppl") <= F.col("ppl_hi"), "middle")
        .otherwise("tail")
    )
    return scored.join(F.broadcast(thresholds), ["lang"], "left").withColumn(
        "bucket", bucket
    )
