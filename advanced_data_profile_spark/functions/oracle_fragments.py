"""DuckDB-dialect SQL fragments mirroring functions.text / operators.dedup
expressions 1:1, generated from the SAME Python constants — a single
source of truth so the driver's Spark-vs-DuckDB value-hash comparison
pins the exact semantics of every text/dedup kernel.

Only used by __spark_entry__.oracle_sql() and tests; the engine itself
never runs DuckDB.
"""

from __future__ import annotations

from advanced_data_profile_spark.functions.text import (
    LANG_MARKERS,
    SCRIPT_RULES,
    STOPWORDS_EN,
)


def sql_norm(col: str = "text") -> str:
    return f"trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g'))"


def sql_token_count(norm: str = "__norm") -> str:
    return f"(CASE WHEN {norm} = '' THEN 0 ELSE length(string_split({norm}, ' ')) END)"


def _sql_list(words: list[str]) -> str:
    inner = ", ".join(f"'{w}'" for w in words)
    return f"[{inner}]"


def sql_stopword_hits(norm: str = "__norm") -> str:
    sw = _sql_list(STOPWORDS_EN)
    return (
        f"(CASE WHEN {norm} = '' THEN 0 ELSE "
        f"length(list_filter(string_split({norm}, ' '), "
        f"x -> list_contains({sw}, x))) END)"
    )


def sql_punct_ratio(col: str = "text") -> str:
    return (
        f"(CASE WHEN length({col}) > 0 THEN "
        f"(length({col}) - length(regexp_replace({col}, '[^a-zA-Z0-9\\s]', '', 'g')))"
        f"::DOUBLE / length({col}) ELSE 0.0 END)"
    )


def sql_quality_score(col: str = "text", norm: str = "__norm") -> str:
    tc = f"{sql_token_count(norm)}::DOUBLE"
    sw_hits = sql_stopword_hits(norm)
    sw = f"(CASE WHEN {tc} > 0 THEN {sw_hits}::DOUBLE / {tc} ELSE 0.0 END)"
    pr = sql_punct_ratio(col)
    # single-spaced norm: sum of token lengths == strlen - (tc - 1)
    mwl = (
        f"(CASE WHEN {tc} > 0 THEN "
        f"(strlen({norm}) - ({tc} - 1))::DOUBLE / {tc} ELSE 0.0 END)"
    )
    len_ok = f"(CASE WHEN {tc} >= 10 AND {tc} <= 5000 THEN 1.0 WHEN {tc} > 0 THEN 0.5 ELSE 0.0 END)"
    sw_ok = f"(CASE WHEN {sw} >= 0.05 AND {sw} <= 0.6 THEN 1.0 ELSE 0.5 END)"
    punct_ok = f"(CASE WHEN {pr} <= 0.2 THEN 1.0 WHEN {pr} <= 0.4 THEN 0.5 ELSE 0.0 END)"
    mwl_ok = f"(CASE WHEN {mwl} >= 2.5 AND {mwl} <= 10 THEN 1.0 ELSE 0.5 END)"
    return (
        f"round(0.4 * {len_ok} + 0.3 * {sw_ok} + 0.2 * {punct_ok} + 0.1 * {mwl_ok}, 4)"
    )


def sql_bpe_ish(col: str = "text", norm: str = "__norm") -> str:
    pieces = (
        f"(CASE WHEN {norm} = '' THEN 0 ELSE "
        f"list_sum(list_transform(string_split({norm}, ' '), "
        f"w -> ceil(strlen(w) / 6.0)))::BIGINT END)"
    )
    punct = f"(length({col}) - length(regexp_replace({col}, '[^\\w\\s]', '', 'g')))"
    return f"({pieces} + coalesce({punct}, 0))::BIGINT"


def sql_md5_int60(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def sql_lang_predict(col: str = "text", norm: str = "__norm") -> str:
    """CASE chain replicating functions.text.lang_predict: script
    short-circuits in SCRIPT_RULES order, then argmax with
    first-alphabetical tie-break."""
    langs = sorted(LANG_MARKERS)
    # same (score, -rank, lang) struct argmax as the Spark side: DuckDB
    # structs compare field-wise left-to-right exactly like Spark's, so
    # ties on score resolve to the first language in sorted order. This
    # keeps the SQL LINEAR in language count — the previous pairwise
    # CASE chain embedded every score expression O(n) times and grew
    # quadratically (untenable past ~30 languages).
    entries = []
    for i, lang in enumerate(langs):
        markers = _sql_list(LANG_MARKERS[lang])
        score = (
            f"(CASE WHEN {norm} = '' THEN 0 ELSE "
            f"length(list_filter(string_split({norm}, ' '), "
            f"x -> list_contains({markers}, x))) END)"
        )
        entries.append(f"struct_pack(s := {score}, nr := {-i}, l := '{lang}')")
    # 'und' rides as a SENTINEL entry (s=0, nr=1): it outranks every
    # zero-score language (nr=1 > -i) and loses to any positive score —
    # exactly the "argmax if any hit else 'und'" semantics, with the
    # whole 100+-struct argmax evaluated ONCE per row instead of twice
    # (once for the >0 guard, once for the result)
    entries.append("struct_pack(s := 0, nr := 1, l := 'und')")
    best = f"list_aggregate([{', '.join(entries)}], 'max')"
    script_whens = " ".join(
        f"WHEN regexp_matches({col}, '{pattern}') THEN '{lang}'"
        for lang, pattern in SCRIPT_RULES
    )
    return f"(CASE {script_whens} ELSE ({best}).l END)"


def sql_lang_top_k(col: str = "text", norm: str = "__norm", k: int = 5) -> str:
    """DuckDB mirror of functions.text.lang_top_k: a list of
    struct(lang, conf) — script-rule hit short-circuits to
    [(lang, 100.0)]; otherwise the (s, nr, l) structs sort descending,
    the top-k positive scores get conf = round(100.0 * s / total, 2)
    (total over ALL languages, the exact Spark arithmetic and operand
    order), and a zero-hit row yields [('und', 0.0)]. The entries list
    is built once in a scalar subquery and referenced twice (ranked +
    total), mirroring Spark's subexpression-eliminated double use."""
    langs = sorted(LANG_MARKERS)
    entries = []
    for i, lang in enumerate(langs):
        markers = _sql_list(LANG_MARKERS[lang])
        score = (
            f"(CASE WHEN {norm} = '' THEN 0 ELSE "
            f"length(list_filter(string_split({norm}, ' '), "
            f"x -> list_contains({markers}, x))) END)"
        )
        entries.append(f"struct_pack(s := {score}, nr := {-i}, l := '{lang}')")
    es = f"[{', '.join(entries)}]"
    body = (
        f"(SELECT CASE WHEN len(top) > 0 THEN "
        f"list_transform(top, e -> struct_pack(lang := e.l, "
        f"conf := round(100.0 * e.s / total, 2))) "
        f"ELSE [struct_pack(lang := 'und', conf := 0.0)] END "
        f"FROM (SELECT list_filter(list_reverse_sort(es)[1:{k}], "
        f"e -> e.s > 0) AS top, "
        f"list_sum(list_transform(es, e -> e.s)) AS total "
        f"FROM (SELECT {es} AS es) __lka) __lkb)"
    )
    script_whens = " ".join(
        f"WHEN regexp_matches({col}, '{pattern}') "
        f"THEN [struct_pack(lang := '{lang}', conf := 100.0)]"
        for lang, pattern in SCRIPT_RULES
    )
    return f"(CASE {script_whens} ELSE {body} END)"


def sql_winnow(norm: str = "__norm", k: int = 5, w: int = 4) -> str:
    """DuckDB mirror of functions.text.winnow_fingerprints (1-based
    inclusive list slicing)."""
    grams = (
        f"[substr({norm}, i, {k}) "
        f"FOR i IN range(1, greatest(strlen({norm}) - {k - 1}, 0) + 1)]"
    )
    hashes = f"list_transform({grams}, g -> {sql_md5_int60('g')})"
    wins = (
        f"[list_min(h[i:i+{w - 1}]) "
        f"FOR i IN range(1, greatest(len(h) - {w - 1}, 0) + 1)]"
    )
    return (
        f"(SELECT list_sort(list_distinct({wins})) "
        f"FROM (SELECT {hashes} AS h) __wnw)"
    )


def sql_minhash_expr(j: int, tok: str = "tok") -> str:
    """min over tokens of md5_int60('<j>:' || token)."""
    arg = "'" + str(j) + ":' || " + tok
    return f"min({sql_md5_int60(arg)})"


def sql_simhash(bits: int, h: str = "h", cnt: str = "cnt") -> tuple[list[str], str]:
    """(per-bit sum expressions, final signature expression over s{b})."""
    sums = [
        f"sum(CASE WHEN (({h} >> {b}) & 1) = 1 THEN {cnt} ELSE -{cnt} END) AS s{b}"
        for b in range(bits)
    ]
    sig = " + ".join(f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits))
    return sums, f"({sig})::BIGINT"


def sql_sign_bucket(vec: str, bits: int, offset: int = 0) -> str:
    """Sign-LSH bucket from components [offset, offset+bits) — mirrors
    operators.dedup._sign_bucket (DuckDB lists are 1-indexed)."""
    terms = " + ".join(
        f"(CASE WHEN {vec}[{offset + i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(bits)
    )
    return f"({terms})::BIGINT"
