"""Text-analysis column builders for training-data pipelines.

All pure Spark built-in expressions (`pyspark.sql.functions`) — they
stay inside WholeStageCodegen, no Python in the hot path, and every
one has an exact ANSI-SQL twin runnable by the DuckDB oracle
(__spark_entry__.oracle_sql).  Ops: token counting, quality scoring
(length / punctuation / stopword ratios), language-ID heuristic,
document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["de", "shi", "le", "bu", "wo"],
}


# Explicit ASCII whitespace class shared by every expression AND its
# DuckDB-oracle SQL twin: Java/Python \s includes vertical tab \x0B
# but RE2's (DuckDB) does not, so a literal \s would diverge between
# Spark and the oracle on \x0B-bearing text (ADVICE r4).
_WS = r" \t\n\x0B\f\r"


def _clean(col: str) -> Column:
    """NULL → ''; strip ALL leading/trailing whitespace (F.trim strips
    only ASCII spaces, so 'foo\\n' would otherwise yield a phantom
    empty token after split)."""
    return F.regexp_replace(
        F.coalesce(F.col(col), F.lit("")), rf"^[{_WS}]+|[{_WS}]+$", ""
    )


def _clean_sql(col: str) -> str:
    return f"regexp_replace(coalesce({col}, ''), '^[{_WS}]+|[{_WS}]+$', '', 'g')"


def token_count(col: str) -> Column:
    """Whitespace token count; NULL/empty/blank → 0."""
    t = _clean(col)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, rf"[{_WS}]+"))).cast("long")


def char_count(col: str) -> Column:
    return F.length(F.coalesce(F.col(col), F.lit(""))).cast("long")


def punct_ratio(col: str) -> Column:
    """Fraction of characters that are punctuation (NULL → 0.0)."""
    c = F.coalesce(F.col(col), F.lit(""))
    n = F.length(c)
    p = n - F.length(F.regexp_replace(c, r"[\.,;:!\?\'\"]", ""))
    return F.when(n > 0, p.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def digit_ratio(col: str) -> Column:
    c = F.coalesce(F.col(col), F.lit(""))
    n = F.length(c)
    d = n - F.length(F.regexp_replace(c, r"[0-9]", ""))
    return F.when(n > 0, d.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def mean_token_len(col: str) -> Column:
    t = _clean(col)
    toks = F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, rf"[{_WS}]+")))
    nospace = F.length(F.regexp_replace(F.coalesce(F.col(col), F.lit("")), rf"[{_WS}]", ""))
    return F.when(toks > 0, nospace.cast("double") / toks.cast("double")).otherwise(F.lit(0.0))


def stopword_hits(col: str, lang: str) -> Column:
    """How many tokens are in lang's stopword list (array_intersect-free:
    counts occurrences via size(filter(...)))."""
    words = LANG_STOPWORDS[lang]
    arr = F.split(_clean(col), rf"[{_WS}]+")
    return F.size(F.filter(arr, lambda x: x.isin(*[F.lit(w) for w in words]))).cast("long")


def quality_score(col: str) -> Column:
    """Composite [0,1] quality heuristic: long enough, low punct/digit
    noise, sane token lengths.  Deterministic arithmetic only."""
    n = char_count(col)
    length_term = F.least(n.cast("double") / F.lit(200.0), F.lit(1.0))
    noise_term = F.lit(1.0) - F.least(punct_ratio(col) * 4 + digit_ratio(col) * 2, F.lit(1.0))
    tl = mean_token_len(col)
    shape_term = F.when((tl >= 3) & (tl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((length_term * 0.4 + noise_term * 0.4 + shape_term * 0.2), 6)


def lang_guess(col: str) -> Column:
    """Stopword-vote language ID over LANG_STOPWORDS; ties broken by
    language order; no hits → 'und'."""
    langs = list(LANG_STOPWORDS)
    hits = [stopword_hits(col, lang) for lang in langs]
    best = F.greatest(*hits)
    expr = F.lit("und")
    for lang, h in reversed(list(zip(langs, hits))):
        expr = F.when((best > 0) & (h == best), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(col: str) -> Column:
    """64-bit hex document fingerprint (md5 prefix — stable across
    engines; the library's ntHash-style fingerprint is
    functions.hashing.hash_strings for sketch paths)."""
    return F.substring(F.md5(F.col(col)), 1, 16)


# GPT-2-style pre-tokenizer pattern, ASCII approximation: the published
# pattern's negative lookahead and \p{L}/\p{N} classes are dropped so
# Java regex (Spark) and RE2 (DuckDB) tokenize BYTE-IDENTICALLY; on
# ASCII text the only divergence from the original is that a run of
# spaces groups as one token instead of splitting its last space onto
# the following word-token — counts stay within one per whitespace run.
# Non-ASCII codepoints (any plane) fall into the greedy "other" run in
# both engines — Java scans UTF-16 code units and RE2 scans runes, but
# a contiguous non-ASCII stretch is one token either way, so match
# COUNTS agree on arbitrary unicode, not just ASCII.
# Whitespace is the module-level explicit class _WS, not \s
# (ADVICE r4: RE2 \s lacks \x0B).
BPE_SPLIT_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
    rf"| ?[^{_WS}A-Za-z0-9]+|[{_WS}]+"
)


def bpe_token_count(col: str) -> Column:
    """BPE-ish token count: matches of the GPT-2-style pre-tokenizer
    regex (contractions / letter runs / digit runs / punctuation runs /
    whitespace runs, each with an optional leading space).  NULL → 0.
    Pure built-in expression (regexp_extract_all), WholeStageCodegen."""
    c = F.coalesce(F.col(col), F.lit(""))
    return F.size(F.regexp_extract_all(c, F.lit(BPE_SPLIT_PATTERN), F.lit(0))).cast("long")


# ---- matching ANSI-SQL (DuckDB oracle) fragments --------------------


def token_count_sql(col: str) -> str:
    t = _clean_sql(col)
    return (
        f"case when {t} = '' then 0 "
        f"else len(string_split_regex({t}, '[{_WS}]+')) end"
    )


def punct_ratio_sql(col: str) -> str:
    c = f"coalesce({col}, '')"
    return (
        f"case when length({c}) > 0 then "
        f"(length({c}) - length(regexp_replace({c}, '[\\.,;:!\\?''\"]', '', 'g')))::double / length({c}) "
        f"else 0.0 end"
    )


def digit_ratio_sql(col: str) -> str:
    c = f"coalesce({col}, '')"
    return (
        f"case when length({c}) > 0 then "
        f"(length({c}) - length(regexp_replace({c}, '[0-9]', '', 'g')))::double / length({c}) "
        f"else 0.0 end"
    )


def mean_token_len_sql(col: str) -> str:
    toks = token_count_sql(col)
    return (
        f"case when {toks} > 0 then "
        f"length(regexp_replace(coalesce({col}, ''), '[{_WS}]', '', 'g'))::double / ({toks}) else 0.0 end"
    )


def quality_score_sql(col: str) -> str:
    tl = mean_token_len_sql(col)
    return (
        f"round(("
        f"least(length(coalesce({col}, ''))::double / 200.0, 1.0) * 0.4 + "
        f"(1.0 - least({punct_ratio_sql(col)} * 4 + {digit_ratio_sql(col)} * 2, 1.0)) * 0.4 + "
        f"(case when ({tl}) >= 3 and ({tl}) <= 10 then 1.0 else 0.5 end) * 0.2"
        f"), 6)"
    )


def stopword_hits_sql(col: str, lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return (
        f"len(list_filter(string_split_regex({_clean_sql(col)}, '[{_WS}]+'), x -> x in ({words})))"
    )


def lang_guess_sql(col: str) -> str:
    langs = list(LANG_STOPWORDS)
    hits = {lang: stopword_hits_sql(col, lang) for lang in langs}
    best = "greatest(" + ", ".join(hits.values()) + ")"
    expr = "'und'"
    for lang in reversed(langs):
        expr = f"case when ({best}) > 0 and ({hits[lang]}) = ({best}) then '{lang}' else {expr} end"
    return expr


def fingerprint_sql(col: str) -> str:
    return f"substr(md5({col}), 1, 16)"


def bpe_token_count_sql(col: str) -> str:
    pat = BPE_SPLIT_PATTERN.replace("'", "''")
    return f"len(regexp_extract_all(coalesce({col}, ''), '{pat}'))"
