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


# ---- Gopher-style document quality rules (Rae et al. 2021, §A1.1) ----
# Every rule is a pure Catalyst expression with a byte-identical DuckDB
# twin (gopher_quality_sql) so the whole filter is exactly oracled.
# Published thresholds; word splitting shares _WS with token_count.

GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _words(col: str):
    t = _clean(col)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, rf"[{_WS}]+")
    )


def gopher_quality(col: str, *, min_words: int = 50, max_words: int = 100000) -> list[Column]:
    """Columns implementing the Gopher quality-filter rules: word
    count bounds, mean word length in [3, 10], symbol-to-word ratio
    ('#' and '...') < 0.1, <90% bullet-started lines, <30%
    ellipsis-ended lines, >80% words with an alphabetic character,
    >=2 stopwords.  Returns [n_words, mean_word_len,
    symbol_word_ratio, bullet_line_frac, ellipsis_line_frac,
    alpha_word_frac, n_stopwords, passes_gopher] — ratios rounded to
    6 so Spark and the DuckDB oracle hash-match exactly."""
    c = F.coalesce(F.col(col), F.lit(""))
    words = _words(col)
    n_words = F.size(words).cast("long")
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    mean_wl = F.round(
        F.length(F.regexp_replace(c, rf"[{_WS}]", "")).cast("double") / nw, 6
    )
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    n_ell = (F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))) / F.lit(3)
    sym_ratio = F.round((n_hash + n_ell).cast("double") / nw, 6)
    lines = F.split(c, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet = F.round(
        F.size(
            F.filter(
                lines,
                lambda x: x.startswith("•") | x.startswith("- ") | x.startswith("* "),
            )
        ).cast("double")
        / n_lines,
        6,
    )
    ell_end = F.round(
        F.size(F.filter(lines, lambda x: x.endswith("..."))).cast("double") / n_lines, 6
    )
    alpha = F.round(
        F.size(F.filter(words, lambda x: x.rlike("[A-Za-z]"))).cast("double") / nw, 6
    )
    stop = F.size(
        F.filter(words, lambda x: F.lower(x).isin(*[F.lit(w) for w in GOPHER_STOPWORDS]))
    ).cast("long")
    # duplicate-line fraction (Gopher's repetition family): fraction
    # of lines that are repeats of an earlier line
    dup_lines = F.round(
        (F.size(lines) - F.size(F.array_distinct(lines))).cast("double") / n_lines, 6
    )
    passes = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_wl >= 3)
        & (mean_wl <= 10)
        & (sym_ratio < 0.1)
        & (bullet < 0.9)
        & (ell_end < 0.3)
        & (alpha > 0.8)
        & (stop >= 2)
        & (dup_lines < 0.3)
    )
    return [
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_word_ratio"),
        bullet.alias("bullet_line_frac"),
        ell_end.alias("ellipsis_line_frac"),
        alpha.alias("alpha_word_frac"),
        stop.alias("n_stopwords"),
        dup_lines.alias("dup_line_frac"),
        passes.alias("passes_gopher"),
    ]


def gopher_quality_sql(col: str, *, min_words: int = 50, max_words: int = 100000) -> dict[str, str]:
    """DuckDB twins of :func:`gopher_quality`, keyed by output name."""
    c = f"coalesce({col}, '')"
    t = _clean_sql(col)
    words = f"(case when {t} = '' then [] else string_split_regex({t}, '[{_WS}]+') end)"
    n_words = f"len({words})"
    nw = f"greatest({n_words}, 1)::double"
    mean_wl = f"round(length(regexp_replace({c}, '[{_WS}]', '', 'g'))::double / {nw}, 6)"
    n_hash = f"(length({c}) - length(replace({c}, '#', '')))"
    n_ell = f"((length({c}) - length(replace({c}, '...', ''))) / 3)"
    sym = f"round(({n_hash} + {n_ell})::double / {nw}, 6)"
    lines = f"string_split({c}, chr(10))"
    n_lines = f"greatest(len({lines}), 1)::double"
    bullet = (
        f"round(len(list_filter({lines}, x -> starts_with(x, '•') or "
        f"starts_with(x, '- ') or starts_with(x, '* ')))::double / {n_lines}, 6)"
    )
    ell_end = f"round(len(list_filter({lines}, x -> ends_with(x, '...')))::double / {n_lines}, 6)"
    alpha = f"round(len(list_filter({words}, x -> regexp_matches(x, '[A-Za-z]')))::double / {nw}, 6)"
    stops = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    stop = f"len(list_filter({words}, x -> lower(x) in ({stops})))"
    dup_lines = f"round((len({lines}) - len(list_distinct({lines})))::double / {n_lines}, 6)"
    passes = (
        f"({n_words} >= {min_words} and {n_words} <= {max_words} and {mean_wl} >= 3 "
        f"and {mean_wl} <= 10 and {sym} < 0.1 and {bullet} < 0.9 and {ell_end} < 0.3 "
        f"and {alpha} > 0.8 and {stop} >= 2 and {dup_lines} < 0.3)"
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_wl,
        "symbol_word_ratio": sym,
        "bullet_line_frac": bullet,
        "ellipsis_line_frac": ell_end,
        "alpha_word_frac": alpha,
        "n_stopwords": stop,
        "dup_line_frac": dup_lines,
        "passes_gopher": passes,
    }


# ---- PII redaction (pure Catalyst, byte-identical DuckDB twin) ------
# Conservative patterns shared verbatim by Java regex and RE2 (no
# lookaround, explicit classes): emails, international-ish phone
# numbers, dotted-quad IPs.  Redaction is a masking pre-pass for
# training corpora, not a compliance guarantee.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\-. ]{7,}[0-9]",
    "ip": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def redact_pii(col: str) -> Column:
    """Text with emails/phones/IPs replaced by <EMAIL>/<PHONE>/<IP>
    (applied in that order; NULL passes through as '')."""
    c = F.coalesce(F.col(col), F.lit(""))
    c = F.regexp_replace(c, PII_PATTERNS["email"], "<EMAIL>")
    c = F.regexp_replace(c, PII_PATTERNS["ip"], "<IP>")
    c = F.regexp_replace(c, PII_PATTERNS["phone"], "<PHONE>")
    return c


def pii_counts(col: str) -> list[Column]:
    """[n_email, n_phone, n_ip] match counts per row."""
    c = F.coalesce(F.col(col), F.lit(""))
    return [
        F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS["email"]), F.lit(0))).cast("long").alias("n_email"),
        F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS["phone"]), F.lit(0))).cast("long").alias("n_phone"),
        F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS["ip"]), F.lit(0))).cast("long").alias("n_ip"),
    ]


def redact_pii_sql(col: str) -> str:
    c = f"coalesce({col}, '')"
    e = PII_PATTERNS["email"].replace("'", "''")
    i = PII_PATTERNS["ip"].replace("'", "''")
    ph = PII_PATTERNS["phone"].replace("'", "''")
    return (
        f"regexp_replace(regexp_replace(regexp_replace({c}, '{e}', '<EMAIL>', 'g'), "
        f"'{i}', '<IP>', 'g'), '{ph}', '<PHONE>', 'g')"
    )


def pii_counts_sql(col: str) -> dict[str, str]:
    c = f"coalesce({col}, '')"
    out = {}
    for name, key in (("n_email", "email"), ("n_phone", "phone"), ("n_ip", "ip")):
        pat = PII_PATTERNS[key].replace("'", "''")
        out[name] = f"len(regexp_extract_all({c}, '{pat}'))"
    return out


# ---- C4-style line-level filtering (Raffel et al. 2020 §2.2) --------
# Line rules: keep lines that end in terminal punctuation (optionally
# followed by a closing quote), have >= min words, and do not mention
# 'javascript'.  Page rules: drop pages containing 'lorem ipsum' or a
# curly brace; require >= min_kept_lines surviving lines.  Pure
# Catalyst higher-order functions with byte-identical DuckDB twins.
# \z (absolute end-of-input) instead of $ because Java's $ matches
# before a trailing \r line terminator while RE2's does not.
_WSL = r" \t\x0B\f\r"  # intra-line whitespace (lines cannot hold \n)
C4_TERMINAL_RE = "[.!?][\"']?\\z"


def _line_words(x: Column) -> Column:
    t = F.regexp_replace(x, rf"^[{_WSL}]+|[{_WSL}]+$", "")
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, rf"[{_WSL}]+")
    )


def c4_line_filter(
    col: str, *, min_words_per_line: int = 5, min_kept_lines: int = 3
) -> list[Column]:
    """Columns: [clean_text, n_lines, n_kept_lines, kept_line_frac,
    has_lorem_ipsum, has_brace, passes_c4].  clean_text is the kept
    lines rejoined with newlines — the actual C4 output document."""
    c = F.coalesce(F.col(col), F.lit(""))
    lines = F.split(c, "\n")
    kept = F.filter(
        lines,
        lambda x: x.rlike(C4_TERMINAL_RE)
        & (F.size(_line_words(x)) >= min_words_per_line)
        & ~F.contains(F.lower(x), F.lit("javascript")),
    )
    n_lines = F.size(lines).cast("long")
    n_kept = F.size(kept).cast("long")
    frac = F.round(n_kept.cast("double") / F.greatest(n_lines, F.lit(1)).cast("double"), 6)
    has_lorem = F.contains(F.lower(c), F.lit("lorem ipsum"))
    has_brace = F.contains(c, F.lit("{"))
    passes = (~has_lorem) & (~has_brace) & (n_kept >= min_kept_lines)
    return [
        F.array_join(kept, "\n").alias("clean_text"),
        n_lines.alias("n_lines"),
        n_kept.alias("n_kept_lines"),
        frac.alias("kept_line_frac"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_brace"),
        passes.alias("passes_c4"),
    ]


def c4_line_filter_sql(
    col: str, *, min_words_per_line: int = 5, min_kept_lines: int = 3
) -> dict[str, str]:
    """DuckDB twins of :func:`c4_line_filter`, keyed by output name."""
    c = f"coalesce({col}, '')"
    term = C4_TERMINAL_RE.replace("'", "''")
    lines = f"string_split({c}, chr(10))"
    wt = f"regexp_replace(x, '^[{_WSL}]+|[{_WSL}]+$', '', 'g')"
    words = (
        f"(case when {wt} = '' then [] else "
        f"string_split_regex({wt}, '[{_WSL}]+') end)"
    )
    kept = (
        f"list_filter({lines}, x -> regexp_matches(x, '{term}') "
        f"and len({words}) >= {min_words_per_line} "
        f"and not contains(lower(x), 'javascript'))"
    )
    n_lines = f"len({lines})"
    n_kept = f"len({kept})"
    frac = f"round({n_kept}::double / greatest({n_lines}, 1)::double, 6)"
    has_lorem = f"contains(lower({c}), 'lorem ipsum')"
    has_brace = f"contains({c}, '{{')"
    passes = f"(not {has_lorem} and not {has_brace} and {n_kept} >= {min_kept_lines})"
    return {
        # DuckDB's array_to_string is NULL on an empty list; Spark's
        # array_join is '' — coalesce to match
        "clean_text": f"coalesce(array_to_string({kept}, chr(10)), '')",
        "n_lines": n_lines,
        "n_kept_lines": n_kept,
        "kept_line_frac": frac,
        "has_lorem_ipsum": has_lorem,
        "has_brace": has_brace,
        "passes_c4": passes,
    }


# ---- Gopher repetition family (Rae et al. 2021 §A1.1, "rep" rules) --
# Top n-gram character fraction (fraction of text characters occupied
# by the single most frequent word n-gram, occurrence-overlap counted)
# and duplicate n-gram character fraction (characters inside n-grams
# that occur more than once).  Row-local and LINEAR: one array_sort of
# the gram array plus a single aggregate() fold per statistic — NO
# shuffle, no nested re-evaluation of the gram list (a naive
# transform(distinct(g), y -> size(filter(g, =y))) formulation
# re-materializes g for every distinct gram and measured ~300x slower
# at 500 docs).  Embarrassingly parallel at 100 TB.  Fractions are
# occurrence-overlap counted and clamped to 1, rounded to 6 so Spark
# and the DuckDB oracle hash-match.


def _grams(words: Column, n: int) -> Column:
    idx = F.sequence(F.lit(0), F.size(words) - n)
    return F.when(
        F.size(words) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n))),
    ).otherwise(F.array().cast("array<string>"))


def _run_chars(acc: Column) -> Column:
    """Characters occupied by the run just ended: count x gram length."""
    return acc["cnt"] * F.length(acc["prev"]).cast("long")


def _fold_top(grams: Column) -> Column:
    """max over distinct grams of count*length, via one linear fold
    over the sorted array (equal grams are adjacent after sort)."""
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).cast("long").alias("cnt"),
        F.lit(0).cast("long").alias("best"),
    )
    return F.aggregate(
        F.array_sort(grams),
        init,
        lambda acc, x: F.when(
            x == acc["prev"],
            F.struct(acc["prev"].alias("prev"), (acc["cnt"] + 1).alias("cnt"),
                     acc["best"].alias("best")),
        ).otherwise(
            F.struct(x.alias("prev"), F.lit(1).cast("long").alias("cnt"),
                     F.greatest(acc["best"], _run_chars(acc)).alias("best"))
        ),
        lambda acc: F.greatest(acc["best"], _run_chars(acc)),
    )


def _fold_dup(grams: Column) -> Column:
    """sum over distinct grams occurring >1 time of count*length, via
    the same linear sorted-run fold."""
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).cast("long").alias("cnt"),
        F.lit(0).cast("long").alias("dup"),
    )
    run_dup = lambda acc: F.when(acc["cnt"] > 1, _run_chars(acc)).otherwise(  # noqa: E731
        F.lit(0).cast("long")
    )
    return F.aggregate(
        F.array_sort(grams),
        init,
        lambda acc, x: F.when(
            x == acc["prev"],
            F.struct(acc["prev"].alias("prev"), (acc["cnt"] + 1).alias("cnt"),
                     acc["dup"].alias("dup")),
        ).otherwise(
            F.struct(x.alias("prev"), F.lit(1).cast("long").alias("cnt"),
                     (acc["dup"] + run_dup(acc)).alias("dup"))
        ),
        lambda acc: acc["dup"] + run_dup(acc),
    )


def repetition_stats(
    col: str, *, top_ns: tuple[int, ...] = (2, 3), dup_ns: tuple[int, ...] = (5,)
) -> list[Column]:
    """Columns: top_{n}gram_char_frac for each n in top_ns,
    dup_{n}gram_char_frac for each n in dup_ns, dup_line_char_frac
    (characters on lines that repeat an earlier line), plus
    passes_repetition using Gopher's published thresholds
    (top-2 <= 0.20, top-3 <= 0.18, dup-5 <= 0.15 — applied to
    whichever of those ns are requested; dup-line <= 0.30)."""
    c = F.coalesce(F.col(col), F.lit(""))
    words = _words(col)
    total = F.greatest(F.length(_clean(col)), F.lit(1)).cast("double")
    out: list[Column] = []
    gates: list[Column] = []
    thresholds = {("top", 2): 0.20, ("top", 3): 0.18, ("dup", 5): 0.15}
    for n in top_ns:
        frac = F.round(F.least(_fold_top(_grams(words, n)).cast("double") / total, F.lit(1.0)), 6)
        out.append(frac.alias(f"top_{n}gram_char_frac"))
        if ("top", n) in thresholds:
            gates.append(frac <= thresholds[("top", n)])
    for n in dup_ns:
        frac = F.round(F.least(_fold_dup(_grams(words, n)).cast("double") / total, F.lit(1.0)), 6)
        out.append(frac.alias(f"dup_{n}gram_char_frac"))
        if ("dup", n) in thresholds:
            gates.append(frac <= thresholds[("dup", n)])
    lines = F.split(c, "\n")
    line_chars = lambda ls: F.aggregate(  # noqa: E731
        F.transform(ls, F.length), F.lit(0), lambda a, x: a + x
    )
    dup_line = F.round(
        F.least(
            (line_chars(lines) - line_chars(F.array_distinct(lines))).cast("double")
            / total,
            F.lit(1.0),
        ),
        6,
    )
    out.append(dup_line.alias("dup_line_char_frac"))
    gates.append(dup_line <= 0.30)
    passes = gates[0]
    for gcol in gates[1:]:
        passes = passes & gcol
    out.append(passes.alias("passes_repetition"))
    return out


def repetition_stats_sql(
    col: str, *, top_ns: tuple[int, ...] = (2, 3), dup_ns: tuple[int, ...] = (5,)
) -> dict[str, str]:
    """Flat per-column DuckDB twins of :func:`repetition_stats`.

    TEST-SCALE ONLY: these re-evaluate the gram list once per distinct
    gram (DuckDB lacks a struct-typed list fold), i.e. O(u x g x n)
    per row — fine for planted unit-test rows, pathological over a
    corpus.  The corpus-scale oracle is the staged unnest + GROUP BY
    SQL in __spark_entry__._q51_oracle_sql, which computes identical
    values linearly."""
    c = f"coalesce({col}, '')"
    t = _clean_sql(col)
    total = f"greatest(length({t}), 1)::double"

    def grams(n: int) -> str:
        # one source of truth with the staged oracle's gram expression
        return repetition_grams_sql(col, n)

    out: dict[str, str] = {}
    gates: list[str] = []
    thresholds = {("top", 2): 0.20, ("top", 3): 0.18, ("dup", 5): 0.15}
    for n in top_ns:
        g = grams(n)
        occ = (
            f"list_max(list_concat([0], list_transform(list_distinct({g}), "
            f"y -> len(list_filter({g}, x -> x = y)) * length(y))))"
        )
        frac = f"round(least({occ}::double / {total}, 1.0), 6)"
        out[f"top_{n}gram_char_frac"] = frac
        if ("top", n) in thresholds:
            gates.append(f"{frac} <= {thresholds[('top', n)]}")
    for n in dup_ns:
        g = grams(n)
        dup = (
            f"coalesce(list_sum(list_transform(list_distinct({g}), "
            f"y -> case when len(list_filter({g}, x -> x = y)) > 1 "
            f"then len(list_filter({g}, x -> x = y)) * length(y) else 0 end)), 0)"
        )
        frac = f"round(least({dup}::double / {total}, 1.0), 6)"
        out[f"dup_{n}gram_char_frac"] = frac
        if ("dup", n) in thresholds:
            gates.append(f"{frac} <= {thresholds[('dup', n)]}")
    lines = f"string_split({c}, chr(10))"
    lc = lambda ls: f"coalesce(list_sum(list_transform({ls}, l -> length(l))), 0)"  # noqa: E731
    dup_line = (
        f"round(least(({lc(lines)} - {lc(f'list_distinct({lines})')})::double / {total}, 1.0), 6)"
    )
    out["dup_line_char_frac"] = dup_line
    gates.append(f"{dup_line} <= 0.3")
    out["passes_repetition"] = "(" + " and ".join(gates) + ")"
    return out


def repetition_grams_sql(col: str, n: int) -> str:
    """The word-n-gram list expression (DuckDB), for staged oracles
    that unnest it once instead of nesting it per distinct gram."""
    t = _clean_sql(col)
    words = f"(case when {t} = '' then [] else string_split_regex({t}, '[{_WS}]+') end)"
    return (
        f"(case when len({words}) >= {n} then "
        f"list_transform(range(1, len({words}) - {n} + 2), "
        f"i -> array_to_string({words}[i:i+{n - 1}], ' ')) "
        f"else [] end)"
    )


# ---- Blocklist screening (the C4 §2.2 "bad words" stage shape) -----
# Raffel et al. 2020 drop any page containing a term from a blocklist.
# Matching is word-boundary-exact WITHOUT regex word boundaries (Java
# \b and RE2 \b have different word-char definitions on non-ASCII):
# the text is lowercased and split on non-alphanumeric runs, so
# 'class' never matches 'classic'; multi-word phrases match on the
# space-joined normalized token stream.  Pure Catalyst, one codegen'd
# pass, exact DuckDB twins (list_intersect / contains).

import re as _re

_TERM_RE = _re.compile(r"^[a-z0-9]+$")
_PHRASE_RE = _re.compile(r"^[a-z0-9]+( [a-z0-9]+)+$")


def _check_blocklist(terms, phrases) -> None:
    for t in terms:
        if not _TERM_RE.match(t):
            raise ValueError(
                f"blocklist term {t!r} must be lowercase [a-z0-9]+ "
                "(normalized matching would silently never hit it)"
            )
    for p in phrases:
        if not _PHRASE_RE.match(p):
            raise ValueError(
                f"blocklist phrase {p!r} must be lowercase single-spaced "
                "[a-z0-9]+ words"
            )


def _block_tokens(col: str) -> Column:
    return F.split(F.lower(F.coalesce(F.col(col), F.lit(""))), "[^a-z0-9]+")


def blocklist_screen(
    col: str, terms: list[str], *, phrases: tuple[str, ...] = ()
) -> list[Column]:
    """Columns: blocked_terms_csv (sorted distinct matched terms,
    comma-joined — csv not array so the oracle compare is
    engine-stable), n_blocked_terms, n_blocked_phrases, blocked."""
    _check_blocklist(terms, phrases)
    toks = _block_tokens(col)
    matched = F.array_sort(
        F.array_intersect(toks, F.array(*[F.lit(t) for t in terms]))
    )
    n_terms = F.size(matched).cast("long")
    norm = F.concat(
        F.lit(" "), F.array_join(F.filter(toks, lambda x: x != ""), " "), F.lit(" ")
    )
    n_phrases = F.lit(0).cast("long")
    for p in phrases:
        n_phrases = n_phrases + F.contains(norm, F.lit(f" {p} ")).cast("long")
    return [
        F.array_join(matched, ",").alias("blocked_terms_csv"),
        n_terms.alias("n_blocked_terms"),
        n_phrases.alias("n_blocked_phrases"),
        ((n_terms > 0) | (n_phrases > 0)).alias("blocked"),
    ]


def blocklist_screen_sql(
    col: str, terms: list[str], *, phrases: tuple[str, ...] = ()
) -> dict[str, str]:
    """DuckDB twins of :func:`blocklist_screen`, keyed by output name."""
    _check_blocklist(terms, phrases)
    toks = f"string_split_regex(lower(coalesce({col}, '')), '[^a-z0-9]+')"
    lits = ", ".join(f"'{t}'" for t in terms)
    matched = f"list_sort(list_intersect({toks}, [{lits}]))"
    n_terms = f"len({matched})::bigint"
    # DuckDB array_to_string([]) is NULL (Spark array_join is '') —
    # coalesce, else contains() nulls out and the phrase sum goes NULL
    norm = (
        f"(' ' || coalesce(array_to_string(list_filter({toks}, x -> x != ''), ' '), '')"
        " || ' ')"
    )
    n_phrases = " + ".join(
        [f"contains({norm}, ' {p} ')::bigint" for p in phrases] or ["0::bigint"]
    )
    return {
        # DuckDB array_to_string(NULL/[]) quirk: coalesce to '' like c4
        "blocked_terms_csv": f"coalesce(array_to_string({matched}, ','), '')",
        "n_blocked_terms": n_terms,
        "n_blocked_phrases": f"({n_phrases})",
        "blocked": f"(({n_terms}) > 0 or ({n_phrases}) > 0)",
    }


# ---- Character-entropy quality signal ------------------------------
# Shannon unigram character entropy per document — low entropy flags
# boilerplate/repeated filler, high entropy flags binary-ish noise;
# a standard cheap corpus-quality feature.  Row-local and LINEAR via
# the same sorted-run fold as the repetition family (equal chars are
# adjacent after array_sort) — NO shuffle, embarrassingly parallel.
# Fixed-point policy (see lmscore): ln is quantized ONCE per run
# count to micro-nat LONGS, so every aggregate downstream is an exact
# order-independent integer sum and the DuckDB oracle (staged unnest
# + GROUP BY in __spark_entry__) matches bit-for-bit.
#   H_micro = ln_micro(n) - (sum_runs cnt*ln_micro(cnt)) div n
# (exact integer rearrangement of H = ln n - (1/n)·Σ c·ln c; `div` is
# truncating integer division in BOTH engines for positive operands).


def _ln_micro(x: Column) -> Column:
    return F.round(F.log(x.cast("double")) * F.lit(1000000.0)).cast("long")


def char_entropy(col: str) -> list[Column]:
    """Columns: n_chars (long), distinct_chars (long),
    entropy_micro_nats (long; 0 for empty/NULL text)."""
    chars = F.array_sort(F.split(F.coalesce(F.col(col), F.lit("")), ""))
    # split('','') == [''] in both engines; a lone '' char behaves as
    # one run of count 1 → entropy 0, same as genuinely empty text.
    run_term = lambda acc: F.when(  # noqa: E731
        acc["cnt"] > 0, acc["cnt"] * _ln_micro(acc["cnt"])
    ).otherwise(F.lit(0).cast("long"))
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("cnt"),
        F.lit(0).cast("long").alias("s"),
        F.lit(0).cast("long").alias("runs"),
    )
    fold = F.aggregate(
        chars,
        init,
        lambda acc, x: F.when(
            acc["prev"].eqNullSafe(x),
            F.struct(
                acc["prev"].alias("prev"), (acc["cnt"] + 1).alias("cnt"),
                acc["s"].alias("s"), acc["runs"].alias("runs"),
            ),
        ).otherwise(
            F.struct(
                x.alias("prev"), F.lit(1).cast("long").alias("cnt"),
                (acc["s"] + run_term(acc)).alias("s"),
                (acc["runs"] + 1).alias("runs"),
            )
        ),
        lambda acc: F.struct(
            (acc["s"] + run_term(acc)).alias("s"), acc["runs"].alias("runs")
        ),
    )
    n = F.length(F.coalesce(F.col(col), F.lit(""))).cast("long")
    s = fold["s"]
    # exact truncating integer division for NON-NEGATIVE longs below
    # 2^53: (s - pmod(s,n)) is an exact multiple of n and both fit in
    # a double, so the correctly-rounded double quotient IS the exact
    # integer (s ≤ n·ln_micro(n) ≈ 1.4e13 at 1 MB docs — headroom
    # checked; DuckDB twin uses bigint `//`, identical for positives).
    sdivn = ((s - F.pmod(s, n)) / n).cast("long")
    return [
        n.alias("n_chars"),
        F.when(n > 0, fold["runs"]).otherwise(F.lit(0).cast("long")).alias("distinct_chars"),
        F.when(n > 0, _ln_micro(n) - sdivn)
        .otherwise(F.lit(0).cast("long"))
        .alias("entropy_micro_nats"),
    ]
