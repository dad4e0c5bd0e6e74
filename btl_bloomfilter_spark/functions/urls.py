"""URL parsing + per-domain capping for web-corpus curation.

Web-scale corpora are dominated by a few hot domains; standard
curation extracts the host, folds it to a registrable domain, and caps
documents per domain with a DETERMINISTIC selection (re-runs, retries
and engine swaps must keep the same rows).  Everything here follows
the engine-portability rules this library uses for hash-oracled
expressions:

- regexes avoid every Java-vs-RE2 divergence (no ``\\w \\s \\b``,
  no lookaround, explicit character classes only);
- no-match is normalized to NULL in BOTH engines (Spark and DuckDB
  each return '' from regexp_extract);
- the cap's priority is the shared 60-bit md5 hash from
  :mod:`.splits` — bit-identical across engines — so the SELECTION
  (not just counts) is hash-oracle-able (q101);
- registrable-domain folding is a documented public-suffix HEURISTIC
  (last two labels, or last three when the second-level label is a
  known registry label like ``co``/``ac`` under a 2-letter ccTLD) —
  the container has no public-suffix list; swap in a real PSL lookup
  where exactness matters.  IPs and single-label hosts fold to
  themselves.

Scale: host/domain are pure codegen projections.  ``domain_cap``
ranks within domain by (priority, id) — a single shuffle on the
domain key; the filtered form lets Spark plant WindowGroupLimit so
each input partition forwards at most ``max_per_domain`` rows per
domain into that shuffle (pinned in tests).  A domain hot enough to
skew its reducer is exactly the domain the cap truncates to a
constant number of survivors.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from .splits import _hash60, _key_sql

# host = authority minus userinfo/port, after a real scheme.
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"

# registry-style second-level labels that take a third label when the
# TLD is a 2-letter country code (example.co.uk -> example.co.uk).
_SECOND_LEVEL = ("co", "com", "net", "org", "ac", "gov", "edu")

_IP_RE = r"^[0-9.]+$"


def url_host(col: Column | str) -> Column:
    """Lower-cased host of a URL, NULL when there is no scheme/host."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.nullif(F.regexp_extract(c, _HOST_RE, 1), F.lit("")))


def url_host_sql(col: str) -> str:
    return f"lower(nullif(regexp_extract({col}, '{_HOST_RE}', 1), ''))"


def registrable_domain(host: Column | str) -> Column:
    """Registrable domain of a lower-cased host (heuristic — see
    module docstring).  NULL host -> NULL; IP / single-label -> host."""
    h = F.col(host) if isinstance(host, str) else host
    labels = F.split(h, r"\.")
    n = F.size(labels)
    take3 = (
        (n >= 3)
        & F.element_at(labels, -2).isin(*_SECOND_LEVEL)
        & (F.length(F.element_at(labels, -1)) == 2)
    )
    return (
        F.when(h.isNull(), F.lit(None).cast("string"))
        .when(h.rlike(_IP_RE) | (n <= 1), h)
        .when(take3, F.array_join(F.slice(labels, n - 2, F.lit(3)), "."))
        .otherwise(F.array_join(F.slice(labels, n - 1, F.lit(2)), "."))
    )


def registrable_domain_sql(host: str) -> str:
    """DuckDB twin of :func:`registrable_domain`; ``host`` is a column
    NAME (put the host extraction in a CTE first — the split expression
    repeats)."""
    l = f"string_split({host}, '.')"
    in_set = ", ".join(f"'{s}'" for s in _SECOND_LEVEL)
    return (
        f"CASE WHEN {host} IS NULL THEN NULL "
        f"WHEN regexp_matches({host}, '{_IP_RE}') OR len({l}) <= 1 THEN {host} "
        f"WHEN len({l}) >= 3 AND list_contains([{in_set}], {l}[len({l})-1]) "
        f"AND length({l}[len({l})]) = 2 "
        f"THEN array_to_string({l}[len({l})-2:len({l})], '.') "
        f"ELSE array_to_string({l}[len({l})-1:len({l})], '.') END"
    )


def domain_cap(
    df: DataFrame,
    domain_col: str,
    id_cols: list[str],
    max_per_domain: int,
    *,
    seed: int | str = 0,
) -> DataFrame:
    """Deterministic per-domain rank + keep flag.

    Adds ``cap_rank`` (1-based rank within ``domain_col``, ordered by
    the engine-portable content-hash priority then ``id_cols``) and
    ``kept`` (rank <= cap).  With unique ``id_cols`` the ordering is
    total, so the assignment is identical across partitionings, runs
    and engines — q101 hash-oracles the full (rank, kept) assignment,
    not just counts.  NULL domains rank together as one group; filter
    them first if they should not be capped as a unit.
    """
    if max_per_domain <= 0:
        raise ValueError("max_per_domain must be positive")
    if not id_cols:
        raise ValueError("id_cols must name at least one column (ties break on them)")
    w = Window.partitionBy(domain_col).orderBy(
        _hash60(id_cols, seed).asc(), *[F.col(c).asc() for c in id_cols]
    )
    return df.withColumn("cap_rank", F.row_number().over(w)).withColumn(
        "kept", F.col("cap_rank") <= max_per_domain
    )


def domain_cap_filter(
    df: DataFrame,
    domain_col: str,
    id_cols: list[str],
    max_per_domain: int,
    *,
    seed: int | str = 0,
) -> DataFrame:
    """The survivors only.  Filtering on the rank (rather than the
    boolean) lets Spark plant WindowGroupLimit: each input partition
    pre-truncates to ``max_per_domain`` rows per domain BEFORE the
    domain shuffle, so a hot domain costs its cap, not its size."""
    capped = domain_cap(df, domain_col, id_cols, max_per_domain, seed=seed)
    return capped.where(F.col("cap_rank") <= max_per_domain).drop("cap_rank", "kept")


def cap_rank_sql(domain_col: str, id_cols: list[str], *, seed: int | str = 0) -> str:
    """DuckDB twin of ``domain_cap``'s rank column."""
    pr = f"(('0x' || substr({_key_sql(seed, id_cols)}, 1, 15))::ubigint)::bigint"
    order = ", ".join([pr] + list(id_cols))
    return f"row_number() OVER (PARTITION BY {domain_col} ORDER BY {order})"
