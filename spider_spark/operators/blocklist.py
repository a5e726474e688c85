"""URL / domain blocklist filtering — the UT1-style corpus scrub every
webtext pipeline runs before training (drop documents whose host falls
under a blocked domain, matching by **registrable-domain suffix**: blocking
``ads.example`` also blocks ``tracker.ads.example``).

Shape at 100 TB: the blocklist (millions of domains, ~100 MB) broadcasts;
the corpus side explodes each host into its ≤ ``max_labels`` domain
suffixes (a bounded ×6 row inflation of a 2-column projection, not of the
documents), semi-joins the broadcast to find blocked keys, and anti-joins
back on the url key. No global sort, no corpus shuffle beyond the keyed
anti-join; if a blocklist ever outgrows broadcast, AQE falls back to a
shuffle join on the same plan.

The host parse is a JVM regex Column (whole-stage codegen) mirrored
verbatim in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)"


def host_of(url: Column) -> Column:
    """Lower-cased host of an absolute URL (empty string if relative).
    SQL: ``lower(regexp_extract(url, HOST_RE, 1))``."""
    return F.lower(F.regexp_extract(url, HOST_RE, 1))


def host_suffixes(host: Column, max_labels: int = 6) -> Column:
    """Array of the host's domain suffixes, shortest first — for
    ``a.b.example``: ``[example, b.example, a.b.example]`` (capped at
    ``max_labels`` labels; deeper subdomains can only match via their
    parent suffixes, which is exactly the blocklist semantics)."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    idx = F.sequence(F.lit(1), F.least(n, F.lit(max_labels)))
    return F.transform(
        idx, lambda i: F.array_join(F.slice(parts, n - i + 1, i), ".")
    )


def blocklist_filter(df: DataFrame, url_col: str, blocked: DataFrame,
                     domain_col: str = "domain", max_labels: int = 6,
                     keep_blocked: bool = False) -> DataFrame:
    """Rows of ``df`` whose URL host does NOT fall under any blocked
    domain (or only those that do, with ``keep_blocked=True`` — the audit
    view). Suffix semantics: a blocklist entry matches the host itself and
    every subdomain of it."""
    sfx = host_suffixes(host_of(F.col(url_col)), max_labels)
    bl = F.broadcast(
        blocked.select(F.lower(F.col(domain_col)).alias("__sfx")).distinct()
    )
    hit = (
        df.select(url_col)
        .withColumn("__sfx", F.explode(sfx))
        .join(bl, "__sfx", "left_semi")
        .select(url_col)
        .distinct()
    )
    how = "left_semi" if keep_blocked else "left_anti"
    return df.join(hit, on=url_col, how=how)


def blocklist_filter_sql(pages_sql: str, domains: list[str],
                         url_col: str = "url", max_labels: int = 6,
                         keep_blocked: bool = False,
                         select_cols: str | None = None) -> str:
    """DuckDB mirror of :func:`blocklist_filter` over ``pages_sql`` (must
    yield ``url_col``) with an inline literal blocklist — identical host
    regex and suffix generation. ``select_cols`` projects extra columns
    of ``pages_sql`` through the filter (defaults to ``url_col``)."""
    vals = ", ".join(f"('{d.lower()}')" for d in domains)
    op = "IN" if keep_blocked else "NOT IN"
    select_cols = select_cols or url_col
    return f"""
    WITH pages AS ({pages_sql}),
    b(domain) AS (VALUES {vals}),
    hosts AS (
      SELECT {url_col},
             string_split(lower(regexp_extract({url_col},
               '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)), '.') AS parts
      FROM pages
    ),
    sfx AS (
      SELECT {url_col},
             unnest(list_transform(
               generate_series(1, least(len(parts), {max_labels})),
               i -> array_to_string(parts[len(parts)-i+1 : len(parts)], '.')
             )) AS s
      FROM hosts
    ),
    hit AS (SELECT DISTINCT {url_col} FROM sfx JOIN b ON s = domain)
    SELECT {select_cols} FROM pages
    WHERE {url_col} {op} (SELECT {url_col} FROM hit)
    """
