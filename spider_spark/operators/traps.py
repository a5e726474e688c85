"""Crawl-trap (spider-trap) detection: per-host URL-structure audit.

A production frontier at 10^10 URLs dies on *traps* — hosts that generate
unbounded URL spaces (calendar pages, faceted search, session-id params,
self-similar path loops). The standard defense (Heritrix's path-depth and
pathological-repetition rules; see also Castillo, "Effective Web
Crawling", §4.3) is structural: no fetching needed, just the URL strings
the crawler has already seen. This module scores every host on three
signals and emits a verdict the scheduler can gate admission on:

* **depth** — path-segment count; trap spaces are deep
  (``/2024/01/02/2024/01/03/...``).
* **repeated path segments** — the same segment appearing twice in one
  path is the classic self-similar loop signature (Heritrix's
  ``PathologicalPathDecideRule`` rejects ≥2 repeats of one segment).
* **query-string fraction** — hosts where almost every discovered URL
  carries a query string are parameter mills (session ids, facets).

Everything is exact integer arithmetic (counts and cross-multiplied
milli-fractions — no floats), so the DuckDB mirror agrees bit-for-bit.

Scale shape: one projection of the URL column → per-URL segment stats
computed inside the scan (JVM ``split``/``array_distinct`` — no Python,
no explode) → ONE host-keyed aggregation with map-side partials. Output
is O(hosts). No driver state; a host with 10^8 discovered URLs costs the
same shuffle bytes as one with 10 (partial aggregation collapses rows
before the exchange).

Reference parity: the reference crawler has no trap defense (it BFS-walks
whatever hrefs it finds, /root/reference/spider/core/crawler.py:146-161)
— this is part of the web-scale frontier layer, alongside politeness and
the seen-filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "url_structure",
    "host_stats",
    "merge_host_stats",
    "trap_verdict",
    "trap_hosts",
    "trap_hosts_sql",
]


# -- shared URL decomposition (Spark Column ⟷ DuckDB SQL, same semantics) --
#
# rest   = everything after the first '://'
# host   = lowercased authority up to the first '/', port stripped
# path   = from that '/' (exclusive of authority) up to '?', '/'-trimmed
# segs   = path split on '/'; depth = number of segments (0 for empty path)
# repeat = depth > distinct(segs)  (some segment occurs twice)
# query  = URL contains '?'


def _rest(url: Column) -> Column:
    return F.element_at(F.split(url, "://", 2), 2)


def _host(url: Column) -> Column:
    hostport = F.substring_index(_rest(url), "/", 1)
    return F.lower(F.substring_index(hostport, ":", 1))


def _path(url: Column) -> Column:
    rest = _rest(url)
    slash = F.instr(rest, "/")
    raw = F.when(slash > 0, F.substring(rest, slash, 2_000_000)).otherwise(F.lit(""))
    before_q = F.substring_index(raw, "?", 1)
    return F.regexp_replace(F.regexp_replace(before_q, "^/+", ""), "/+$", "")


def url_structure(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds ``(host, depth, has_repeat, has_query)`` to every row — the
    per-URL structural signals :func:`trap_hosts` aggregates. All JVM
    string/array expressions inside the scan; no shuffle."""
    u = F.col(url_col)
    path = _path(u)
    segs = F.split(path, "/")
    depth = F.when(path == "", F.lit(0)).otherwise(F.size(segs))
    return urls.select(
        "*",
        _host(u).alias("host"),
        depth.alias("depth"),
        (depth > F.when(path == "", F.lit(0))
         .otherwise(F.size(F.array_distinct(segs)))).alias("has_repeat"),
        (F.instr(u, "?") > 0).alias("has_query"),
    )


def host_stats(urls: DataFrame, url_col: str = "url",
               depth_limit: int = 8) -> DataFrame:
    """Per-host structural counters over a discovered-URL log:
    ``(host, n_urls, max_depth, sum_depth, n_deep, n_repeat, n_query)``.
    Counters are ASSOCIATIVE (sums and a max), so incremental accrual —
    per crawl round, per wave — merges via :func:`merge_host_stats` into
    exactly the full-log aggregation. ``depth_limit`` is baked into
    ``n_deep`` at accrual time and must match across merged batches."""
    s = url_structure(urls.select(url_col), url_col)
    return s.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.max("depth").alias("max_depth"),
        F.sum("depth").alias("sum_depth"),
        F.sum(F.when(F.col("depth") > depth_limit, 1).otherwise(0)).alias("n_deep"),
        F.sum(F.when(F.col("has_repeat"), 1).otherwise(0)).alias("n_repeat"),
        F.sum(F.when(F.col("has_query"), 1).otherwise(0)).alias("n_query"),
    )


def merge_host_stats(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two host-stat tables into one (host-keyed sums / max). The
    running table is O(hosts) rows however many batches fold in — the
    incremental-accrual scale shape (never re-scan the URL history)."""
    return a.unionByName(b).groupBy("host").agg(
        F.sum("n_urls").alias("n_urls"),
        F.max("max_depth").alias("max_depth"),
        F.sum("sum_depth").alias("sum_depth"),
        F.sum("n_deep").alias("n_deep"),
        F.sum("n_repeat").alias("n_repeat"),
        F.sum("n_query").alias("n_query"),
    )


def trap_verdict(stats: DataFrame,
                 min_urls: int = 10, depth_limit: int = 8,
                 deep_frac_milli: int = 500, repeat_frac_milli: int = 300,
                 query_frac_milli: int = 800) -> DataFrame:
    """Verdict column over a host-stats table: a host is a trap when it
    has ≥ ``min_urls`` discovered URLs AND any signal fraction crosses
    its milli-threshold (``1000·n_deep > deep_frac_milli·n_urls`` etc.).
    Integer cross-multiplication throughout — no float ever touches the
    verdict, so the SQL mirror is bit-exact. ``depth_limit`` is accepted
    for signature symmetry with :func:`trap_hosts` (it acts at accrual)."""
    n = F.col("n_urls")
    return stats.select(
        "host", "n_urls", "max_depth", "sum_depth",
        "n_deep", "n_repeat", "n_query",
        (
            (n >= min_urls)
            & (
                (F.lit(1000) * F.col("n_deep") > F.lit(deep_frac_milli) * n)
                | (F.lit(1000) * F.col("n_repeat") > F.lit(repeat_frac_milli) * n)
                | (F.lit(1000) * F.col("n_query") > F.lit(query_frac_milli) * n)
            )
        ).alias("is_trap"),
    )


def trap_hosts(urls: DataFrame, url_col: str = "url",
               min_urls: int = 10, depth_limit: int = 8,
               deep_frac_milli: int = 500, repeat_frac_milli: int = 300,
               query_frac_milli: int = 800) -> DataFrame:
    """One-shot per-host structural verdict over a discovered-URL log =
    :func:`trap_verdict` ∘ :func:`host_stats`. Returns ``(host, n_urls,
    max_depth, sum_depth, n_deep, n_repeat, n_query, is_trap)``."""
    return trap_verdict(
        host_stats(urls, url_col, depth_limit),
        min_urls=min_urls, depth_limit=depth_limit,
        deep_frac_milli=deep_frac_milli,
        repeat_frac_milli=repeat_frac_milli,
        query_frac_milli=query_frac_milli,
    )


def trap_hosts_sql(urls_rel: str, url_col: str = "url",
                   min_urls: int = 10, depth_limit: int = 8,
                   deep_frac_milli: int = 500, repeat_frac_milli: int = 300,
                   query_frac_milli: int = 800) -> str:
    """DuckDB mirror of :func:`trap_hosts`. ``urls_rel`` is a table name
    or parenthesized subquery exposing ``url_col``."""
    u = url_col
    return f"""
    WITH s AS (
      SELECT lower(split_part(split_part(split_part({u}, '://', 2), '/', 1), ':', 1))
               AS host,
             trim(BOTH '/' FROM split_part(
               CASE WHEN strpos(split_part({u}, '://', 2), '/') > 0
                    THEN substr(split_part({u}, '://', 2),
                                strpos(split_part({u}, '://', 2), '/'))
                    ELSE '' END, '?', 1)) AS path,
             (strpos({u}, '?') > 0) AS has_query
      FROM {urls_rel}
    ), t AS (
      SELECT host, has_query,
             CASE WHEN path = '' THEN 0
                  ELSE len(string_split(path, '/')) END AS depth,
             CASE WHEN path = '' THEN 0
                  ELSE len(list_distinct(string_split(path, '/'))) END AS n_distinct
      FROM s
    ), agg AS (
      SELECT host,
             count(*) AS n_urls,
             max(depth) AS max_depth,
             sum(depth) AS sum_depth,
             sum(CASE WHEN depth > {depth_limit} THEN 1 ELSE 0 END) AS n_deep,
             sum(CASE WHEN depth > n_distinct THEN 1 ELSE 0 END) AS n_repeat,
             sum(CASE WHEN has_query THEN 1 ELSE 0 END) AS n_query
      FROM t GROUP BY host
    )
    SELECT host, n_urls, max_depth, sum_depth, n_deep, n_repeat, n_query,
           (n_urls >= {min_urls} AND (
              1000 * n_deep > {deep_frac_milli} * n_urls
              OR 1000 * n_repeat > {repeat_frac_milli} * n_urls
              OR 1000 * n_query > {query_frac_milli} * n_urls)) AS is_trap
    FROM agg
    """
