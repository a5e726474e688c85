"""URL template mining: collapse a URL population into structural families.

Large crawls are dominated by a few *URL templates* — the same path shape
with varying ids, dates, or session tokens (``/2024/{n}/{n}/post-{n}``,
``/session/{hex}``). Mining those families from the frontier or the seen
set is the standard structural analysis behind crawler-trap review (one
template exploding to millions of members IS the calendar/session trap —
the static complement of the in-crawl dynamic guard in
:mod:`spider_spark.operators.traps`), per-site scheduling (budget by
template, not raw URL), and corpus reporting.

Template derivation is two ordered regex rewrites over the path+query —
hex runs of ≥8 chars → ``{hex}`` first (session tokens, content hashes),
then any digit run → ``{n}`` — applied host-scoped so families never
merge across sites. Both character classes mean the same thing to Java
regex (Spark) and RE2 (DuckDB), so the mirror replays the identical
rewrites.

Scale shape: one scan-local projection (three ``regexp_replace`` in
WholeStageCodegen, no Python) feeding ONE (host, template)-keyed
aggregation with map-side partials — shuffle rows are O(distinct
templates), which is the point of the operator. A hot template collapses
to one row per partition before the exchange.

Reference parity: no analog (the reference keeps a flat URL set,
use_cache.py:14); crawl-analysis extension layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "url_template",
    "url_templates",
    "url_templates_sql",
    "dust_rules",
    "dust_rules_sql",
]

_SCHEME_HOST = r"^[a-z][a-z0-9+.-]*://[^/]*"
_HEX_RUN = "[0-9a-f]{8,}"
_DIGIT_RUN = "[0-9]+"


def url_template(url: Column) -> Column:
    """The structural template of ``url``'s path+query: scheme+authority
    stripped, ``{hex}`` for ≥8-char lowercase-hex runs, ``{n}`` for digit
    runs, empty path normalized to ``/``."""
    path = F.regexp_replace(url, _SCHEME_HOST, "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.regexp_replace(path, _HEX_RUN, "{hex}")
    return F.regexp_replace(path, _DIGIT_RUN, "{n}")


def url_templates(pages: DataFrame, url_col: str = "url",
                  host_col: str | None = None) -> DataFrame:
    """``(host, template, n_urls, example_url, depth)`` per URL family.

    ``host`` parses from the URL authority unless ``host_col`` names an
    existing column; ``example_url`` is the family's minimum URL (a
    deterministic representative); ``depth`` counts path segments of the
    template (query string excluded) — the trap-review sort key alongside
    ``n_urls``."""
    url = F.col(url_col)
    host = (
        F.col(host_col) if host_col
        else F.regexp_replace(
            F.regexp_extract(url, _SCHEME_HOST, 0), r"^[a-z][a-z0-9+.-]*://", ""
        )
    )
    tpl = url_template(url)
    path_only = F.split(tpl, r"\?", 2).getItem(0)
    depth = (
        F.size(F.filter(F.split(path_only, "/"), lambda s: s != ""))
        .cast("long")
    )
    return (
        pages.select(host.alias("host"), tpl.alias("template"),
                     url.alias("u"), depth.alias("d"))
        .groupBy("host", "template")
        .agg(
            F.count("*").alias("n_urls"),
            F.min("u").alias("example_url"),
            F.first("d").alias("depth"),  # constant within a template
        )
    )


def url_templates_sql(pages: str = "pages", url_col: str = "url",
                      host_col: str | None = None) -> str:
    """DuckDB mirror of :func:`url_templates` — identical rewrite order
    and character classes (RE2 ≡ Java regex for these patterns)."""
    host = (
        host_col if host_col
        else (f"regexp_replace(regexp_extract({url_col}, '{_SCHEME_HOST}', 0), "
              f"'^[a-z][a-z0-9+.-]*://', '')")
    )
    return f"""
    WITH t AS (
      SELECT {host} AS host,
             regexp_replace(
               regexp_replace(
                 CASE WHEN regexp_replace({url_col}, '{_SCHEME_HOST}', '') = ''
                      THEN '/' ELSE regexp_replace({url_col}, '{_SCHEME_HOST}', '')
                 END,
                 '{_HEX_RUN}', '{{hex}}', 'g'),
               '{_DIGIT_RUN}', '{{n}}', 'g') AS template,
             {url_col} AS u
      FROM {pages}
    )
    SELECT host, template,
           count(*)::BIGINT AS n_urls,
           min(u) AS example_url,
           (len(list_filter(string_split(string_split(template, '?')[1], '/'),
                            s -> s <> '')))::BIGINT AS depth
    FROM t GROUP BY host, template
    """


# ---------------------------------------------------------------------------
# DUST alias-rule mining (Different URLs with Similar Text)
# ---------------------------------------------------------------------------


def dust_rules(urls: DataFrame, url_col: str = "url", fp_col: str = "fp",
               k: int = 100, min_support: int = 2,
               max_bucket: int = 64) -> DataFrame:
    """Mine per-site URL alias rules from same-content URL pairs
    (Bar-Yossef et al. WWW 2007, "Do not crawl in the DUST"): when two
    URLs on the SAME host carry the same content fingerprint and their
    paths differ in EXACTLY one segment, that segment substitution
    (``/a/…`` ⇄ ``/amp/…``, ``/p/…`` ⇄ ``/print/…``) is evidence of a
    site-level aliasing rule; enough independent pairs promote it to a
    canonicalization rule the crawler applies BEFORE fetching — the
    learned complement of the declared ``rel=canonical`` signal
    (:mod:`spider_spark.operators.canonical`), which most duplicate
    pages never declare.

    Output: ``(host, seg_from, seg_to, support)`` — substitutions
    ordered ``least→greatest`` (the rule is symmetric evidence; the
    canonicalization direction is a policy the caller picks), with
    ``support`` = number of distinct same-content URL pairs exhibiting
    it, floored at ``min_support``, top-``k`` by ``(support DESC, host,
    seg_from, seg_to)`` — a total order, so the cut is deterministic.

    Scale shape: the only join is fingerprint-keyed, and fingerprints
    shared by more than ``max_bucket`` URLs are excluded first via a
    broadcast anti-join (a mirror-wide duplicate would otherwise
    contribute B² pairs — the hot-bucket guard every pair family in
    :mod:`.dedupe` carries; recall on such families is already served
    by their sheer pair count elsewhere). Segment comparison is
    per-pair array algebra (``filter`` over an index sequence — no
    per-segment explode), and the rule rollup is a keyed count with
    map-side partials. Nothing is corpus-global.
    """
    if min_support < 1:
        raise ValueError(f"min_support must be ≥1: {min_support}")
    if max_bucket < 2:
        raise ValueError(f"max_bucket must be ≥2: {max_bucket}")
    dd = urls.select(
        F.col(url_col).alias("u"), F.col(fp_col).alias("f")
    ).distinct()
    hot = (
        dd.groupBy("f").agg(F.count("*").alias("n"))
        .filter(F.col("n") > max_bucket)
        .select("f")
    )
    ok = dd.join(F.broadcast(hot), on="f", how="left_anti")
    a = ok.select("f", F.col("u").alias("u_a"))
    b = ok.select("f", F.col("u").alias("u_b"))
    pairs = a.join(b, on="f").filter(F.col("u_a") < F.col("u_b"))

    def parts(c):
        return F.split(c, "/")

    pa, pb = parts(F.col("u_a")), parts(F.col("u_b"))
    segs_a = F.slice(pa, 4, F.greatest(F.size(pa) - 3, F.lit(0)))
    segs_b = F.slice(pb, 4, F.greatest(F.size(pb) - 3, F.lit(0)))
    cand = (
        pairs.select(
            F.element_at(pa, 3).alias("host_a"),
            F.element_at(pb, 3).alias("host_b"),
            segs_a.alias("sa"), segs_b.alias("sb"),
        )
        .filter(
            (F.col("host_a") == F.col("host_b"))
            & (F.size("sa") == F.size("sb"))
        )
        .withColumn(
            "diffs",
            F.filter(
                F.sequence(F.lit(1), F.size("sa")),
                lambda i: F.element_at(F.col("sa"), i)
                != F.element_at(F.col("sb"), i),
            ),
        )
        .filter(F.size("diffs") == 1)
        .select(
            F.col("host_a").alias("host"),
            F.element_at(F.col("sa"), F.element_at("diffs", 1)).alias("x"),
            F.element_at(F.col("sb"), F.element_at("diffs", 1)).alias("y"),
        )
    )
    rules = (
        cand.select(
            "host",
            F.least("x", "y").alias("seg_from"),
            F.greatest("x", "y").alias("seg_to"),
        )
        .groupBy("host", "seg_from", "seg_to")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
    return rules.orderBy(
        F.desc("support"), F.asc("host"), F.asc("seg_from"), F.asc("seg_to")
    ).limit(k)


def dust_rules_sql(urls_rel: str, url_col: str = "url", fp_col: str = "fp",
                   k: int = 100, min_support: int = 2,
                   max_bucket: int = 64) -> str:
    """DuckDB mirror of :func:`dust_rules` — same guard, pair
    orientation, single-mismatch test, rule orientation, and cut."""
    return f"""
    WITH dd AS (
      SELECT DISTINCT {url_col} AS u, {fp_col} AS f FROM {urls_rel}
    ),
    ok AS (
      SELECT * FROM dd
      WHERE f NOT IN (
        SELECT f FROM dd GROUP BY f HAVING count(*) > {max_bucket}
      )
    ),
    pairs AS (
      SELECT a.u AS u_a, b.u AS u_b
      FROM ok a JOIN ok b ON a.f = b.f AND a.u < b.u
    ),
    parsed AS (
      SELECT string_split(u_a, '/')[3] AS host_a,
             string_split(u_b, '/')[3] AS host_b,
             string_split(u_a, '/')[4:] AS sa,
             string_split(u_b, '/')[4:] AS sb
      FROM pairs
    ),
    cand AS (
      SELECT host_a AS host,
             list_filter(range(1, len(sa) + 1), i -> sa[i] <> sb[i]) AS diffs,
             sa, sb
      FROM parsed
      WHERE host_a = host_b AND len(sa) = len(sb)
    ),
    onediff AS (
      SELECT host, sa[diffs[1]] AS x, sb[diffs[1]] AS y
      FROM cand WHERE len(diffs) = 1
    )
    SELECT host, least(x, y) AS seg_from, greatest(x, y) AS seg_to,
           count(*)::BIGINT AS support
    FROM onediff
    GROUP BY host, seg_from, seg_to
    HAVING count(*) >= {min_support}
    ORDER BY support DESC, host ASC, seg_from ASC, seg_to ASC
    LIMIT {k}
    """
