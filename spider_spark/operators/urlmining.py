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

__all__ = ["url_template", "url_templates", "url_templates_sql"]

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
