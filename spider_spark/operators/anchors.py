"""Anchor-text index — the classic web-IR link signal.

Search engines rank a page partly by the text OTHER pages use to link to
it (anchor text describes the target better than the target describes
itself — Brin & Page 1998 §2.2; Craswell et al. 2001 measured it beating
content ranking for site finding). A training-data pipeline uses the same
index for document routing and as a quality prior (pages accumulating
diverse anchor text from many hosts are rarely spam).

Scale shape (100 TB):

* ONE parse pass over the corpus — the same Arrow-batched kernel cost
  class as the crawl's fetch phase; no second HTML scan.
* explode → two keyed aggregations with map-side combine. The distinct
  source-host count is exact via a pre-aggregation on
  ``(dst, anchor, src_host)`` — never a ``count_distinct`` shuffle of raw
  rows, and never a collect.
* output grain is ``(dst_url, anchor_text)`` — bounded by the corpus's
  link vocabulary, orders of magnitude below the raw link count after the
  map-side combine.

The link-admission filters match the crawl's (query-string drop, relative
resolution against the page, self-link drop — reference semantics
crawler.py:140-155, with the page as base), so the index describes exactly
the edges a crawl would follow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_spark.functions.parse import extract_anchors_udf

__all__ = [
    "anchor_pairs",
    "anchor_text_index",
    "anchor_text_index_sql",
    "link_spam_features",
    "link_spam_features_sql",
]


def anchor_pairs(pages: DataFrame, url_col: str = "url",
                 html_col: str = "html",
                 honor_nofollow: bool = False) -> DataFrame:
    """Raw ``(src_url, src_host, dst_url, dst_host, anchor_text,
    nofollow)`` edge records parsed from the pages' HTML, one row per
    admitted link in document order. The exploded relation every anchor
    aggregation (and any host-graph builder wanting labelled edges)
    starts from. ``honor_nofollow=True`` drops links whose ``rel``
    carries nofollow/ugc/sponsored — an endorsement index must not
    credit them (the row predicate costs nothing; the flag column stays
    for consumers that weight rather than drop)."""
    from spider_spark.operators.blocklist import host_of

    # explode_outer, NOT explode: a plain explode makes Catalyst's
    # InferFiltersFromGenerate push a `size(udf(..)) > 0` filter below the
    # projection, which re-evaluates the Arrow parse kernel — doubling the
    # dominant cost of the whole operator. The outer generate infers no
    # filter; the post-explode isNotNull drops link-less pages for the
    # price of a row predicate.
    out = (
        pages.select(
            F.col(url_col).alias("src_url"),
            host_of(F.col(url_col)).alias("src_host"),
            extract_anchors_udf(F.col(html_col), F.col(url_col)).alias("_a"),
        )
        .select(
            "src_url", "src_host", F.explode_outer("_a").alias("l")
        )
        .filter(F.col("l").isNotNull())
        .select(
            "src_url", "src_host",
            F.col("l.url").alias("dst_url"),
            F.col("l.host").alias("dst_host"),
            F.col("l.anchor_text").alias("anchor_text"),
            F.col("l.nofollow").alias("nofollow"),
        )
    )
    if honor_nofollow:
        out = out.filter(~F.col("nofollow"))
    return out


def anchor_text_index(pages: DataFrame, url_col: str = "url",
                      html_col: str = "html",
                      honor_nofollow: bool = False) -> DataFrame:
    """Per-(target, anchor-text) index: ``(dst_url, anchor_text, n_links,
    n_src_hosts)`` where ``n_links`` counts admitted links carrying that
    exact text and ``n_src_hosts`` counts DISTINCT linking hosts (the
    spam-resistance denominator). Two keyed aggs, both map-side
    combinable; exact arithmetic only."""
    pre = (
        anchor_pairs(pages, url_col, html_col, honor_nofollow=honor_nofollow)
        .groupBy("dst_url", "anchor_text", "src_host")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return pre.groupBy("dst_url", "anchor_text").agg(
        F.sum("_n").alias("n_links"),
        F.count(F.lit(1)).alias("n_src_hosts"),
    )


def anchor_text_index_sql(edges_rel: str) -> str:
    """DuckDB mirror over an edge relation with columns ``(src_url,
    src_host, dst_url, anchor_text)`` — same two-stage aggregation, bit
    exact (integer counts only)."""
    return f"""
    WITH pre AS (
      SELECT dst_url, anchor_text, src_host, count(*)::BIGINT AS _n
      FROM ({edges_rel})
      GROUP BY 1, 2, 3
    )
    SELECT dst_url, anchor_text,
           sum(_n)::BIGINT AS n_links,
           count(*)::BIGINT AS n_src_hosts
    FROM pre
    GROUP BY 1, 2
    """


def link_spam_features(pages: DataFrame, url_col: str = "url",
                       html_col: str = "html") -> DataFrame:
    """Per-page outlink-structure features — the link half of the classic
    web-spam feature set (Ntoulas et al., WWW 2006 §4: spam pages skew
    toward many external links, low anchor diversity, and boilerplate
    anchor text): ``(url, n_links, n_internal, n_external, n_dst_hosts,
    anchor_chars)`` over the ADMITTED links (the crawl's filters — query
    drop, self drop, page-base resolution — so the features describe the
    edges a crawler would actually follow). Pages whose links were all
    filtered report zeros rather than vanishing.

    Scale shape: the same single Arrow parse pass as every anchor
    consumer, then two source-keyed aggregations (the distinct dst-host
    count pre-aggregates on ``(src, dst_host)`` — never a count_distinct
    expand over raw link rows). Integer arithmetic only — bit-exact
    against :func:`link_spam_features_sql`."""
    edges = anchor_pairs(pages, url_col, html_col)
    internal = (F.col("dst_host") == F.col("src_host")).cast("int")
    per_host = edges.groupBy("src_url", "dst_host").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(internal).alias("_int"),
        F.sum(F.length("anchor_text")).alias("_chars"),
    )
    agg = per_host.groupBy("src_url").agg(
        F.sum("_n").alias("n_links"),
        F.sum("_int").alias("n_internal"),
        (F.sum("_n") - F.sum("_int")).alias("n_external"),
        F.count(F.lit(1)).alias("n_dst_hosts"),
        F.sum("_chars").alias("anchor_chars"),
    )
    zero = F.lit(0).cast("long")
    return (
        pages.select(F.col(url_col).alias("url"))
        .join(agg.withColumnRenamed("src_url", "url"), on="url", how="left")
        .select(
            "url",
            *[
                F.coalesce(F.col(c), zero).cast("long").alias(c)
                for c in (
                    "n_links", "n_internal", "n_external",
                    "n_dst_hosts", "anchor_chars",
                )
            ],
        )
    )


def link_spam_features_sql(edges_rel: str, pages_rel: str) -> str:
    """DuckDB mirror over an edge relation ``(src_url, src_host, dst_url,
    dst_host, anchor_text)`` and a page-URL relation ``(url)`` — the same
    two-stage aggregation and zero-fill."""
    return f"""
    WITH per_host AS (
      SELECT src_url, dst_host, count(*)::BIGINT AS _n,
             sum(CASE WHEN dst_host = src_host THEN 1 ELSE 0 END)::BIGINT AS _int,
             sum(length(anchor_text))::BIGINT AS _chars
      FROM ({edges_rel})
      GROUP BY 1, 2
    ),
    agg AS (
      SELECT src_url AS url, sum(_n)::BIGINT AS n_links,
             sum(_int)::BIGINT AS n_internal,
             (sum(_n) - sum(_int))::BIGINT AS n_external,
             count(*)::BIGINT AS n_dst_hosts,
             sum(_chars)::BIGINT AS anchor_chars
      FROM per_host GROUP BY 1
    )
    SELECT p.url,
           coalesce(a.n_links, 0)::BIGINT AS n_links,
           coalesce(a.n_internal, 0)::BIGINT AS n_internal,
           coalesce(a.n_external, 0)::BIGINT AS n_external,
           coalesce(a.n_dst_hosts, 0)::BIGINT AS n_dst_hosts,
           coalesce(a.anchor_chars, 0)::BIGINT AS anchor_chars
    FROM ({pages_rel}) p LEFT JOIN agg a USING (url)
    """


# ---------------------------------------------------------------------------
# focused-crawl relevance: anchor-text topic scoring
# ---------------------------------------------------------------------------


def focused_scores(anchor_index: DataFrame, query_terms: list[str],
                   k: int = 20) -> DataFrame:
    """Top-``k`` frontier targets by anchor-text topical relevance — the
    focused-crawl priority signal (Chakrabarti et al., WWW 1999: steer
    expansion toward pages whose INCOMING link text matches the topic):
    ``(dst_url, score, n_anchor_texts)`` where each anchor-text row of
    :func:`anchor_text_index` contributes ``|distinct query terms in the
    anchor| × n_src_hosts`` — host-weighted, so one spammy site repeating
    a keyword a thousand times counts once, while independent sites
    agreeing on it compound. Exact integers; ties → dst_url ASC.

    The output ranks a crawl frontier: feed the ordered targets into the
    admission ranking or ``global_round_cap`` tiers the way
    ``importance_tiered_schedule`` feeds TrustRank quartiles — anchor
    relevance is the topical analog of link-graph importance.

    Scale shape: per-row array arithmetic over the (already aggregated)
    anchor index — O(distinct (target, text)) rows, one dst-keyed agg,
    top-k heap. No joins, no Python."""
    from spider_spark.functions.text import normalized_text

    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    qt = sorted({t.lower() for t in query_terms})
    toks = F.split(normalized_text(F.col("anchor_text")), " ")
    matched = F.size(
        F.filter(F.array(*[F.lit(t) for t in qt]),
                 lambda t: F.array_contains(toks, t))
    )
    scored = anchor_index.select(
        "dst_url",
        (matched.cast("long") * F.col("n_src_hosts")).alias("part"),
    ).filter(F.col("part") > 0)
    out = scored.groupBy("dst_url").agg(
        F.sum("part").alias("score"),
        F.count(F.lit(1)).alias("n_anchor_texts"),
    )
    return out.orderBy(F.col("score").desc(), F.col("dst_url").asc()).limit(k)


def focused_scores_sql(edges_rel: str, query_terms: list[str],
                       k: int = 20) -> str:
    """DuckDB mirror of :func:`focused_scores` composed over
    :func:`anchor_text_index_sql` — same match rule (distinct query terms
    present in the normalized anchor tokens), weighting, and tie-break."""
    from spider_spark.operators.dedupe import NORM_SQL

    qt = sorted({t.lower() for t in query_terms})
    qlist = "[" + ", ".join("'" + t.replace("'", "''") + "'" for t in qt) + "]"
    norm = NORM_SQL.format(x="anchor_text")
    return f"""
    WITH idx AS ({anchor_text_index_sql(edges_rel)}),
    m AS (
      SELECT dst_url,
             len(list_filter({qlist},
                 t -> list_contains(string_split({norm}, ' '), t)))::BIGINT
               * n_src_hosts AS part
      FROM idx
    )
    SELECT dst_url, sum(part)::BIGINT AS score,
           count(*)::BIGINT AS n_anchor_texts
    FROM m WHERE part > 0
    GROUP BY dst_url
    ORDER BY score DESC, dst_url ASC LIMIT {k}
    """
