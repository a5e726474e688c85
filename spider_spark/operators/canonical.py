"""Canonical-URL consolidation — the site's OWN duplicate declaration.

Large crawls (Common Crawl, Google's documented processing) honor
``<link rel=canonical>``: when page A declares B canonical, A and B are
one logical document, and dedup / indexing should key on B. This module
turns that per-page signal (extracted by the Arrow-batched kernel in
:mod:`spider_spark.functions.parse`, which resolves relative hrefs
through the crawl's own URL algebra) into cluster verdicts a pipeline
can join against: canonical key per URL + cluster size.

The reference crawler has no canonical handling (it keys purely on
yarl-normalized URL strings, use_cache.py:22-24); this is one of the
training-data-pipeline extensions layered on the same parse kernel.

Scale shape: ONE Arrow parse pass over ``html``; everything after is a
3-string-column projection shuffled once on ``canonical_key`` for the
window count. Hot keys are real duplicate clusters — grouping them is
the point, and cluster payloads are a handful of strings per member, so
key skew is bounded by site template fan-in, not page size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spider_spark.functions.parse import make_canonical_udf


def canonical_map(pages: DataFrame, url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """(url, canonical_url) — the page's declared canonical target as a
    normalized absolute URL, NULL when the page declares none (or the
    declaration is unusable). One Arrow batch per partition."""
    canon = make_canonical_udf()
    return pages.select(
        F.col(url_col).alias("url"),
        canon(F.col(html_col), F.col(url_col)).alias("canonical_url"),
    )


def canonical_clusters(pages: DataFrame, url_col: str = "url",
                       html_col: str = "html") -> DataFrame:
    """(url, canonical_url, canonical_key, cluster_size): every page keyed
    by its effective canonical (own URL when none declared), with the
    number of URLs consolidating onto that key. ``cluster_size > 1`` rows
    are the dedup verdicts; ``url == canonical_key`` marks the keeper.

    One window count over the key — a single shuffle of the narrow
    projection, no join-back."""
    per = canonical_map(pages, url_col=url_col, html_col=html_col)
    keyed = per.withColumn(
        "canonical_key", F.coalesce("canonical_url", "url"))
    w = Window.partitionBy("canonical_key")
    return keyed.withColumn("cluster_size", F.count(F.lit(1)).over(w))
