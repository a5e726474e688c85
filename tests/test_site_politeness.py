"""Site-level politeness (CrawlConfig.politeness_site): the per-round
budget counts fetches per REGISTRABLE DOMAIN (PSL eTLD+1), so subdomain
farms can't multiply their allowance by spreading URLs over hostnames.

Fixture: one site (`s.example`) split across two subdomains that link in
a chain. With budget=1, host grouping fetches up to 2 pages/round (one
per hostname); site grouping fetches exactly 1 — more rounds, identical
final seen set (the invariance theorem is grouping-independent).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_spark.plans.crawl import CrawlConfig, CrawlEngine

N = 12


@pytest.fixture(scope="module")
def pages(spark):
    """Chain graph over alternating subdomains of one site: page i (on
    a.s.example for even i, b.s.example for odd) links to i+1 and i+2."""
    i = F.col("id")
    host = F.when(i % 2 == 0, F.lit("a.s.example")).otherwise(
        F.lit("b.s.example")
    )

    def url_of(x):
        h = F.when(x % 2 == 0, F.lit("a.s.example")).otherwise(
            F.lit("b.s.example")
        )
        return F.concat(F.lit("https://"), h, F.lit("/p/"), x.cast("string"))

    link1 = F.when(i + 1 < N, F.concat(
        F.lit('<a href="'), url_of(i + 1), F.lit('">n1</a>'))).otherwise(F.lit(""))
    link2 = F.when(i + 2 < N, F.concat(
        F.lit('<a href="'), url_of(i + 2), F.lit('">n2</a>'))).otherwise(F.lit(""))
    html = F.concat(
        F.format_string("<html><head><title>P%s</title></head><body>", i.cast("string")),
        link1, link2,
        F.format_string("body %s</body></html>", i.cast("string")),
    )
    from spider_spark.functions.parse import extract_text_udf

    df = spark.range(N).select(
        url_of(i).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + i).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        F.lit("en").alias("lang"),
    ).withColumn("text", extract_text_udf(F.col("html")))
    return df.select("url", "warc_ts", "html", "text", "lang") \
             .localCheckpoint(eager=True)


def _crawl(spark, pages, site: bool):
    cfg = CrawlConfig(depth=N, budget=1, politeness_site=site)
    eng = CrawlEngine(spark, pages, cfg)
    return eng.crawl("https://a.s.example/p/0")


class TestSitePoliteness:
    def test_seen_set_invariant_but_schedule_tighter(self, spark, pages):
        by_host = _crawl(spark, pages, site=False)
        by_site = _crawl(spark, pages, site=True)

        seen_h = {(r.canon_url, r.depth) for r in by_host.seen.collect()}
        seen_s = {(r.canon_url, r.depth) for r in by_site.seen.collect()}
        assert seen_h == seen_s  # grouping reschedules, never drops
        assert len(seen_s) == N

        # per-round fetch ceilings: 2 hostnames × budget 1 vs 1 site × 1
        f_host = [m.fetched for m in by_host.metrics if m.fetched]
        f_site = [m.fetched for m in by_site.metrics if m.fetched]
        assert max(f_host) == 2
        assert max(f_site) == 1
        assert len(f_site) > len(f_host)  # strictly more rounds

    def test_site_mode_without_budget_is_free(self, spark, pages):
        """No budget, no rules → the fast path skips scheduling entirely;
        site mode must not change results."""
        eng = CrawlEngine(
            spark, pages, CrawlConfig(depth=N, politeness_site=True)
        )
        res = eng.crawl("https://a.s.example/p/0")
        assert res.seen.count() == N
