"""RSS/Atom feed source (sources/feed.py): kernel semantics, Spark
wiring, and the adapter into the sitemap refresh planner."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark.sources.feed import (
    feed_entries,
    feed_refresh_entries,
    parse_feed,
)

RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>blog</title>
  <item><link>https://a.example/p1</link>
        <pubDate>Mon, 01 Jan 2024 10:20:30 GMT</pubDate>
        <title>P1</title></item>
  <item><guid>https://a.example/p2</guid><title>P2 guid permalink</title></item>
  <item><guid isPermaLink="false">tag:a.example,2024:p3</guid>
        <title>skipped: no link, non-permalink guid</title></item>
  <item><link>https://a.example/p4</link>
        <pubDate>not a date</pubDate><title>P4</title></item>
</channel></rss>"""

ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <title>blog</title>
  <entry><link rel="alternate" href="https://b.example/e1"/>
         <published>2024-01-01T10:20:30Z</published>
         <updated>2024-01-02T00:00:00Z</updated><title>E1</title></entry>
  <entry><link href="https://b.example/e2"/>
         <updated>2024-01-03</updated><title>E2</title></entry>
  <entry><link rel="self" href="https://b.example/feed"/>
         <title>skipped: no alternate link</title></entry>
</feed>"""

T0 = 1704104430  # 2024-01-01T10:20:30Z


class TestKernel:
    def test_rss(self):
        rows = parse_feed(RSS)
        assert [r["loc"] for r in rows] == [
            "https://a.example/p1", "https://a.example/p2",
            "https://a.example/p4",
        ]
        assert rows[0]["published_epoch"] == T0
        assert rows[0]["kind"] == "rss" and rows[0]["title"] == "P1"
        assert rows[1]["published_epoch"] is None  # no pubDate
        assert rows[2]["published_epoch"] is None  # unparseable date → NULL

    def test_rss_rfc822_numeric_zone(self):
        body = RSS.replace("GMT", "+0200")
        assert parse_feed(body)[0]["published_epoch"] == T0 - 7200

    def test_atom(self):
        rows = parse_feed(ATOM)
        assert [r["loc"] for r in rows] == [
            "https://b.example/e1", "https://b.example/e2",
        ]
        assert rows[0]["published_epoch"] == T0
        assert rows[0]["updated_epoch"] == 1704153600  # Jan 2 midnight
        assert rows[0]["kind"] == "atom"
        assert rows[1]["published_epoch"] is None
        assert rows[1]["updated_epoch"] == 1704240000  # date-only → midnight

    def test_bare_channel_tolerated(self):
        body = ("<channel><item><link>https://c.example/x</link>"
                "</item></channel>")
        assert [r["loc"] for r in parse_feed(body)] == ["https://c.example/x"]

    def test_malformed_and_foreign(self):
        assert parse_feed("<rss><channel><item>") == []
        assert parse_feed("<html><body>nope</body></html>") == []
        assert parse_feed("") == []


class TestSparkWiring:
    def test_entries_shape_and_single_arrow_pass(self, spark):
        feeds = spark.createDataFrame(
            [("https://a.example/feed", RSS), ("https://b.example/feed", ATOM)],
            "url string, xml string",
        )
        out = feed_entries(feeds, xml_col="xml")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("ArrowEvalPython") == 1, plan
        rows = out.collect()
        assert len(rows) == 5
        kinds = {r["feed_url"]: r["kind"] for r in rows}
        assert kinds["https://a.example/feed"] == "rss"
        assert kinds["https://b.example/feed"] == "atom"

    def test_adapter_feeds_sitemap_planner(self, spark):
        from spider_spark.sources.sitemap import sitemap_refresh_plan

        feeds = spark.createDataFrame(
            [("https://b.example/feed", ATOM)], "url string, xml string")
        entries = feed_refresh_entries(feed_entries(feeds))
        fetched = spark.createDataFrame(
            # e1 fetched BEFORE its updated ts → changed; e2 never → new
            [("https://b.example/e1", T0 - 10)],
            "url string, fetch_epoch long",
        )
        plan = sitemap_refresh_plan(
            entries, fetched, now_epoch=T0 + 10, default_ttl_sec=86_400)
        got = {r["loc"]: r["reason"] for r in plan.collect()}
        assert got == {
            "https://b.example/e1": "changed",
            "https://b.example/e2": "new",
        }
        # lastmod carried into the plan = coalesce(updated, published)
        lm = {r["loc"]: r["lastmod_epoch"] for r in plan.collect()}
        assert lm["https://b.example/e1"] == 1704153600
