"""Domain blocklist scrub: suffix semantics, audit view, DuckDB parity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from spider_spark.operators.blocklist import (
    blocklist_filter,
    blocklist_filter_sql,
    host_of,
    host_suffixes,
)

URLS = [
    "http://ads.example/x",              # blocked: exact domain
    "http://tracker.ads.example/y",      # blocked: subdomain of blocked
    "https://a.b.tracker.ads.example/z", # blocked: deep subdomain
    "http://example/ok",                 # kept: parent of a blocked domain
    "http://notads.example/ok",          # kept: suffix must align on a dot
    "http://ads.example.com/ok",         # kept: different registrable domain
    "http://clean.site/ok",              # kept
    "relative/path",                     # kept: no host
    "http://ADS.Example/upper",          # blocked: case-insensitive host
]
BLOCKED = ["ads.example", "evil.test"]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame([(u,) for u in URLS], ["url"]).cache()


@pytest.fixture(scope="module")
def blocked_df(spark):
    return spark.createDataFrame([(d,) for d in BLOCKED], ["domain"])


class TestHostParsing:
    def test_host_of(self, spark):
        df = spark.range(1).select(
            host_of(F.lit("HTTPS://Sub.Host.Example:8080/p?q#f")).alias("h"),
            host_of(F.lit("no/scheme")).alias("r"),
        )
        row = df.collect()[0]
        assert row["h"] == "sub.host.example"
        assert row["r"] == ""

    def test_suffixes_shortest_first_capped(self, spark):
        df = spark.range(1).select(
            host_suffixes(F.lit("a.b.c.example"), max_labels=3).alias("s")
        )
        assert df.collect()[0]["s"] == ["example", "c.example", "b.c.example"]


class TestBlocklistFilter:
    def test_suffix_semantics(self, spark, pages, blocked_df):
        kept = {r["url"] for r in blocklist_filter(pages, "url", blocked_df).collect()}
        assert kept == {
            "http://example/ok",
            "http://notads.example/ok",
            "http://ads.example.com/ok",
            "http://clean.site/ok",
            "relative/path",
        }

    def test_audit_view_is_complement(self, spark, pages, blocked_df):
        kept = {r["url"] for r in blocklist_filter(pages, "url", blocked_df).collect()}
        hit = {
            r["url"]
            for r in blocklist_filter(
                pages, "url", blocked_df, keep_blocked=True
            ).collect()
        }
        assert kept | hit == set(URLS) and not kept & hit

    def test_deep_subdomain_matches_past_label_cap(self, spark, blocked_df):
        # 8-label host, max_labels=6: the blocked 2-label suffix is still
        # among the generated (shortest-first) suffixes.
        deep = spark.createDataFrame(
            [("http://a.b.c.d.e.f.ads.example/deep",)], ["url"]
        )
        assert blocklist_filter(deep, "url", blocked_df).count() == 0

    def test_extra_columns_survive(self, spark, blocked_df):
        df = spark.createDataFrame(
            [("http://clean.site/1", 7), ("http://ads.example/2", 8)],
            ["url", "payload"],
        )
        out = blocklist_filter(df, "url", blocked_df).collect()
        assert [(r["url"], r["payload"]) for r in out] == [
            ("http://clean.site/1", 7)
        ]

    def test_matches_duckdb_mirror(self, spark, pages, blocked_df):
        got = {r["url"] for r in blocklist_filter(pages, "url", blocked_df).collect()}
        con = duckdb.connect()
        con.register("pages_t", pages.toPandas())
        sql = blocklist_filter_sql("SELECT url FROM pages_t", BLOCKED)
        want = {r[0] for r in con.execute(sql).fetchall()}
        assert got == want

    def test_audit_matches_duckdb_mirror(self, spark, pages, blocked_df):
        got = {
            r["url"]
            for r in blocklist_filter(
                pages, "url", blocked_df, keep_blocked=True
            ).collect()
        }
        con = duckdb.connect()
        con.register("pages_t", pages.toPandas())
        sql = blocklist_filter_sql(
            "SELECT url FROM pages_t", BLOCKED, keep_blocked=True
        )
        want = {r[0] for r in con.execute(sql).fetchall()}
        assert got == want
