"""robots.txt parser (functions/robots.py): RFC 9309 group semantics,
de-facto extensions (Crawl-delay, Sitemap), and the wiring into the
politeness join and sitemap ingestion."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark.functions.robots import parse_robots_df, parse_robots_txt
from spider_spark.operators.politeness import RobotsRules, apply_robots


BASIC = """
# corpus-wide rules
User-agent: *
Disallow: /private/
Disallow: /tmp/
Crawl-delay: 2

Sitemap: https://a.example/sitemap.xml
"""


class TestKernel:
    def test_star_group(self):
        dis, delay, maps = parse_robots_txt(BASIC, agent="spider")
        assert dis == ["/private/", "/tmp/"]
        assert delay == 2.0
        assert maps == ["https://a.example/sitemap.xml"]

    def test_exact_agent_overrides_star(self):
        body = """
        User-agent: *
        Disallow: /all/
        User-agent: Spider
        Disallow: /spider-only/
        Crawl-delay: 9
        """
        dis, delay, _ = parse_robots_txt(body, agent="spider")
        assert dis == ["/spider-only/"]  # exact match wins, star ignored
        assert delay == 9.0
        dis2, delay2, _ = parse_robots_txt(body, agent="otherbot")
        assert dis2 == ["/all/"]
        assert delay2 is None

    def test_consecutive_agents_share_group(self):
        body = "User-agent: a\nUser-agent: b\nDisallow: /x/"
        assert parse_robots_txt(body, agent="b")[0] == ["/x/"]
        assert parse_robots_txt(body, agent="a")[0] == ["/x/"]

    def test_agent_after_rules_starts_new_group(self):
        body = "User-agent: a\nDisallow: /x/\nUser-agent: b\nDisallow: /y/"
        assert parse_robots_txt(body, agent="a")[0] == ["/x/"]
        assert parse_robots_txt(body, agent="b")[0] == ["/y/"]

    def test_multiple_groups_same_agent_merge(self):
        body = ("User-agent: spider\nDisallow: /x/\n"
                "User-agent: other\nDisallow: /z/\n"
                "User-agent: spider\nDisallow: /y/\nCrawl-delay: 3\n")
        dis, delay, _ = parse_robots_txt(body, agent="spider")
        assert dis == ["/x/", "/y/"]
        assert delay == 3.0

    def test_empty_disallow_allows_everything(self):
        assert parse_robots_txt("User-agent: *\nDisallow:")[0] == []

    def test_sitemap_is_global(self):
        body = ("User-agent: other\nDisallow: /x/\n"
                "Sitemap: https://s.example/1.xml\n"
                "User-agent: *\nSitemap: https://s.example/2.xml\n")
        _, _, maps = parse_robots_txt(body, agent="spider")
        assert maps == ["https://s.example/1.xml", "https://s.example/2.xml"]

    def test_noise_tolerated(self):
        body = ("junk line without colon\n"
                "Disallow: /orphan-rule-before-any-group/\n"
                "USER-AGENT: *   # caps + trailing comment\n"
                "unknown-field: whatever\n"
                "DISALLOW: /a/\n"
                "Crawl-delay: not-a-number\n"
                "Crawl-delay: 5\n"
                "Crawl-delay: 1.5\n")
        dis, delay, _ = parse_robots_txt(body, agent="spider")
        assert dis == ["/a/"]
        assert delay == 1.5  # min of the valid values

    def test_empty_and_none(self):
        assert parse_robots_txt("") == ([], None, [])
        assert parse_robots_txt(None) == ([], None, [])


class TestLikeCompile:
    def test_star_and_anchor(self):
        from spider_spark.functions.robots import compile_like_pattern as c

        assert c("/p/*") == "/p/%%"          # trailing * then implicit suffix
        assert c("/*.zip$") == "/%.zip"      # $ drops the implicit suffix
        assert c("/a") == "/a%"              # plain prefix
        assert c("/a$") == "/a"              # exact match only

    def test_literal_specials_escaped(self):
        from spider_spark.functions.robots import compile_like_pattern as c

        assert c("/u_x/") == "/u^_x/%"
        assert c("/100%/") == "/100^%/%"
        assert c("/c^d/") == "/c^^d/%"

    def test_dollar_mid_pattern_is_literal(self):
        from spider_spark.functions.robots import compile_like_pattern as c

        assert c("/a$b/") == "/a$b/%"

    def test_allow_rules_carried_with_rank(self):
        from spider_spark.functions.robots import _parse_groups

        rules, _, _ = _parse_groups(
            "User-agent: *\nDisallow: /p/\nAllow: /p/open\nAllow:\n")
        assert rules == [("/p/", False), ("/p/open", True)]  # empty Allow no-op

    def test_back_compat_prefix_view_drops_allows(self):
        dis, _, _ = parse_robots_txt(
            "User-agent: *\nDisallow: /p/\nAllow: /p/open\n")
        assert dis == ["/p/"]


class TestFullMatchGate:
    """RFC 9309 longest-match verdict through the production politeness
    gate (operators/politeness.robots_verdict_blocked via apply_robots)."""

    BODY = ("User-agent: *\n"
            "Disallow: /private/*\n"
            "Allow: /private/*open*\n"
            "Disallow: /*.zip$\n"
            "Disallow: /t/\n"
            "Allow: /t/\n"            # equal octets → Allow wins
            "Disallow: /u_x/\n")

    def _gate(self, spark, paths):
        robots = spark.createDataFrame(
            [("h.example", self.BODY)], "host string, robots_txt string")
        rules = RobotsRules.from_df(parse_robots_df(robots))
        frontier = spark.createDataFrame(
            [("h.example", f"http://h.example{p}") for p in paths],
            "host string, canon_url string")
        allowed, blocked = apply_robots(frontier, rules)
        pfx = len("http://h.example")
        return ({r["canon_url"][pfx:] for r in allowed.collect()},
                {r["canon_url"][pfx:] for r in blocked.collect()})

    def test_wildcard_anchor_override_tie_escape(self, spark):
        allowed, blocked = self._gate(spark, [
            "/private/doc",      # Disallow /private/*
            "/private/open1",    # Allow /private/*open* (longer) overrides
            "/a.zip",            # $-anchored Disallow hits
            "/a.zipx",           # $ anchor → no match
            "/t/x",              # tie at equal length → Allow
            "/u_x/y",            # literal underscore matches
            "/uax/y",            # `_` escaped: must NOT wildcard-match
            "/ok",               # no rule → allowed
        ])
        assert blocked == {"/private/doc", "/a.zip", "/u_x/y"}
        assert allowed == {"/private/open1", "/a.zipx", "/t/x", "/uax/y",
                           "/ok"}

    def test_legacy_table_without_rules_stays_prefix_gate(self, spark):
        # A stored rules table lacking the compiled `rules` column keeps
        # the conservative prefix-disallow semantics (Allow ignored).
        legacy = spark.createDataFrame(
            [("h.example", ["/private/"], None)],
            "host string, disallow_prefixes array<string>, "
            "crawl_delay double")
        rules = RobotsRules.from_df(legacy)
        frontier = spark.createDataFrame(
            [("h.example", "http://h.example/private/open1"),
             ("h.example", "http://h.example/ok")],
            "host string, canon_url string")
        _, blocked = apply_robots(frontier, rules)
        assert [r["canon_url"] for r in blocked.collect()] == [
            "http://h.example/private/open1"]

    def test_no_python_in_per_url_verdict(self, spark):
        # The verdict fold is a JVM aggregate: the gate's plan over an
        # already-parsed rules table must contain no Python eval node.
        parsed = spark.createDataFrame(
            [("h.example", ["/p/"], None,
              [("/p/%%", 4, False), ("/p/%open%%", 9, True)])],
            "host string, disallow_prefixes array<string>, "
            "crawl_delay double, "
            "rules array<struct<lk string, len int, allow boolean>>")
        rules = RobotsRules.from_df(parsed)
        frontier = spark.createDataFrame(
            [("h.example", "http://h.example/p/doc")],
            "host string, canon_url string")
        allowed, blocked = apply_robots(frontier, rules)
        for df in (allowed, blocked):
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "Python" not in plan, plan
        assert blocked.count() == 1


class TestSparkWiring:
    def test_parse_df_shape(self, spark):
        df = spark.createDataFrame(
            [("a.example", BASIC), ("b.example", "")],
            "host string, robots_txt string",
        )
        rows = {r["host"]: r for r in parse_robots_df(df).collect()}
        assert rows["a.example"]["disallow_prefixes"] == ["/private/", "/tmp/"]
        assert rows["a.example"]["crawl_delay"] == 2.0
        assert rows["b.example"]["disallow_prefixes"] == []
        assert rows["b.example"]["crawl_delay"] is None

    def test_feeds_politeness_join(self, spark):
        robots = spark.createDataFrame(
            [("h1.example",
              "User-agent: *\nDisallow: /private/\nCrawl-delay: 30")],
            "host string, robots_txt string",
        )
        rules = RobotsRules.from_df(parse_robots_df(robots))
        frontier = spark.createDataFrame(
            [
                ("h1.example", "http://h1.example/private/x"),
                ("h1.example", "http://h1.example/ok"),
                ("h2.example", "http://h2.example/private/x"),
            ],
            "host string, canon_url string",
        )
        allowed, blocked = apply_robots(frontier, rules)
        assert sorted(r["canon_url"] for r in blocked.collect()) == [
            "http://h1.example/private/x"
        ]
        caps = {
            (r["host"], r["canon_url"]): r["__delay_cap"]
            for r in allowed.collect()
        }
        assert caps[("h1.example", "http://h1.example/ok")] == 2  # 60/30
        assert caps[("h2.example", "http://h2.example/private/x")] is None

    def test_sitemaps_feed_sitemap_ingestion(self, spark):
        from spider_spark.sources.sitemap import sitemap_entries

        robots = spark.createDataFrame(
            [("a.example",
              "Sitemap: https://a.example/s1.xml\n"
              "Sitemap: https://a.example/s2.xml\nUser-agent: *\n")],
            "host string, robots_txt string",
        )
        discovered = (
            parse_robots_df(robots)
            .select(F.explode("sitemaps").alias("url"))
        )
        xml = (
            '<?xml version="1.0"?>'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            "<url><loc>https://a.example/p1</loc>"
            "<lastmod>2024-01-02</lastmod></url></urlset>"
        )
        fetched = discovered.withColumn("xml", F.lit(xml))
        entries = sitemap_entries(fetched, xml_col="xml").collect()
        assert len(entries) == 2  # one per discovered sitemap
        assert {r["loc"] for r in entries} == {"https://a.example/p1"}
