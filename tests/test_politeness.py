"""Politeness scheduler tests: per-host budget top-k (salted two-stage),
robots disallow/crawl-delay, and budget round-carryover in the engine."""

import pytest
from pyspark.sql import functions as F

from spider_spark.operators.politeness import RobotsRules, apply_robots, schedule
from spider_spark.plans.crawl import CrawlConfig, CrawlEngine
from spider_spark.sources.pages import synthetic_pages


@pytest.fixture(scope="module")
def frontier(spark):
    rows = [
        (f"https://h{h}.example/p/{i}", f"h{h}.example", 1,
         "https://seed/", "https://seed/", h * 100 + i, 1)
        for h in range(3)
        for i in range(10)
    ]
    return spark.createDataFrame(
        rows,
        "canon_url string, host string, depth int, seed string, parent string, "
        "admission_rank long, round_admitted int",
    ).cache()


class TestSchedule:
    def test_budget_topk_per_host(self, frontier):
        eligible, carryover, blocked = schedule(frontier, budget=4, salt=4)
        el = eligible.collect()
        assert len(el) == 12  # 4 × 3 hosts
        by_host = {}
        for r in el:
            by_host.setdefault(r["host"], []).append(r["admission_rank"])
        for h in range(3):
            # exact top-4 by (depth, admission_rank) — the priority queue
            assert sorted(by_host[f"h{h}.example"]) == [
                h * 100, h * 100 + 1, h * 100 + 2, h * 100 + 3
            ]
        assert carryover.count() == 18
        assert blocked.count() == 0
        # partition: eligible ∪ carryover == frontier exactly
        assert (
            eligible.unionByName(carryover).select("canon_url").distinct().count()
            == 30
        )

    def test_unlimited_budget_passthrough(self, frontier):
        eligible, carryover, blocked = schedule(frontier, budget=None)
        assert eligible.count() == 30
        assert carryover.count() == 0


class TestRobots:
    def test_disallow_prefix_blocks(self, frontier):
        rules = RobotsRules(
            disallow={"h1.example": ("/p/",)}, crawl_delay={}
        )
        allowed, blocked = apply_robots(frontier, rules)
        assert blocked.count() == 10
        assert {r["host"] for r in blocked.collect()} == {"h1.example"}
        assert allowed.count() == 20

    def test_crawl_delay_caps_budget(self, frontier):
        rules = RobotsRules(
            disallow={}, crawl_delay={"h2.example": 30.0}  # 60s window → 2 fetches
        )
        eligible, carryover, _ = schedule(frontier, budget=5, rules=rules)
        by_host = {}
        for r in eligible.collect():
            by_host[r["host"]] = by_host.get(r["host"], 0) + 1
        assert by_host["h0.example"] == 5
        assert by_host["h1.example"] == 5
        assert by_host["h2.example"] == 2


class TestRobotsTTL:
    def test_expired_rules_stop_constraining(self, spark):
        import datetime as dt

        now = dt.datetime(2024, 6, 1, 12, 0, 0)
        robots = spark.createDataFrame(
            [
                ("h1.example", ["/p/"], 0.0, now - dt.timedelta(hours=1)),
                ("h2.example", ["/p/"], 0.0, now - dt.timedelta(days=7)),
                ("h3.example", ["/p/"], 0.0, None),
            ],
            "host string, disallow_prefixes array<string>, crawl_delay double, "
            "fetched_ts timestamp",
        )
        rules = RobotsRules.from_df(robots, now=now, ttl_sec=24 * 3600)
        assert "h1.example" in rules.disallow      # fresh
        assert "h2.example" not in rules.disallow  # stale → expired
        assert "h3.example" not in rules.disallow  # never fetched → no cache
        # no TTL configured → everything applies
        rules_all = RobotsRules.from_df(robots)
        assert set(rules_all.disallow) == {"h1.example", "h2.example", "h3.example"}


class TestEngineRobots:
    def test_blocked_urls_never_fetched_or_seen(self, spark):
        # graph note: odd ids only link to odd ids, and every even id is on
        # h0 — so from an odd seed, block an odd-id host that IS reachable:
        # seed id 7 (h8) reaches id 23 (h5) at depth 2
        pages = synthetic_pages(spark, 100).localCheckpoint(eager=True)
        robots = spark.createDataFrame(
            [("h5.example", ["/d/"], 0.0)],
            "host string, disallow_prefixes array<string>, crawl_delay double",
        )
        eng = CrawlEngine(
            spark, pages, CrawlConfig(depth=3, verify_text=False), robots=robots
        )
        res = eng.crawl("https://h8.example/d/7")
        fetched_hosts = {
            r["url"].split("/")[2]
            for r in res.results.filter(F.col("fetched")).collect()
        }
        assert "h5.example" not in fetched_hosts
        assert sum(m.blocked for m in res.metrics) > 0
