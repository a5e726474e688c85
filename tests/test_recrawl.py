"""Recrawl scheduling + the continuous-crawl loop (cuckoo forget path)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from spider_spark.operators.cuckoo import build_cuckoo, delete_from, filter_unseen_cuckoo
from spider_spark.operators.recrawl import recrawl_due, recrawl_due_sql
from spider_spark.sources.pages import PAGES_EPOCH, synthetic_pages


@pytest.fixture(scope="module")
def pages(spark):
    return synthetic_pages(spark, 200, partitions=4).localCheckpoint(eager=True)


class TestRecrawlDue:
    def test_no_jitter_is_a_sharp_ttl(self, spark, pages):
        # warc_ts = EPOCH + id → age at now = EPOCH + 150 is 150 - id
        out = recrawl_due(pages, PAGES_EPOCH + 150, ttl_sec=100, jitter_frac=0.0)
        got = {r["url"] for r in out.collect()}
        want = {
            r["url"]
            for r in pages.filter(
                F.unix_timestamp("warc_ts") <= PAGES_EPOCH + 50
            ).collect()
        }
        assert got == want
        ages = {r["url"]: r["age_sec"] for r in out.collect()}
        assert all(a >= 100 for a in ages.values())

    def test_jitter_spreads_the_wave(self, spark, pages):
        sharp = recrawl_due(pages, PAGES_EPOCH + 150, 100, jitter_frac=0.0)
        jittered = recrawl_due(pages, PAGES_EPOCH + 150, 100, jitter_frac=0.5)
        s, j = sharp.count(), jittered.count()
        assert j > s, "jitter can only pull TTLs earlier (superset of due)"
        # everything due sharply is also due jittered
        extra = sharp.join(jittered, on="url", how="left_anti").count()
        assert extra == 0
        # but not EVERYTHING became due: the wave is spread, not collapsed
        assert j < pages.count()

    def test_urgency_ordering_and_bounds(self, spark, pages):
        out = recrawl_due(pages, PAGES_EPOCH + 150, 100, jitter_frac=0.2)
        rows = out.collect()
        assert all(r["urgency"] >= 1.0 for r in rows)
        # each row's urgency is bounded by its age over the jitter band
        for r in rows:
            assert r["age_sec"] / 100.0 <= r["urgency"] <= r["age_sec"] / 80.0
        # without jitter, urgency IS age/ttl → the oldest page ranks first
        sharp = recrawl_due(pages, PAGES_EPOCH + 150, 100, jitter_frac=0.0).collect()
        top = max(sharp, key=lambda r: r["urgency"])
        assert top["age_sec"] == max(r["age_sec"] for r in sharp)

    def test_matches_duckdb_mirror(self, spark, pages):
        out = recrawl_due(pages, PAGES_EPOCH + 150, 100, jitter_frac=0.3)
        got = {(r["url"], r["age_sec"], round(r["urgency"], 9)) for r in out.collect()}
        con = duckdb.connect()
        con.register(
            "pages",
            pages.select("url", F.unix_timestamp("warc_ts").alias("ts")).toPandas(),
        )
        sql = recrawl_due_sql(
            PAGES_EPOCH + 150, 100, jitter_frac=0.3, ts_epoch_expr="ts"
        )
        want = {(u, a, round(x, 9)) for u, a, x in con.execute(sql).fetchall()}
        assert got == want

    def test_rejects_bad_params(self, pages):
        with pytest.raises(ValueError):
            recrawl_due(pages, PAGES_EPOCH, ttl_sec=0)
        with pytest.raises(ValueError):
            recrawl_due(pages, PAGES_EPOCH, ttl_sec=10, jitter_frac=1.0)

    def test_ttl_mult_scales_the_policy(self, spark, pages):
        # a uniform 0.5 multiplier must equal a halved base TTL exactly
        pm = pages.withColumn("m", F.lit(0.5))
        fast = recrawl_due(pm, PAGES_EPOCH + 150, 100, jitter_frac=0.2,
                           ttl_mult_col="m")
        halved = recrawl_due(pages, PAGES_EPOCH + 150, 50, jitter_frac=0.2)
        got = {(r["url"], r["age_sec"], round(r["urgency"], 9))
               for r in fast.collect()}
        want = {(r["url"], r["age_sec"], round(r["urgency"], 9))
                for r in halved.collect()}
        assert got == want
        # per-row multipliers: changed pages (even ids) come due at ages
        # where stable pages (odd ids, 2x TTL) do not
        pm2 = pages.withColumn(
            "m",
            F.when(F.unix_timestamp("warc_ts") % 2 == 0, F.lit(0.5))
            .otherwise(F.lit(2.0)),
        )
        out = recrawl_due(pm2, PAGES_EPOCH + 150, 100, jitter_frac=0.0,
                          ttl_mult_col="m")
        ages = [(r["age_sec"], r["url"]) for r in out.collect()]
        assert any(a < 100 for a, _ in ages), "fast pages due before base TTL"
        # every due page younger than the slow TTL must be a fast one
        fast = {r["url"] for r in pm2.filter("m = 0.5").collect()}
        assert all(u in fast for a, u in ages if a < 200)

    def test_ttl_mult_matches_duckdb_mirror(self, spark, pages):
        pm = pages.withColumn(
            "m",
            F.when(F.unix_timestamp("warc_ts") % 3 == 0, F.lit(0.5))
            .otherwise(F.lit(2.0)),
        )
        out = recrawl_due(pm, PAGES_EPOCH + 150, 100, jitter_frac=0.3,
                          ttl_mult_col="m")
        got = {(r["url"], r["age_sec"], round(r["urgency"], 9)) for r in out.collect()}
        con = duckdb.connect()
        con.register(
            "pages",
            pm.select("url", F.unix_timestamp("warc_ts").alias("ts"), "m").toPandas(),
        )
        sql = recrawl_due_sql(
            PAGES_EPOCH + 150, 100, jitter_frac=0.3, ts_epoch_expr="ts",
            ttl_mult_expr="m",
        )
        want = {(u, a, round(x, 9)) for u, a, x in con.execute(sql).fetchall()}
        assert got == want

    def test_pushdown_no_shuffle(self, pages):
        plan = (
            recrawl_due(pages, PAGES_EPOCH + 150, 100)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, "recrawl_due must be a scan-local decision"


class TestContinuousCrawlLoop:
    """The seen-set forget path: stale URLs leave the cuckoo filter and the
    exact seen table, and the unseen gate re-admits exactly them — the
    operator composition a continuous crawler loops on."""

    def test_expire_then_readmit(self, spark, pages):
        urls = pages.select("url", "warc_ts")
        ck = build_cuckoo(urls, "url", n_shards=2)
        # nothing re-admitted while everything is fresh
        assert filter_unseen_cuckoo(urls, "url", urls, ck).count() == 0
        due = recrawl_due(pages, PAGES_EPOCH + 150, 100, jitter_frac=0.2)
        n_due = due.count()
        assert 0 < n_due < pages.count(), "fixture must expire a strict subset"
        delete_from(ck, due, "url")
        fresh_seen = urls.join(due, on="url", how="left_anti")
        readmitted = filter_unseen_cuckoo(urls, "url", fresh_seen, ck)
        got = {r["url"] for r in readmitted.select("url").collect()}
        assert got == {r["url"] for r in due.collect()}
        ck.destroy_broadcasts()


class TestCaptureChangeRates:
    @pytest.fixture(scope="class")
    def captures(self, spark):
        rows = [
            # u0: 3 captures, content changes both times → interval = span/3
            ("u0", 100, "a"), ("u0", 200, "b"), ("u0", 400, "c"),
            # u1: 3 captures, never changes → interval = span/1 = span
            ("u1", 100, "x"), ("u1", 300, "x"), ("u1", 700, "x"),
            # u2: 2 captures, one change
            ("u2", 0, "p"), ("u2", 500, "q"),
            # u3: a single capture → filtered by min_caps
            ("u3", 42, "z"),
        ]
        return spark.createDataFrame(rows, "url string, ts long, digest string").cache()

    def test_change_counting_and_intervals(self, spark, captures):
        from spider_spark.operators.recrawl import capture_change_rates

        got = {r["url"]: (r["n_caps"], r["n_changes"], r["span_sec"],
                          r["change_interval_sec"])
               for r in capture_change_rates(captures).collect()}
        assert got["u0"] == (3, 2, 300, 100)
        assert got["u1"] == (3, 0, 600, 600)
        assert got["u2"] == (2, 1, 500, 250)
        assert "u3" not in got

    def test_matches_duckdb_mirror(self, spark, captures):
        import duckdb

        from spider_spark.operators.recrawl import (
            capture_change_rates,
            capture_change_rates_sql,
        )

        got = sorted(tuple(r) for r in capture_change_rates(captures).collect())
        con = duckdb.connect()
        con.register("caps", captures.toPandas())
        want = sorted(tuple(r) for r in
                      con.execute(capture_change_rates_sql("caps")).fetchall())
        assert got == want

    def test_single_exchange_plan(self, captures):
        from spider_spark.operators.recrawl import capture_change_rates

        plan = (
            capture_change_rates(captures)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange") == 1, (
            "window and agg share the url key — one shuffle total\n" + plan)
