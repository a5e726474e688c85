"""Crawl-trap detection: per-URL structural signals, host verdicts, and
bit-exact DuckDB-mirror parity (operators/traps.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from spider_spark.operators.traps import (
    host_stats,
    merge_host_stats,
    trap_hosts,
    trap_hosts_sql,
    trap_verdict,
    url_structure,
)


def _urls(spark, rows):
    return spark.createDataFrame([(u,) for u in rows], "url string")


class TestUrlStructure:
    def test_signals(self, spark):
        df = url_structure(_urls(spark, [
            "https://a.example/d/1",                    # depth 2
            "https://A.EXAMPLE:8080/",                   # depth 0, port+case
            "https://b.example/x/y/x",                   # repeated segment
            "https://c.example/p?q=1",                   # query
            "https://d.example",                         # no path at all
        ]))
        got = {r["url"]: r.asDict() for r in df.collect()}
        r1 = got["https://a.example/d/1"]
        assert (r1["host"], r1["depth"], r1["has_repeat"], r1["has_query"]) == \
            ("a.example", 2, False, False)
        r2 = got["https://A.EXAMPLE:8080/"]
        assert (r2["host"], r2["depth"]) == ("a.example", 0)
        assert got["https://b.example/x/y/x"]["has_repeat"] is True
        assert got["https://c.example/p?q=1"]["has_query"] is True
        assert got["https://d.example"]["depth"] == 0


class TestTrapHosts:
    @pytest.fixture(scope="class")
    def log(self, spark):
        rows = [f"https://ok.example/d/{i}" for i in range(20)]
        # calendar loop: deep, repeated segments
        rows += [f"https://cal.example{'/2024' * 6}/p{i}" for i in range(20)]
        # session-id mill: every URL carries a query string
        rows += [f"https://mill.example/d/{i}?sid={i}" for i in range(20)]
        # trap-shaped but below min_urls
        rows += [f"https://tiny.example{'/2024' * 6}/p{i}" for i in range(3)]
        return _urls(spark, rows)

    def test_verdicts(self, spark, log):
        got = {r["host"]: r.asDict() for r in trap_hosts(log).collect()}
        assert got["ok.example"]["is_trap"] is False
        assert got["cal.example"]["is_trap"] is True
        assert got["cal.example"]["n_repeat"] == 20
        assert got["cal.example"]["max_depth"] == 7
        assert got["mill.example"]["is_trap"] is True
        assert got["mill.example"]["n_query"] == 20
        assert got["tiny.example"]["is_trap"] is False  # min_urls gate

    def test_sql_mirror_bit_exact(self, spark, log):
        spark_rows = sorted(
            tuple(r) for r in trap_hosts(log).collect()
        )
        pdf = log.toPandas()  # noqa: F841 — registered below
        con = duckdb.connect()
        con.register("urls", pdf)
        duck_rows = sorted(
            tuple(r) for r in con.execute(trap_hosts_sql("urls")).fetchall()
        )
        assert spark_rows == duck_rows


class TestIncrementalStats:
    def test_merged_deltas_equal_full_log(self, spark):
        """Associativity contract: per-batch host_stats folded via
        merge_host_stats == one aggregation over the concatenated log —
        the invariant the in-crawl guard's round accrual rests on."""
        rows = [f"https://a.example/d/{i}" for i in range(7)]
        rows += [f"https://b.example{'/x' * (i % 4)}/p?s={i}" for i in range(9)]
        full = _urls(spark, rows)
        a, b = _urls(spark, rows[:5]), _urls(spark, rows[5:])
        merged = sorted(
            tuple(r) for r in
            merge_host_stats(host_stats(a), host_stats(b)).collect()
        )
        whole = sorted(tuple(r) for r in host_stats(full).collect())
        assert merged == whole
        # and verdicts over merged stats == one-shot trap_hosts
        v_merged = sorted(tuple(r) for r in trap_verdict(
            merge_host_stats(host_stats(a), host_stats(b)), min_urls=5
        ).collect())
        v_full = sorted(
            tuple(r) for r in trap_hosts(full, min_urls=5).collect()
        )
        assert v_merged == v_full


def _trap_pages(spark, n):
    """synthetic_pages + one textless anchor per page to a DISTINCT
    trap-host URL with repeated path segments (depth varies per id). The
    empty anchor adds no text, so the byte-identical text invariant
    still holds through the kernel."""
    from spider_spark.sources.pages import synthetic_pages

    pages = synthetic_pages(spark, n)
    tid = F.regexp_extract("url", r"/d/(\d+)", 1).cast("long")
    h = F.col("html").cast("string")
    trap = F.concat(
        F.lit('<a href="https://cal.trap.example'),
        F.expr("repeat('/2024', CAST(2 + _tid % 5 AS INT))"),
        F.lit('/p'), F.col("_tid").cast("string"), F.lit('"></a>'),
    )
    return (
        pages.withColumn("_tid", tid)
        .withColumn(
            "html",
            F.encode(
                F.concat(
                    h.substr(F.lit(1), F.length(h) - 14),
                    trap,
                    F.lit("</body></html>"),
                ),
                "UTF-8",
            ),
        )
        .drop("_tid")
    )


GUARD = {"min_urls": 5, "repeat_frac_milli": 300}


class TestDynamicTrapGuard:
    """In-crawl trap detection (CrawlEngine(trap_guard=...)): the trap
    host accrues structural stats round by round, crosses the threshold
    mid-crawl, and its links stop being admitted from the next round."""

    def _trap_admissions(self, res):
        return res.seen.filter(
            F.col("canon_url").contains("cal.trap.example")
        ).count()

    def test_guard_blocks_mid_crawl(self, spark):
        from spider_spark.plans.crawl import CrawlConfig, CrawlEngine

        pages = _trap_pages(spark, 300).localCheckpoint(eager=True)
        free = CrawlEngine(spark, pages, CrawlConfig(depth=5)).crawl(
            "h0.example/d/0"
        )
        eng = CrawlEngine(spark, pages, CrawlConfig(depth=5),
                          trap_guard=GUARD)
        gated = eng.crawl("h0.example/d/0")
        blocked = [r["host"] for r in eng.dynamic_blocked_hosts.collect()]
        assert blocked == ["cal.trap.example"]
        n_free, n_gated = (
            self._trap_admissions(free), self._trap_admissions(gated)
        )
        assert 0 < n_gated < n_free  # pre-flag admissions stay; flood stops
        # real-page results identical: the guard only ever drops trap links
        real = lambda r: sorted(  # noqa: E731
            tuple(x) for x in r.results.filter(
                ~F.col("url").contains("cal.trap")
            ).select("url", "depth", "fetched").collect()
        )
        assert real(free) == real(gated)

    def test_guard_deterministic(self, spark):
        from spider_spark.plans.crawl import CrawlConfig, CrawlEngine

        pages = _trap_pages(spark, 200).localCheckpoint(eager=True)
        runs = []
        for _ in range(2):
            eng = CrawlEngine(spark, pages, CrawlConfig(depth=4),
                              trap_guard=GUARD)
            res = eng.crawl("h0.example/d/0")
            runs.append(sorted(
                tuple(r) for r in res.seen.select(
                    "canon_url", "depth", "admission_rank"
                ).collect()
            ))
        assert runs[0] == runs[1]

    def test_continuous_carries_stats_across_waves(self, spark):
        from spider_spark.plans.continuous import ContinuousCrawler
        from spider_spark.plans.crawl import CrawlConfig

        pages = _trap_pages(spark, 120).localCheckpoint(eager=True)
        c = ContinuousCrawler(
            spark, pages, CrawlConfig(depth=3),
            expected_urls=10_000, trap_guard=GUARD,
        )
        c.bootstrap("h0.example/d/0")
        assert c.trap_stats is not None
        r1 = c.wave(now_epoch=1_900_000_000, ttl_sec=600)
        assert r1.trap_blocked == 1  # flagged state survives the wave
        # stats kept accruing (merge across waves, never reset)
        n = c.trap_stats.filter(
            F.col("host") == "cal.trap.example"
        ).collect()[0]["n_urls"]
        assert n >= 5


class TestCrawlHostGate:
    """The engine's blocked_hosts link-admission gate (plans/crawl.py):
    blocked links are dropped before the dedupe shuffle — never admitted,
    never fetched, never recorded — and the crawl matches the blocked
    recursive-CTE oracle exactly."""

    SEED, DEPTH, N = 0, 4, 500

    def _oracle(self, sf_dir, blocked):
        from spider_spark.sources.pages import oracle_results_sql

        con = duckdb.connect()
        con.sql(f"create view documents as"
                f" select * from '{sf_dir}/documents.parquet'")
        df = con.sql(
            oracle_results_sql(self.SEED, self.DEPTH, blocked_host=blocked)
        ).df()
        return {
            (r.url, int(r.depth), bool(r.fetched)) for r in df.itertuples()
        }

    def _engine(self, result):
        return {
            (r["url"], r["depth"], r["fetched"])
            for r in result.results.select("url", "depth", "fetched").collect()
        }

    def test_blocked_crawl_matches_oracle(self, spark, sf_dir):
        from spider_spark.plans.crawl import CrawlConfig, CrawlEngine
        from spider_spark.sources.pages import pages_from_documents, seed_url_for

        pages = pages_from_documents(spark, sf_dir).localCheckpoint(eager=True)
        eng = CrawlEngine(spark, pages, CrawlConfig(depth=self.DEPTH),
                          blocked_hosts=["h5.example"])
        got = self._engine(eng.crawl(seed_url_for(self.SEED, self.N)))
        assert got == self._oracle(sf_dir, "h5.example")
        assert not any("h5.example" in u for u, _, _ in got)
        # the gate removed something real: vs the unblocked oracle
        assert got < self._oracle(sf_dir, None)

    def test_dataframe_blocklist_equals_list(self, spark, sf_dir):
        """A DataFrame('host') blocklist (the trap_hosts-verdict feed)
        gates identically to the broadcast list form."""
        from spider_spark.plans.crawl import CrawlConfig, CrawlEngine
        from spider_spark.sources.pages import pages_from_documents, seed_url_for

        pages = pages_from_documents(spark, sf_dir).localCheckpoint(eager=True)
        bdf = spark.createDataFrame([("H5.EXAMPLE",)], "host string")
        eng = CrawlEngine(spark, pages, CrawlConfig(depth=self.DEPTH),
                          blocked_hosts=bdf)
        got = self._engine(eng.crawl(seed_url_for(self.SEED, self.N)))
        assert got == self._oracle(sf_dir, "h5.example")
