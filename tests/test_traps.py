"""Crawl-trap detection: per-URL structural signals, host verdicts, and
bit-exact DuckDB-mirror parity (operators/traps.py)."""

from __future__ import annotations

import duckdb
import pytest

from spider_spark.operators.traps import trap_hosts, trap_hosts_sql, url_structure


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
