"""CLI parity tests — mirror of the reference's controller tests
(test_db_ops_controller.py / test_config_controller.py): create/count/drop
round-trip, crawl→catch end-to-end asserting the logged record lines, and
config-file lifecycle."""

import logging

import pytest

from spider_spark import cli
from spider_spark.config import ConfigController


@pytest.fixture()
def store(tmp_path):
    return str(tmp_path / "store")


@pytest.fixture()
def run(store, monkeypatch, tmp_path, spark):
    """Invoke the CLI with a temp store + temp config; reuse the session
    SparkSession (get_spark returns the active one)."""
    monkeypatch.setenv("SPIDER_SPARK_CONFIG", str(tmp_path / "cfg.ini"))

    def _run(*argv):
        return cli.main(["--store-root", store, *argv])

    return _run


class TestConfigController:
    def test_defaults_and_update(self, tmp_path, monkeypatch):
        path = str(tmp_path / "c.ini")
        monkeypatch.setenv("SPIDER_SPARK_CONFIG", path)
        c = ConfigController()
        assert c.load().concurrency_limit == 5
        c.set("INFRASTRUCTURE", "concurrency_limit", "9")
        c.save()
        assert ConfigController(path).load().concurrency_limit == 9


class TestProxyValidation:
    def test_bad_proxy_raises(self, run, tmp_path, monkeypatch):
        """crawler.py:39-47 parity: --use-proxy with a malformed
        ``proxy_host`` (no scheme/host) raises IncorrectProxyFormatError
        before any crawl work starts."""
        from spider_spark.errors import IncorrectProxyFormatError

        c = ConfigController()
        c.set("INFRASTRUCTURE", "proxy_host", "not a url")
        c.save()
        with pytest.raises(IncorrectProxyFormatError):
            run("--pages", "synthetic:10", "crawl", "https://h0.example/d/0",
                "--depth", "0", "--use-proxy")

    def test_valid_proxy_accepted_and_ignored(self, run, caplog):
        c = ConfigController()
        c.set("INFRASTRUCTURE", "proxy_host", "http://127.0.0.1:8080")
        c.save()
        with caplog.at_level(cli.CRAWL_INFO, logger="spider_spark"):
            rc = run("--pages", "synthetic:10", "crawl",
                     "https://h0.example/d/0", "--depth", "0", "--use-proxy")
        assert rc == 0
        assert any("no effect" in r.getMessage() for r in caplog.records)


class TestCobweb:
    def test_create_count_drop(self, run, caplog):
        with caplog.at_level(cli.DB_INFO, logger="spider_spark"):
            assert run("cobweb", "create") == 0
            assert run("cobweb", "count") == 0
            assert run("cobweb", "drop") == 0
            assert run("cobweb", "count") == 1  # dropped → not found
        msgs = [r.getMessage() for r in caplog.records]
        assert "table created" in msgs
        assert "count: 0" in msgs
        assert "table dropped" in msgs
        assert any("does not exist" in m for m in msgs)


class TestCrawlCatch:
    def test_end_to_end(self, run, caplog):
        with caplog.at_level(cli.DB_INFO, logger="spider_spark"):
            rc = run(
                "--pages", "synthetic:120",
                "crawl", "https://h0.example/d/2", "--depth", "2", "--concur", "0",
            )
            assert rc == 0
            rc = run("catch", "https://h0.example/d/2", "-n", "3")
            assert rc == 0
        msgs = [r.getMessage() for r in caplog.records]
        assert any(m.startswith("crawled: ") for m in msgs)
        assert any(m.startswith("total calls: ") for m in msgs)
        # numbered records, seed first (L2 ordering)
        assert any(m.startswith("#1 https://h0.example/d/2 | ") for m in msgs)
        assert sum(1 for m in msgs if m.startswith("#")) == 3

    def test_max_fetch_per_round_same_results(self, run, spark, store, caplog):
        """--max-fetch-per-round reschedules fetches across rounds but the
        persisted results (and counters) match the uncapped crawl."""
        from spider_spark.sources.tableio import ParquetManifestIO

        assert run("--pages", "synthetic:120", "crawl",
                   "https://h0.example/d/2", "--depth", "2") == 0
        io = ParquetManifestIO(spark, store)
        base = {r["url"] for r in io.read(cli.RESULTS_TABLE).collect()}
        io.drop(cli.RESULTS_TABLE)
        assert run("--pages", "synthetic:120", "crawl",
                   "https://h0.example/d/2", "--depth", "2",
                   "--max-fetch-per-round", "3") == 0
        capped = {r["url"] for r in io.read(cli.RESULTS_TABLE).collect()}
        assert capped == base and len(base) > 3

    def test_no_overwrite_keeps_content(self, run, spark, store, caplog):
        from spider_spark.sources.tableio import ParquetManifestIO

        assert run("--pages", "synthetic:50", "crawl", "h1.example/d/1") == 0
        io = ParquetManifestIO(spark, store)
        before = {r["url"]: r["content_ref"] for r in io.read(cli.RESULTS_TABLE).collect()}
        assert run(
            "--pages", "synthetic:50", "crawl", "h1.example/d/1", "--no-overwrite"
        ) == 0
        after = {r["url"]: r["content_ref"] for r in io.read(cli.RESULTS_TABLE).collect()}
        assert before == after


class TestRecrawlCommand:
    def test_durable_wave_refetches_and_continues_ranks(self, run, store, spark, caplog):
        from pyspark.sql import functions as F

        from spider_spark.sources.pages import PAGES_EPOCH
        from spider_spark.sources.tableio import ParquetManifestIO

        with caplog.at_level(cli.DB_INFO, logger="spider_spark"):
            assert run("--pages", "synthetic:60", "crawl",
                       "https://h0.example/d/0", "--depth", "3",
                       "--durable") == 0
        io = ParquetManifestIO(spark, store)
        rank_before = io.latest_meta("metrics")["next_rank"]
        n_seen = io.read("seen").count()
        caplog.clear()
        with caplog.at_level(cli.DB_INFO, logger="spider_spark"):
            assert run("--pages", "synthetic:60", "recrawl",
                       "--now", str(PAGES_EPOCH + 100), "--ttl", "60",
                       "--jitter", "0.2", "--depth", "0") == 0
        assert any("due for refetch" in m for m in caplog.messages)
        # the wave replaced rows, never grew the corpus
        assert io.read("seen").count() == n_seen
        assert io.latest_meta("metrics")["next_rank"] > rank_before
        refreshed = io.read("seen").filter(
            F.col("admission_rank") >= rank_before
        ).count()
        assert refreshed == io.latest_meta("metrics")["next_rank"] - rank_before

    def test_recrawl_without_store_fails_cleanly(self, run, caplog):
        from spider_spark.sources.pages import PAGES_EPOCH

        with caplog.at_level(logging.WARNING, logger="spider_spark"):
            assert run("--pages", "synthetic:10", "recrawl",
                       "--now", str(PAGES_EPOCH), "--ttl", "60") == 1
        assert any("nothing to recrawl" in m for m in caplog.messages)
