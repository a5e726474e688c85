"""WARC source tests: round-trip through the minimal writer, gzip
members, malformed-record tolerance, and a full crawl over WARC-sourced
pages matching the parquet-sourced oracle result."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from spider_spark.sources.warc import read_warc, write_warc_file


@pytest.fixture()
def warc_dir(tmp_path):
    return tmp_path / "warc"


def _mk(warc_dir, name, pages, compress=False):
    warc_dir.mkdir(exist_ok=True)
    write_warc_file(str(warc_dir / name), pages, compress=compress)


class TestWarcRoundTrip:
    def test_plain_and_gzip_archives(self, spark, warc_dir):
        ts = datetime(2024, 1, 1, 12, 0, 0)
        _mk(warc_dir, "a.warc",
            [("https://x.example/1", ts, b"<html>one</html>")])
        _mk(warc_dir, "b.warc",
            [("https://x.example/2", ts, b"<html>two</html>"),
             ("https://x.example/3", ts, b"<html>three</html>")],
            compress=True)
        got = {r["url"]: r for r in read_warc(spark, str(warc_dir)).collect()}
        assert set(got) == {f"https://x.example/{i}" for i in (1, 2, 3)}
        assert bytes(got["https://x.example/1"]["html"]) == b"<html>one</html>"
        assert bytes(got["https://x.example/3"]["html"]) == b"<html>three</html>"
        assert got["https://x.example/2"]["warc_ts"] == ts

    def test_non_response_and_malformed_records_skipped(self, spark, warc_dir):
        ts = datetime(2024, 1, 1)
        warc_dir.mkdir(exist_ok=True)
        good = b""
        # a warcinfo record (skipped), a record with no URI (skipped),
        # then one good response
        good += (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nINFO\r\n\r\n")
        good += (b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 3\r\n\r\nxyz\r\n\r\n")
        good += (b"WARC/1.0\r\nWARC-Type: response\r\n"
                 b"WARC-Target-URI: https://ok.example/\r\n"
                 b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
                 b"Content-Length: 42\r\n\r\n"
                 b"HTTP/1.1 200 OK\r\nContent-Length: 4\r\n\r\nBODY\r\n\r\n")
        (warc_dir / "mixed.warc").write_bytes(good)
        rows = read_warc(spark, str(warc_dir)).collect()
        assert len(rows) == 1
        assert rows[0]["url"] == "https://ok.example/"
        assert bytes(rows[0]["html"]) == b"BODY"
        assert rows[0]["warc_ts"] == ts

    def test_oversized_record_with_embedded_warc_payload_is_skipped(
        self, spark, warc_dir, monkeypatch
    ):
        """ADVICE r2 (medium): a record whose Content-Length exceeds the cap
        must be skipped WHOLE — its payload must never be line-scanned, or
        attacker-controlled 'WARC/...' text inside it fabricates a phantom
        response row (content injection from untrusted dumps)."""
        import spider_spark.sources.warc as warcmod

        monkeypatch.setattr(warcmod, "MAX_RECORD_BYTES", 64)
        evil_payload = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: https://evil.example/\r\n"
            b"Content-Length: 4\r\n\r\nPWND\r\n\r\n"
        )
        evil_payload += b"x" * (200 - len(evil_payload))  # > 64-byte cap
        archive = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: https://big.example/\r\n"
            + f"Content-Length: {len(evil_payload)}\r\n\r\n".encode()
            + evil_payload + b"\r\n\r\n"
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: https://ok.example/\r\n"
            b"Content-Length: 4\r\n\r\nGOOD\r\n\r\n"
        )
        got = list(warcmod._parse_warc_stream(archive))
        assert [u for u, _, _ in got] == ["https://ok.example/"]
        assert got[0][2] == b"GOOD"

    def test_multi_member_gzip_streams_past_oversized_records(
        self, monkeypatch
    ):
        """Multi-member gzip archives (the Common-Crawl layout) parse without
        ever materializing the decompressed archive: records bigger than the
        cap are chunk-skipped in-stream, later members still parse."""
        import gzip as _gz

        import spider_spark.sources.warc as warcmod

        monkeypatch.setattr(warcmod, "MAX_RECORD_BYTES", 1024)
        big = b"z" * 10_000  # 10x the cap
        rec = lambda uri, body: (  # noqa: E731
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + f"WARC-Target-URI: {uri}\r\n".encode()
            + f"Content-Length: {len(body)}\r\n\r\n".encode()
            + body + b"\r\n\r\n"
        )
        member1 = _gz.compress(rec("https://a.example/", b"AAA") + rec("https://big.example/", big))
        member2 = _gz.compress(rec("https://b.example/", b"BBB"))
        got = list(warcmod._parse_warc_stream(member1 + member2))
        assert [u for u, _, _ in got] == ["https://a.example/", "https://b.example/"]
        assert [b for _, _, b in got] == [b"AAA", b"BBB"]

    def test_crawl_over_warc_source_matches_parquet_source(
        self, spark, warc_dir
    ):
        """The ingestion edge composes with the engine: pages round-tripped
        through WARC crawl to the same results as the in-memory table."""
        from spider_spark.functions.parse import extract_text_udf
        from spider_spark.plans.crawl import CrawlConfig, CrawlEngine
        from spider_spark.sources.pages import synthetic_pages

        src = synthetic_pages(spark, 40).localCheckpoint(eager=True)
        rows = src.select("url", "warc_ts", "html").collect()
        _mk(warc_dir, "site.warc",
            [(r["url"], r["warc_ts"], bytes(r["html"])) for r in rows],
            compress=True)

        pages = read_warc(spark, str(warc_dir)).withColumn(
            "text", extract_text_udf(F.col("html"))
        ).localCheckpoint(eager=True)
        seed = "https://h0.example/d/0"
        via_warc = CrawlEngine(spark, pages, CrawlConfig(depth=3)).crawl(seed)
        direct = CrawlEngine(spark, src, CrawlConfig(depth=3)).crawl(seed)
        key = lambda res: {  # noqa: E731
            (r["url"], r["title"], r["depth"], r["fetched"])
            for r in res.results.collect()
        }
        assert key(via_warc) == key(direct)


class TestRevisitDedupe:
    @staticmethod
    def _pages(spark):
        # urls u0..u5; payloads shared within {u0,u1,u2} and {u3,u4}; u5 unique
        rows = [("https://h.example/u0", "alpha body"),
                ("https://h.example/u1", "alpha body"),
                ("https://h.example/u2", "alpha body"),
                ("https://h.example/u3", "beta body"),
                ("https://h.example/u4", "beta body"),
                ("https://h.example/u5", "gamma body")]
        from pyspark.sql import functions as F

        return spark.createDataFrame(rows, "url string, text string") \
            .withColumn("warc_ts", F.timestamp_seconds(F.lit(1_700_000_000)))

    def test_wet_dedupe_emits_revisits(self, spark, tmp_path):
        from spider_spark.sources.warc import (
            read_warc_records, read_wet, write_wet)

        out = str(tmp_path / "wet")
        write_wet(self._pages(spark), out, n_shards=4, dedupe=True).collect()
        recs = {r["url"]: (r["record_type"], r["refers_to"])
                for r in read_warc_records(spark, out).collect()}
        assert recs == {
            "https://h.example/u0": ("conversion", None),
            "https://h.example/u1": ("revisit", "https://h.example/u0"),
            "https://h.example/u2": ("revisit", "https://h.example/u0"),
            "https://h.example/u3": ("conversion", None),
            "https://h.example/u4": ("revisit", "https://h.example/u3"),
            "https://h.example/u5": ("conversion", None),
        }
        # payload-bearing records still round-trip through the WET reader
        texts = {r["url"]: r["text"] for r in read_wet(spark, out).collect()}
        assert texts == {"https://h.example/u0": "alpha body",
                         "https://h.example/u3": "beta body",
                         "https://h.example/u5": "gamma body"}

    def test_dedupe_is_partition_invariant(self, spark, tmp_path):
        from spider_spark.sources.warc import write_wet

        pages = self._pages(spark)
        m1 = {r["shard"]: r["sha256"] for r in write_wet(
            pages, str(tmp_path / "a"), n_shards=4, dedupe=True).collect()}
        m2 = {r["shard"]: r["sha256"] for r in write_wet(
            pages.repartition(5), str(tmp_path / "b"), n_shards=4,
            dedupe=True).collect()}
        assert m1 == m2

    def test_warc_dedupe_on_binary_payload(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from spider_spark.sources.warc import read_warc_records, write_warc

        pages = self._pages(spark).select(
            "url", "warc_ts", F.encode("text", "UTF-8").alias("html"))
        out = str(tmp_path / "warc")
        write_warc(pages, out, n_shards=2, dedupe=True).collect()
        recs = read_warc_records(spark, out).collect()
        by_type = {}
        for r in recs:
            by_type.setdefault(r["record_type"], []).append(r["url"])
        assert len(by_type["response"]) == 3
        assert len(by_type["revisit"]) == 3

    def test_plain_mode_unchanged(self, spark, tmp_path):
        from spider_spark.sources.warc import read_warc_records, write_wet

        out = str(tmp_path / "plain")
        write_wet(self._pages(spark), out, n_shards=2).collect()
        recs = read_warc_records(spark, out).collect()
        assert all(r["record_type"] == "conversion" for r in recs)
        assert len(recs) == 6
