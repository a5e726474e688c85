"""Distributed WARC export (sources/warc.py write_warc): round-trip
against the streaming reader, byte-determinism across runs, the
compression-invariant manifest digest, and atomic file placement."""

from __future__ import annotations

import glob
import hashlib
import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from spider_spark.sources.warc import read_warc, write_warc


@pytest.fixture()
def pages(spark):
    rows = [
        (
            f"http://h{i % 5}.example/d/{i}",
            datetime(2024, 1, 1 + i % 20, i % 24, 0, 0),
            f"<html><title>t{i}</title><body>page {i} body</body></html>"
            .encode(),
        )
        for i in range(200)
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    )


def _digest_dir(d: str) -> dict[str, str]:
    return {
        os.path.basename(p): hashlib.sha256(open(p, "rb").read()).hexdigest()
        for p in glob.glob(os.path.join(d, "shard-*"))
    }


class TestWarcSink:
    def test_roundtrip(self, spark, pages, tmp_path):
        out = str(tmp_path / "export")
        manifest = write_warc(pages, out, n_shards=8).collect()
        assert sum(m["n_records"] for m in manifest) == 200
        back = read_warc(spark, os.path.join(out, "*.warc.gz"))
        got = sorted(
            (r["url"], r["warc_ts"], bytes(r["html"]))
            for r in back.collect()
        )
        want = sorted(
            (r["url"], r["warc_ts"], bytes(r["html"]))
            for r in pages.collect()
        )
        assert got == want

    def test_deterministic_bytes_across_runs(self, spark, pages, tmp_path):
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        write_warc(pages, a, n_shards=8).collect()
        # second run from a different partition layout of the same rows
        write_warc(pages.repartition(7), b, n_shards=8).collect()
        da, db = _digest_dir(a), _digest_dir(b)
        assert da and da == db

    def test_digest_is_compression_invariant(self, spark, pages, tmp_path):
        gz = {
            m["shard"]: m["sha256"]
            for m in write_warc(pages, str(tmp_path / "gz"),
                                n_shards=4, compress=True).collect()
        }
        plain = {
            m["shard"]: m["sha256"]
            for m in write_warc(pages, str(tmp_path / "plain"),
                                n_shards=4, compress=False).collect()
        }
        assert gz == plain and len(gz) == 4

    def test_no_torn_files(self, spark, pages, tmp_path):
        out = str(tmp_path / "export")
        write_warc(pages, out, n_shards=4).collect()
        assert not glob.glob(os.path.join(out, "*.inprogress"))
        for p in glob.glob(os.path.join(out, "shard-*.warc.gz")):
            assert os.path.getsize(p) > 0

    def test_manifest_byte_counts(self, spark, pages, tmp_path):
        out = str(tmp_path / "export")
        for m in write_warc(pages, out, n_shards=4).collect():
            assert os.path.getsize(m["path"]) == m["n_bytes"]

    def test_shard_count_validation(self, spark, pages, tmp_path):
        with pytest.raises(ValueError):
            write_warc(pages, str(tmp_path / "x"), n_shards=0)

    def test_null_timestamp_uses_epoch(self, spark, tmp_path):
        df = spark.createDataFrame(
            [("http://a.example/", None, b"<html></html>")],
            "url string, warc_ts timestamp, html binary",
        )
        out = str(tmp_path / "null-ts")
        write_warc(df, out, n_shards=1).collect()
        back = read_warc(spark, os.path.join(out, "*.warc.gz")).collect()
        assert back[0]["warc_ts"] == datetime(1970, 1, 1)


class TestWetSink:
    @pytest.fixture()
    def texts(self, spark):
        rows = [
            (
                f"http://h{i % 5}.example/d/{i}",
                datetime(2024, 1, 1 + i % 20, i % 24, 0, 0),
                f"extracted text of page {i}\nwith a second line",
            )
            for i in range(60)
        ]
        # one adversarial payload that LOOKS like an HTTP envelope — a
        # conversion record must not strip it
        rows.append((
            "http://h0.example/http-lookalike",
            datetime(2024, 2, 1),
            "HTTP/1.1 200 OK\r\n\r\nnot actually an envelope",
        ))
        return spark.createDataFrame(
            rows, "url string, warc_ts timestamp, text string")

    def test_roundtrip(self, spark, texts, tmp_path):
        from spider_spark.sources.warc import read_wet, write_wet

        out = str(tmp_path / "wet")
        man = write_wet(texts, out, n_shards=4).collect()
        assert sum(r["n_records"] for r in man) == 61
        got = {r["url"]: r["text"] for r in read_wet(spark, out).collect()}
        want = {r["url"]: r["text"] for r in texts.collect()}
        assert got == want  # incl. the HTTP/-leading payload, unstripped

    def test_deterministic_bytes_across_runs(self, spark, texts, tmp_path):
        from spider_spark.sources.warc import write_wet

        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        write_wet(texts, a, n_shards=4).collect()
        write_wet(texts.repartition(7), b, n_shards=4).collect()
        assert _digest_dir(a) == _digest_dir(b)

    def test_warc_reader_ignores_conversion_records(self, spark, texts,
                                                    tmp_path):
        from spider_spark.sources.warc import write_wet

        out = str(tmp_path / "wet")
        write_wet(texts, out, n_shards=2).collect()
        assert read_warc(spark, out).count() == 0


class TestWatSink:
    @pytest.fixture()
    def metas(self, spark):
        rows = [
            (
                f"http://h{i % 5}.example/d/{i}",
                datetime(2024, 1, 1 + i % 20, i % 24, 0, 0),
                f'{{"n_links":{i % 7},"title":"t{i}","url":"http://h{i % 5}.example/d/{i}"}}',
            )
            for i in range(60)
        ]
        # a JSON payload that LOOKS like an HTTP envelope — a metadata
        # record must not strip it
        rows.append((
            "http://h0.example/http-lookalike",
            datetime(2024, 2, 1),
            "HTTP/1.1 200 OK\r\n\r\nnot actually an envelope",
        ))
        return spark.createDataFrame(
            rows, "url string, warc_ts timestamp, wat_json string")

    def test_roundtrip(self, spark, metas, tmp_path):
        from spider_spark.sources.warc import read_wat, write_wat

        out = str(tmp_path / "wat")
        man = write_wat(metas, out, n_shards=4).collect()
        assert sum(r["n_records"] for r in man) == 61
        got = {r["url"]: r["wat_json"] for r in read_wat(spark, out).collect()}
        want = {r["url"]: r["wat_json"] for r in metas.collect()}
        assert got == want

    def test_deterministic_bytes_across_runs(self, spark, metas, tmp_path):
        from spider_spark.sources.warc import write_wat

        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        write_wat(metas, a, n_shards=4).collect()
        write_wat(metas.repartition(7), b, n_shards=4).collect()
        assert _digest_dir(a) == _digest_dir(b)

    def test_other_readers_ignore_metadata_records(self, spark, metas,
                                                   tmp_path):
        from spider_spark.sources.warc import read_wet, write_wat

        out = str(tmp_path / "wat")
        write_wat(metas, out, n_shards=2).collect()
        assert read_warc(spark, out).count() == 0
        assert read_wet(spark, out).count() == 0
