"""Payload-type sniffing (functions/mime.py): magic prefixes, markup
detection, text-vs-binary heuristic, JVM-only plan, DuckDB mirror parity."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from spider_spark.functions.mime import sniff_mime, sniff_mime_sql

CASES = [
    (b"<!DOCTYPE html><html></html>", "text/html"),
    (b"<HTML><body>x</body>", "text/html"),
    (b"  \r\n\t<html>", "text/html"),
    (b"\xef\xbb\xbf<!doctype HTML>", "text/html"),          # UTF-8 BOM
    (b'<?xml version="1.0"?><rss/>', "application/xml"),
    (b"%PDF-1.4\n%\xe2\xe3", "application/pdf"),
    (b"\x89PNG\r\n\x1a\nrest", "image/png"),
    (b"\xff\xd8\xff\xe0JFIF", "image/jpeg"),
    (b"GIF89a\x01\x00", "image/gif"),
    (b"GIF87a\x01\x00", "image/gif"),
    (b"\x1f\x8b\x08gz", "application/gzip"),
    (b"PK\x03\x04zipentry", "application/zip"),
    (b"WARC/1.0\r\nWARC-Type: response", "application/warc"),
    (b"RIFF\x00\x00\x00\x00WEBPVP8", "image/webp"),
    (b"RIFF\x00\x00\x00\x00WAVEfmt", "application/octet-stream"),
    (b"just some plain text, no markup", "text/plain"),
    (b"tab\tand\r\nnewlines are text", "text/plain"),
    (b"BIN\x01\x02 junk", "application/octet-stream"),
    (b"", "text/plain"),
]


class TestSniffMime:
    def test_cases(self, spark):
        df = spark.createDataFrame(
            [(bytearray(b),) for b, _ in CASES], "content binary")
        got = [r["mime"] for r in
               df.select(sniff_mime("content").alias("mime")).collect()]
        assert got == [m for _, m in CASES]

    def test_plan_is_jvm_only(self, spark):
        df = spark.createDataFrame([(bytearray(b"x"),)], "content binary")
        plan = (df.select(sniff_mime("content").alias("m"))
                ._jdf.queryExecution().executedPlan().toString())
        assert "Python" not in plan and "Arrow" not in plan

    def test_duckdb_mirror_parity(self, spark):
        # mirror sees the latin-1 decode of the same bytes (identical
        # codepoints to what the engine's decode produces)
        texts = [b.decode("ISO-8859-1") for b, _ in CASES if b"\xef\xbb\xbf" not in b]
        con = duckdb.connect()
        con.register("rel", pd.DataFrame({"c": texts}))
        want = [r[0] for r in
                con.execute(f"SELECT {sniff_mime_sql('c')} FROM rel").fetchall()]
        df = spark.createDataFrame(
            [(bytearray(t.encode("ISO-8859-1")),) for t in texts],
            "content binary")
        got = [r["m"] for r in
               df.select(sniff_mime("content").alias("m")).collect()]
        assert got == want
