"""WARC source — read Common-Crawl-style archives into the pages table.

The engine's `input_hint` table (url, warc_ts, html, text, lang) is "an
Iceberg table of Common-Crawl-style web pages"; the interchange format
those pages arrive in is WARC (ISO 28500: plain-text record headers +
binary payload, gzip-membered in production). This module provides the
ingestion edge:

* :func:`read_warc` — ``binaryFile`` scan of ``*.warc`` files →
  ``mapInPandas`` record parser → pages rows. One Spark task per archive
  file (WARC's gzip-member framing makes files the natural split unit —
  the same layout Common Crawl publishes: ~1 GB segment files, thousands
  of them, trivially parallel). ``response`` records only; the target
  URI, date and HTTP body are extracted per the spec's named headers.
* :func:`write_warc_file` — a minimal conforming writer (driver-side,
  test/fixture use): wraps each page as a ``response`` record with an
  HTTP/1.1 200 envelope.

The parser is deliberately tolerant (skips records without a target URI
or with malformed lengths) — real crawl dumps contain both — and caps
per-record payloads it will materialize.

Cites: the reference has no archive ingestion at all (it fetches live
HTTP, crawler.py:121-138); this is engine-side scope from the north
star's "Common-Crawl-style pages" framing.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), False),
    ]
)

MAX_RECORD_BYTES = 64 * 1024 * 1024  # skip pathological records


_SKIP_CHUNK = 1 << 20


def _skip_forward(buf, n: int) -> None:
    """Advance a (possibly non-seekable) stream by ``n`` bytes with bounded
    memory — GzipFile forward-seeks by inflating anyway, so an explicit
    chunked read-and-discard is both portable and honest about cost."""
    while n > 0:
        chunk = buf.read(min(n, _SKIP_CHUNK))
        if not chunk:
            return
        n -= len(chunk)


def _parse_warc_stream(data: bytes) -> Iterator[tuple[str, datetime | None, bytes]]:
    """Yield (target_uri, warc_date, http_body) for each response record.

    Gzip archives (including multi-member Common-Crawl layout) are inflated
    *streamingly* via GzipFile: only the current record's payload (capped at
    MAX_RECORD_BYTES) is ever materialized, never the whole decompressed
    archive."""
    if data[:2] == b"\x1f\x8b":  # gzip, possibly multi-member
        buf = gzip.GzipFile(fileobj=io.BytesIO(data))
    else:
        buf = io.BytesIO(data)
    while True:
        # find the next record header
        line = buf.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            continue
        headers: dict[str, str] = {}
        while True:
            h = buf.readline()
            if not h or h in (b"\r\n", b"\n"):
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.decode("ascii", "replace").strip().lower()] = (
                    v.decode("utf-8", "replace").strip()
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            continue  # malformed: resync on the next WARC/ line
        if length < 0:
            continue  # malformed: resync on the next WARC/ line
        if length > MAX_RECORD_BYTES:
            # valid but oversized: skip the WHOLE payload so embedded
            # WARC-looking text can't resync into a phantom record
            # (content-injection vector from untrusted dumps)
            _skip_forward(buf, length)
            continue
        block = buf.read(length)
        if headers.get("warc-type") != "response":
            continue
        uri = headers.get("warc-target-uri")
        if not uri:
            continue
        ts: datetime | None = None
        raw_date = headers.get("warc-date")
        if raw_date:
            try:
                ts = datetime.fromisoformat(raw_date.replace("Z", "+00:00"))
                ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
            except ValueError:
                ts = None
        # payload = HTTP response body (after the HTTP header block); a
        # bare payload (no HTTP envelope) passes through unchanged
        sep = block.find(b"\r\n\r\n")
        body = block[sep + 4:] if block[:5] in (b"HTTP/",) and sep >= 0 else block
        yield uri, ts, body


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Pages rows from WARC archives at ``path`` (glob ok). Column-prunes
    nothing (WARC is a record stream — the scan is inherently full-file),
    but parallelism is per archive file, which is how Common Crawl shards
    its dumps."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, tss, bodies = [], [], []
            for blob in pdf["content"]:
                for uri, ts, body in _parse_warc_stream(bytes(blob)):
                    urls.append(uri)
                    tss.append(ts)
                    bodies.append(body)
            if urls:
                yield pd.DataFrame({"url": urls, "warc_ts": tss, "html": bodies})

    return files.mapInPandas(parse, WARC_PAGES_SCHEMA)


def write_warc_file(path: str, pages: list[tuple[str, datetime, bytes]],
                    compress: bool = False) -> None:
    """Minimal conforming WARC writer for fixtures: one ``response``
    record per (url, ts, html) with an HTTP/1.1 200 envelope."""
    out = io.BytesIO()
    for url, ts, html in pages:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n"
            + html
        )
        date = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode()
            + f"WARC-Date: {date}\r\n".encode()
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"Content-Type: application/http; msgtype=response\r\n"
            b"\r\n"
            + http
            + b"\r\n\r\n"
        )
        out.write(rec)
    data = out.getvalue()
    if compress:
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)
