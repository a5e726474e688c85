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


def _iter_warc_frames(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield ``(headers, block)`` for every well-framed record in the
    archive — the shared framing layer under every WARC consumer.

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
        yield headers, buf.read(length)


def _warc_date(headers: dict) -> datetime | None:
    raw_date = headers.get("warc-date")
    if not raw_date:
        return None
    try:
        ts = datetime.fromisoformat(raw_date.replace("Z", "+00:00"))
        return ts.astimezone(timezone.utc).replace(tzinfo=None)
    except ValueError:
        return None


def _parse_warc_stream(data: bytes, record_type: str = "response",
                       ) -> Iterator[tuple[str, datetime | None, bytes]]:
    """Yield (target_uri, warc_date, http_body) for each ``record_type``
    record (``response`` for WARC page dumps, ``conversion`` for WET
    text extracts — same framing, different payload)."""
    for headers, block in _iter_warc_frames(data):
        if headers.get("warc-type") != record_type:
            continue
        uri = headers.get("warc-target-uri")
        if not uri:
            continue
        ts = _warc_date(headers)
        # payload = HTTP response body (after the HTTP header block); a
        # bare payload (no HTTP envelope) passes through unchanged.
        # Only response records carry an envelope — a conversion (WET)
        # payload that happens to START with "HTTP/" must not be
        # stripped.
        sep = block.find(b"\r\n\r\n")
        body = (
            block[sep + 4:]
            if record_type == "response" and block[:5] == b"HTTP/" and sep >= 0
            else block
        )
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


def warc_record(url: str, ts: datetime | None, html: bytes) -> bytes:
    """One conforming ``response`` record: WARC/1.0 headers + HTTP/1.1 200
    envelope. Pure function of its inputs — the writer's determinism
    contract rests on it."""
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        + b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n"
        + html
    )
    date = (ts or datetime(1970, 1, 1)).strftime("%Y-%m-%dT%H:%M:%SZ")
    return (
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


def wet_record(url: str, ts: datetime | None, text: bytes) -> bytes:
    """One conforming ``conversion`` record (the WET layout Common Crawl
    ships next to every WARC dump): text/plain payload, no HTTP
    envelope. Pure function of its inputs, like :func:`warc_record`."""
    date = (ts or datetime(1970, 1, 1)).strftime("%Y-%m-%dT%H:%M:%SZ")
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        + f"WARC-Target-URI: {url}\r\n".encode()
        + f"WARC-Date: {date}\r\n".encode()
        + f"Content-Length: {len(text)}\r\n".encode()
        + b"Content-Type: text/plain\r\n"
        b"\r\n"
        + text
        + b"\r\n\r\n"
    )


REVISIT_PROFILE = "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"


def revisit_record(url: str, ts: datetime | None, refers_to: str,
                   digest_hex: str) -> bytes:
    """One conforming ``revisit`` record (the identical-payload-digest
    profile Common Crawl uses for URLs whose content was already
    archived): zero-length payload, ``WARC-Refers-To-Target-URI``
    naming the record that holds the bytes, ``WARC-Payload-Digest``
    carrying the shared digest (``sha1:`` + hex here — CC ships base32;
    the digest's role is equality, not transport parity). Pure function
    of its inputs, like :func:`warc_record`."""
    date = (ts or datetime(1970, 1, 1)).strftime("%Y-%m-%dT%H:%M:%SZ")
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: revisit\r\n"
        + f"WARC-Target-URI: {url}\r\n".encode()
        + f"WARC-Date: {date}\r\n".encode()
        + f"WARC-Profile: {REVISIT_PROFILE}\r\n".encode()
        + f"WARC-Payload-Digest: sha1:{digest_hex}\r\n".encode()
        + f"WARC-Refers-To-Target-URI: {refers_to}\r\n".encode()
        + b"Content-Length: 0\r\n"
        b"\r\n"
        b"\r\n\r\n"
    )


def write_warc_file(path: str, pages: list[tuple[str, datetime, bytes]],
                    compress: bool = False) -> None:
    """Minimal conforming WARC writer for fixtures: one ``response``
    record per (url, ts, html), driver-side."""
    data = b"".join(warc_record(u, t, h) for u, t, h in pages)
    if compress:
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)


def _gzip_member(data: bytes) -> bytes:
    """One gzip member with ``mtime=0`` — byte-identical across runs (a
    default-mtime header would stamp wall-clock time into the output and
    break the writer's determinism contract)."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
        g.write(data)
    return buf.getvalue()


WARC_MANIFEST_SCHEMA = (
    "shard int, path string, n_records long, n_bytes long, sha256 string"
)


def write_warc(df: DataFrame, out_dir: str, n_shards: int = 16,
               compress: bool = True, dedupe: bool = False) -> DataFrame:
    """Distributed WARC export: pages rows → ``n_shards`` archive files
    under ``out_dir`` (a shared filesystem, the same assumption the
    filter shardstore makes). Returns the manifest — one row per
    non-empty shard with record/byte counts and the sha256 of the
    *uncompressed* record stream (compression-invariant, so a ``.gz``
    export verifies against a plain one).

    Deterministic by construction: shard = ``md5_60(url) mod n_shards``
    (a pure function of the key — stable across runs, retries, and
    partition layouts), records sorted by url within a shard, gzip
    members stamped ``mtime=0``. Re-running the export produces
    byte-identical files — the property that makes exported corpora
    content-addressable and diffable across releases.

    Scale shape: ONE hash shuffle on the shard key, then each shard
    streams through a single ``applyInPandas`` task writing its own
    file (Common Crawl's layout: many ~1 GB segment files). Each record
    is its own gzip member (also the Common Crawl convention), which is
    exactly what :func:`read_warc`'s streaming multi-member inflate
    consumes — round-trip tested. Writes are tmp-file + atomic
    ``os.replace`` so a killed export never leaves a torn archive."""
    from pyspark.sql import functions as F

    return _write_archive(df, out_dir, "html", warc_record,
                          lambda b: bytes(b),
                          ".warc", n_shards, compress,
                          dedupe=dedupe, payload_bin=F.col("html"))


def write_wet(df: DataFrame, out_dir: str, n_shards: int = 16,
              compress: bool = True, dedupe: bool = False) -> DataFrame:
    """Distributed WET export: the text-extract companion Common Crawl
    ships next to every WARC dump — one ``conversion`` record per page,
    text/plain payload (UTF-8), no HTTP envelope. Same determinism,
    sharding, atomic-placement, and manifest contract as
    :func:`write_warc` (shared writer); consumes the pages table's
    ``text`` column. Round-trips through :func:`read_wet`."""
    from pyspark.sql import functions as F

    return _write_archive(df, out_dir, "text", wet_record,
                          lambda t: str(t).encode("utf-8"),
                          ".warc.wet", n_shards, compress,
                          dedupe=dedupe,
                          payload_bin=F.encode(F.col("text"), "UTF-8"))


def _write_archive(df: DataFrame, out_dir: str, payload_col: str,
                   record_fn, payload_bytes, ext_base: str,
                   n_shards: int, compress: bool,
                   dedupe: bool = False, payload_bin=None) -> DataFrame:
    """Shared sharded writer (see :func:`write_warc` for the contract).

    ``dedupe=True`` adds Common Crawl's storage-dedup semantics: only
    the FIRST holder of each payload digest (deterministically the
    minimum url — not stream order, so the choice survives
    re-partitioning) gets a full record; every other URL with identical
    bytes becomes a zero-payload ``revisit`` record pointing at it
    (:func:`revisit_record`). Digesting (``sha1`` over the payload
    bytes) and keeper election run JVM-side — one narrow
    ``(digest, url)`` aggregation plus one digest-keyed join back —
    before the usual url-hash shard shuffle."""
    import hashlib
    import os

    if n_shards < 1:
        raise ValueError(f"n_shards must be ≥1: {n_shards}")
    os.makedirs(out_dir, exist_ok=True)
    from spider_spark.operators.dedupe import md5_60
    from pyspark.sql import functions as F

    if dedupe:
        base = df.select("url", "warc_ts", payload_col).withColumn(
            "_digest", F.sha1(payload_bin))
        keep = base.groupBy("_digest").agg(F.min("url").alias("_keeper"))
        df = (
            base.join(keep, on="_digest")
            .withColumn("_refers_to",
                        F.when(F.col("url") != F.col("_keeper"),
                               F.col("_keeper")))
            .drop("_keeper")
        )
        extra = ["_digest", "_refers_to"]
    else:
        extra = []

    shard = F.pmod(md5_60(F.col("url")), F.lit(n_shards)).cast("int")
    ext = ext_base + ".gz" if compress else ext_base

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        s = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values("url", kind="mergesort")
        digest = hashlib.sha256()
        out = io.BytesIO()
        refers = pdf["_refers_to"] if dedupe else [None] * len(pdf)
        digs = pdf["_digest"] if dedupe else [None] * len(pdf)
        for url, ts, payload, ref, dg in zip(pdf["url"], pdf["warc_ts"],
                                             pdf[payload_col], refers, digs):
            if pd.isna(ts):
                ts = None  # NaT is truthy — normalize so the epoch fallback fires
            elif hasattr(ts, "to_pydatetime"):
                ts = ts.to_pydatetime()
            if ref is not None and not pd.isna(ref):
                rec = revisit_record(str(url), ts, str(ref), str(dg))
            else:
                rec = record_fn(str(url), ts, payload_bytes(payload))
            digest.update(rec)
            out.write(_gzip_member(rec) if compress else rec)
        data = out.getvalue()
        path = os.path.join(out_dir, f"shard-{s:05d}{ext}")
        tmp = f"{path}.inprogress"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pd.DataFrame([{
            "shard": s, "path": path, "n_records": len(pdf),
            "n_bytes": len(data), "sha256": digest.hexdigest(),
        }])

    return (
        df.select("url", "warc_ts", payload_col, *extra)
        .withColumn("_shard", shard)
        .groupBy("_shard")
        .applyInPandas(write_shard, WARC_MANIFEST_SCHEMA)
    )


WET_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("text", T.StringType(), False),
    ]
)


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Text rows from WET archives at ``path`` (glob ok): the
    ``conversion``-record counterpart of :func:`read_warc`, same
    streaming multi-member inflate and oversized-record whole-skip."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, tss, texts = [], [], []
            for blob in pdf["content"]:
                for uri, ts, body in _parse_warc_stream(
                        bytes(blob), record_type="conversion"):
                    urls.append(uri)
                    tss.append(ts)
                    texts.append(body.decode("utf-8", errors="replace"))
            if urls:
                yield pd.DataFrame({"url": urls, "warc_ts": tss,
                                    "text": texts})

    return files.mapInPandas(parse, WET_PAGES_SCHEMA)


# ---------------------------------------------------------------------------
# WAT: the metadata companion (Common Crawl's third archive format)
# ---------------------------------------------------------------------------


def wat_record(url: str, ts: datetime | None, payload: bytes) -> bytes:
    """One conforming ``metadata`` record (the WAT layout Common Crawl
    ships next to every WARC/WET pair): application/json payload. Pure
    function of its inputs, like :func:`warc_record`."""
    date = (ts or datetime(1970, 1, 1)).strftime("%Y-%m-%dT%H:%M:%SZ")
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: metadata\r\n"
        + f"WARC-Target-URI: {url}\r\n".encode()
        + f"WARC-Date: {date}\r\n".encode()
        + f"Content-Length: {len(payload)}\r\n".encode()
        + b"Content-Type: application/json\r\n"
        b"\r\n"
        + payload
        + b"\r\n\r\n"
    )


def write_wat(df: DataFrame, out_dir: str, n_shards: int = 16,
              compress: bool = True) -> DataFrame:
    """Distributed WAT export: ``metadata`` records whose payload is the
    ``wat_json`` column (the caller assembles it — the engine's
    convention is ``to_json(struct(...))`` over parse-kernel outputs, a
    fixed field order so re-exports are byte-identical). Same
    determinism, sharding, atomic-placement, and manifest contract as
    :func:`write_warc` (shared writer). Round-trips through
    :func:`read_wat`."""
    return _write_archive(df, out_dir, "wat_json", wat_record,
                          lambda t: str(t).encode("utf-8"),
                          ".warc.wat", n_shards, compress)


WAT_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("wat_json", T.StringType(), False),
    ]
)


def read_wat(spark: SparkSession, path: str) -> DataFrame:
    """Metadata rows from WAT archives at ``path`` (glob ok): the
    ``metadata``-record counterpart of :func:`read_warc` — same
    streaming multi-member inflate, oversized-record whole-skip, and
    (because the record type is not ``response``) no HTTP-envelope
    strip: a JSON payload that happens to start with "HTTP/" survives
    untouched."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, tss, bodies = [], [], []
            for blob in pdf["content"]:
                for uri, ts, body in _parse_warc_stream(
                        bytes(blob), record_type="metadata"):
                    urls.append(uri)
                    tss.append(ts)
                    bodies.append(body.decode("utf-8", errors="replace"))
            if urls:
                yield pd.DataFrame({"url": urls, "warc_ts": tss,
                                    "wat_json": bodies})

    return files.mapInPandas(parse, WAT_PAGES_SCHEMA)


WARC_RECORDS_SCHEMA = (
    "url string, warc_ts timestamp, record_type string, refers_to string"
)


def read_warc_records(spark: SparkSession, path: str) -> DataFrame:
    """Record-level view of an archive: ``(url, warc_ts, record_type,
    refers_to)`` for EVERY well-framed record regardless of type — the
    reader a dedup-aware consumer needs (a ``revisit`` row tells it to
    fetch the bytes from ``refers_to``'s record instead). Same
    streaming-inflate framing layer as :func:`read_warc`."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, tss, types, refs = [], [], [], []
            for blob in pdf["content"]:
                for headers, _block in _iter_warc_frames(bytes(blob)):
                    uri = headers.get("warc-target-uri")
                    rtype = headers.get("warc-type")
                    if not uri or not rtype:
                        continue
                    urls.append(uri)
                    tss.append(_warc_date(headers))
                    types.append(rtype)
                    refs.append(headers.get("warc-refers-to-target-uri"))
            if urls:
                yield pd.DataFrame({
                    "url": urls, "warc_ts": tss,
                    "record_type": types, "refers_to": refs,
                })

    return files.mapInPandas(parse, WARC_RECORDS_SCHEMA)
