"""Structured-Streaming ingestion — the continuous-crawl variant.

The reference is a one-shot batch CLI; a production frontier at 10^10 URLs
runs continuously: new WARC/page batches land in the pages table, links are
extracted incrementally, and the URL-seen set is maintained as streaming
state. This module re-expresses the engine's per-round kernels as a
Structured Streaming pipeline:

* **source** — ``readStream`` over the pages location (file source; at
  production scale an Iceberg/Kafka source drops in) with the same
  ``input_hint`` schema;
* **parse/extract** — the identical Arrow parse UDF used by the batch
  rounds (one kernel, two execution modes);
* **dedupe** — ``applyInPandasWithState``: per url-hash-shard state holds
  the seen-set shard; first sighting of a canonical URL is emitted, repeats
  are dropped. State is partitioned by ``pmod(xxhash64(url), n_shards)`` —
  the streaming twin of the batch engine's bloom-shard layout;
* **sink** — ``writeStream`` (append) with checkpointing; watermarking on
  ``warc_ts`` bounds state for the optional windowed per-host rate
  aggregation :func:`host_rate`.

Tested with the file source + ``trigger(availableNow=True)`` so runs are
deterministic and finite.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from spider_spark.functions.parse import make_parse_udf

PAGES_STREAM_SCHEMA = StructType(
    [
        StructField("url", StringType(), True),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", StringType(), True),  # file source: binary read as-is
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)


def read_pages_stream(spark: SparkSession, path: str,
                      schema: StructType | None = None,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over a directory of pages parquet files."""
    r = spark.readStream.schema(schema or PAGES_STREAM_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def extract_links_stream(pages: DataFrame, resolve_base: str = "page") -> DataFrame:
    """Incremental link extraction: the batch parse kernel applied to the
    stream. Emits ``(url, warc_ts, link)`` rows in document order."""
    parse_udf = make_parse_udf(resolve_base)
    args = (
        (F.col("html").cast("binary"), F.col("url"))
        if resolve_base == "seed"
        else (F.col("html").cast("binary"), F.col("url"), F.col("url"))
    )
    parsed = pages.withColumn("p", parse_udf(*args))
    return parsed.select(
        "url",
        "warc_ts",
        F.explode(F.col("p.links")).alias("l"),
    ).select("url", "warc_ts", F.col("l.url").alias("link"), F.col("l.host").alias("host"))


FIRST_SEEN_SCHEMA = StructType(
    [
        StructField("link", StringType(), False),
        StructField("shard", IntegerType(), False),
        StructField("first_url", StringType(), True),
    ]
)
_STATE_SCHEMA = StructType([StructField("seen_csv", StringType(), True)])


def _dedupe_fn(
    key: Any, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-shard seen-set state: emit each link's first sighting only.
    State holds the shard's seen URLs (newline-joined; a production shard
    would hold a serialized bloom + spill table — same interface)."""
    (shard,) = key
    seen: set[str] = set()
    if state.exists:
        (csv,) = state.get
        if csv:
            seen = set(csv.split("\n"))
    out_links, out_first = [], []
    for pdf in pdf_iter:
        for link, url in zip(pdf["link"], pdf["url"]):
            if link not in seen:
                seen.add(link)
                out_links.append(link)
                out_first.append(url)
    state.update(("\n".join(sorted(seen)),))
    if out_links:
        yield pd.DataFrame(
            {"link": out_links, "shard": shard, "first_url": out_first}
        )


def dedupe_links_stream(links: DataFrame, n_shards: int = 32) -> DataFrame:
    """Streaming URL-seen dedupe via sharded ``applyInPandasWithState``.
    Emits each canonical link once (its first sighting across all
    micro-batches); the shard key spreads state like the batch engine's
    bloom shards (D1/H3 analog)."""
    sharded = links.withColumn(
        "shard", F.pmod(F.xxhash64(F.col("link")), F.lit(n_shards)).cast("int")
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _dedupe_fn,
        outputStructType=FIRST_SEEN_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def host_rate(pages: DataFrame, window: str = "1 minute",
              watermark: str = "2 minutes") -> DataFrame:
    """Windowed per-host fetch-rate aggregation with late-data handling —
    the streaming metrics twin of the batch per-round counters (A2)."""
    host = F.regexp_extract(F.col("url"), r"^https?://([^/]+)", 1).alias("host")
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window(F.col("warc_ts"), window).alias("w"), host)
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"), "host",
            F.col("n_pages").cast("long").alias("n_pages"),
        )
    )


def run_to_completion(stream_df: DataFrame, checkpoint: str, out_path: str,
                      fmt: str = "parquet", output_mode: str = "append") -> None:
    """Drain all available input (``availableNow``) into a sink and stop —
    the deterministic test/bench harness for the streaming path."""
    q = (
        stream_df.writeStream.format(fmt)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .option("path", out_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_to_memory(stream_df: DataFrame, checkpoint: str, name: str,
                  output_mode: str = "complete") -> None:
    """Drain into an in-memory table (for aggregations whose trailing
    window would never close under append mode: the watermark cannot pass
    the newest data in a finite run)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
