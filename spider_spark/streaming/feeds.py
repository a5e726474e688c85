"""Streaming feed watcher (Structured Streaming over syndication feeds).

A continuous crawler does not poll every feed in one batch job: feed
documents ARRIVE (the fetch tier drops newly-downloaded RSS/Atom bodies
into a landing directory / table), and discovery should emit refetch
candidates incrementally as they land. This module is the Structured
Streaming twin of the batch path ``sources/feed.py`` →
``sources/sitemap.sitemap_refresh_plan`` → ``ContinuousCrawler.wave(
extra_due=…)``:

* ``read_feeds_stream`` — file-source stream over a landing directory of
  ``(url, xml)`` parquet drops.
* ``feed_watch_stream`` — ``foreachBatch`` handler running the SAME
  batch operators per micro-batch (parse → adapt → refresh plan), then
  appending NEW due URLs to the sink. Cross-batch emission dedup is an
  anti-join against the sink itself (the sink IS the state — idempotent
  under ``foreachBatch``'s at-least-once replay, no driver memory), so
  a feed republished in a later batch re-emits nothing, while a URL
  whose verdict appears for the first time does.

Scale: per batch the work is O(batch feeds) parse + the planner's keyed
join; the emission gate reads only the sink's ``loc`` column
(column-pruned). The fetched-state side is whatever relation the caller
passes (a TableIO-backed seen/results table in production) — joined,
never collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

__all__ = ["read_feeds_stream", "feed_watch_stream", "FEED_DOCS_SCHEMA"]

FEED_DOCS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("xml", StringType(), False),
    ]
)


def read_feeds_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over a landing directory of feed-document
    parquet drops (``url, xml``)."""
    r = spark.readStream.schema(FEED_DOCS_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def feed_watch_stream(feeds: DataFrame, fetched: DataFrame, checkpoint: str,
                      out_path: str, now_epoch: int,
                      default_ttl_sec: int = 604_800) -> dict:
    """Drain the feed stream through the refresh planner, appending each
    newly-due URL to ``out_path`` exactly once across batches.

    ``fetched`` carries ``(url, fetch_epoch)`` — the crawler's stored
    fetch state. Per micro-batch: parse (one Arrow pass) → adapt →
    ``sitemap_refresh_plan`` → anti-join against the sink's existing
    ``loc`` set → append. The sink rows ``(loc, reason, lastmod_epoch,
    priority_milli)`` feed ``ContinuousCrawler.wave(extra_due=…)``
    unchanged. Returns driver-side counters ``batches`` / ``in_feeds``
    / ``planned`` / ``emitted``."""
    import os

    from spider_spark.sources.feed import feed_entries, feed_refresh_entries
    from spider_spark.sources.sitemap import sitemap_refresh_plan

    stats = {"batches": 0, "in_feeds": 0, "planned": 0, "emitted": 0}

    def handle(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        b = batch.localCheckpoint(eager=True)
        n_in = b.count()
        plan = sitemap_refresh_plan(
            feed_refresh_entries(feed_entries(b)), fetched,
            now_epoch=now_epoch, default_ttl_sec=default_ttl_sec,
        ).localCheckpoint(eager=True)
        n_planned = plan.count()
        if os.path.isdir(out_path) and any(
                f.endswith(".parquet") for f in os.listdir(out_path)):
            seen = spark.read.parquet(out_path).select("loc")
            fresh = plan.join(seen, on="loc", how="left_anti")
        else:
            fresh = plan
        fresh = fresh.localCheckpoint(eager=True)
        n_new = fresh.count()
        if n_new:
            fresh.write.mode("append").parquet(out_path)
        stats["batches"] += 1
        stats["in_feeds"] += n_in
        stats["planned"] += n_planned
        stats["emitted"] += n_new

    q = (
        feeds.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stats
