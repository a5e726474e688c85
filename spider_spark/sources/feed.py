"""RSS/Atom feed ingestion (web syndication as a discovery channel).

Feeds are the second standard URL-discovery channel next to sitemaps
(sources/sitemap.py): hosts publish RSS 2.0 ``<rss><channel><item>`` or
Atom 1.0 ``<feed><entry>`` documents listing recent pages with
publication/update times. The reference engine has no feed path (it
seeds from one URL, crawler.py:53); at web scale feeds are how a
continuous crawler finds NEW pages minutes after they appear, without
re-walking the host's link graph.

Design (same discipline as the sitemap source):

* ``parse_feed`` — one-document kernel on :mod:`xml.etree.ElementTree`
  (namespace-agnostic local-name matching, tolerant of malformed input),
  run inside an Arrow-batched pandas UDF. Handles both families in one
  pass: the root tag dispatches (``rss``/``channel`` → items, ``feed`` →
  entries).
* ``feed_entries`` — feed documents → exploded entry relation
  ``(feed_url, loc, published_epoch, updated_epoch, title, kind)``.
  RSS ``pubDate`` (RFC 822) and Atom ``published``/``updated``
  (ISO 8601) both land as integer epoch seconds, so oracle mirrors are
  bit-exact. RSS item links come from ``<link>`` text, falling back to
  a permalink ``<guid>``; Atom links from the first ``<link href=…>``
  whose ``rel`` is absent or ``alternate``.
* ``feed_refresh_entries`` — adapter to the sitemap refresh planner's
  entry shape (``loc, lastmod_epoch, changefreq, priority_milli,
  is_index``): ``lastmod = coalesce(updated, published)``, no
  changefreq/priority hints, never an index. One planner
  (``sitemap_refresh_plan``) then serves both discovery channels, and
  its output feeds ``ContinuousCrawler.wave(extra_due=…)`` unchanged.

Scale: one Arrow scan over feed documents (a host's feed is tiny next
to its page set); everything downstream is the sitemap planner's keyed
join. No collect, no Python past the parse kernel.
"""

from __future__ import annotations

from datetime import datetime, timezone
from email.utils import parsedate_to_datetime
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["parse_feed", "feed_entries", "feed_refresh_entries"]

FEED_ENTRIES_SCHEMA = ArrayType(
    StructType(
        [
            StructField("loc", StringType(), False),
            StructField("published_epoch", LongType(), True),
            StructField("updated_epoch", LongType(), True),
            StructField("title", StringType(), True),
            StructField("kind", StringType(), False),
        ]
    )
)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _parse_rfc822(raw: str | None) -> int | None:
    """RFC 822/1123 date (RSS ``pubDate``) → epoch seconds; naive values
    read as UTC; unparseable → NULL (never an exception)."""
    if not raw or not raw.strip():
        return None
    try:
        dt = parsedate_to_datetime(raw.strip())
    except (TypeError, ValueError):
        return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp())


def _parse_iso(raw: str | None) -> int | None:
    """ISO-8601 (Atom dates) → epoch seconds, same reading as the
    sitemap source's W3C parser."""
    if not raw or not raw.strip():
        return None
    try:
        dt = datetime.fromisoformat(raw.strip().replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp())


def _rss_items(channel) -> list[dict]:
    out = []
    for item in channel:
        if _local(item.tag) != "item":
            continue
        link, guid, guid_ok, pub, title = None, None, True, None, None
        for c in item:
            name = _local(c.tag)
            text = (c.text or "").strip()
            if name == "link" and text:
                link = text
            elif name == "guid":
                guid = text or None
                guid_ok = (c.get("isPermaLink", "true").lower() != "false")
            elif name == "pubDate":
                pub = text
            elif name == "title":
                title = text or None
        loc = link or (guid if guid and guid_ok else None)
        if not loc:
            continue
        out.append(
            {
                "loc": loc,
                "published_epoch": _parse_rfc822(pub),
                "updated_epoch": None,
                "title": title,
                "kind": "rss",
            }
        )
    return out


def _atom_entries(feed) -> list[dict]:
    out = []
    for entry in feed:
        if _local(entry.tag) != "entry":
            continue
        loc, pub, upd, title = None, None, None, None
        for c in entry:
            name = _local(c.tag)
            text = (c.text or "").strip()
            if name == "link" and loc is None:
                rel = (c.get("rel") or "alternate").strip().lower()
                href = (c.get("href") or "").strip()
                if rel == "alternate" and href:
                    loc = href
            elif name == "published":
                pub = text
            elif name == "updated":
                upd = text
            elif name == "title":
                title = text or None
        if not loc:
            continue
        out.append(
            {
                "loc": loc,
                "published_epoch": _parse_iso(pub),
                "updated_epoch": _parse_iso(upd),
                "title": title,
                "kind": "atom",
            }
        )
    return out


def parse_feed(xml: bytes | str) -> list[dict]:
    """Parse one feed document → entry dicts (see module schema). RSS
    2.0 (``<rss><channel><item>``, bare ``<channel>`` tolerated) and
    Atom 1.0 (``<feed><entry>``) both handled; anything else — including
    malformed XML — yields ``[]``, never an exception on the hot
    path."""
    if isinstance(xml, (bytes, bytearray, memoryview)):
        xml = bytes(xml).decode("utf-8", errors="replace")
    try:
        root = ElementTree.fromstring(xml)
    except ElementTree.ParseError:
        return []
    kind = _local(root.tag)
    if kind == "rss":
        for child in root:
            if _local(child.tag) == "channel":
                return _rss_items(child)
        return []
    if kind == "channel":
        return _rss_items(root)
    if kind == "feed":
        return _atom_entries(root)
    return []


@pandas_udf(FEED_ENTRIES_SCHEMA)
def parse_feed_udf(xml: pd.Series) -> pd.Series:
    return xml.map(parse_feed)


def feed_entries(feeds: DataFrame, xml_col: str = "xml",
                 url_col: str = "url") -> DataFrame:
    """Feed documents → exploded entry relation ``(feed_url, loc,
    published_epoch, updated_epoch, title, kind)``. One Arrow parse
    pass; ``explode_outer + isNotNull`` (not plain ``explode``) keeps
    Catalyst from inferring a ``size()`` filter that re-evaluates the
    parse UDF (see operators/anchors.py anchor_pairs)."""
    return (
        feeds.select(
            F.col(url_col).alias("feed_url"),
            parse_feed_udf(F.col(xml_col).cast("string")).alias("_e"),
        )
        .select("feed_url", F.explode_outer("_e").alias("e"))
        .filter(F.col("e").isNotNull())
        .select(
            "feed_url",
            F.col("e.loc").alias("loc"),
            F.col("e.published_epoch").alias("published_epoch"),
            F.col("e.updated_epoch").alias("updated_epoch"),
            F.col("e.title").alias("title"),
            F.col("e.kind").alias("kind"),
        )
    )


def feed_refresh_entries(entries: DataFrame) -> DataFrame:
    """Adapt feed entries to the sitemap refresh planner's entry shape:
    ``lastmod_epoch = coalesce(updated, published)`` (Atom ``updated``
    is the protocol's change signal; RSS has only ``pubDate``), no
    changefreq/priority hints, never an index — so
    ``sitemap_refresh_plan(feed_refresh_entries(e), fetched, now)``
    plans feed-driven refetches exactly like sitemap-driven ones."""
    return entries.select(
        "loc",
        F.coalesce("updated_epoch", "published_epoch").alias("lastmod_epoch"),
        F.lit(None).cast("string").alias("changefreq"),
        F.lit(None).cast("int").alias("priority_milli"),
        F.lit(False).alias("is_index"),
    )
