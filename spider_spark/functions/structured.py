"""Structured-metadata extraction: JSON-LD and OpenGraph.

News/article corpora (CCNews, realnews, C4-news) are built from pages'
embedded structured data, not from heuristic text fields: schema.org
JSON-LD blocks (``<script type="application/ld+json">``) carry the
canonical headline / publication date / author, and OpenGraph ``<meta
property="og:*">`` tags carry the social-card title/type/image. The
reference crawler extracts only ``<title>`` (crawler.py parse path);
this module adds the structured layer as one Arrow kernel per family:

* ``extract_jsonld`` — every well-formed JSON-LD block's ``@type``,
  ``headline``/``name``, ``datePublished`` (ISO-8601 → epoch seconds,
  same deterministic reading as the sitemap/feed parsers), ``author``
  (string or ``{"name": …}`` object, first of a list). ``@graph``
  containers and top-level arrays are flattened one level — the two
  layouts real CMSes emit. Malformed JSON in one block never poisons
  the others (per-block try).
* ``extract_opengraph`` — head-scoped first-wins ``og:title`` /
  ``og:type`` / ``og:image`` / ``og:url`` (the four basic properties;
  first-wins mirrors the protocol's "first tag is authoritative").

Both kernels are tolerant like every parse kernel here: any failure
yields NULLs, never an exception on the hot path. Scale: one Arrow scan
each (or compose the OpenGraph fields into a fused audit when more head
signals are consumed); everything downstream is plain columns.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from html.parser import HTMLParser

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

__all__ = [
    "extract_jsonld",
    "extract_opengraph",
    "jsonld_entities",
    "opengraph_df",
]

JSONLD_SCHEMA = ArrayType(
    StructType(
        [
            StructField("type", StringType(), True),
            StructField("headline", StringType(), True),
            StructField("published_epoch", LongType(), True),
            StructField("author", StringType(), True),
        ]
    )
)

OG_SCHEMA = StructType(
    [
        StructField("og_title", StringType(), True),
        StructField("og_type", StringType(), True),
        StructField("og_image", StringType(), True),
        StructField("og_url", StringType(), True),
    ]
)


def _iso_epoch(raw) -> int | None:
    if not isinstance(raw, str) or not raw.strip():
        return None
    try:
        dt = datetime.fromisoformat(raw.strip().replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp())


def _author_name(raw) -> str | None:
    if isinstance(raw, list) and raw:
        raw = raw[0]
    if isinstance(raw, dict):
        raw = raw.get("name")
    if isinstance(raw, str) and raw.strip():
        return raw.strip()
    return None


def _entity(obj: dict) -> dict | None:
    t = obj.get("@type")
    if isinstance(t, list) and t:
        t = t[0]
    headline = obj.get("headline") or obj.get("name")
    out = {
        "type": t if isinstance(t, str) else None,
        "headline": headline if isinstance(headline, str) else None,
        "published_epoch": _iso_epoch(obj.get("datePublished")),
        "author": _author_name(obj.get("author")),
    }
    if all(v is None for v in out.values()):
        return None
    return out


class _JsonLdParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._in_block = False
        self.blocks: list[str] = []
        self._buf: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "script":
            d = dict(attrs)
            if (d.get("type") or "").strip().lower() == "application/ld+json":
                self._in_block = True
                self._buf = []

    def handle_endtag(self, tag):
        if tag == "script" and self._in_block:
            self._in_block = False
            self.blocks.append("".join(self._buf))

    def handle_data(self, data):
        if self._in_block:
            self._buf.append(data)


def extract_jsonld(html: bytes | str) -> list[dict]:
    """Entity dicts (see module schema) from every JSON-LD block;
    ``@graph`` containers and top-level arrays flattened one level;
    per-block error isolation."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _JsonLdParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    out: list[dict] = []
    for block in p.blocks:
        try:
            data = json.loads(block)
        except ValueError:
            continue
        if isinstance(data, dict) and isinstance(data.get("@graph"), list):
            items = data["@graph"]
        elif isinstance(data, list):
            items = data
        else:
            items = [data]
        for obj in items:
            if isinstance(obj, dict):
                e = _entity(obj)
                if e is not None:
                    out.append(e)
    return out


class _OpenGraphParser(HTMLParser):
    _WANT = ("og:title", "og:type", "og:image", "og:url")

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.props: dict[str, str] = {}
        self._done = False

    def handle_starttag(self, tag, attrs):
        if self._done:
            return
        if tag == "body":
            self._done = True  # OpenGraph is head-scoped by protocol
        elif tag == "meta":
            d = dict(attrs)
            prop = (d.get("property") or "").strip().lower()
            if prop in self._WANT and prop not in self.props:
                content = (d.get("content") or "").strip()
                if content:
                    self.props[prop] = content

    def handle_endtag(self, tag):
        if tag == "head":
            self._done = True


def extract_opengraph(html: bytes | str) -> tuple:
    """(og_title, og_type, og_image, og_url) — head-scoped, first-wins
    per property."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _OpenGraphParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    return tuple(p.props.get(k) for k in _OpenGraphParser._WANT)


def jsonld_entities(pages: DataFrame, html_col: str = "html",
                    url_col: str = "url") -> DataFrame:
    """Pages → exploded entity relation ``(url, type, headline,
    published_epoch, author)``. One Arrow pass; explode_outer +
    isNotNull keeps Catalyst from double-evaluating the kernel (see
    operators/anchors.py)."""

    @pandas_udf(JSONLD_SCHEMA)
    def jsonld_udf(html: pd.Series) -> pd.Series:
        return html.map(extract_jsonld)

    return (
        pages.select(
            F.col(url_col).alias("url"),
            jsonld_udf(F.col(html_col)).alias("_e"),
        )
        .select("url", F.explode_outer("_e").alias("e"))
        .filter(F.col("e").isNotNull())
        .select(
            "url",
            F.col("e.type").alias("type"),
            F.col("e.headline").alias("headline"),
            F.col("e.published_epoch").alias("published_epoch"),
            F.col("e.author").alias("author"),
        )
    )


def opengraph_df(pages: DataFrame, html_col: str = "html",
                 url_col: str = "url") -> DataFrame:
    """Pages → ``(url, og_title, og_type, og_image, og_url)`` in one
    Arrow pass."""

    @pandas_udf(OG_SCHEMA)
    def og_udf(html: pd.Series) -> pd.DataFrame:
        vals = [extract_opengraph(h) for h in html]
        return pd.DataFrame(
            vals, columns=["og_title", "og_type", "og_image", "og_url"])

    return pages.select(
        F.col(url_col).alias("url"),
        og_udf(F.col(html_col)).alias("_o"),
    ).select(
        "url",
        F.col("_o.og_title").alias("og_title"),
        F.col("_o.og_type").alias("og_type"),
        F.col("_o.og_image").alias("og_image"),
        F.col("_o.og_url").alias("og_url"),
    )
