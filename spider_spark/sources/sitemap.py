"""Sitemap ingestion (the sitemaps.org XML protocol).

A production crawler doesn't discover every URL by link traversal: hosts
publish sitemaps — ``<urlset>`` documents listing URLs with optional
``lastmod`` / ``changefreq`` / ``priority`` hints, and ``<sitemapindex>``
documents pointing at child sitemaps. The reference engine has no sitemap
path (it seeds from a single URL, crawler.py:53); at web scale sitemaps
are both a seed source and the freshness oracle the recrawl scheduler
(operators/recrawl.py) wants: ``lastmod`` newer than our fetch means the
page changed, ``changefreq`` is the host's own TTL hint.

Design:

* ``parse_sitemap`` — one-document kernel on :mod:`xml.etree.ElementTree`
  (stdlib; namespace-agnostic via local-name matching, tolerant of
  malformed tails like the HTML kernel). Runs inside an Arrow-batched
  pandas UDF — the same hot-path discipline as the HTML parse.
* ``sitemap_entries`` — pages-of-XML → exploded entry relation
  ``(sitemap_url, loc, lastmod_epoch, changefreq, priority_milli,
  is_index)``. ``lastmod`` is parsed from W3C datetime (date-only or full
  ISO-8601 with zone) into epoch seconds — integer, so oracle mirrors are
  bit-exact. ``priority`` becomes an exact milli integer.
* ``sitemap_refresh_plan`` — entries ⋈ fetched-state: per-URL refetch
  verdict with a reason column (``changed`` > ``stale`` > ``new``). One
  keyed left join + JVM expressions; no UDF, no collect. Feeds
  ``CrawlEngine.crawl(due, seeds_canonical=True)`` exactly like
  ``recrawl_due``.

Scale: the parse pass is one Arrow scan over sitemap documents (a host's
sitemap set is tiny next to its page set); the refresh join is keyed on
URL — co-partitioned with every other URL-keyed stage. ``changefreq``
TTLs are constants folded into the plan.
"""

from __future__ import annotations

from datetime import datetime, timezone
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "CHANGEFREQ_TTL_SEC",
    "parse_sitemap",
    "sitemap_entries",
    "sitemap_refresh_plan",
    "sitemap_refresh_sql",
    "sitemap_xml",
    "sitemap_index_xml",
    "write_sitemap",
    "read_sitemap_files",
]

SITEMAP_ENTRIES_SCHEMA = ArrayType(
    StructType(
        [
            StructField("loc", StringType(), False),
            StructField("lastmod_epoch", LongType(), True),
            StructField("changefreq", StringType(), True),
            StructField("priority_milli", IntegerType(), True),
            StructField("is_index", BooleanType(), False),
        ]
    )
)

# the protocol's <changefreq> vocabulary as refresh TTLs (seconds).
# 'always' is always stale; 'never' never goes stale by age (a newer
# lastmod still triggers a 'changed' refetch — archived pages do change
# their archival note).
CHANGEFREQ_TTL_SEC = {
    "always": 0,
    "hourly": 3_600,
    "daily": 86_400,
    "weekly": 604_800,
    "monthly": 2_592_000,
    "yearly": 31_536_000,
}


def _local(tag: str) -> str:
    """Element local name, namespace stripped ('{ns}url' → 'url')."""
    return tag.rsplit("}", 1)[-1]


def _parse_lastmod(raw: str | None) -> int | None:
    """W3C datetime → epoch seconds. Date-only values are UTC midnight;
    naive datetimes are treated as UTC (the protocol recommends zoned
    values; UTC is the deterministic reading of the rest)."""
    if not raw:
        return None
    s = raw.strip()
    try:
        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp())


def _parse_priority_milli(raw: str | None) -> int | None:
    """'0.8' → 800, exactly (scaled-integer parse, no float round-trip)."""
    if not raw:
        return None
    s = raw.strip()
    try:
        v = int(round(float(s) * 1000))
    except ValueError:
        return None
    return v if 0 <= v <= 1000 else None


def parse_sitemap(xml: bytes | str) -> list[dict]:
    """Parse one sitemap document → entry dicts (see module schema).

    ``<urlset>`` children yield page entries (``is_index=False``);
    ``<sitemapindex>`` children yield child-sitemap entries
    (``is_index=True``). Entries without a ``<loc>`` are skipped;
    malformed XML yields what was parsed up to the error (ET is
    all-or-nothing, so in practice: an empty list) — tolerant like the
    HTML kernel, never an exception on the hot path."""
    if isinstance(xml, (bytes, bytearray, memoryview)):
        xml = bytes(xml).decode("utf-8", errors="replace")
    try:
        root = ElementTree.fromstring(xml)
    except ElementTree.ParseError:
        return []
    kind = _local(root.tag)
    if kind == "urlset":
        child_tag, is_index = "url", False
    elif kind == "sitemapindex":
        child_tag, is_index = "sitemap", True
    else:
        return []
    out: list[dict] = []
    for child in root:
        if _local(child.tag) != child_tag:
            continue
        fields = {_local(c.tag): (c.text or "") for c in child}
        loc = fields.get("loc", "").strip()
        if not loc:
            continue
        freq = fields.get("changefreq", "").strip().lower() or None
        if freq is not None and freq not in CHANGEFREQ_TTL_SEC and freq != "never":
            freq = None
        out.append(
            {
                "loc": loc,
                "lastmod_epoch": _parse_lastmod(fields.get("lastmod")),
                "changefreq": freq,
                "priority_milli": _parse_priority_milli(fields.get("priority")),
                "is_index": is_index,
            }
        )
    return out


@pandas_udf(SITEMAP_ENTRIES_SCHEMA)
def parse_sitemap_udf(xml: pd.Series) -> pd.Series:
    return xml.map(parse_sitemap)


def sitemap_entries(sitemaps: DataFrame, xml_col: str = "xml",
                    url_col: str = "url") -> DataFrame:
    """Sitemap documents → exploded entry relation ``(sitemap_url, loc,
    lastmod_epoch, changefreq, priority_milli, is_index)``. One Arrow
    parse pass + posexplode; document order within a sitemap is not
    semantically meaningful in the protocol, so plain explode."""
    # explode_outer + isNotNull, not explode: keeps Catalyst from
    # inferring a size() filter that re-evaluates the parse UDF (see
    # operators/anchors.py anchor_pairs for the full note)
    return (
        sitemaps.select(
            F.col(url_col).alias("sitemap_url"),
            parse_sitemap_udf(F.col(xml_col).cast("string")).alias("_e"),
        )
        .select("sitemap_url", F.explode_outer("_e").alias("e"))
        .filter(F.col("e").isNotNull())
        .select(
            "sitemap_url",
            F.col("e.loc").alias("loc"),
            F.col("e.lastmod_epoch").alias("lastmod_epoch"),
            F.col("e.changefreq").alias("changefreq"),
            F.col("e.priority_milli").alias("priority_milli"),
            F.col("e.is_index").alias("is_index"),
        )
    )


def _ttl_expr(freq, default_ttl_sec: int):
    """changefreq → TTL seconds as a folded CASE chain; NULL for 'never'
    (age never triggers), ``default_ttl_sec`` for absent/unknown."""
    expr = F.when(F.lit(False), F.lit(None).cast("long"))
    for name, sec in CHANGEFREQ_TTL_SEC.items():
        expr = expr.when(freq == name, F.lit(sec).cast("long"))
    return (
        expr.when(freq == "never", F.lit(None).cast("long"))
        .otherwise(F.lit(default_ttl_sec).cast("long"))
    )


def sitemap_refresh_plan(entries: DataFrame, fetched: DataFrame,
                         now_epoch: int,
                         default_ttl_sec: int = 604_800,
                         url_col: str = "url",
                         ts_col: str = "fetch_epoch") -> DataFrame:
    """Per-URL refetch verdict from sitemap hints vs stored fetch state:
    ``(loc, reason, lastmod_epoch, priority_milli)`` where reason is

    * ``changed`` — ``lastmod`` strictly newer than our fetch (the host
      says the page changed; strongest signal, checked first);
    * ``stale`` — ``now − fetch ≥ TTL(changefreq)`` (``always`` → 0 ⇒
      every pass; ``never`` → age alone never refetches);
    * ``new`` — the sitemap lists a URL we never fetched.

    ``fetched`` carries ``(url_col, ts_col)`` with epoch-seconds fetch
    times. Index entries are excluded (they name child sitemaps, not
    pages). One keyed left join; all verdict arithmetic is integer JVM
    expressions, so the DuckDB mirror is bit-exact."""
    from pyspark.sql import Window

    f = fetched.select(
        F.col(url_col).alias("loc"),
        F.col(ts_col).cast("long").alias("_fetch"),
    )
    # deterministic keep-one per loc (a URL may appear in several
    # sitemaps): newest lastmod wins, then highest priority, then the
    # lexically-first changefreq — a total order over the projected
    # columns, so any residual tie is between identical rows.
    w = Window.partitionBy("loc").orderBy(
        F.col("lastmod_epoch").desc_nulls_last(),
        F.col("priority_milli").desc_nulls_last(),
        F.col("changefreq").asc_nulls_last(),
    )
    e = (
        entries.filter(~F.col("is_index"))
        .select("loc", "lastmod_epoch", "changefreq", "priority_milli")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    ttl = _ttl_expr(F.col("changefreq"), default_ttl_sec)
    reason = (
        F.when(F.col("_fetch").isNull(), F.lit("new"))
        .when(
            F.col("lastmod_epoch").isNotNull()
            & (F.col("lastmod_epoch") > F.col("_fetch")),
            F.lit("changed"),
        )
        .when(
            ttl.isNotNull() & (F.lit(now_epoch) - F.col("_fetch") >= ttl),
            F.lit("stale"),
        )
    )
    return (
        e.join(f, on="loc", how="left")
        .select(
            "loc", reason.alias("reason"),
            "lastmod_epoch", "priority_milli",
        )
        .filter(F.col("reason").isNotNull())
    )


def sitemap_refresh_sql(entries_rel: str, fetched_rel: str, now_epoch: int,
                        default_ttl_sec: int = 604_800) -> str:
    """DuckDB mirror of :func:`sitemap_refresh_plan` over an entry
    relation ``(loc, lastmod_epoch, changefreq, priority_milli,
    is_index)`` and a fetched relation ``(loc, fetch_epoch)``."""
    cases = " ".join(
        f"WHEN e.changefreq = '{name}' THEN {sec}::BIGINT"
        for name, sec in CHANGEFREQ_TTL_SEC.items()
    )
    return f"""
    WITH e AS (
      SELECT DISTINCT ON (loc)
             loc, lastmod_epoch, changefreq, priority_milli
      FROM ({entries_rel}) WHERE NOT is_index
      ORDER BY loc, lastmod_epoch DESC NULLS LAST,
               priority_milli DESC NULLS LAST, changefreq ASC NULLS LAST
    ),
    f AS (SELECT loc, fetch_epoch FROM ({fetched_rel})),
    v AS (
      SELECT e.loc,
        CASE WHEN f.fetch_epoch IS NULL THEN 'new'
             WHEN e.lastmod_epoch IS NOT NULL
                  AND e.lastmod_epoch > f.fetch_epoch THEN 'changed'
             WHEN (CASE {cases}
                        WHEN e.changefreq = 'never' THEN NULL
                        ELSE {default_ttl_sec}::BIGINT END) IS NOT NULL
                  AND {now_epoch} - f.fetch_epoch >=
                      (CASE {cases}
                            WHEN e.changefreq = 'never' THEN NULL
                            ELSE {default_ttl_sec}::BIGINT END)
             THEN 'stale'
        END AS reason,
        e.lastmod_epoch, e.priority_milli
      FROM e LEFT JOIN f USING (loc)
    )
    SELECT loc, reason, lastmod_epoch, priority_milli
    FROM v WHERE reason IS NOT NULL
    """


# ---------------------------------------------------------------------------
# sitemap export (the write side of the protocol)
# ---------------------------------------------------------------------------

SITEMAP_MAX_URLS = 50_000  # the protocol's per-file limit

SITEMAP_MANIFEST_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("file_no", IntegerType(), False),
        StructField("path", StringType(), False),
        StructField("n_urls", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sha256", StringType(), False),
    ]
)


def _w3c_utc(epoch: int) -> str:
    return datetime.fromtimestamp(int(epoch), tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ")


def sitemap_xml(entries: list[dict]) -> bytes:
    """One ``<urlset>`` document from ``(loc, lastmod_epoch, changefreq,
    priority_milli)`` dicts (None fields omitted) — the inverse of
    :func:`parse_sitemap`, which round-trips it exactly: W3C UTC
    lastmod back to the same epoch, ``priority`` printed at exact milli
    precision. Deterministic: no timestamps-of-now, fixed formatting."""
    from xml.sax.saxutils import escape

    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>\n',
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n',
    ]
    for e in entries:
        parts.append(f"<url><loc>{escape(str(e['loc']))}</loc>")
        if e.get("lastmod_epoch") is not None:
            parts.append(f"<lastmod>{_w3c_utc(e['lastmod_epoch'])}</lastmod>")
        if e.get("changefreq") is not None:
            parts.append(f"<changefreq>{e['changefreq']}</changefreq>")
        if e.get("priority_milli") is not None:
            parts.append(
                f"<priority>{int(e['priority_milli']) / 1000:.3f}</priority>")
        parts.append("</url>\n")
    parts.append("</urlset>\n")
    return "".join(parts).encode("utf-8")


def sitemap_index_xml(locs: list[tuple[str, int | None]]) -> bytes:
    """A ``<sitemapindex>`` document from ``(loc, lastmod_epoch)`` pairs
    — what a host serves at its sitemap root to point crawlers at the
    per-shard files. :func:`parse_sitemap` reads it back with
    ``is_index = true``."""
    from xml.sax.saxutils import escape

    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>\n',
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n',
    ]
    for loc, lastmod in sorted(locs):
        parts.append(f"<sitemap><loc>{escape(str(loc))}</loc>")
        if lastmod is not None:
            parts.append(f"<lastmod>{_w3c_utc(lastmod)}</lastmod>")
        parts.append("</sitemap>\n")
    parts.append("</sitemapindex>\n")
    return "".join(parts).encode("utf-8")


def write_sitemap(df: DataFrame, out_dir: str,
                  max_urls: int = SITEMAP_MAX_URLS) -> DataFrame:
    """Distributed sitemap export: URL rows → per-host ``<urlset>`` XML
    files under ``out_dir``, each holding ≤ ``max_urls`` URLs (the
    protocol's 50 k limit), named ``sitemap-{host}-{file_no:05d}.xml``.
    Returns the manifest ``(host, file_no, path, n_urls, n_bytes,
    sha256)`` — feed it to :func:`sitemap_index_xml` for the index
    document. The write side of this module: what the engine's own
    store publishes so OTHER crawlers (and the recrawl planner's tests)
    can consume the corpus through the same protocol the read side
    speaks; round-trips through :func:`sitemap_entries` byte-exactly.

    Input columns: ``url`` (required), optional ``lastmod_epoch``
    (long, UTC seconds), ``changefreq``, ``priority_milli`` — absent
    columns are treated as all-null and their tags omitted.

    Deterministic by construction (the write_warc contract): file
    membership and order come from sorting URLs within a host — no
    partition-layout dependence — files are placed atomically, and the
    manifest carries the sha256 of each file's bytes. Scale shape: one
    window rank within each host (a host's sitemap is inherently a
    per-host artifact; the protocol's own 50 k split keeps files small,
    and a mega-host ranks once, not per file) and ONE shuffle to the
    (host, file_no) writer groups, each streaming its ≤ ``max_urls``
    rows to its own file."""
    import hashlib
    import os

    from pyspark.sql import Window

    from spider_spark.functions.urlkit import make_host_udf

    if max_urls < 1:
        raise ValueError(f"max_urls must be ≥1: {max_urls}")
    os.makedirs(out_dir, exist_ok=True)
    host_udf = make_host_udf()
    cols = set(df.columns)
    sel = [F.col("url").cast("string").alias("url"),
           host_udf(F.col("url")).alias("host")]
    for c, typ in (("lastmod_epoch", "long"), ("changefreq", "string"),
                   ("priority_milli", "int")):
        sel.append((F.col(c) if c in cols else F.lit(None)).cast(typ).alias(c))
    w = Window.partitionBy("host").orderBy("url")
    ranked = df.select(*sel).withColumn(
        "file_no",
        ((F.row_number().over(w) - 1) / max_urls).cast("int"),
    )

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        host = str(pdf["host"].iloc[0])
        file_no = int(pdf["file_no"].iloc[0])
        pdf = pdf.sort_values("url", kind="mergesort")
        entries = [
            {
                "loc": u,
                "lastmod_epoch": None if pd.isna(lm) else int(lm),
                "changefreq": None if (cf is None or pd.isna(cf)) else str(cf),
                "priority_milli": None if pd.isna(pr) else int(pr),
            }
            for u, lm, cf, pr in zip(pdf["url"], pdf["lastmod_epoch"],
                                     pdf["changefreq"], pdf["priority_milli"])
        ]
        data = sitemap_xml(entries)
        safe_host = host.replace(":", "_")
        path = os.path.join(out_dir, f"sitemap-{safe_host}-{file_no:05d}.xml")
        tmp = f"{path}.inprogress"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pd.DataFrame([{
            "host": host, "file_no": file_no, "path": path,
            "n_urls": len(pdf), "n_bytes": len(data),
            "sha256": hashlib.sha256(data).hexdigest(),
        }])

    return ranked.groupBy("host", "file_no").applyInPandas(
        write_group, SITEMAP_MANIFEST_SCHEMA)


def read_sitemap_files(spark, path_glob: str) -> DataFrame:
    """Exported sitemap files back as ``(url, xml)`` rows — feed to
    :func:`sitemap_entries`. (``binaryFile`` source: each sitemap file
    is one row, exactly the shape the parse kernel wants.)"""
    raw = spark.read.format("binaryFile").load(path_glob)
    return raw.select(F.col("path").alias("url"),
                      F.col("content").alias("xml"))
