"""Synthetic Common-Crawl-style pages tables (FIXTURES.md §1).

The sandbox has no network (the reference fetches live HTTP,
crawler.py:121-138; our "web" is a replayed pages table per
``BASELINE.json.input_hint``: ``url:string, warc_ts:timestamp, html:binary,
text:string, lang:string``). Pages are generated deterministically and —
deliberately — with an **arithmetically defined link graph**, so that an
independent SQL oracle (DuckDB recursive CTE) can compute the expected
crawl frontier without ever parsing HTML. That makes the whole
fetch→parse→explode→dedupe pipeline end-to-end checkable against something
that shares no code with the engine.

Graph definition over dense ids ``0..n-1``:

* ``host(i) = h0.example`` when ``i`` is even else ``h{1 + i % 19}.example``
  — host ``h0`` holds ~50% of all pages/links (the skew fixture, SURVEY H4).
* ``url(i) = https://host(i)/d/{i}``
* page ``i`` links, in document order, to: an ``<a>`` without href
  (dropped, crawler.py:154-155), its own URL with ``?q=1`` (query-string
  drop, crawler.py:148-149), child ``c1 = (2i+1) % n``, a dead URL
  ``https://dead.example/d/{i}`` (fetch-join miss ≡ failed download,
  crawler.py:102-104), child ``c2 = (3i+2) % n``, and ``c1`` again
  (intra-page duplicate → seen-set dedupe, use_cache.py:22-24).
* ``title(i) = 'Doc {i}'`` except ``i % 17 == 0`` → no ``<title>`` tag
  (null-title handling, crawler.py:165-168).

HTML is assembled entirely with JVM-side string expressions
(``format_string``/``concat``) — no Python in the generator hot path — and
the ``text`` column is produced by the same Arrow-batched
:func:`~spider_spark.functions.parse.extract_text_udf` kernel the crawler
uses, which is what makes the "byte-identical extracted text per url"
invariant meaningful and testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_spark.functions.parse import extract_text_udf

PAGES_EPOCH = 1704067200  # 2024-01-01T00:00:00Z, deterministic warc_ts base
N_HOSTS = 20


def host_expr(i):
    """h0 for even ids (hot host ~50%), else h1..h19."""
    return F.when(i % 2 == 0, F.lit("h0.example")).otherwise(
        F.concat(F.lit("h"), (F.lit(1) + i % 19).cast("string"), F.lit(".example"))
    )


def url_expr(i):
    return F.concat(F.lit("https://"), host_expr(i), F.lit("/d/"), i.cast("string"))


def seed_url_for(i: int, n: int) -> str:
    host = "h0.example" if i % 2 == 0 else f"h{1 + i % 19}.example"
    return f"https://{host}/d/{i}"


def build_pages(ids: DataFrame, n: int,
                nofollow_c2_mod: int | None = None,
                binary_mod: int | None = None) -> DataFrame:
    """Pages table from a DataFrame with columns (id:long, text:string,
    lang:string). Pure JVM string assembly + one Arrow pass for ``text``.

    ``nofollow_c2_mod=m`` decorates the c2 anchor of every page with
    ``i % m == 0`` with one of the three opt-out rel tokens
    (nofollow/ugc/sponsored, cycling by ``i % 3``) and plants a DECOY
    ``rel="external noopener"`` on pages with ``i % m == 3`` — an
    affirmative rel that must NOT block admission.

    ``binary_mod=m`` prefixes the payload of every page with ``i % m == 0``
    with PDF magic bytes (``%PDF-1.7\\n``) while KEEPING the trailing
    markup — adversarial on purpose: a naive parser still finds the links,
    so only a real MIME gate (CrawlConfig.html_only) keeps them out of the
    frontier.

    With all mods ``None`` the emitted bytes are identical to the classic
    fixture."""
    i = F.col("id")
    c1 = (F.lit(2) * i + 1) % n
    c2 = (F.lit(3) * i + 2) % n
    u = url_expr(i)
    head = F.when(
        i % 17 == 0, F.lit("<head></head>")
    ).otherwise(
        F.format_string("<head><title>Doc %s</title></head>", i.cast("string"))
    )
    if nofollow_c2_mod:
        tok = F.element_at(
            F.array(F.lit("nofollow"), F.lit("ugc"), F.lit("sponsored")),
            (i % 3 + 1).cast("int"),
        )
        c2_attr = (
            F.when(i % nofollow_c2_mod == 0,
                   F.concat(F.lit(' rel="'), tok, F.lit('"')))
            .when(i % nofollow_c2_mod == 3, F.lit(' rel="external noopener"'))
            .otherwise(F.lit(""))
        )
    else:
        c2_attr = F.lit("")
    magic = (
        F.when(i % binary_mod == 0, F.lit("%PDF-1.7\n")).otherwise(F.lit(""))
        if binary_mod
        else F.lit("")
    )
    html_str = F.concat(
        magic,
        F.lit("<html>"),
        head,
        F.lit('<body><a>skip</a><a href="'),
        u,
        F.lit('?q=1">q</a><a href="'),
        url_expr(c1),
        F.lit('">c1</a><a href="https://dead.example/d/'),
        i.cast("string"),
        F.lit('">dead</a><a'),
        c2_attr,
        F.lit(' href="'),
        url_expr(c2),
        F.lit('">c2</a><a href="'),
        url_expr(c1),
        F.lit('">c1b</a><p>'),
        F.col("text"),
        F.lit("</p></body></html>"),
    )
    return (
        ids.select(
            u.alias("url"),
            F.timestamp_seconds(F.lit(PAGES_EPOCH) + i).alias("warc_ts"),
            F.encode(html_str, "UTF-8").alias("html"),
            F.col("lang"),
        )
        .withColumn("text", extract_text_udf(F.col("html")))
        .select("url", "warc_ts", "html", "text", "lang")
    )


def synthetic_pages(spark: SparkSession, n_pages: int, partitions: int | None = None,
                    filler_repeats: int = 0) -> DataFrame:
    """Standalone deterministic pages table of any size (bench uses this).
    ``filler_repeats`` pads each page body with ~64 bytes × repeats of
    deterministic filler so benchmark pages carry realistic web-page weight
    (real HTML is tens of KB, not 300 bytes)."""
    parts = partitions or spark.sparkContext.defaultParallelism
    body = F.format_string(
        "synthetic page body %d with deterministic filler text", F.col("id")
    )
    if filler_repeats > 0:
        body = F.concat(
            body,
            F.repeat(
                F.format_string(
                    " lorem ipsum dolor sit amet %d consectetur adipiscing elit sed do",
                    F.col("id"),
                ),
                filler_repeats,
            ),
        )
    ids = spark.range(0, n_pages, 1, parts).select(
        F.col("id"),
        body.alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("uk"), F.lit("es")),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("lang"),
    )
    return build_pages(ids, n_pages)


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages table derived from the driver's ``documents`` parquet (dense
    ``doc_id`` 0..N-1): page body text = document text, lang = document
    lang. This is what ``__spark_entry__`` crawls so the DuckDB oracle can
    recompute the frontier from ``documents`` alone."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    ids = docs.select(F.col("doc_id").alias("id"), "text", "lang")
    return build_pages(ids, n)


def _host_sql(x: str) -> str:
    return (f"CASE WHEN ({x}) % 2 = 0 THEN 'h0.example' "
            f"ELSE 'h' || (1 + ({x}) % 19) || '.example' END")


def _url_sql(x: str) -> str:
    return f"'https://' || {_host_sql(x)} || '/d/' || ({x})"


def oracle_pages_sql() -> str:
    """DuckDB mirror of :func:`build_pages`' HTML assembly over the
    ``documents`` view: ``(url, html)`` where ``html`` is a VARCHAR whose
    UTF-8 bytes equal the engine's binary ``html`` column byte-for-byte —
    so format-ingestion paths (e.g. the WARC source) can be digest-checked
    against an oracle that shares no code with the generator."""
    c1 = "(2*doc_id+1) % nn.n"
    c2 = "(3*doc_id+2) % nn.n"
    return f"""
    SELECT {_url_sql('doc_id')} AS url,
      '<html>' ||
      CASE WHEN doc_id % 17 = 0 THEN '<head></head>'
           ELSE '<head><title>Doc ' || doc_id || '</title></head>' END ||
      '<body><a>skip</a><a href="' || {_url_sql('doc_id')} || '?q=1">q</a><a href="'
      || {_url_sql(c1)} || '">c1</a><a href="https://dead.example/d/'
      || doc_id || '">dead</a><a href="' || {_url_sql(c2)}
      || '">c2</a><a href="' || {_url_sql(c1)}
      || '">c1b</a><p>' || text || '</p></body></html>' AS html
    FROM documents, (SELECT count(*)::BIGINT AS n FROM documents) nn
    """


# The DuckDB-side mirror of the graph, used by __spark_entry__.oracle_sql().
# Children of page i are (2i+1)%n and (3i+2)%n (minus the seed, which the
# parse filter drops, crawler.py:152-153) plus the per-page dead URL
# (modelled as virtual id n+i, which never expands).
ORACLE_GRAPH_SQL = """
WITH RECURSIVE
  nn AS (SELECT count(*)::BIGINT AS n FROM documents),
  reach(id, depth) AS (
    SELECT {seed_id}::BIGINT AS id, 0 AS depth
    UNION
    SELECT u.child, reach.depth + 1
    FROM reach, nn,
         UNNEST([(2*reach.id+1) % nn.n, (3*reach.id+2) % nn.n, nn.n + reach.id]) AS u(child)
    WHERE reach.depth < {depth} AND reach.id < nn.n AND u.child <> {seed_id}
      AND {admit_pred}
  ),
  seen AS (SELECT id, MIN(depth) AS depth FROM reach GROUP BY id)
"""


def _host_block_pred(blocked_host: str | None) -> str:
    """Recursive-CTE admission predicate mirroring the engine's
    ``blocked_hosts`` link gate for one ``hK.example`` host (TRUE when
    nothing is blocked). Blocked links are never admitted — not fetched,
    not recorded — exactly the engine's drop-before-dedupe semantics."""
    if blocked_host is None:
        return "TRUE"
    if not (blocked_host.startswith("h") and blocked_host.endswith(".example")):
        raise ValueError(f"only hK.example hosts are modeled: {blocked_host!r}")
    k = int(blocked_host[1:-len(".example")])
    if k == 0:
        return "NOT (u.child < nn.n AND u.child % 2 = 0)"
    return (f"NOT (u.child < nn.n AND u.child % 2 = 1"
            f" AND 1 + u.child % 19 = {k})")


def oracle_seen_nofollow_sql(seed_id: int, depth: int, mod: int) -> str:
    """Expected URL-seen set ``(url, depth)`` when the crawl honors
    per-anchor rel=nofollow over the ``nofollow_c2_mod=mod`` fixture: the
    c2 edge of any parent with ``parent % mod == 0`` is never admitted
    (dropped at parse, before the seen-set dedupe — exactly the engine's
    drop-before-dedupe order), every other edge is unchanged, and the
    decoy affirmative rel on ``parent % mod == 3`` blocks nothing. The
    slot-aware recursive walk shares no code with the engine's kernel."""
    return f"""
WITH RECURSIVE
  nn AS (SELECT count(*)::BIGINT AS n FROM documents),
  reach(id, depth) AS (
    SELECT {seed_id}::BIGINT AS id, 0 AS depth
    UNION
    SELECT u.child, reach.depth + 1
    FROM reach, nn,
         UNNEST([
           {{'child': (2*reach.id+1) % nn.n, 'nf': FALSE}},
           {{'child': (3*reach.id+2) % nn.n, 'nf': reach.id % {mod} = 0}},
           {{'child': nn.n + reach.id, 'nf': FALSE}}
         ]) AS t(u)
    WHERE reach.depth < {depth} AND reach.id < nn.n
      AND u.child <> {seed_id} AND NOT u.nf
  ),
  seen AS (SELECT id, MIN(depth) AS depth FROM reach GROUP BY id)
SELECT
  CASE WHEN s.id < nn.n THEN
    'https://h' || (CASE WHEN s.id % 2 = 0 THEN 0 ELSE 1 + s.id % 19 END)
    || '.example/d/' || s.id
  ELSE 'https://dead.example/d/' || (s.id - nn.n) END AS url,
  s.depth::BIGINT AS depth
FROM seen s, nn
"""


def oracle_results_mime_gate_sql(seed_id: int, depth: int, mod: int) -> str:
    """Expected results ``(url, title, depth, fetched)`` when the crawl
    runs with the ``html_only`` MIME gate over the ``binary_mod=mod``
    fixture: pages with ``id % mod == 0`` sniff as application/pdf, so
    they are fetched and recorded (fetched=TRUE) with a NULL title but
    NEVER parsed — none of their links (c1, c2, or their dead URL) enter
    the frontier. Everything else follows the classic graph."""
    return f"""
WITH RECURSIVE
  nn AS (SELECT count(*)::BIGINT AS n FROM documents),
  reach(id, depth) AS (
    SELECT {seed_id}::BIGINT AS id, 0 AS depth
    UNION
    SELECT u.child, reach.depth + 1
    FROM reach, nn,
         UNNEST([(2*reach.id+1) % nn.n, (3*reach.id+2) % nn.n,
                 nn.n + reach.id]) AS u(child)
    WHERE reach.depth < {depth} AND reach.id < nn.n
      AND reach.id % {mod} <> 0 AND u.child <> {seed_id}
  ),
  seen AS (SELECT id, MIN(depth) AS depth FROM reach GROUP BY id)
SELECT
  CASE WHEN s.id < nn.n THEN
    'https://h' || (CASE WHEN s.id % 2 = 0 THEN 0 ELSE 1 + s.id % 19 END)
    || '.example/d/' || s.id
  ELSE 'https://dead.example/d/' || (s.id - nn.n) END AS url,
  CASE WHEN s.id < nn.n AND s.id % 17 <> 0 AND s.id % {mod} <> 0
       THEN 'Doc ' || s.id END AS title,
  s.depth::BIGINT AS depth,
  (s.id < nn.n) AS fetched
FROM seen s, nn
"""


def oracle_results_sql(seed_id: int, depth: int,
                       blocked_host: str | None = None) -> str:
    """Expected final results table (url, title, depth, fetched) in pure SQL."""
    return (
        ORACLE_GRAPH_SQL.format(seed_id=seed_id, depth=depth,
                                admit_pred=_host_block_pred(blocked_host))
        + """
SELECT
  CASE WHEN s.id < nn.n THEN
    'https://h' || (CASE WHEN s.id % 2 = 0 THEN 0 ELSE 1 + s.id % 19 END)
    || '.example/d/' || s.id
  ELSE 'https://dead.example/d/' || (s.id - nn.n) END AS url,
  CASE WHEN s.id < nn.n AND s.id % 17 <> 0 THEN 'Doc ' || s.id END AS title,
  s.depth AS depth,
  (s.id < nn.n) AS fetched
FROM seen s, nn
"""
    )
