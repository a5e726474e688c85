"""Substring- and segment-level deduplication (training-data pipeline ops).

Two operators below the document granularity of :mod:`.dedupe`, each a
JVM-only Column plan paired with DuckDB-SQL mirror builders sharing the
same constants so the driver's oracle verifies them value-for-value:

* **duplicate-span detection** — the exact-substring dedup family
  (Lee et al., "Deduplicating Training Data Makes Language Models
  Better"): slide fixed-width word windows at a stride over every
  document, hash each window, and mark a window occurrence *duplicated*
  when its hash appears ≥2 times anywhere in the corpus (cross-doc or
  within-doc). Per-doc output is the duplicated-window fraction — the
  signal pipelines threshold on before span-cutting. Guarantee: any
  exact duplicated word-span of length ≥ ``width + stride − 1`` words
  contains at least one aligned duplicated window in *both* of its
  occurrences, so stride trades explode volume for minimum detectable
  span length (stride=1 ≡ every span of ``width`` words).

* **segment-frequency filter** — the CCNet/C4 line-level dedup shape:
  given a pre-segmented ``array<string>`` column (real pipelines split
  on newlines/sentences; callers choose), compute each distinct
  segment's document frequency corpus-wide and rebuild every document
  keeping only segments whose df ≤ ``max_df`` — global boilerplate
  (cookie banners, nav chrome) vanishes from every doc at once.

Scale notes: both operators are shuffle-bounded by hash keys, never
all-pairs. Span stats are two keyed aggregations (window-hash, then
doc) plus one join back on the per-(doc,hash) distinct rows — a hot
boilerplate window inflates no join (it is counted, not paired). The
segment filter's hot set (df > max_df) is by construction the tiny tail
of the df distribution, so its anti-join broadcasts; ``broadcast_hot=
False`` falls back to a keyed shuffle anti-join if a pathological
corpus makes it large. Reassembly sorts segments *within one document*
(``array_sort`` over a collected list) — bounded by document length,
never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_spark.functions.text import normalized_text
from spider_spark.operators.dedupe import NORM_SQL, md5_60, md5_60_sql


# ---------------------------------------------------------------------------
# duplicate-span detection (exact-substring dedup signal)
# ---------------------------------------------------------------------------


def span_windows(docs: DataFrame, width: int = 8, stride: int = 2,
                 id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``(id, pos, span_hash)`` for every width-word window starting at
    word positions 1, 1+stride, 2·stride+1, … (1-based, full windows
    only; documents shorter than ``width`` words emit none). The hash is
    the shared 60-bit md5 both engines compute identically."""
    if width < 1 or stride < 1:
        raise ValueError(f"width/stride must be ≥1: {width}/{stride}")
    words = F.split(normalized_text(F.col(text_col)), " ")
    n = F.size(words)
    starts = F.when(
        n >= width, F.sequence(F.lit(1), n - (width - 1), F.lit(stride))
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    win = F.explode(starts).alias("pos")
    return docs.select(F.col(id_col), words.alias("_w"), win).select(
        id_col,
        "pos",
        md5_60(F.array_join(F.slice(F.col("_w"), F.col("pos"), width), " ")).alias(
            "span_hash"
        ),
    )


def span_windows_sql(width: int = 8, stride: int = 2, id_col: str = "doc_id",
                     text_col: str = "text", table: str = "documents") -> str:
    """DuckDB mirror of :func:`span_windows` (same normalization, hash,
    and start positions)."""
    norm = NORM_SQL.format(x=text_col)
    h = md5_60_sql(f"array_to_string(words[i:i+{width - 1}], ' ')")
    return f"""
    SELECT {id_col}, i AS pos, {h} AS span_hash FROM (
      SELECT {id_col}, words, unnest(
        [i FOR i IN range(1, len(words) - {width - 1} + 1, {stride})]
      ) AS i
      FROM (SELECT {id_col}, string_split({norm}, ' ') AS words FROM {table})
      WHERE len(words) >= {width}
    )
    """


def span_dup_stats(docs: DataFrame, width: int = 8, stride: int = 2,
                   id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document duplicated-span statistics: ``(id, n_windows,
    n_dup_windows, dup_fraction)`` where a window occurrence is duplicated
    iff its hash occurs ≥2 times corpus-wide. Every input document appears
    (zero-window docs report 0 / 0.0).

    Plan: windows → count per (doc, hash) → corpus count per hash (a
    map-side-combinable sum over the per-doc rows, NOT the raw windows) →
    join the flag back on the hash key → one doc-keyed agg. All shuffles
    are keyed; boilerplate hashes skew an agg, never a pair-join."""
    w = span_windows(docs, width=width, stride=stride,
                     id_col=id_col, text_col=text_col)
    per = w.groupBy(id_col, "span_hash").agg(F.count("*").alias("n"))
    corpus = per.groupBy("span_hash").agg(F.sum("n").alias("c"))
    stats = (
        per.join(corpus, on="span_hash")
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("n_windows"),
            F.sum(F.when(F.col("c") >= 2, F.col("n")).otherwise(0)).alias(
                "n_dup_windows"
            ),
        )
    )
    return (
        docs.select(id_col)
        .join(stats, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
        )
        .withColumn(
            "dup_fraction",
            F.when(F.col("n_windows") == 0, F.lit(0.0)).otherwise(
                F.col("n_dup_windows") / F.col("n_windows")
            ),
        )
    )


def span_dup_stats_sql(width: int = 8, stride: int = 2, id_col: str = "doc_id",
                       text_col: str = "text", table: str = "documents") -> str:
    win = span_windows_sql(width=width, stride=stride, id_col=id_col,
                           text_col=text_col, table=table)
    return f"""
    WITH win AS ({win}),
    per AS (SELECT {id_col}, span_hash, count(*) AS n FROM win GROUP BY 1, 2),
    corpus AS (SELECT span_hash, sum(n) AS c FROM per GROUP BY 1),
    stats AS (
      SELECT per.{id_col},
             sum(n)::BIGINT AS n_windows,
             sum(CASE WHEN c >= 2 THEN n ELSE 0 END)::BIGINT AS n_dup_windows
      FROM per JOIN corpus USING (span_hash)
      GROUP BY 1
    )
    SELECT d.{id_col},
           coalesce(n_windows, 0) AS n_windows,
           coalesce(n_dup_windows, 0) AS n_dup_windows,
           CASE WHEN coalesce(n_windows, 0) = 0 THEN 0.0
                ELSE coalesce(n_dup_windows, 0) * 1.0 / n_windows
           END AS dup_fraction
    FROM (SELECT {id_col} FROM {table}) d
    LEFT JOIN stats USING ({id_col})
    """


# ---------------------------------------------------------------------------
# segment-frequency filter (CCNet/C4 line-level dedup)
# ---------------------------------------------------------------------------


def segment_frequency_filter(docs: DataFrame, segments_col: str,
                             max_df: int, id_col: str = "doc_id",
                             broadcast_hot: bool = True) -> DataFrame:
    """Strip globally-common segments from every document: any segment
    whose *document frequency* (distinct docs containing it, duplicates
    within one doc count once) exceeds ``max_df`` is removed everywhere;
    survivors are re-joined with single spaces in original order. Output:
    ``(id, clean_text, n_segments, n_kept)`` for every input document
    (all-dropped docs report ``clean_text = ''``)."""
    segs = docs.select(
        F.col(id_col), F.posexplode(F.col(segments_col)).alias("pos", "seg")
    ).withColumn("h", md5_60(F.col("seg")))
    hot = (
        segs.select(id_col, "h").distinct()
        .groupBy("h").agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_df)
        .select("h")
    )
    if broadcast_hot:
        hot = F.broadcast(hot)
    kept = segs.join(hot, on="h", how="left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda x: x["seg"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    return (
        docs.select(F.col(id_col), F.size(F.col(segments_col)).alias("n_segments"))
        .join(rebuilt, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.col("n_segments").cast("long").alias("n_segments"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )


def word_chunks(text_col: str, chunk_words: int):
    """``array<string>`` of non-overlapping ``chunk_words``-word segments
    of the normalized text — the segmenter the driver query uses (real
    pipelines pass newline/sentence splits instead)."""
    words = F.split(normalized_text(F.col(text_col)), " ")
    n_chunks = F.ceil(F.size(words) / F.lit(chunk_words)).cast("int")
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n_chunks, F.lit(1))),
        lambda i: F.array_join(
            F.slice(words, (i - F.lit(1)) * chunk_words + F.lit(1), chunk_words), " "
        ),
    )


def segment_filter_chunks_sql(chunk_words: int, max_df: int,
                              id_col: str = "doc_id", text_col: str = "text",
                              table: str = "documents") -> str:
    """DuckDB mirror of ``segment_frequency_filter(docs.withColumn(segs,
    word_chunks(...)), ...)`` — same chunking, df rule, and reassembly."""
    norm = NORM_SQL.format(x=text_col)
    h = md5_60_sql("seg")
    return f"""
    WITH w AS (SELECT {id_col}, string_split({norm}, ' ') AS words FROM {table}),
    segs AS (
      SELECT {id_col}, i AS pos,
             array_to_string(
               words[(i - 1) * {chunk_words} + 1 : (i - 1) * {chunk_words} + {chunk_words}],
               ' ') AS seg
      FROM (SELECT {id_col}, words,
                   unnest(range(1, greatest((len(words) + {chunk_words} - 1) // {chunk_words}, 1) + 1)) AS i
            FROM w)
    ),
    hot AS (
      SELECT h FROM (
        SELECT DISTINCT {id_col}, {h} AS h FROM segs
      ) GROUP BY h HAVING count(*) > {max_df}
    ),
    kept AS (SELECT * FROM segs WHERE {h} NOT IN (SELECT h FROM hot)),
    rebuilt AS (
      SELECT {id_col},
             string_agg(seg, ' ' ORDER BY pos) AS clean_text,
             count(*) AS n_kept
      FROM kept GROUP BY {id_col}
    )
    SELECT d.{id_col},
           coalesce(clean_text, '') AS clean_text,
           greatest((len(words) + {chunk_words} - 1) // {chunk_words}, 1)::BIGINT
             AS n_segments,
           coalesce(n_kept, 0)::BIGINT AS n_kept
    FROM w d LEFT JOIN rebuilt USING ({id_col})
    """


# ---------------------------------------------------------------------------
# host-scoped boilerplate filter (per-site template lines)
# ---------------------------------------------------------------------------


def host_boilerplate_filter(docs: DataFrame, host_col: str,
                            segments_col: str,
                            min_df: int = 3,
                            frac: tuple[int, int] = (1, 2),
                            id_col: str = "doc_id") -> DataFrame:
    """Strip per-HOST template segments: a segment is boilerplate *on a
    host* when its within-host document frequency (distinct docs of that
    host containing it; duplicates within one doc count once) is both
    ``≥ min_df`` and ``≥ frac`` of the host's page count — the
    site-template shape (nav chrome, footers, cookie banners repeated
    across one site's pages) that the corpus-wide
    :func:`segment_frequency_filter` cannot express: a line ubiquitous
    on site A but quoted once on site B is stripped from A's docs and
    kept in B's. The fraction test is integer cross-multiplication
    (``df · den ≥ num · host_pages``) so the DuckDB mirror agrees
    bit-for-bit. Output: ``(id, host, clean_text, n_segments, n_kept)``
    for every input document.

    Scale shape: one (host, segment-hash)-keyed distinct + count, one
    host-keyed page count, and a (host, hash)-keyed anti-join back —
    never broadcast (the union of all hosts' template sets grows with
    host count; per-host hotness does not make it small), never
    all-pairs. Reassembly sorts within one document only."""
    if min_df < 1:
        raise ValueError(f"min_df must be ≥1: {min_df}")
    num, den = frac
    if not (0 < num <= den):
        raise ValueError(f"frac: need 0 < num ≤ den, got {num}/{den}")
    segs = docs.select(
        F.col(id_col), F.col(host_col).alias("__host"),
        F.posexplode(F.col(segments_col)).alias("pos", "seg"),
    ).withColumn("h", md5_60(F.col("seg")))
    host_pages = docs.groupBy(F.col(host_col).alias("__host")).agg(
        F.count("*").alias("__pages"))
    hot = (
        segs.select(id_col, "__host", "h").distinct()
        .groupBy("__host", "h").agg(F.count("*").alias("df"))
        .join(host_pages, on="__host")
        .filter((F.col("df") >= min_df)
                & (F.col("df") * den >= num * F.col("__pages")))
        .select("__host", "h")
    )
    kept = segs.join(hot, on=["__host", "h"], how="left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda x: x["seg"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    return (
        docs.select(F.col(id_col), F.col(host_col).alias("host"),
                    F.size(F.col(segments_col)).alias("n_segments"))
        .join(rebuilt, on=id_col, how="left")
        .select(
            id_col, "host",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.col("n_segments").cast("long").alias("n_segments"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )


def host_boilerplate_sql(segments_sql: str, host_sql: str,
                         min_df: int = 3, frac: tuple[int, int] = (1, 2),
                         id_col: str = "doc_id",
                         table: str = "documents") -> str:
    """DuckDB mirror of :func:`host_boilerplate_filter` over documents
    whose segment array is ``segments_sql`` (a list-valued expression
    over ``table``) and host is ``host_sql`` — identical df rule,
    integer fraction test, and space-joined in-order reassembly."""
    num, den = frac
    h = md5_60_sql("seg")
    return f"""
WITH base AS (
  SELECT {id_col}, {host_sql} AS host, {segments_sql} AS segs FROM {table}
),
segs AS (
  SELECT {id_col}, host, pos, seg, {h} AS h FROM (
    SELECT {id_col}, host,
           unnest(range(len(segs))) AS pos,
           unnest(segs) AS seg
    FROM base)
),
host_pages AS (
  SELECT host, count(*)::BIGINT AS pages FROM base GROUP BY host
),
hot AS (
  SELECT d.host, d.h
  FROM (SELECT DISTINCT {id_col}, host, h FROM segs) d
  JOIN host_pages hp USING (host)
  GROUP BY d.host, d.h, hp.pages
  HAVING count(*) >= {min_df}
     AND count(*) * {den} >= {num} * hp.pages
),
kept AS (
  SELECT segs.* FROM segs
  WHERE NOT EXISTS (SELECT 1 FROM hot
                    WHERE hot.host = segs.host AND hot.h = segs.h)
),
rebuilt AS (
  SELECT {id_col},
         string_agg(seg, ' ' ORDER BY pos) AS clean_text,
         count(*)::BIGINT AS n_kept
  FROM kept GROUP BY {id_col}
)
SELECT b.{id_col}, b.host,
       coalesce(r.clean_text, '') AS clean_text,
       len(b.segs)::BIGINT AS n_segments,
       coalesce(r.n_kept, 0)::BIGINT AS n_kept
FROM base b LEFT JOIN rebuilt r USING ({id_col})
"""


# ---------------------------------------------------------------------------
# in-document consecutive-repeat collapse
# ---------------------------------------------------------------------------


def collapse_repeat_segments(docs: DataFrame, segments_col: str,
                             id_col: str = "doc_id") -> DataFrame:
    """Collapse runs of consecutive identical segments within each
    document to their first occurrence — the IN-document half of
    repetition cleaning (the Gopher repetition criteria flag these
    docs; scraped pagination/chat/boilerplate loops produce them).
    Distinct from every cross-document family in this module: no
    corpus state at all — the keep rule ``i == 0 or seg != prev`` is
    ONE scan-local indexed array filter (WholeStageCodegen, zero
    shuffle, zero Python). Output ``(id, clean_text, n_segments,
    n_collapsed)`` for every input document."""
    segs = F.col(segments_col)
    kept = F.filter(
        segs,
        lambda s, i: (i == F.lit(0)) | (s != F.element_at(segs, i)),
    )
    return docs.select(
        F.col(id_col),
        F.array_join(kept, " ").alias("clean_text"),
        F.size(segs).cast("long").alias("n_segments"),
        (F.size(segs) - F.size(kept)).cast("long").alias("n_collapsed"),
    )


def collapse_repeat_words_sql(id_col: str = "doc_id",
                              text_col: str = "text",
                              table: str = "documents") -> str:
    """DuckDB mirror of ``collapse_repeat_segments`` over word segments
    (``split(normalized_text)``) — same indexed keep rule (DuckDB list
    lambdas index from 1; Spark's from 0; both test "differs from
    predecessor")."""
    norm = NORM_SQL.format(x=text_col)
    return f"""
    WITH w AS (SELECT {id_col}, string_split({norm}, ' ') AS segs
               FROM {table}),
    k AS (
      SELECT {id_col}, segs,
             list_filter(segs, (x, i) -> i = 1 OR segs[i - 1] <> x) AS kept
      FROM w
    )
    SELECT {id_col}, array_to_string(kept, ' ') AS clean_text,
           len(segs)::BIGINT AS n_segments,
           (len(segs) - len(kept))::BIGINT AS n_collapsed
    FROM k
    """
