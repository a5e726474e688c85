"""Content-defined chunking (CDC) + chunk-level storage dedup.

A maintained crawl stores the same page text again and again with small
edits (boilerplate drift, timestamps, injected banners). Fixed-size
blocks lose all dedup the moment one byte shifts; *content-defined*
boundaries (LBFS, Muthitacharoen et al. SOSP 2001 — the rsync/restic/
casync family) cut where a rolling hash of the local content hits a
target value, so an edit only perturbs the chunks it touches and every
other chunk re-aligns byte-for-byte. Chunk-hash content addressing then
stores each distinct chunk once — the storage half of the dedup suite
(the retrieval half is :mod:`.dedupe`'s near-dup families).

Word-level formulation (the pipeline's shared tokenization, so chunk
hashes join the span/winnow tables): a boundary falls AFTER word ``i``
iff ``md5_60(words[i-k+1..i]) % p == 0`` — the same positional k-gram
hash the winnowing selector uses, giving expected chunk length ``p``
words, shift-invariant by construction. Boundary decisions, span
assembly, and chunk strings are ONE scan-local array expression per
document (no explode until the chunk relation exists); the corpus-wide
chunk frequency is a single chunk-hash-keyed count with map-side
partials, joined back for the per-document storage verdict.

No min/max chunk-size clamps: the sequential clamp of the classic
implementations makes boundary ``i`` depend on boundary ``i-1`` (a scan,
not a map) and breaks shift-invariance — the property this operator
exists for. Degenerate short chunks are the documented cost, bounded in
expectation by the geometric tail.

Reference parity: no analog in the reference (an asyncio crawler);
storage-layer extension beside sources/warc.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spider_spark.functions.text import normalized_text
from spider_spark.operators.dedupe import NORM_SQL, md5_60, md5_60_sql

__all__ = ["cdc_chunks", "cdc_dedup_stats", "cdc_dedup_stats_sql"]


def cdc_chunks(docs: DataFrame, k: int = 3, p: int = 16,
               id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``(id, cpos, chunk, c_hash, c_words)`` — every document split at
    content-defined boundaries (expected chunk length ``p`` words;
    documents shorter than ``k`` words form one chunk)."""
    if k < 1:
        raise ValueError(f"k must be ≥1: {k}")
    if p < 2:
        raise ValueError(f"p must be ≥2: {p}")
    words = F.split(normalized_text(F.col(text_col)), " ")
    n = F.size(words)
    # boundary after word i (i = k..n-1): hash of words[i-k+1..i] % p == 0
    # (never after the last word — that boundary is implicit)
    bpos = F.when(
        n > k,
        F.filter(
            F.sequence(F.lit(k), n - 1),
            lambda i: md5_60(
                F.array_join(F.slice(words, i - F.lit(k - 1), k), " ")
            ) % p == 0,
        ),
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    # cuts = [0] ++ bpos ++ [n]; chunk c = words[cuts[c]+1 .. cuts[c+1]]
    cuts = F.concat(F.array(F.lit(0)), bpos, F.array(n))
    chunks = F.transform(
        F.sequence(F.lit(1), F.size(cuts) - 1),
        lambda c: F.array_join(
            F.slice(
                words,
                F.element_at(cuts, c) + 1,
                F.element_at(cuts, c + 1) - F.element_at(cuts, c),
            ),
            " ",
        ),
    )
    return (
        docs.select(F.col(id_col), F.posexplode(chunks).alias("cpos", "chunk"))
        .filter(F.col("chunk") != "")
        .select(
            id_col, "cpos", "chunk",
            md5_60(F.col("chunk")).alias("c_hash"),
            (F.size(F.split(F.col("chunk"), " "))).cast("long").alias("c_words"),
        )
    )


def cdc_dedup_stats(docs: DataFrame, k: int = 3, p: int = 16,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Per-document content-addressed storage verdict: ``(id, n_chunks,
    n_dup_chunks, dup_words)`` where a chunk is *dup* when its hash
    occurs in more than one ``(doc, position)`` across the corpus — the
    words a chunk store would not store twice. Chunk-hash-keyed count +
    join-back + doc-keyed rollup; every document reports (zero-chunk
    docs report zeros)."""
    ch = cdc_chunks(docs, k, p, id_col, text_col)
    freq = ch.groupBy("c_hash").agg(F.count(F.lit(1)).alias("df"))
    rolled = (
        ch.join(freq, on="c_hash")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("df") > 1).cast("long")).alias("n_dup_chunks"),
            F.sum(
                F.when(F.col("df") > 1, F.col("c_words")).otherwise(F.lit(0))
            ).alias("dup_words"),
        )
    )
    return (
        docs.select(id_col).distinct()
        .join(rolled, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_chunks", F.lit(0)).cast("long").alias("n_chunks"),
            F.coalesce("n_dup_chunks", F.lit(0)).cast("long").alias("n_dup_chunks"),
            F.coalesce("dup_words", F.lit(0)).cast("long").alias("dup_words"),
        )
    )


def cdc_dedup_stats_sql(k: int = 3, p: int = 16, id_col: str = "doc_id",
                        text_col: str = "text",
                        table: str = "documents") -> str:
    """DuckDB mirror of :func:`cdc_dedup_stats` — same boundary rule,
    span assembly, hash, frequency rule, and zero-fill."""
    norm = NORM_SQL.format(x=text_col)
    bh = md5_60_sql(f"array_to_string(words[i - {k - 1}:i], ' ')")
    ch = md5_60_sql("chunk")
    return f"""
    WITH w AS (
      SELECT {id_col}, string_split({norm}, ' ') AS words FROM {table}
    ),
    cutlist AS (
      SELECT {id_col}, words,
             [0] || CASE WHEN len(words) > {k}
                    THEN list_filter(range({k}, len(words)),
                                     i -> {bh} % {p} = 0)
                    ELSE [] END || [len(words)] AS cuts
      FROM w
    ),
    chunks AS (
      SELECT {id_col}, c - 1 AS cpos,
             array_to_string(words[cuts[c] + 1:cuts[c + 1]], ' ') AS chunk
      FROM (SELECT {id_col}, words, cuts,
                   unnest(range(1, len(cuts))) AS c
            FROM cutlist)
    ),
    ch2 AS (
      SELECT {id_col}, cpos, chunk, {ch} AS c_hash,
             len(string_split(chunk, ' ')) AS c_words
      FROM chunks WHERE chunk <> ''
    ),
    freq AS (SELECT c_hash, count(*) AS df FROM ch2 GROUP BY 1),
    rolled AS (
      SELECT ch2.{id_col}, count(*) AS n_chunks,
             sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS n_dup_chunks,
             sum(CASE WHEN df > 1 THEN c_words ELSE 0 END) AS dup_words
      FROM ch2 JOIN freq USING (c_hash) GROUP BY 1
    )
    SELECT d.{id_col},
           coalesce(n_chunks, 0)::BIGINT AS n_chunks,
           coalesce(n_dup_chunks, 0)::BIGINT AS n_dup_chunks,
           coalesce(dup_words, 0)::BIGINT AS dup_words
    FROM (SELECT DISTINCT {id_col} FROM {table}) d
    LEFT JOIN rolled USING ({id_col})
    """
