"""Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken —
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003).

The guarantee-carrying alternative to "every j-th hash" fingerprinting:
from the sequence of word k-gram hashes, every window of ``w``
consecutive hashes contributes its MINIMUM (rightmost position on ties —
the paper's rule), so any shared run of at least ``w + k - 1`` words
between two documents is GUARANTEED to share a selected fingerprint.
MOSS runs on this; at corpus scale it is the span-dedup candidate
generator whose density (≈ 2/(w+1)) is tunable with a proof, unlike the
heuristic rolling-fingerprint sampler (functions/text.py
rolling_fingerprint, which keeps hash % p == 0 grams and can miss
arbitrarily long matches).

Plan shape (100 TB-safe): gram hashing is scan-local; the window min is
a per-document sort (documents are bounded, partition = doc); the
rightmost-min resolution is ONE (doc, hash)-keyed self-join back to the
gram relation — never a pair join, never a broadcast of anything
corpus-sized. Short documents (< w grams) contribute the minimum of
their whole gram sequence (window start 0 only), so every document is
fingerprinted.

Reference analog: the reference has no fingerprinting at all (its dedupe
is the URL-seen set, spider/use_cache.py:19-28); this is engine-side
corpus tooling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spider_spark.functions.text import normalized_text
from spider_spark.operators.dedupe import NORM_SQL, md5_60, md5_60_sql

DEFAULT_K = 3   # words per gram
DEFAULT_W = 4   # hashes per winnowing window


def positional_grams(docs: DataFrame, k: int = DEFAULT_K,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """``(id, pos, h)`` — md5_60 of every word ``k``-gram at its 0-based
    position (NOT distinct: winnowing is positional). Documents shorter
    than ``k`` words yield their whole text as the single gram at pos 0."""
    words = F.split(normalized_text(F.col(text_col)), " ")
    count = F.greatest(F.size(words) - (k - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.array_join(F.slice(words, i, k), " "),
    )
    return (
        docs.select(F.col(id_col), F.posexplode(grams).alias("pos", "gram"))
        .select(id_col, "pos", md5_60(F.col("gram")).alias("h"))
    )


def winnow_fingerprints(docs: DataFrame, k: int = DEFAULT_K,
                        w: int = DEFAULT_W, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Selected fingerprints ``(id, pos, h)``: for every valid window
    start ``s`` (0 ≤ s ≤ m-w, or s=0 alone when m < w), the window's
    minimum hash at its RIGHTMOST in-window position; distinct per
    (id, pos, h). Deterministic, bit-exact vs :func:`winnow_sql`."""
    grams = positional_grams(docs, k, id_col, text_col)
    frame = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    )
    per_doc = Window.partitionBy(id_col)
    wins = (
        grams
        .withColumn("wmin", F.min("h").over(frame))
        .withColumn("m", F.count(F.lit(1)).over(per_doc))
        .filter(F.col("pos") <= F.greatest(F.col("m") - w, F.lit(0)))
        .select(F.col(id_col).alias("_id"), F.col("pos").alias("s"), "wmin")
    )
    sel = (
        wins.join(
            grams,
            on=[
                wins["_id"] == grams[id_col],
                wins["wmin"] == grams["h"],
                grams["pos"].between(wins["s"], wins["s"] + (w - 1)),
            ],
        )
        .groupBy("_id", "s")
        .agg(F.max("pos").alias("pos"), F.min("wmin").alias("h"))
    )
    return sel.select(
        F.col("_id").alias(id_col), "pos", "h"
    ).distinct()


def positional_grams_sql(k: int = DEFAULT_K, id_col: str = "doc_id",
                         text_col: str = "text",
                         table: str = "documents") -> str:
    """DuckDB mirror of :func:`positional_grams`."""
    norm = NORM_SQL.format(x=text_col)
    gram = f"array_to_string(words[i:i+{k - 1}], ' ')"
    return f"""
    SELECT {id_col}, u['pos']::BIGINT AS pos, {md5_60_sql("u['g']")} AS h
    FROM (
      SELECT {id_col},
             unnest([{{'pos': i - 1, 'g': {gram}}}
                     FOR i IN range(1, greatest(len(words) - {k - 1}, 1) + 1)]) AS u
      FROM (SELECT {id_col}, string_split({norm}, ' ') AS words FROM {table})
    )
    """


def winnow_sql(k: int = DEFAULT_K, w: int = DEFAULT_W,
               id_col: str = "doc_id", text_col: str = "text",
               table: str = "documents") -> str:
    """DuckDB mirror of :func:`winnow_fingerprints` — the identical
    window-min + rightmost-tie relational algebra."""
    return f"""
    WITH grams AS ({positional_grams_sql(k, id_col, text_col, table)}),
    wins AS (
      SELECT {id_col} AS _id, pos AS s,
             MIN(h) OVER (PARTITION BY {id_col} ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
               AS wmin,
             COUNT(*) OVER (PARTITION BY {id_col}) AS m
      FROM grams
    ),
    valid AS (SELECT _id, s, wmin FROM wins
              WHERE s <= greatest(m - {w}, 0)),
    sel AS (
      SELECT v._id, v.s, MAX(g.pos) AS pos, MIN(v.wmin) AS h
      FROM valid v
      JOIN grams g ON g.{id_col} = v._id AND g.h = v.wmin
                  AND g.pos BETWEEN v.s AND v.s + {w - 1}
      GROUP BY v._id, v.s
    )
    SELECT DISTINCT _id AS {id_col}, pos, h FROM sel
    """
