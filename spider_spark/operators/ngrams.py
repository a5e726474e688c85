"""Corpus n-gram statistics: counts and deterministic top-k.

The n-gram count table is the workhorse corpus statistic behind a
training-data pipeline's LM-adjacent tooling — decontamination overlap
audits (:mod:`.decontam` checks membership; this module measures mass),
boilerplate discovery (the top of the distribution IS the boilerplate),
and infini-gram-style corpus search (Liu et al. 2024 serve raw n-gram
counts at corpus scale).

Scale shape: ONE pass — split inside the scan, a per-document lambda
transform producing the gram list (no per-position explode fan-out
before the aggregation key exists), explode, then a gram-keyed count
with map-side partial aggregation; top-k compiles to
``TakeOrderedAndProject`` (per-partition partial top-k, never a global
sort). Shuffle bytes are O(distinct grams), not O(gram occurrences).
A hot gram ("of the …") collapses to one row per partition before the
exchange. The (count DESC, gram ASC) order is total, so top-k is
deterministic and the DuckDB mirror agrees row-for-row.

Tokenization is the pipeline's shared one — ``normalized_text`` (lower,
whitespace-collapse, trim) split on single spaces — identical to the
span-dedup and BM25 word streams, so counts join against those tables.

Reference parity: no analog in the reference (an asyncio crawler);
training-data extension layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_spark.functions.text import normalized_text
from spider_spark.operators.dedupe import NORM_SQL

__all__ = ["ngram_counts", "top_ngrams", "top_ngrams_sql"]


def ngram_counts(docs: DataFrame, n: int = 3,
                 text_col: str = "text") -> DataFrame:
    """``(gram, n_occurrences)`` for every word ``n``-gram in the corpus
    (documents shorter than ``n`` words contribute nothing)."""
    if n < 1:
        raise ValueError(f"n must be ≥1: {n}")
    words = F.split(normalized_text(F.col(text_col)), " ")
    starts = F.when(
        F.size(words) >= n, F.sequence(F.lit(1), F.size(words) - (n - 1))
    ).otherwise(F.array())
    grams = F.transform(starts, lambda i: F.array_join(F.slice(words, i, n), " "))
    return (
        docs.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )


def top_ngrams(docs: DataFrame, n: int = 3, k: int = 100,
               text_col: str = "text") -> DataFrame:
    """Top-``k`` grams by ``(n_occurrences DESC, gram ASC)`` — a total
    order, so the cut is deterministic at any parallelism."""
    return ngram_counts(docs, n, text_col).orderBy(
        F.desc("n_occurrences"), F.asc("gram")
    ).limit(k)


def top_ngrams_sql(n: int = 3, k: int = 100, rel: str = "documents",
                   text_col: str = "text") -> str:
    """DuckDB mirror of :func:`top_ngrams`. ``range(1, m)`` is empty for
    ``m ≤ 1``, which drops short documents exactly like the Spark guard."""
    norm = NORM_SQL.format(x=text_col)
    return f"""
    WITH grams AS (
      SELECT unnest(list_transform(
               range(1, len(w) - {n} + 2),
               i -> array_to_string(w[i:i + {n - 1}], ' '))) AS gram
      FROM (SELECT string_split({norm}, ' ') AS w FROM {rel})
    )
    SELECT gram, count(*)::BIGINT AS n_occurrences
    FROM grams GROUP BY gram
    ORDER BY n_occurrences DESC, gram ASC
    LIMIT {k}
    """
