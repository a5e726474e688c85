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


# ---------------------------------------------------------------------------
# collocation mining: bigram PMI
# ---------------------------------------------------------------------------


def bigram_pmi(docs: DataFrame, k: int = 50, min_count: int = 5,
               text_col: str = "text") -> DataFrame:
    """Top-``k`` word-bigram collocations by pointwise mutual information:
    ``(gram, n_xy, n_x, n_y, pmi)`` with ``pmi = ln(n_xy·T / (n_x·n_y))``
    (``T`` = total token count), rounded to 6 decimals with the gram as
    tie-break — the BM25 determinism recipe, so the DuckDB mirror agrees
    row-for-row. ``min_count`` floors the bigram frequency (PMI is
    notoriously noisy on hapax pairs).

    The collocation table is the phrase-discovery statistic behind
    tokenizer vocabulary curation and boilerplate phrase review. Scale
    shape: the bigram and unigram counts are the :func:`ngram_counts`
    aggregations (shuffle rows = distinct grams, map-side combinable);
    the two unigram attachments are word-keyed joins (never broadcast —
    a web-scale vocabulary is not a small side); the count products run
    in doubles only inside the final ``ln`` (exact inputs, ordering
    fixed by the 6-decimal round). Top-k is the usual heap."""
    if min_count < 1:
        raise ValueError(f"min_count must be ≥1: {min_count}")
    uni = ngram_counts(docs, 1, text_col)
    total = int(uni.agg(F.sum("n_occurrences")).collect()[0][0] or 0)
    bi = ngram_counts(docs, 2, text_col).filter(
        F.col("n_occurrences") >= min_count
    ).select(
        "gram", F.col("n_occurrences").alias("n_xy"),
        F.split("gram", " ").getItem(0).alias("_w1"),
        F.split("gram", " ").getItem(1).alias("_w2"),
    )
    u1 = uni.select(F.col("gram").alias("_w1"), F.col("n_occurrences").alias("n_x"))
    u2 = uni.select(F.col("gram").alias("_w2"), F.col("n_occurrences").alias("n_y"))
    scored = (
        bi.join(u1, on="_w1").join(u2, on="_w2")
        .select(
            "gram", "n_xy", "n_x", "n_y",
            F.round(
                F.log(
                    F.col("n_xy").cast("double") * F.lit(float(total))
                    / (F.col("n_x").cast("double") * F.col("n_y").cast("double"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("gram")).limit(k)


def bigram_pmi_sql(k: int = 50, min_count: int = 5, rel: str = "documents",
                   text_col: str = "text") -> str:
    """DuckDB mirror of :func:`bigram_pmi` — same counts, multiplication
    order, 6-decimal rounding, and tie-break."""
    norm = NORM_SQL.format(x=text_col)
    return f"""
    WITH toks AS (SELECT string_split({norm}, ' ') AS w FROM {rel}),
    uni AS (
      SELECT word, count(*) AS n FROM (SELECT unnest(w) AS word FROM toks)
      GROUP BY 1
    ),
    tot AS (SELECT sum(n)::DOUBLE AS t FROM uni),
    bi AS (
      SELECT gram, count(*) AS n_xy FROM (
        SELECT unnest(list_transform(
                 range(1, len(w)),
                 i -> array_to_string(w[i:i + 1], ' '))) AS gram
        FROM toks
      ) GROUP BY 1
      HAVING count(*) >= {min_count}
    )
    SELECT gram, n_xy::BIGINT AS n_xy, u1.n::BIGINT AS n_x,
           u2.n::BIGINT AS n_y,
           round(ln(n_xy::DOUBLE * t / (u1.n::DOUBLE * u2.n::DOUBLE)), 6)
             AS pmi
    FROM bi
    JOIN uni u1 ON u1.word = string_split(gram, ' ')[1]
    JOIN uni u2 ON u2.word = string_split(gram, ' ')[2]
    CROSS JOIN tot
    ORDER BY pmi DESC, gram ASC LIMIT {k}
    """
