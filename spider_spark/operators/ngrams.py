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

__all__ = [
    "ngram_counts",
    "top_ngrams",
    "top_ngrams_sql",
    "bigram_pmi",
    "bigram_pmi_sql",
    "kn_bigram_probs",
    "kn_bigram_probs_sql",
]


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


# ---------------------------------------------------------------------------
# count-based LM estimation: interpolated Kneser-Ney bigram probabilities
# ---------------------------------------------------------------------------


def kn_bigram_probs(docs: DataFrame, k: int = 100, min_count: int = 3,
                    d_milli: int = 750, text_col: str = "text") -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (Kneser & Ney 1995;
    Chen & Goodman 1999) over the corpus word stream, as exact integer
    relational algebra:

    ``P(y|x) = (c(x,y) - d)/c(x·) + d·N1+(x,·)/c(x·) · N1+(·,y)/T``

    with discount ``d = d_milli/1000``, ``c(x·)`` the context total
    (bigram tokens starting with ``x``), ``N1+(x,·)`` the fan-out
    (distinct successors of ``x``), ``N1+(·,y)`` the continuation count
    (distinct predecessors of ``y`` — the KN signature: how many contexts
    a word completes, not how often it occurs), and ``T`` the number of
    distinct bigram types. Every quantity is a count; the probability is
    the single rational

    ``[(1000·c(x,y) - d_milli)·T + d_milli·N1+(x,·)·N1+(·,y)]
      / (1000·c(x·)·T)``

    reported as ``prob_ppm`` (floor of the value scaled to 10^6) in
    ``decimal(38,0)`` / HUGEINT cross-multiplication — exact at 10^14
    bigram tokens where int64 products overflow — so the DuckDB mirror
    agrees bit-for-bit and the output is parallelism-independent.

    Output: ``(gram, n_xy, n_ctx, fanout_x, cont_y, prob_ppm)`` for the
    top-``k`` bigrams by ``(n_xy DESC, gram ASC)`` with ``n_xy ≥
    min_count`` (the statistics are computed over the FULL distribution
    first — the floor only trims the report).

    Scale shape: one gram-keyed bigram count (map-side combinable,
    shuffle rows = distinct bigram types); context totals / fan-out and
    continuation counts are two word-keyed re-aggregations OF that
    table (rows = vocabulary size, no second corpus pass); ``T`` is a
    1-row aggregate cross-joined in; the two attachments are word-keyed
    joins (never broadcast — a web-scale vocabulary is not a small
    side); top-k is ``TakeOrderedAndProject``. This is the
    infini-gram/CCNet-style count-table estimation path: the smoothed
    LM a pipeline derives from the corpus itself.
    """
    if not (0 < d_milli < 1000):
        raise ValueError(f"d_milli must be in (0, 1000): {d_milli}")
    if min_count < 1:
        raise ValueError(f"min_count must be ≥1: {min_count}")
    dec = "decimal(38,0)"
    bi = (
        ngram_counts(docs, 2, text_col)
        .select(
            "gram",
            F.col("n_occurrences").alias("n_xy"),
            F.split("gram", " ").getItem(0).alias("_w1"),
            F.split("gram", " ").getItem(1).alias("_w2"),
        )
    )
    ctx = bi.groupBy("_w1").agg(
        F.sum("n_xy").alias("n_ctx"),
        F.count(F.lit(1)).alias("fanout_x"),
    )
    cont = bi.groupBy("_w2").agg(F.count(F.lit(1)).alias("cont_y"))
    types = bi.agg(F.count(F.lit(1)).alias("_t"))
    num = (
        (F.lit(1000).cast(dec) * F.col("n_xy").cast(dec)
         - F.lit(d_milli).cast(dec)) * F.col("_t").cast(dec)
        + F.lit(d_milli).cast(dec) * F.col("fanout_x").cast(dec)
        * F.col("cont_y").cast(dec)
    )
    den = F.lit(1000).cast(dec) * F.col("n_ctx").cast(dec) * F.col("_t").cast(dec)
    scored = (
        bi.join(ctx, on="_w1")
        .join(cont, on="_w2")
        .crossJoin(F.broadcast(types))
        .filter(F.col("n_xy") >= min_count)
        .select(
            "gram", "n_xy", "n_ctx", "fanout_x", "cont_y",
            (num * F.lit(1000000).cast(dec)).alias("_num"),
            den.alias("_den"),
        )
        .withColumn("prob_ppm", F.expr("CAST(_num div _den AS BIGINT)"))
        .drop("_num", "_den")
    )
    return scored.orderBy(F.desc("n_xy"), F.asc("gram")).limit(k)


def kn_bigram_probs_sql(k: int = 100, min_count: int = 3,
                        d_milli: int = 750, rel: str = "documents",
                        text_col: str = "text") -> str:
    """DuckDB mirror of :func:`kn_bigram_probs` — same counts, HUGEINT
    cross-multiplication, floor division, ordering, and tie-break."""
    norm = NORM_SQL.format(x=text_col)
    return f"""
    WITH toks AS (SELECT string_split({norm}, ' ') AS w FROM {rel}),
    bi AS (
      SELECT gram, count(*) AS n_xy,
             string_split(gram, ' ')[1] AS w1,
             string_split(gram, ' ')[2] AS w2
      FROM (
        SELECT unnest(list_transform(
                 range(1, len(w)),
                 i -> array_to_string(w[i:i + 1], ' '))) AS gram
        FROM toks
      ) GROUP BY 1
    ),
    ctx AS (
      SELECT w1, sum(n_xy) AS n_ctx, count(*) AS fanout_x
      FROM bi GROUP BY 1
    ),
    cont AS (SELECT w2, count(*) AS cont_y FROM bi GROUP BY 1),
    types AS (SELECT count(*)::HUGEINT AS t FROM bi)
    SELECT gram, n_xy::BIGINT AS n_xy, n_ctx::BIGINT AS n_ctx,
           fanout_x::BIGINT AS fanout_x, cont_y::BIGINT AS cont_y,
           (((1000::HUGEINT * n_xy::HUGEINT - {d_milli}::HUGEINT) * t
             + {d_milli}::HUGEINT * fanout_x::HUGEINT * cont_y::HUGEINT)
            * 1000000::HUGEINT
            // (1000::HUGEINT * n_ctx::HUGEINT * t))::BIGINT AS prob_ppm
    FROM bi JOIN ctx USING (w1) JOIN cont USING (w2)
    CROSS JOIN types
    WHERE n_xy >= {min_count}
    ORDER BY n_xy DESC, gram ASC LIMIT {k}
    """
