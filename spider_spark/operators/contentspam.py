"""Content-spam features — the text half of the classic web-spam set.

Ntoulas et al. (WWW 2006 §§5-8) showed that spam pages separate from
editorial pages on a handful of cheap CONTENT statistics — extreme word
counts, inflated average word length (keyword-stuffed compounds),
abnormal concentration of globally popular words (pages stitched from
query logs), and low lexical diversity (generated/templated text). The
link half of that feature set lives in operators/anchors.py
``link_spam_features``; this module computes the content half over any
text relation, so the pair joins on url/doc into the feature vector a
spam classifier (functions/classifier.py is the scoring shape) consumes.

Per-document output:

* ``n_words`` — shared tokenization (``normalized_text`` split; the BM25
  / n-gram word stream, so features join those tables).
* ``avg_word_len_micro`` — exact integer micro-units via the identity
  Σ word lens = len(normalized) − (n_words − 1): no second pass, no
  floats.
* ``frac_popular_ppm`` — share of the doc's word occurrences drawn from
  the corpus's top-``n_popular`` words (the deterministic
  (count DESC, word ASC) cut of :func:`...ngrams.top_ngrams`); ppm by
  integer division.
* ``distinct_word_ratio_ppm`` — lexical diversity, the relational proxy
  for the paper's zlib compression-ratio feature (a codec inside the
  oracle boundary is not mirrorable; diversity captures the same
  generated-text signal).
* ``word_entropy`` — Shannon entropy of the word distribution,
  ``ln N − (Σ c·ln c)/N``, rounded to 6 decimals (the PMI determinism
  recipe: exact integer counts in, one float log per distinct word,
  6 dp out).

Scale shape: one explode into a ``(doc, word)`` count with map-side
partials, one doc-keyed rollup, a BROADCAST join against the
``n_popular``-row popular set, and a join back to the scan-local base
columns — two keyed shuffles total, grain never exceeds distinct
(doc, word) pairs. No windows, no collects, no Python.

Reference parity: no analog in the reference (an asyncio crawler);
web-scale quality/spam extension layer beside gopher_rules and
link_spam_features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_spark.functions.text import normalized_text
from spider_spark.operators.dedupe import NORM_SQL

__all__ = ["content_spam_features", "content_spam_features_sql"]

PPM = 1_000_000


def content_spam_features(docs: DataFrame, n_popular: int = 100,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """``(id, n_words, avg_word_len_micro, frac_popular_ppm,
    distinct_word_ratio_ppm, word_entropy)`` per document — see the
    module docstring for the feature semantics and scale shape."""
    if n_popular < 1:
        raise ValueError(f"n_popular must be ≥1: {n_popular}")
    from spider_spark.operators.ngrams import top_ngrams

    norm = normalized_text(F.col(text_col))
    words = F.split(norm, " ")
    base = docs.select(
        F.col(id_col),
        F.size(words).alias("n_words"),
        (F.length(norm) - (F.size(words) - 1)).alias("_sum_len"),
    )
    popular = top_ngrams(docs, n=1, k=n_popular, text_col=text_col).select(
        F.col("gram").alias("word"), F.lit(1).alias("_pop"))
    wc = (
        docs.select(F.col(id_col), F.explode(words).alias("word"))
        .groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("c"))
        .join(F.broadcast(popular), on="word", how="left")
    )
    rolled = wc.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n_distinct"),
        F.sum(F.coalesce("_pop", F.lit(0)) * F.col("c")).alias("_n_pop"),
        F.sum(F.col("c") * F.log(F.col("c").cast("double"))).alias("_s"),
    )
    out = base.join(rolled, on=id_col, how="left")
    nw = F.greatest(F.col("n_words"), F.lit(1))
    return out.select(
        id_col, "n_words",
        F.expr(f"(_sum_len * {PPM}) div greatest(n_words, 1)")
        .alias("avg_word_len_micro"),
        F.expr(f"(coalesce(_n_pop, 0) * {PPM}) div greatest(n_words, 1)")
        .alias("frac_popular_ppm"),
        F.expr(f"(coalesce(_n_distinct, 0) * {PPM}) div greatest(n_words, 1)")
        .alias("distinct_word_ratio_ppm"),
        F.round(
            F.log(nw.cast("double"))
            - F.coalesce(F.col("_s"), F.lit(0.0)) / nw,
            6,
        ).alias("word_entropy"),
    )


def content_spam_features_sql(docs_rel: str = "SELECT * FROM documents",
                              n_popular: int = 100, text_col: str = "text",
                              id_col: str = "doc_id") -> str:
    """DuckDB mirror of :func:`content_spam_features` — identical
    tokenization, popular-set cut, integer ppm arithmetic, and 6 dp
    entropy rounding."""
    norm = NORM_SQL.format(x=text_col)
    return f"""
    WITH csf_base AS (
      SELECT {id_col},
             len(string_split({norm}, ' '))::BIGINT AS n_words,
             (length({norm}) - (len(string_split({norm}, ' ')) - 1))::BIGINT
               AS _sum_len
      FROM ({docs_rel})
    ),
    csf_pop AS (
      SELECT word, 1 AS _pop FROM (
        SELECT unnest(string_split({norm}, ' ')) AS word FROM ({docs_rel})
      ) GROUP BY word
      ORDER BY count(*) DESC, word ASC LIMIT {n_popular}
    ),
    csf_wc AS (
      SELECT {id_col}, word, count(*)::BIGINT AS c FROM (
        SELECT {id_col}, unnest(string_split({norm}, ' ')) AS word
        FROM ({docs_rel})
      ) GROUP BY 1, 2
    ),
    csf_roll AS (
      SELECT w.{id_col},
             count(*)::BIGINT AS _n_distinct,
             sum(coalesce(p._pop, 0) * w.c)::BIGINT AS _n_pop,
             sum(w.c * ln(w.c)) AS _s
      FROM csf_wc w LEFT JOIN csf_pop p USING (word)
      GROUP BY 1
    )
    SELECT b.{id_col}, b.n_words,
           (b._sum_len * {PPM}) // greatest(b.n_words, 1)
             AS avg_word_len_micro,
           (coalesce(r._n_pop, 0) * {PPM}) // greatest(b.n_words, 1)
             AS frac_popular_ppm,
           (coalesce(r._n_distinct, 0) * {PPM}) // greatest(b.n_words, 1)
             AS distinct_word_ratio_ppm,
           round(ln(greatest(b.n_words, 1))
                 - coalesce(r._s, 0.0) / greatest(b.n_words, 1), 6)
             AS word_entropy
    FROM csf_base b LEFT JOIN csf_roll r USING ({id_col})
    """
