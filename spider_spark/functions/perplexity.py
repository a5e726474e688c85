"""CCNet-style perplexity scoring + head/middle/tail bucketing.

CCNet (Wenzek et al., 2020) ranks each document by the perplexity of a
language model for the document's language and splits every language's
corpus into three equal-count buckets — *head* (lowest perplexity ≈
Wikipedia-like), *middle*, *tail* — which downstream pipelines use to keep
or re-weight data. This module reproduces that pipeline with a
deterministic stand-in for the KenLM models: the frozen char-trigram
naive-Bayes weights already shipped for language ID
(:mod:`spider_spark.functions.text`), whose log-probabilities are INTEGER
milli-nats — so the per-document perplexity

    ppl_milli = ⌊ −Σ_grams w(g) / n_grams ⌋        (integer division)

is pure integer arithmetic that Spark and the DuckDB oracle evaluate
bit-identically. A real deployment swaps the weight table for trained
KenLM scores; every Spark shape below survives that swap unchanged.

Scale shape (the part that matters at 100 TB):

* scoring — tokens → char-trigram explode (rows ∝ corpus characters, the
  unavoidable LM cost), broadcast joins against the weight/floor tables
  (≤ a few MB even for a real 5-gram model bucketized), ONE doc-keyed
  aggregation with map-side partial sums. No Python in the hot path.
* bucketing — per-language tercile cutoffs come from a (lang, ppl_milli)
  histogram aggregation whose size is bounded by the integer *value
  range* of milli-nat perplexities (≈10⁴ per language), NOT by corpus
  size; the tiny histogram is reduced driver-side and the three cutoffs
  broadcast back. No per-language global sort, no window over the corpus.

Docs whose language has no model (or with no grams) get ``ppl_milli =
NULL`` and bucket ``'unscored'`` — CCNet likewise only scores languages it
has an LM for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spider_spark.functions.text import _LANG_NGRAM_FLOOR, _LANG_NGRAM_W

__all__ = ["doc_perplexity", "perplexity_buckets", "perplexity_buckets_sql"]

_WS = r"\s+"


def _gram_col(text: Column) -> Column:
    """Array of boundary-padded char trigrams of every whitespace token —
    the exact tokenization the lang-id oracle already proved
    engine-identical (lower → split on ``\\s+`` → drop empties → per
    token ``_tok_`` padded trigrams, ``len(tok)`` of them)."""
    toks = F.filter(
        F.split(F.lower(text), _WS), lambda t: t != F.lit("")
    )
    return F.flatten(
        F.transform(
            toks,
            lambda t: F.transform(
                F.sequence(F.lit(1), F.length(t)),
                lambda i: F.substring(
                    F.concat(F.lit("_"), t, F.lit("_")), i, 3
                ),
            ),
        )
    )


def doc_perplexity(docs: DataFrame, text_col: str = "text",
                   lang_col: str = "lang",
                   id_col: str = "doc_id") -> DataFrame:
    """``(id_col, lang_col, ppl_milli)`` for every input row; ``NULL``
    when the language has no model or the text has no grams. One gram
    explode + two broadcast joins + one doc-keyed agg."""
    spark = docs.sparkSession
    wdf = spark.createDataFrame(
        [(l, g, w) for l, prof in _LANG_NGRAM_W.items()
         for g, w in sorted(prof.items())],
        [lang_col, "__g", "__w"],
    )
    fdf = spark.createDataFrame(
        list(_LANG_NGRAM_FLOOR.items()), [lang_col, "__fl"]
    )
    scored = (
        docs.join(F.broadcast(fdf), on=lang_col)  # inner: modeled langs
        .select(
            id_col, "__fl",
            F.explode(_gram_col(F.col(text_col))).alias("__g"),
            F.col(lang_col),
        )
        .join(F.broadcast(wdf), on=[lang_col, "__g"], how="left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce("__w", "__fl")).alias("__total"),
            F.count("*").alias("__n"),
        )
        .select(id_col, F.expr("(-__total) div __n").alias("ppl_milli"))
    )
    return docs.select(id_col, lang_col).join(scored, on=id_col, how="left")


def _tercile_cuts(hist: list) -> dict:
    """Exact per-language tercile cutoffs from (lang, v, count) rows:
    c_k = smallest v whose cumulative count × 3 ≥ k × total — the same
    integer comparison the SQL mirror runs."""
    from collections import defaultdict

    by_lang: dict = defaultdict(list)
    for lang, v, c in hist:
        by_lang[lang].append((v, c))
    cuts = {}
    for lang, vc in by_lang.items():
        vc.sort()
        tot = sum(c for _, c in vc)
        cum, c1, c2 = 0, None, None
        for v, c in vc:
            cum += c
            if c1 is None and cum * 3 >= tot:
                c1 = v
            if c2 is None and cum * 3 >= 2 * tot:
                c2 = v
        cuts[lang] = (c1, c2)
    return cuts


def perplexity_buckets(docs: DataFrame, text_col: str = "text",
                       lang_col: str = "lang",
                       id_col: str = "doc_id") -> DataFrame:
    """``(id_col, lang_col, ppl_milli, bucket)`` with per-language
    equal-count buckets ``head`` / ``middle`` / ``tail`` (CCNet order:
    head = lowest perplexity); ``unscored`` when ``ppl_milli`` is NULL."""
    # checkpoint the 3-column score projection: the histogram pass and the
    # final bucket join both read it, and without this the gram-explode LM
    # scan (the expensive part, ∝ corpus chars) would run twice
    ppl = doc_perplexity(docs, text_col, lang_col, id_col).localCheckpoint(
        eager=True
    )
    hist = (
        ppl.filter(F.col("ppl_milli").isNotNull())
        .groupBy(lang_col, "ppl_milli")
        .count()
        .collect()
    )
    cuts = _tercile_cuts([tuple(r) for r in hist])
    spark = docs.sparkSession
    if cuts:
        cdf = spark.createDataFrame(
            [(l, c1, c2) for l, (c1, c2) in cuts.items()],
            f"{lang_col} string, __c1 long, __c2 long",
        )
        ppl = ppl.join(F.broadcast(cdf), on=lang_col, how="left")
    else:
        ppl = ppl.withColumn("__c1", F.lit(None).cast("long")).withColumn(
            "__c2", F.lit(None).cast("long")
        )
    return ppl.select(
        id_col,
        lang_col,
        "ppl_milli",
        F.when(F.col("ppl_milli").isNull(), F.lit("unscored"))
        .when(F.col("ppl_milli") <= F.col("__c1"), F.lit("head"))
        .when(F.col("ppl_milli") <= F.col("__c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def perplexity_buckets_sql(table: str = "documents", text_col: str = "text",
                           lang_col: str = "lang",
                           id_col: str = "doc_id") -> str:
    """DuckDB mirror of :func:`perplexity_buckets`: same frozen integer
    weights, same tokenization, same integer division, same histogram
    cutoff comparison (``cum*3 >= k*tot``)."""
    weight_rows = ",\n      ".join(
        f"('{lang}', '{g}', {w})"
        for lang, prof in _LANG_NGRAM_W.items()
        for g, w in sorted(prof.items())
    )
    lang_rows = ",\n      ".join(
        f"('{lang}', {fl})" for lang, fl in _LANG_NGRAM_FLOOR.items()
    )
    return f"""
    WITH m(lang, g, w) AS (VALUES
      {weight_rows}
    ),
    langs(lang, fl) AS (VALUES
      {lang_rows}
    ),
    toks AS (
      SELECT d.{id_col} AS id, d.{lang_col} AS lang, l.fl,
        unnest(list_filter(string_split_regex(lower(d.{text_col}), '{_WS}'),
                           t -> t <> '')) AS tok
      FROM {table} d JOIN langs l ON d.{lang_col} = l.lang
    ),
    grams AS (
      SELECT id, lang, fl, unnest(list_transform(
        range(1, length(tok) + 1),
        i -> substr('_' || tok || '_', i::INT, 3))) AS g
      FROM toks
    ),
    scored AS (
      SELECT grams.id,
             ((-sum(coalesce(m.w, grams.fl))) // count(*))::BIGINT
               AS ppl_milli
      FROM grams LEFT JOIN m ON m.lang = grams.lang AND m.g = grams.g
      GROUP BY 1
    ),
    ppl AS (
      SELECT d.{id_col}, d.{lang_col}, s.ppl_milli
      FROM {table} d LEFT JOIN scored s ON s.id = d.{id_col}
    ),
    hist AS (
      SELECT {lang_col}, ppl_milli AS v, count(*) AS c
      FROM ppl WHERE ppl_milli IS NOT NULL GROUP BY 1, 2
    ),
    cum AS (
      SELECT {lang_col}, v,
             sum(c) OVER (PARTITION BY {lang_col} ORDER BY v) AS cum,
             sum(c) OVER (PARTITION BY {lang_col}) AS tot
      FROM hist
    ),
    cuts AS (
      SELECT {lang_col},
             min(v) FILTER (WHERE cum * 3 >= tot) AS c1,
             min(v) FILTER (WHERE cum * 3 >= 2 * tot) AS c2
      FROM cum GROUP BY 1
    )
    SELECT p.{id_col}, p.{lang_col}, p.ppl_milli,
           CASE WHEN p.ppl_milli IS NULL THEN 'unscored'
                WHEN p.ppl_milli <= k.c1 THEN 'head'
                WHEN p.ppl_milli <= k.c2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM ppl p LEFT JOIN cuts k USING ({lang_col})
    """
