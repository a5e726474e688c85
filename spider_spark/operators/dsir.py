"""DSIR: Data Selection via Importance Resampling (Xie et al., 2023).

DSIR picks pretraining documents whose n-gram statistics look like a
*target* distribution (Wikipedia/books in the paper): estimate two bag-
of-n-grams language models — target ``p`` and raw-pool ``q`` — score every
raw document with the log importance weight ``log p(x) − log q(x)``, add
Gumbel noise, and keep the top-k (Gumbel-top-k ≡ sampling without
replacement ∝ importance weight — Vieira 2014).

This module reproduces that pipeline with the repo's deterministic LM
stand-ins (the pattern :mod:`spider_spark.functions.perplexity` uses for
CCNet):

* **target model** — the frozen integer milli-nat char-trigram profile of
  one language (``_LANG_NGRAM_W[target_lang]``, floor-backed);
* **raw/background model** — the uniform MIXTURE of every frozen language
  profile: ``w_b(g) = ln((1/n)·Σ_l exp(w_l(g)))`` in milli-nats (floor-
  backed per language), rounded to integers once in Python and embedded
  verbatim in both engines. A mixture (not a mean of logs — Jensen would
  bias the ratio positive for every language) makes the per-gram ratio a
  proper log-likelihood ratio: positive for target-looking grams,
  negative otherwise, so document length *amplifies* the correct sign
  instead of confounding the cut.

Per-document weight = Σ_grams ``(w_target(g) − w_background(g))`` — pure
integer milli-nats. The Gumbel key is the one float step: ``u =
(md5_60(id)+0.5)/2⁶⁰``, ``key = weight/1000 − ln(−ln(u))`` rounded to 6
decimals (the BM25-oracle float-parity recipe), tie-broken by id — a
total order, so the top-k cut is deterministic and DuckDB-mirrorable. A
real deployment swaps the VALUES tables for trained hashed-ngram models;
every Spark shape survives the swap.

Scale shape: ONE gram explode (rows ∝ corpus characters — the
unavoidable LM cost, identical to the CCNet scorer), a broadcast join
against the gram-diff table (bounded by the model's gram vocabulary, a
few MB even for the paper's 10⁴ hash buckets), one doc-keyed sum with
map-side partials, and a ``TakeOrderedAndProject`` top-k. No Python in
the hot path, no global sort, no driver state beyond the frozen tables.

Reference parity: no analog in the reference crawler; training-data
extension layer (the data-selection sibling of ``ccnet_perplexity_buckets``
and ``temperature_mix_sample``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_spark.functions.perplexity import _gram_col, _WS
from spider_spark.functions.text import _LANG_NGRAM_FLOOR, _LANG_NGRAM_W
from spider_spark.operators.dedupe import md5_60, md5_60_sql

__all__ = ["dsir_weights", "dsir_select", "dsir_select_sql"]

_TWO60 = float(1 << 60)


def _mix_milli(weights: list[int]) -> int:
    """Milli-nat log of the uniform mixture of milli-nat log-probs."""
    import math

    n = len(weights)
    return round(1000.0 * math.log(
        sum(math.exp(w / 1000.0) for w in weights) / n
    ))


def _diff_table(target_lang: str) -> tuple[list[tuple[str, int]], int]:
    """``(gram → w_target − w_mixture)`` over the union vocabulary of
    every frozen profile, plus the unseen-gram constant
    ``floor_target − mix(floors)``. All integer milli-nats."""
    if target_lang not in _LANG_NGRAM_W:
        raise ValueError(f"no frozen LM for target_lang={target_lang!r}")
    langs = list(_LANG_NGRAM_W)
    fl_t = _LANG_NGRAM_FLOOR[target_lang]
    vocab = sorted({g for prof in _LANG_NGRAM_W.values() for g in prof})
    rows = []
    for g in vocab:
        w_t = _LANG_NGRAM_W[target_lang].get(g, fl_t)
        w_b = _mix_milli([
            _LANG_NGRAM_W[lang].get(g, _LANG_NGRAM_FLOOR[lang]) for lang in langs
        ])
        rows.append((g, w_t - w_b))
    diff_floor = fl_t - _mix_milli(list(_LANG_NGRAM_FLOOR.values()))
    return rows, diff_floor


def dsir_weights(docs: DataFrame, target_lang: str = "en",
                 id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``(id_col, weight_milli)`` — the integer log importance weight of
    every document (0 for gramless docs: an empty product of ratios)."""
    rows, diff_floor = _diff_table(target_lang)
    spark = docs.sparkSession
    ddf = spark.createDataFrame(rows, ["__g", "__d"])
    scored = (
        docs.select(id_col, F.explode(_gram_col(F.col(text_col))).alias("__g"))
        .join(F.broadcast(ddf), on="__g", how="left")
        .groupBy(id_col)
        .agg(F.sum(F.coalesce("__d", F.lit(diff_floor))).alias("weight_milli"))
    )
    return docs.select(id_col).join(scored, on=id_col, how="left").select(
        id_col, F.coalesce("weight_milli", F.lit(0)).alias("weight_milli")
    )


def dsir_select(docs: DataFrame, k: int, target_lang: str = "en",
                id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gumbel-top-``k`` selection ∝ importance weight:
    ``(id_col, weight_milli, gumbel_key)`` for the ``k`` kept documents.
    ``gumbel_key = round(weight_milli/1000 − ln(−ln(u)), 6)`` with the
    md5-uniform ``u`` — deterministic sampling without replacement."""
    w = dsir_weights(docs, target_lang, id_col, text_col)
    u = (md5_60(F.col(id_col).cast("string")) + F.lit(0.5)) / F.lit(_TWO60)
    key = F.round(
        F.col("weight_milli") / F.lit(1000.0) - F.log(-F.log(u)), 6
    ).alias("gumbel_key")
    return (
        w.select(id_col, "weight_milli", key)
        .orderBy(F.desc("gumbel_key"), F.asc(id_col))
        .limit(k)
    )


def dsir_select_sql(k: int, target_lang: str = "en", table: str = "documents",
                    id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB mirror of :func:`dsir_select`: same frozen integer diff
    table, same tokenization (the proven perplexity gram CTE), same
    Gumbel key arithmetic and rounding, same (key DESC, id ASC) cut."""
    rows, diff_floor = _diff_table(target_lang)
    diff_rows = ",\n      ".join(f"('{g}', {d})" for g, d in rows)
    u = f"(({md5_60_sql(f'{id_col}::VARCHAR')}) + 0.5) / {_TWO60}"
    return f"""
    WITH m(g, d) AS (VALUES
      {diff_rows}
    ),
    toks AS (
      SELECT {id_col} AS id,
        unnest(list_filter(string_split_regex(lower({text_col}), '{_WS}'),
                           t -> t <> '')) AS tok
      FROM {table}
    ),
    grams AS (
      SELECT id, unnest(list_transform(
        range(1, length(tok) + 1),
        i -> substr('_' || tok || '_', i::INT, 3))) AS g
      FROM toks
    ),
    scored AS (
      SELECT grams.id, sum(coalesce(m.d, {diff_floor}))::BIGINT AS weight_milli
      FROM grams LEFT JOIN m ON m.g = grams.g
      GROUP BY 1
    ),
    weights AS (
      SELECT d.{id_col}, coalesce(s.weight_milli, 0) AS weight_milli
      FROM {table} d LEFT JOIN scored s ON s.id = d.{id_col}
    )
    SELECT {id_col}, weight_milli,
           round(weight_milli / 1000.0 - ln(-ln({u})), 6) AS gumbel_key
    FROM weights
    ORDER BY gumbel_key DESC, {id_col} ASC
    LIMIT {k}
    """
