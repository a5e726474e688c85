"""Stored-query matching (reverse search / percolation).

Forward search asks "which documents match this query"; a monitoring
pipeline asks the reverse — "which of my STANDING queries does this new
document match" (Elasticsearch calls it percolation): content alerts
over a crawl ("tell me when pages mention X and Y"), routing rules that
file ingested docs into topics, compliance watchlists over a stream.
The crawl/ingest side of this engine produces exactly the document flow
such rules watch, and ``ContinuousCrawler``/``dedup_gate_stream``
batches are the natural place to run the match per wave.

Semantics: a stored query is a set of terms; ``mode="all"`` (default)
matches documents containing EVERY term (the conjunctive alert rule —
same semantics as ``bm25_topk(require_all=True)`` but evaluated for
every query at once), ``mode="any"`` matches on at least one. Terms
are matched against the pipeline's shared tokenization
(``normalized_text`` split), so rules behave identically to search.

Scale shape — the asymmetry is the whole design: the query table is
small by nature (rules are human-authored; thousands, not billions),
so its exploded ``(term, query)`` relation is BROADCAST and the corpus
side never shuffles for the join. Per doc the work is one in-scan
dedup of its term set, the broadcast probe, and one
``(doc, query)``-keyed count with map-side partials — grain bounded by
(matched term, query) pairs, not corpus × queries. No windows, no
Python.

Reference parity: no analog in the reference (an asyncio crawler);
monitoring/routing extension beside operators/search.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_spark.functions.text import normalized_text
from spider_spark.operators.dedupe import NORM_SQL

__all__ = ["stored_query_match", "stored_query_match_sql"]


def _check_terms(qid, terms) -> None:
    """Shared rule validation: terms must be non-empty and ASCII.

    Lowercasing happens in each engine (F.lower / lower() / str.lower),
    and the engines disagree on some non-ASCII mappings (U+0130 'İ'
    lowers to a two-codepoint sequence in Python but not everywhere),
    so non-ASCII terms would make a rule match in one engine and miss
    in the other — rejected loudly instead. An empty terms list would
    silently never match even in 'all' mode (the conjunction is
    non-vacuous: the HAVING count comes from a join that produced no
    rows), so it is a rule-authoring error, also rejected."""
    if not terms:
        raise ValueError(
            f"stored query {qid!r} has no terms: an empty rule never "
            f"matches any document (non-vacuous conjunction)")
    for t in terms:
        if t is None or not t or not t.isascii():
            raise ValueError(
                f"stored query {qid!r} term {t!r} must be non-empty "
                f"ASCII: engines disagree on non-ASCII lowercasing")


def stored_query_match(docs: DataFrame, queries: DataFrame,
                       mode: str = "all", text_col: str = "text",
                       id_col: str = "doc_id",
                       query_id_col: str = "query_id",
                       terms_col: str = "terms") -> DataFrame:
    """``(id, query_id, n_matched)`` for every (document, stored query)
    pair the ``mode`` rule accepts. ``queries`` is
    ``(query_id, terms: array<string>)``; terms are lowercased and
    deduplicated here, so rule authors need not pre-normalize. Rules
    must be non-empty ASCII (see :func:`_check_terms`) — validated
    with one loud ``limit(1)`` probe over the rule table (tiny by
    design; the probe costs one broadcast-size scan)."""
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be 'all' or 'any': {mode}")
    bad = queries.select(
        F.col(query_id_col).alias("qid"),
        F.col(terms_col).alias("_terms"),
    ).filter(
        F.col("_terms").isNull() | (F.size("_terms") == 0)
        | F.exists("_terms",
                   lambda t: t.isNull() | (t == "")
                   | ~t.rlike("^[\\x00-\\x7F]*$"))
    ).limit(1).collect()
    if bad:
        _check_terms(bad[0]["qid"], [
            t for t in (bad[0]["_terms"] or [])
            if t is None or not t or not t.isascii()
        ] or bad[0]["_terms"])
    q = queries.select(
        F.col(query_id_col).alias("qid"),
        F.array_distinct(F.transform(F.col(terms_col), F.lower))
        .alias("_terms"),
    ).withColumn("n_terms", F.size("_terms"))
    qx = q.select("qid", "n_terms", F.explode("_terms").alias("term"))
    dterms = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(
            F.split(normalized_text(F.col(text_col)), " "))).alias("term"),
    )
    matched = (
        dterms.join(F.broadcast(qx), on="term")
        .groupBy(id_col, "qid", "n_terms")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    if mode == "all":
        matched = matched.filter(F.col("n_matched") == F.col("n_terms"))
    return matched.select(id_col, F.col("qid").alias(query_id_col),
                          "n_matched")


def stored_query_match_sql(queries: list[tuple[str, list[str]]],
                           mode: str = "all",
                           docs_rel: str = "SELECT * FROM documents",
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           query_id_col: str = "query_id") -> str:
    """DuckDB mirror of :func:`stored_query_match` with the stored
    queries rendered as literal rows (the driver-oracle form; a
    relation-valued variant would mirror identically)."""
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be 'all' or 'any': {mode}")
    rows = []
    for qid, terms in queries:
        _check_terms(qid, terms)
        qesc = qid.replace("'", "''")
        # ASCII-only (validated above), so str.lower() here agrees
        # byte-for-byte with the Spark side's F.lower.
        lits = ", ".join(
            "'" + t.lower().replace("'", "''") + "'" for t in terms)
        rows.append(f"('{qesc}', [{lits}])")
    values = ", ".join(rows)
    norm = NORM_SQL.format(x=text_col)
    having = ("HAVING count(*) = any_value(n_terms)" if mode == "all" else "")
    return f"""
    WITH pq_raw(qid, terms) AS (VALUES {values}),
    pq AS (
      SELECT qid, list_distinct(terms) AS terms,
             len(list_distinct(terms)) AS n_terms
      FROM pq_raw
    ),
    pq_x AS (SELECT qid, n_terms, unnest(terms) AS term FROM pq),
    pd AS (
      SELECT {id_col}, unnest(list_distinct(string_split({norm}, ' ')))
             AS term
      FROM ({docs_rel})
    )
    SELECT pd.{id_col}, pq_x.qid AS {query_id_col},
           count(*)::BIGINT AS n_matched
    FROM pd JOIN pq_x USING (term)
    GROUP BY 1, 2
    {having}
    """
