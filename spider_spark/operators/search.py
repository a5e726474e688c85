"""Lexical (BM25) keyword search over the document corpus.

The reference stores crawled pages and queries them by parent URL
(postgres_database.py:144-160); a corpus engine's natural next query
surface is *content* search. This operator scores documents against a
term query with BM25 (Robertson-Spärck Jones, the TREC standard) as a
pure DataFrame plan, complementing the embedding-based ANN family in
:mod:`.similarity` with the lexical half of a hybrid retrieval stack.

Plan shape (all JVM Column expressions, shuffles keyed by term or doc):

1. one explode over the corpus → distinct-per-doc term frequencies
   (``groupBy(doc, term)`` — map-side combinable);
2. doc lengths ride the same pass (``groupBy(doc)``);
3. the query's document frequencies come from the tf rows FILTERED to
   the query terms first — the df agg and the idf table are O(|query|),
   broadcast back;
4. per-(doc, matched term) partial scores → one doc-keyed sum → global
   top-k via ``orderBy().limit(k)`` (Spark's TakeOrderedAndProject —
   per-partition heaps + driver merge of k rows, never a global sort).

Corpus-wide scalars (N, avgdl) are a two-value driver collect — scan
metadata, not data. Hot terms (stopwords in the query) cost one skewed
agg, never a pair join; BM25's idf makes them near-zero-weight anyway.

Determinism across engines: scores are doubles; the final score is
rounded to 6 decimals and ties break on doc_id, so the top-k row set and
the oracle's agree bit-for-bit (sub-ulp libm differences vanish at 6
decimals; ranking never depends on raw float order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_spark.functions.text import normalized_text
from spider_spark.operators.dedupe import NORM_SQL

K1 = 1.2
B = 0.75


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 10,
              id_col: str = "doc_id", text_col: str = "text",
              require_all: bool = False) -> DataFrame:
    """Top-``k`` documents for ``query_terms`` by BM25 (k1=1.2, b=0.75):
    ``(id, n_matched, score)``, score rounded to 6 decimals, ties broken
    by ascending id.

    ``require_all=True`` switches to conjunctive (boolean-AND) retrieval:
    only documents containing EVERY distinct query term rank — the
    high-precision mode intersection-heavy search UIs default to. Free
    at plan level: ``n_matched`` already counts distinct matched terms,
    so the AND is one filter before the top-k heap (scoring unchanged —
    an AND result ranks identically in both modes)."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = docs.select(
        F.col(id_col),
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("term"),
    )
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dl = terms.groupBy(id_col).agg(F.count("*").alias("dl"))
    scalars = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = scalars["n_docs"], scalars["avgdl"]
    qt = [t.lower() for t in query_terms]
    qtf = tf.filter(F.col("term").isin(qt))
    dfreq = qtf.groupBy("term").agg(F.count("*").alias("df"))
    idf = dfreq.select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
    )
    scored = (
        qtf.join(F.broadcast(idf), on="term")
        .join(dl, on=id_col)
        .select(
            id_col,
            (
                F.col("idf")
                * (F.col("tf") * F.lit(K1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(K1)
                    * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.lit(float(avgdl)))
                )
            ).alias("part"),
        )
        .groupBy(id_col)
        .agg(F.count("*").alias("n_matched"), F.round(F.sum("part"), 6).alias("score"))
    )
    if require_all:
        scored = scored.filter(F.col("n_matched") == len({t.lower() for t in query_terms}))
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def bm25_topk_sql(query_terms: list[str], k: int = 10, id_col: str = "doc_id",
                  text_col: str = "text", table: str = "documents",
                  require_all: bool = False) -> str:
    """DuckDB mirror of :func:`bm25_topk` — same constants, same expression
    order, same 6-decimal rounding and (score desc, id asc) tie-break."""
    norm = NORM_SQL.format(x=text_col)
    qlist = ", ".join("'" + t.lower().replace("'", "''") + "'" for t in query_terms)
    having = (f"HAVING count(*) = {len({t.lower() for t in query_terms})}"
              if require_all else "")
    return f"""
    WITH terms AS (
      SELECT {id_col}, unnest(string_split({norm}, ' ')) AS term FROM {table}
    ),
    tf AS (SELECT {id_col}, term, count(*) AS tf FROM terms GROUP BY 1, 2),
    dl AS (SELECT {id_col}, count(*) AS dl FROM terms GROUP BY 1),
    scalars AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
    qtf AS (SELECT * FROM tf WHERE term IN ({qlist})),
    idf AS (
      SELECT term,
             ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) AS idf
      FROM (SELECT term, count(*) AS df FROM qtf GROUP BY 1), scalars
    ),
    scored AS (
      SELECT qtf.{id_col},
             count(*) AS n_matched,
             round(sum(
               idf * (tf * {K1 + 1.0!r})
               / (tf + {K1!r} * ({1.0 - B!r} + {B!r} * dl / avgdl))
             ), 6) AS score
      FROM qtf
      JOIN idf USING (term)
      JOIN dl USING ({id_col})
      CROSS JOIN scalars
      GROUP BY qtf.{id_col}
      {having}
    )
    SELECT {id_col}, n_matched::BIGINT AS n_matched, score
    FROM scored ORDER BY score DESC, {id_col} ASC LIMIT {k}
    """


# ---------------------------------------------------------------------------
# grouped TF-IDF keyword profiles
# ---------------------------------------------------------------------------


def group_keywords(docs: DataFrame, group_col: str, k: int = 5,
                   text_col: str = "text") -> DataFrame:
    """Top-``k`` characteristic terms per group by TF-IDF over the
    group's own term frequencies: ``(group, term, tf, df, score, rank)``
    where ``df`` counts GROUPS containing the term and
    ``score = round(tf · ln(n_groups / df), 6)`` (ties → term ASC). The
    "what is this site about" profile when grouped by host — the site
    summary a crawl-review UI or a source datacard shows.

    Scale shape: one explode → (group, term)-keyed tf agg (map-side
    combinable); ``df`` is a count over the already-distinct tf rows
    (term-keyed, shuffle rows = distinct terms) joined back term-keyed
    (never broadcast — a web-scale vocabulary is not a small side);
    per-group top-k via the salted two-stage ``topk_per_key`` (no
    single-task window on a hot group). ``n_groups`` is a 1-value
    driver scalar."""
    from spider_spark.operators.similarity import topk_per_key

    terms = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("term"),
    )
    tf = terms.groupBy("grp", "term").agg(F.count("*").alias("tf"))
    n_groups = tf.select("grp").distinct().count()
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(dfreq, on="term").select(
        "grp", "term", "tf", "df",
        F.round(
            F.col("tf").cast("double")
            * F.log(F.lit(float(n_groups)) / F.col("df").cast("double")),
            6,
        ).alias("score"),
    )
    out = topk_per_key(
        scored, ["grp"], [F.col("score").desc(), F.col("term").asc()], k
    )
    return out.select(
        F.col("grp").alias(group_col), "term", "tf", "df", "score",
        F.col("rank").cast("long").alias("rank"),
    )


def group_keywords_sql(docs_rel: str, group_expr: str, k: int = 5,
                       text_col: str = "text",
                       out_group_col: str = "host") -> str:
    """DuckDB mirror of :func:`group_keywords` — same counts,
    multiplication order, rounding, tie-break, and rank window."""
    norm = NORM_SQL.format(x=text_col)
    return f"""
    WITH terms AS (
      SELECT {group_expr} AS grp,
             unnest(string_split({norm}, ' ')) AS term
      FROM {docs_rel}
    ),
    tf AS (SELECT grp, term, count(*) AS tf FROM terms GROUP BY 1, 2),
    ng AS (SELECT count(DISTINCT grp)::DOUBLE AS n_groups FROM tf),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT grp, term, tf, df,
             round(tf::DOUBLE * ln(n_groups / df::DOUBLE), 6) AS score
      FROM tf JOIN dfreq USING (term) CROSS JOIN ng
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY grp ORDER BY score DESC, term ASC
      ) AS rank FROM scored
    )
    SELECT grp AS {out_group_col}, term, tf::BIGINT AS tf, df::BIGINT AS df,
           score, rank::BIGINT AS rank
    FROM ranked WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# positional phrase search
# ---------------------------------------------------------------------------


def phrase_topk(docs: DataFrame, phrase_terms: list[str], k: int = 10,
                id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact-phrase search: top-``k`` documents containing the consecutive
    word sequence ``phrase_terms`` (over the pipeline's shared
    tokenization — ``normalized_text`` split on single spaces, the same
    word stream BM25 and the span/n-gram operators consume).

    Output ``(id, n_hits, first_pos)`` — occurrence count and the
    0-based word offset of the first occurrence (the snippet anchor) —
    ordered by ``(n_hits DESC, id ASC)``, a total order over exact
    integers, so the cut is deterministic at any parallelism.

    Scale shape: ZERO shuffles before the top-k. An m-word phrase occurs
    at word offset i iff the m-gram starting at i equals the phrase, so
    the match list is a per-row higher-order-function filter over the
    candidate start offsets (``F.filter`` — JVM, no explode, no
    positional self-join); a ``contains`` substring test on the
    normalized text short-circuits non-matching documents before any
    array work (necessary condition: the phrase string with single
    spaces is a substring of the normalized text whenever the m-gram
    matches). The result is a scan-local projection feeding
    ``TakeOrderedAndProject`` — per-partition heaps, k rows to the
    driver, never a global sort.

    Reference parity: no analog (the reference queries by parent URL
    only, postgres_database.py:144-160); retrieval extension layer.
    """
    if len(phrase_terms) < 2:
        raise ValueError("phrase_terms must have at least 2 words")
    terms = [t.lower() for t in phrase_terms]
    if any((not t) or (" " in t) for t in terms):
        raise ValueError(f"phrase terms must be non-empty single words: {terms}")
    phrase = " ".join(terms)
    m = len(terms)
    words = F.split(normalized_text(F.col(text_col)), " ")
    starts = F.when(
        F.size(words) >= m, F.sequence(F.lit(1), F.size(words) - (m - 1))
    ).otherwise(F.array().cast("array<int>"))
    starts = F.when(
        normalized_text(F.col(text_col)).contains(phrase), starts
    ).otherwise(F.array().cast("array<int>"))
    hits = F.filter(
        starts,
        lambda i: F.array_join(F.slice(words, i, m), " ") == F.lit(phrase),
    )
    out = (
        docs.select(F.col(id_col), hits.alias("hits"))
        .filter(F.size("hits") > 0)
        .select(
            id_col,
            F.size("hits").cast("long").alias("n_hits"),
            (F.element_at("hits", 1) - 1).cast("long").alias("first_pos"),
        )
    )
    return out.orderBy(F.col("n_hits").desc(), F.col(id_col).asc()).limit(k)


def phrase_topk_sql(phrase_terms: list[str], k: int = 10,
                    id_col: str = "doc_id", text_col: str = "text",
                    table: str = "documents") -> str:
    """DuckDB mirror of :func:`phrase_topk` — the identical
    start-offset/list-filter formulation (``list_slice`` is
    inclusive-bounds where Spark's ``slice`` is (start, length)), same
    0-based first_pos and (n_hits DESC, id ASC) order."""
    terms = [t.lower() for t in phrase_terms]
    phrase = " ".join(terms).replace("'", "''")
    m = len(terms)
    norm = NORM_SQL.format(x=text_col)
    return f"""
    WITH toks AS (
      SELECT {id_col}, string_split({norm}, ' ') AS words FROM {table}
    ),
    hits AS (
      SELECT {id_col},
             list_filter(
               range(1, greatest(len(words) - {m - 1}, 0) + 1),
               i -> array_to_string(list_slice(words, i, i + {m - 1}), ' ')
                    = '{phrase}'
             ) AS hits
      FROM toks
    )
    SELECT {id_col}, len(hits)::BIGINT AS n_hits,
           (hits[1] - 1)::BIGINT AS first_pos
    FROM hits WHERE len(hits) > 0
    ORDER BY n_hits DESC, {id_col} ASC LIMIT {k}
    """


def phrase_snippets(docs: DataFrame, phrase_terms: list[str], k: int = 10,
                    window: int = 4, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """:func:`phrase_topk` plus a keyword-in-context snippet: ``window``
    words of context on each side of the first occurrence, re-joined
    from the corpus. Output ``(id, n_hits, first_pos, snippet)``.

    Cost on top of the phrase scan: ONE broadcast join of the k-row
    top-k against the corpus (id-keyed; the corpus side is a 2-column
    projection and the snippet slice happens inside that scan), so the
    corpus is read twice but shuffled never."""
    top = phrase_topk(docs, phrase_terms, k=k, id_col=id_col,
                      text_col=text_col)
    m = len(phrase_terms)
    words = F.split(normalized_text(F.col(text_col)), " ")
    start = F.greatest(F.col("first_pos") + 1 - window, F.lit(1))
    length = F.col("first_pos") + m + window - start + 1
    joined = docs.select(id_col, text_col).join(
        F.broadcast(top), on=id_col
    )
    return joined.select(
        id_col, "n_hits", "first_pos",
        F.array_join(
            F.slice(words, start.cast("int"), length.cast("int")), " "
        ).alias("snippet"),
    ).orderBy(F.col("n_hits").desc(), F.col(id_col).asc())


def phrase_snippets_sql(phrase_terms: list[str], k: int = 10,
                        window: int = 4, id_col: str = "doc_id",
                        text_col: str = "text",
                        table: str = "documents") -> str:
    """DuckDB mirror of :func:`phrase_snippets` (``list_slice`` clamps at
    the list end like Spark's ``slice``)."""
    m = len(phrase_terms)
    inner = phrase_topk_sql(phrase_terms, k=k, id_col=id_col,
                            text_col=text_col, table=table)
    norm = NORM_SQL.format(x=text_col)
    return f"""
    WITH top AS ({inner})
    SELECT t.{id_col}, t.n_hits, t.first_pos,
           array_to_string(
             list_slice(
               string_split({norm}, ' '),
               greatest(t.first_pos + 1 - {window}, 1),
               t.first_pos + {m + window}
             ), ' ') AS snippet
    FROM top t JOIN {table} d ON t.{id_col} = d.{id_col}
    ORDER BY t.n_hits DESC, t.{id_col} ASC
    """


# ---------------------------------------------------------------------------
# hybrid retrieval: reciprocal-rank fusion of lexical + semantic top-k
# ---------------------------------------------------------------------------

RRF_K = 60  # the standard fusion constant (Cormack et al., SIGIR'09)


def hybrid_topk(docs: DataFrame, embeddings: DataFrame,
                query_terms: list[str], query_vec_id: int,
                k_each: int = 50, k: int = 10,
                id_col: str = "doc_id",
                lex_index=None, sem_index=None,
                nprobe: int = 4) -> DataFrame:
    """Reciprocal-rank fusion of the BM25 lexical top-``k_each`` and the
    cosine semantic top-``k_each`` (query = the embedding row whose
    ``vec_id == query_vec_id``; ``vec_id ≡ doc_id`` is the corpus
    linkage): ``rrf = Σ 1/(60 + rank_i)`` over the lists a doc appears
    in. Output ``(id, rrf, lex_rank, sem_rank)``, ties broken by id.

    ``lex_index`` / ``sem_index`` (a built
    :class:`~spider_spark.operators.lexindex.LexicalIndex` /
    :class:`~spider_spark.operators.ivf_index.IVFIndex`) swap each half
    for its persisted, partition-pruned form — the 100 TB probe-many path
    (VERDICT r3 finding #4). The lexical index is exact (bit-identical to
    ``bm25_topk``); the IVF half is exact when ``nprobe`` covers every
    list and approximate below that. Without indexes both halves are the
    inline full-scan operators (the oracle baseline).

    Cost: both halves are already k-bounded; fusion is a full-outer join
    of two k-row frames — driver-scale, not data-scale."""
    from pyspark.sql import Window

    from spider_spark.operators.similarity import cosine_topk

    if lex_index is not None:
        lex = lex_index.search(query_terms, k=k_each)
    else:
        lex = bm25_topk(docs, query_terms, k=k_each, id_col=id_col)
    lex = lex.withColumn(
        "lex_rank",
        F.row_number().over(
            Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
        ).cast("long"),
    ).select(id_col, "lex_rank")
    q_vec = embeddings.filter(F.col("vec_id") == query_vec_id)
    if sem_index is not None:
        sem_raw = sem_index.search(q_vec, k=k_each, nprobe=nprobe)
    else:
        sem_raw = cosine_topk(embeddings, q_vec, k=k_each)
    sem = sem_raw.select(
        F.col("nid").alias(id_col), F.col("rank").alias("sem_rank")
    )
    fused = (
        lex.join(sem, on=id_col, how="full_outer")
        .select(
            id_col,
            (
                F.coalesce(F.lit(1.0) / (F.lit(float(RRF_K)) + F.col("lex_rank")),
                           F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (F.lit(float(RRF_K)) + F.col("sem_rank")),
                             F.lit(0.0))
            ).alias("rrf"),
            F.coalesce("lex_rank", F.lit(-1)).alias("lex_rank"),
            F.coalesce("sem_rank", F.lit(-1)).alias("sem_rank"),
        )
    )
    return fused.orderBy(F.col("rrf").desc(), F.col(id_col).asc()).limit(k)


def hybrid_topk_sql(query_terms: list[str], query_vec_id: int,
                    k_each: int = 50, k: int = 10, dim: int = 64,
                    id_col: str = "doc_id") -> str:
    """DuckDB mirror of :func:`hybrid_topk` — composes the two halves'
    mirrors and fuses with the same constants and tie-breaks. Requires
    ``query_vec_id + 1`` as the cosine mirror's n_queries bound with a
    single-id equality filter."""
    from spider_spark.operators.similarity import cosine_topk_sql

    bm25 = bm25_topk_sql(query_terms, k=k_each, id_col=id_col)
    cos = cosine_topk_sql(k=k_each, n_queries=query_vec_id + 1, dim=dim)
    return f"""
    WITH lex0 AS ({bm25}),
    lex AS (
      SELECT {id_col},
             row_number() OVER (ORDER BY score DESC, {id_col}) AS lex_rank
      FROM lex0
    ),
    sem AS (
      SELECT nid AS {id_col}, rank AS sem_rank FROM ({cos})
      WHERE qid = {query_vec_id}
    ),
    fused AS (
      SELECT coalesce(lex.{id_col}, sem.{id_col}) AS {id_col},
             coalesce(1.0 / ({float(RRF_K)!r} + lex_rank), 0.0)
               + coalesce(1.0 / ({float(RRF_K)!r} + sem_rank), 0.0) AS rrf,
             coalesce(lex_rank, -1) AS lex_rank,
             coalesce(sem_rank, -1) AS sem_rank
      FROM lex FULL OUTER JOIN sem USING ({id_col})
    )
    SELECT {id_col}, rrf, lex_rank::BIGINT AS lex_rank,
           sem_rank::BIGINT AS sem_rank
    FROM fused ORDER BY rrf DESC, {id_col} LIMIT {k}
    """


# ---------------------------------------------------------------------------
# retrieval-quality evaluation (recall@k / MRR)
# ---------------------------------------------------------------------------

EVAL_PPM = 1_000_000


def retrieval_eval(results: DataFrame, truth: DataFrame,
                   query_col: str = "qid", id_col: str = "nid",
                   rank_col: str = "rank") -> DataFrame:
    """Per-query retrieval quality of ``results`` against ``truth``:
    ``(query, n_results, n_truth, n_hits, recall_ppm, mrr_micro)`` —
    the measure-don't-guess harness for the ANN stack (an approximate
    index without a recall number is a guess; the pinned-recall tests
    in tests/test_similarity.py are point checks, this is the
    per-query relation a dashboard tracks). ``recall_ppm =
    n_hits·10^6 div n_truth``; ``mrr_micro = 10^6 div r`` where ``r``
    is the rank of the first relevant result (0 when none) — both
    exact integer rationals, so the oracle replays them bit-for-bit.

    ``truth`` is any ground-truth relation ``(query, id)`` — exact
    brute-force top-k for ANN evaluation, judgment lists for search.
    Queries missing from ``results`` (or with zero hits) still report,
    zero-filled: silent query dropout is exactly what an eval harness
    must surface. Scale shape: two query-keyed aggs + one
    (query, id)-keyed join at result-list grain (k rows per query —
    tiny next to the corpus the lists came from)."""
    r = results.select(F.col(query_col).alias("q"), F.col(id_col).alias("d"),
                       F.col(rank_col).cast("long").alias("r"))
    t = truth.select(F.col(query_col).alias("q"), F.col(id_col).alias("d"))
    n_res = r.groupBy("q").agg(F.count(F.lit(1)).alias("n_results"))
    n_tru = t.groupBy("q").agg(F.count(F.lit(1)).alias("n_truth"))
    hits = r.join(t, on=["q", "d"]).groupBy("q").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min("r").alias("_first"),
    )
    return (
        n_tru.join(n_res, on="q", how="full_outer")
        .join(hits, on="q", how="left")
        .select(
            F.col("q").alias(query_col),
            F.coalesce("n_results", F.lit(0)).alias("n_results"),
            F.coalesce("n_truth", F.lit(0)).alias("n_truth"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.expr(f"(coalesce(n_hits, 0) * {EVAL_PPM}) "
                   f"div greatest(coalesce(n_truth, 0), 1)")
            .alias("recall_ppm"),
            F.coalesce(F.expr(f"{EVAL_PPM} div _first"), F.lit(0))
            .alias("mrr_micro"),
        )
    )


def retrieval_eval_sql(results_rel: str, truth_rel: str,
                       query_col: str = "qid", id_col: str = "nid",
                       rank_col: str = "rank") -> str:
    """DuckDB mirror of :func:`retrieval_eval` — identical joins,
    zero-fills, and integer rationals."""
    return f"""
    WITH ev_r AS (SELECT {query_col} AS q, {id_col} AS d,
                         {rank_col}::BIGINT AS r FROM ({results_rel})),
    ev_t AS (SELECT {query_col} AS q, {id_col} AS d FROM ({truth_rel})),
    ev_nr AS (SELECT q, count(*)::BIGINT AS n_results FROM ev_r GROUP BY 1),
    ev_nt AS (SELECT q, count(*)::BIGINT AS n_truth FROM ev_t GROUP BY 1),
    ev_h AS (
      SELECT ev_r.q, count(*)::BIGINT AS n_hits, min(r) AS _first
      FROM ev_r JOIN ev_t ON ev_r.q = ev_t.q AND ev_r.d = ev_t.d
      GROUP BY 1
    )
    SELECT coalesce(ev_nt.q, ev_nr.q) AS {query_col},
           coalesce(n_results, 0) AS n_results,
           coalesce(n_truth, 0) AS n_truth,
           coalesce(n_hits, 0) AS n_hits,
           (coalesce(n_hits, 0) * {EVAL_PPM})
             // greatest(coalesce(n_truth, 0), 1) AS recall_ppm,
           coalesce({EVAL_PPM} // _first, 0) AS mrr_micro
    FROM ev_nt
    FULL OUTER JOIN ev_nr ON ev_nt.q = ev_nr.q
    LEFT JOIN ev_h ON coalesce(ev_nt.q, ev_nr.q) = ev_h.q
    """


def ndcg_eval(results: DataFrame, truth: DataFrame,
              query_col: str = "qid", id_col: str = "nid",
              rank_col: str = "rank", grade_col: str = "grade") -> DataFrame:
    """Graded-relevance companion to :func:`retrieval_eval`:
    ``(query, dcg, idcg, ndcg)`` with ``dcg = Σ grade/log2(rank+1)``
    over the results' hit positions and ``idcg`` the same sum over the
    truth's grades in ideal order (grade DESC, id ASC — a total order,
    so the ideal ranking is deterministic). All three are rounded to 6
    decimals (the PMI float-determinism recipe: exact integer grades
    and ranks in, one ``log2`` per term, 6 dp out), ``ndcg = 0`` when
    the query has no graded truth. Queries present only in ``results``
    report zeros — same no-silent-dropout contract as
    :func:`retrieval_eval`.

    Scale shape: one (query, id)-keyed join at result-list grain plus
    one per-query window over the truth list (k rows per query by
    construction — the window partition is bounded, never corpus-sized).
    """
    r = results.select(F.col(query_col).alias("q"), F.col(id_col).alias("d"),
                       F.col(rank_col).cast("long").alias("r"))
    t = truth.select(F.col(query_col).alias("q"), F.col(id_col).alias("d"),
                     F.col(grade_col).cast("long").alias("g"))
    from pyspark.sql import Window

    gain = F.col("g").cast("double") / F.log2(F.col("r") + 1)
    dcg = (
        r.join(t, on=["q", "d"])
        .groupBy("q").agg(F.round(F.sum(gain), 6).alias("dcg"))
    )
    iw = Window.partitionBy("q").orderBy(F.col("g").desc(), F.col("d").asc())
    ideal = t.withColumn("r", F.row_number().over(iw).cast("long"))
    idcg = ideal.groupBy("q").agg(F.round(F.sum(gain), 6).alias("idcg"))
    qs = r.select("q").unionByName(t.select("q")).distinct()
    return (
        qs.join(idcg, on="q", how="left").join(dcg, on="q", how="left")
        .select(
            F.col("q").alias(query_col),
            F.coalesce("dcg", F.lit(0.0)).alias("dcg"),
            F.coalesce("idcg", F.lit(0.0)).alias("idcg"),
            F.when(F.coalesce("idcg", F.lit(0.0)) > 0,
                   F.round(F.coalesce("dcg", F.lit(0.0)) / F.col("idcg"), 6))
            .otherwise(F.lit(0.0)).alias("ndcg"),
        )
    )


def ndcg_eval_sql(results_rel: str, truth_rel: str,
                  query_col: str = "qid", id_col: str = "nid",
                  rank_col: str = "rank", grade_col: str = "grade") -> str:
    """DuckDB mirror of :func:`ndcg_eval` — identical ideal order,
    gains, and 6 dp rounding."""
    return f"""
    WITH nd_r AS (SELECT {query_col} AS q, {id_col} AS d,
                         {rank_col}::BIGINT AS r FROM ({results_rel})),
    nd_t AS (SELECT {query_col} AS q, {id_col} AS d,
                    {grade_col}::BIGINT AS g FROM ({truth_rel})),
    nd_dcg AS (
      SELECT nd_r.q, round(sum(g / log2(r + 1)), 6) AS dcg
      FROM nd_r JOIN nd_t ON nd_r.q = nd_t.q AND nd_r.d = nd_t.d
      GROUP BY 1
    ),
    nd_ideal AS (
      SELECT q, g, row_number() OVER (
        PARTITION BY q ORDER BY g DESC, d ASC) AS r
      FROM nd_t
    ),
    nd_idcg AS (
      SELECT q, round(sum(g / log2(r + 1)), 6) AS idcg
      FROM nd_ideal GROUP BY 1
    ),
    nd_q AS (SELECT q FROM nd_r UNION SELECT q FROM nd_t)
    SELECT nd_q.q AS {query_col},
           coalesce(dcg, 0.0) AS dcg,
           coalesce(idcg, 0.0) AS idcg,
           CASE WHEN coalesce(idcg, 0.0) > 0
                THEN round(coalesce(dcg, 0.0) / idcg, 6)
                ELSE 0.0 END AS ndcg
    FROM nd_q
    LEFT JOIN nd_idcg USING (q)
    LEFT JOIN nd_dcg USING (q)
    """
