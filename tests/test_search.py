"""BM25 lexical search: ranking semantics + DuckDB mirror equality."""

from __future__ import annotations

import duckdb
import pytest

from spider_spark.operators.search import bm25_topk, bm25_topk_sql


class TestBM25:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        # df(spark)=df(join)=5 of 7 docs (common); df(vector)=2 (rare)
        rows = [
            (0, "spark join spark join spark"),        # heavy on common terms
            (1, "vector index vector recall"),         # heavy on the rare term
            (2, "spark window table row column join"),
            (3, "join window spark table scan join"),
            (4, "table scan filter spark join project"),
            (5, "vector"),                             # short doc, rare term
            (6, "spark join agg"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string").cache()

    def test_rare_terms_outweigh_common_ones(self, spark, docs):
        # 'vector' appears in 2 docs, 'spark'/'join' in 3 — idf must favor
        # the vector-heavy docs over the spark/join-heavy ones
        got = bm25_topk(docs, ["spark", "join", "vector"], k=7).collect()
        ranks = {r["doc_id"]: i for i, r in enumerate(got)}
        assert ranks[1] < ranks[0], "two rare-term hits beat common-term spam"
        assert len(ranks) == 7, "every doc matches some query term here"

    def test_short_doc_boost(self, spark, docs):
        # same single 'vector' occurrence: the 1-word doc must outscore a
        # 5-word doc on that term (BM25 length normalization)
        got = {r["doc_id"]: r["score"] for r in bm25_topk(docs, ["vector"], k=6).collect()}
        assert got[5] > got[1] * 0.5 and 5 in got and 1 in got
        assert list(got) == sorted(got, key=lambda d: (-got[d], d))

    def test_matches_duckdb_mirror(self, spark, docs):
        q = ["spark", "join", "vector", "window"]
        got = [tuple(r) for r in bm25_topk(docs, q, k=4).collect()]
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        want = [tuple(r) for r in con.execute(bm25_topk_sql(q, k=4)).fetchall()]
        assert [(d, n, round(s, 6)) for d, n, s in got] == [
            (d, n, round(s, 6)) for d, n, s in want
        ]

    def test_rejects_empty_query(self, docs):
        with pytest.raises(ValueError):
            bm25_topk(docs, [])

    def test_jvm_only_plan(self, docs):
        plan = (
            bm25_topk(docs, ["spark"], k=3)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "TakeOrderedAndProject" in plan, "top-k must be heap-based, not a sort"


class TestHybridRRF:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        import numpy as np

        rng = np.random.default_rng(11)
        words = ["spark", "join", "vector", "table", "scan", "agg", "row"]
        docs = spark.createDataFrame(
            [(i, " ".join(rng.choice(words, size=12))) for i in range(40)],
            "doc_id long, text string",
        ).cache()
        emb = spark.createDataFrame(
            [(i, [float(x) for x in rng.normal(size=8)]) for i in range(40)],
            "vec_id long, embedding array<float>",
        ).cache()
        return docs, emb

    def test_matches_duckdb_mirror(self, spark, corpus):
        from spider_spark.operators.search import hybrid_topk, hybrid_topk_sql

        docs, emb = corpus
        got = [tuple(r) for r in hybrid_topk(docs, emb, ["spark", "vector"], 3,
                                             k_each=15, k=8).collect()]
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        con.register("embeddings", emb.toPandas())
        sql = hybrid_topk_sql(["spark", "vector"], 3, k_each=15, k=8, dim=8)
        want = [tuple(r) for r in con.execute(sql).fetchall()]
        assert [(d, round(s, 9), a, b) for d, s, a, b in got] == [
            (d, round(s, 9), a, b) for d, s, a, b in want
        ]

    def test_doc_in_both_lists_outranks_single_list(self, spark, corpus):
        from spider_spark.operators.search import hybrid_topk

        docs, emb = corpus
        rows = hybrid_topk(docs, emb, ["spark", "vector"], 3,
                           k_each=15, k=40).collect()
        both = [r for r in rows if r["lex_rank"] > 0 and r["sem_rank"] > 0]
        only = [r for r in rows if (r["lex_rank"] > 0) != (r["sem_rank"] > 0)]
        if both and only:
            # a doc near the top of BOTH lists must beat the best
            # bottom-of-one-list doc (the point of fusion)
            best_both = max(r["rrf"] for r in both)
            assert best_both > min(r["rrf"] for r in only)
