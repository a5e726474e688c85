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
