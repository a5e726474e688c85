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


class TestPhraseSearch:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        rows = [
            (0, "table part a row table part value"),   # 2 hits, first at 0
            (1, "x Table  PART y"),                     # normalization → 1 hit at 1
            (2, "table value part table"),              # words present, never adjacent
            (3, "atable partb table-part"),             # substrings only, no token match
            (4, "a a a"),                               # overlap fixture (phrase 'a a')
            (5, "table part"),                          # exact doc == phrase
        ]
        return spark.createDataFrame(rows, "doc_id long, text string").cache()

    def test_counts_and_positions(self, spark, docs):
        from spider_spark.operators.search import phrase_topk

        got = {r["doc_id"]: (r["n_hits"], r["first_pos"])
               for r in phrase_topk(docs, ["table", "part"], k=10).collect()}
        assert got == {0: (2, 0), 1: (1, 1), 5: (1, 0)}

    def test_overlapping_occurrences_count(self, spark, docs):
        from spider_spark.operators.search import phrase_topk

        got = phrase_topk(docs, ["a", "a"], k=10).collect()
        by_id = {r["doc_id"]: (r["n_hits"], r["first_pos"]) for r in got}
        assert by_id[4] == (2, 0), "'a a a' holds two overlapping 'a a' starts"

    def test_tokens_not_substrings(self, spark, docs):
        from spider_spark.operators.search import phrase_topk

        ids = {r["doc_id"] for r in phrase_topk(docs, ["table", "part"], k=10).collect()}
        assert 3 not in ids, "hyphen/concat substrings are not token matches"
        assert 2 not in ids, "non-adjacent words are not a phrase"

    def test_matches_duckdb_mirror(self, spark, docs):
        from spider_spark.operators.search import phrase_topk, phrase_topk_sql

        got = [tuple(r) for r in phrase_topk(docs, ["table", "part"], k=10).collect()]
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        want = [tuple(r) for r in
                con.execute(phrase_topk_sql(["table", "part"], k=10)).fetchall()]
        assert got == want

    def test_plan_has_no_explode_no_python(self, docs):
        from spider_spark.operators.search import phrase_topk

        plan = (
            phrase_topk(docs, ["table", "part"], k=5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Generate" not in plan, "phrase match is a per-row array filter"
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "TakeOrderedAndProject" in plan

    def test_rejects_degenerate_phrases(self, docs):
        from spider_spark.operators.search import phrase_topk

        with pytest.raises(ValueError):
            phrase_topk(docs, ["solo"])
        with pytest.raises(ValueError):
            phrase_topk(docs, ["two words", "x"])


class TestPhraseSnippets:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        rows = [
            (0, "w1 w2 w3 table part w6 w7 w8 w9"),   # interior hit
            (1, "table part tail1 tail2"),            # hit at doc start
            (2, "lead1 lead2 table part"),            # hit at doc end
        ]
        return spark.createDataFrame(rows, "doc_id long, text string").cache()

    def test_window_clamps_at_both_ends(self, spark, docs):
        from spider_spark.operators.search import phrase_snippets

        got = {r["doc_id"]: r["snippet"]
               for r in phrase_snippets(docs, ["table", "part"], k=10,
                                        window=2).collect()}
        assert got[0] == "w2 w3 table part w6 w7"
        assert got[1] == "table part tail1 tail2"
        assert got[2] == "lead1 lead2 table part"

    def test_matches_duckdb_mirror(self, spark, docs):
        from spider_spark.operators.search import (
            phrase_snippets,
            phrase_snippets_sql,
        )

        got = [tuple(r) for r in
               phrase_snippets(docs, ["table", "part"], k=10, window=2).collect()]
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        want = [tuple(r) for r in con.execute(
            phrase_snippets_sql(["table", "part"], k=10, window=2)
        ).fetchall()]
        assert got == want


class TestGroupKeywords:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        rows = [
            ("a.example", "spark spark shuffle join the the"),
            ("a.example", "spark catalyst the"),
            ("b.example", "pandas numpy the the"),
            ("b.example", "pandas arrow the"),
            ("c.example", "the the the"),
        ]
        return spark.createDataFrame(rows, "host string, text string").cache()

    def test_characteristic_terms_win(self, spark, docs):
        from spider_spark.operators.search import group_keywords

        rows = group_keywords(docs, "host", k=2).collect()
        top = {r["host"]: r["term"] for r in rows if r["rank"] == 1}
        assert top["a.example"] == "spark"
        assert top["b.example"] == "pandas"
        # 'the' appears in every group → idf = ln(3/3) = 0 everywhere
        the_scores = [r["score"] for r in rows if r["term"] == "the"]
        assert all(s == 0.0 for s in the_scores)

    def test_matches_duckdb_mirror(self, spark, docs):
        from spider_spark.operators.search import (
            group_keywords,
            group_keywords_sql,
        )

        got = sorted(tuple(r) for r in group_keywords(docs, "host", k=3).collect())
        con = duckdb.connect()
        con.register("docs", docs.toPandas())
        want = sorted(tuple(r) for r in con.execute(
            group_keywords_sql("docs", "host", k=3)).fetchall())
        assert got == want

    def test_no_single_task_window(self, docs):
        from spider_spark.operators.search import group_keywords

        plan = (
            group_keywords(docs, "host", k=2)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # map-side pruning before the per-group exchange: Spark 4 plans the
        # row_number filter as a Partial WindowGroupLimit pre-shuffle
        assert "WindowGroupLimit" in plan and "Partial" in plan, plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestBooleanAnd:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        return spark.createDataFrame(
            [(0, "spark join window"), (1, "spark join"), (2, "join window"),
             (3, "spark spark spark"), (4, "window dressing")],
            "doc_id long, text string")

    def test_and_is_a_filter_of_or(self, spark, corpus):
        from spider_spark.operators.search import bm25_topk

        q = ["spark", "window"]
        union = {r["doc_id"]: r for r in bm25_topk(corpus, q, k=10).collect()}
        conj = {r["doc_id"]: r for r in
                bm25_topk(corpus, q, k=10, require_all=True).collect()}
        assert set(conj) == {0}  # only doc 0 has both terms
        assert set(union) == {0, 1, 2, 3, 4}
        # scoring identical in both modes
        assert conj[0]["score"] == union[0]["score"]
        assert conj[0]["n_matched"] == 2

    def test_duplicate_query_terms_collapse(self, spark, corpus):
        from spider_spark.operators.search import bm25_topk

        got = bm25_topk(corpus, ["spark", "SPARK", "join"], k=10,
                        require_all=True).collect()
        assert {r["doc_id"] for r in got} == {0, 1}

    def test_sql_mirror(self, spark, corpus):
        import duckdb

        from spider_spark.operators.search import bm25_topk, bm25_topk_sql

        q = ["spark", "window"]
        spark_rows = sorted(map(tuple, bm25_topk(
            corpus, q, k=10, require_all=True).collect()))
        con = duckdb.connect()
        con.register("bdocs", corpus.toPandas())
        duck_rows = sorted(map(tuple, con.execute(bm25_topk_sql(
            q, k=10, table="bdocs", require_all=True)).fetchall()))
        assert spark_rows == duck_rows


class TestRetrievalEval:
    def test_matches_hand_computed(self, spark):
        from spider_spark.operators.search import retrieval_eval

        # q1: hits at ranks 2,3 of truth {a,b,c} → recall 2/3, mrr 1/2
        # q2: no hits → zeros; q3: truth-only; q4: results-only
        results = spark.createDataFrame(
            [("q1", "x", 1), ("q1", "a", 2), ("q1", "b", 3),
             ("q2", "y", 1), ("q4", "z", 1)],
            "qid string, nid string, rank long")
        truth = spark.createDataFrame(
            [("q1", "a"), ("q1", "b"), ("q1", "c"),
             ("q2", "m"), ("q3", "n")], "qid string, nid string")
        got = {r["qid"]: (r["n_results"], r["n_truth"], r["n_hits"],
                          r["recall_ppm"], r["mrr_micro"])
               for r in retrieval_eval(results, truth).collect()}
        assert got == {
            "q1": (3, 3, 2, 666666, 500000),
            "q2": (1, 1, 0, 0, 0),
            "q3": (0, 1, 0, 0, 0),
            "q4": (1, 0, 0, 0, 0),
        }

    def test_perfect_retrieval(self, spark):
        from spider_spark.operators.search import retrieval_eval

        rows = [("q", f"d{i}", i + 1) for i in range(5)]
        results = spark.createDataFrame(rows, "qid string, nid string, rank long")
        truth = results.select("qid", "nid")
        r = retrieval_eval(results, truth).collect()[0]
        assert (r["recall_ppm"], r["mrr_micro"]) == (1_000_000, 1_000_000)

    def test_sql_mirror(self, spark):
        import duckdb

        from spider_spark.operators.search import (
            retrieval_eval, retrieval_eval_sql)

        results = spark.createDataFrame(
            [("q1", "a", 1), ("q1", "b", 2), ("q2", "c", 1), ("q5", "d", 4)],
            "qid string, nid string, rank long")
        truth = spark.createDataFrame(
            [("q1", "b"), ("q2", "z"), ("q3", "a")], "qid string, nid string")
        spark_rows = sorted(map(tuple, retrieval_eval(results, truth).collect()))
        con = duckdb.connect()
        con.register("ev_results", results.toPandas())
        con.register("ev_truth", truth.toPandas())
        duck_rows = sorted(map(tuple, con.execute(retrieval_eval_sql(
            "SELECT * FROM ev_results", "SELECT * FROM ev_truth")).fetchall()))
        assert spark_rows == duck_rows

    def test_evaluates_the_real_ann_stack(self, spark):
        from spider_spark.operators.search import retrieval_eval
        from spider_spark.operators.similarity import cosine_topk, ivf_topk

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        queries = emb.filter("vec_id < 8")
        truth = cosine_topk(emb, queries, k=5).select("qid", "nid")
        approx = ivf_topk(emb, queries, k=5, nprobe=2)
        ev = retrieval_eval(approx, truth).collect()
        assert len(ev) == 8
        mean_recall = sum(r["recall_ppm"] for r in ev) / len(ev)
        assert 200_000 < mean_recall <= 1_000_000  # nprobe=2/16 loses recall


class TestNdcgEval:
    def test_matches_hand_computed(self, spark):
        import math

        from spider_spark.operators.search import ndcg_eval

        # truth grades: a=3, b=2, c=1; results rank a@2, c@1 (b missed)
        results = spark.createDataFrame(
            [("q", "c", 1), ("q", "a", 2), ("q", "x", 3)],
            "qid string, nid string, rank long")
        truth = spark.createDataFrame(
            [("q", "a", 3), ("q", "b", 2), ("q", "c", 1)],
            "qid string, nid string, grade long")
        r = ndcg_eval(results, truth).collect()[0]
        dcg = 1 / math.log2(2) + 3 / math.log2(3)
        idcg = 3 / math.log2(2) + 2 / math.log2(3) + 1 / math.log2(4)
        assert r["dcg"] == round(dcg, 6)
        assert r["idcg"] == round(idcg, 6)
        assert r["ndcg"] == round(round(dcg, 6) / round(idcg, 6), 6)

    def test_perfect_and_empty(self, spark):
        from spider_spark.operators.search import ndcg_eval

        truth = spark.createDataFrame(
            [("q", "a", 2), ("q", "b", 1), ("z", "m", 3)],
            "qid string, nid string, grade long")
        perfect = spark.createDataFrame(
            [("q", "a", 1), ("q", "b", 2)], "qid string, nid string, rank long")
        got = {r["qid"]: r for r in ndcg_eval(perfect, truth).collect()}
        assert got["q"]["ndcg"] == 1.0
        assert got["z"]["dcg"] == 0.0 and got["z"]["ndcg"] == 0.0
        # results-only query reports zeros, not dropout
        only = spark.createDataFrame([("w", "y", 1)],
                                     "qid string, nid string, rank long")
        got2 = {r["qid"]: r for r in ndcg_eval(only, truth).collect()}
        assert got2["w"]["ndcg"] == 0.0

    def test_sql_mirror(self, spark):
        import duckdb

        from spider_spark.operators.search import ndcg_eval, ndcg_eval_sql

        results = spark.createDataFrame(
            [("q1", "a", 1), ("q1", "b", 2), ("q2", "c", 1)],
            "qid string, nid string, rank long")
        truth = spark.createDataFrame(
            [("q1", "b", 3), ("q1", "a", 3), ("q1", "d", 1), ("q3", "e", 2)],
            "qid string, nid string, grade long")
        spark_rows = sorted(map(tuple, ndcg_eval(results, truth).collect()))
        con = duckdb.connect()
        con.register("nd_results", results.toPandas())
        con.register("nd_truth", truth.toPandas())
        duck_rows = sorted(map(tuple, con.execute(ndcg_eval_sql(
            "SELECT * FROM nd_results", "SELECT * FROM nd_truth")).fetchall()))
        assert spark_rows == duck_rows
