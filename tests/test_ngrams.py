"""Corpus n-gram counts + deterministic top-k (operators/ngrams.py)."""

from __future__ import annotations

import duckdb
import pytest

from spider_spark.operators.ngrams import ngram_counts, top_ngrams, top_ngrams_sql


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat"),            # exactly one trigram
        (3, "the  CAT   sat on"),      # normalization folds into doc 1's grams
        (4, "short"),                  # < n words → no grams
        (5, ""),                       # empty → no grams
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestCounts:
    def test_counts_and_edges(self, docs):
        got = dict(ngram_counts(docs, n=3).collect())
        assert got["the cat sat"] == 3
        assert got["cat sat on"] == 2
        assert got["sat on the"] == 1
        assert sum(got.values()) == 4 + 1 + 2  # docs 1,2,3 only

    def test_topk_total_order(self, docs):
        top = top_ngrams(docs, n=3, k=3).collect()
        assert [(r["gram"], r["n_occurrences"]) for r in top] == [
            ("the cat sat", 3),
            ("cat sat on", 2),
            ("on the mat", 1),  # ties broken ASC by gram
        ]

    def test_sql_mirror_bit_exact(self, docs):
        spark_rows = [tuple(r) for r in top_ngrams(docs, n=3, k=10).collect()]
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        duck_rows = con.execute(top_ngrams_sql(n=3, k=10)).fetchall()
        assert spark_rows == duck_rows


class TestBigramPMI:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        # "san francisco" always together (strong collocation); "the" is
        # everywhere (any bigram with it scores low); "red car"/"red sun"
        # split "red"'s mass
        rows = [
            (0, "san francisco is the best city in the bay"),
            (1, "the red car and the red sun"),
            (2, "san francisco fog rolls over the bay"),
            (3, "the car in san francisco is red"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string").cache()

    def test_collocation_outranks_common_pairs(self, spark, docs):
        from spider_spark.operators.ngrams import bigram_pmi

        rows = bigram_pmi(docs, k=20, min_count=2).collect()
        got = {r["gram"]: r for r in rows}
        assert "san francisco" in got
        sf = got["san francisco"]
        assert sf["n_xy"] == 3 and sf["n_x"] == 3 and sf["n_y"] == 3
        # perfectly-bound pair must outrank anything involving "the"
        the_pmis = [r["pmi"] for r in rows if "the" in r["gram"].split()]
        assert all(sf["pmi"] > p for p in the_pmis)

    def test_min_count_floors(self, spark, docs):
        from spider_spark.operators.ngrams import bigram_pmi

        grams = {r["gram"] for r in bigram_pmi(docs, k=50, min_count=2).collect()}
        assert "fog rolls" not in grams, "hapax pair floored by min_count"

    def test_matches_duckdb_mirror(self, spark, docs):
        import duckdb

        from spider_spark.operators.ngrams import bigram_pmi, bigram_pmi_sql

        got = [tuple(r) for r in bigram_pmi(docs, k=20, min_count=1).collect()]
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        want = [tuple(r) for r in
                con.execute(bigram_pmi_sql(k=20, min_count=1)).fetchall()]
        assert got == want

    def test_jvm_only_plan(self, docs):
        from spider_spark.operators.ngrams import bigram_pmi

        plan = (
            bigram_pmi(docs, k=5, min_count=1)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "TakeOrderedAndProject" in plan
