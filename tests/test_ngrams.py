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
