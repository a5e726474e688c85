"""Frozen linear quality classifier (functions/classifier.py): integer
log-odds scoring, mirror parity, separability, JVM-only plan."""

import pytest
from pyspark.sql import functions as F

from spider_spark.functions.classifier import (
    QUALITY_WEIGHTS,
    quality_classifier_scores,
    quality_classifier_sql,
)

CORPUS = [
    (0, "The research study presents evidence and analysis of the theory; "
        "results and conclusion follow the method chapter."),
    (1, "BUY NOW!!! Free discount offer — click to subscribe and WIN a "
        "prize, limited deal, cheap bonus!!!"),
    (2, "Mixed text: the university research deal offers a free click."),
    (3, ""),
    (4, "совершенно другой алфавит без латинских слов"),
    (5, "punctuation,matters:research!evidence?method."),
]


def _py_score(text: str) -> tuple[int, int]:
    import re

    words = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
    return sum(QUALITY_WEIGHTS.get(w, 0) for w in words), len(words)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string").cache()


class TestQualityClassifier:
    def test_matches_python_replay(self, docs):
        got = {
            r["doc_id"]: (r["score_milli"], r["n_words"], r["is_informative"])
            for r in quality_classifier_scores(docs).collect()
        }
        for i, text in CORPUS:
            score, n = _py_score(text)
            assert got[i] == (score, n, score * 1000 >= 0 * n), f"doc {i}"

    def test_separability_and_edges(self, docs):
        got = {
            r["doc_id"]: r for r in quality_classifier_scores(docs).collect()
        }
        assert got[0]["score_milli"] > 0 and got[0]["is_informative"]
        assert got[1]["score_milli"] < 0 and not got[1]["is_informative"]
        # empty doc: score 0, zero words
        assert got[3]["score_milli"] == 0 and got[3]["n_words"] == 0
        # non-Latin script: every char is a separator under the [a-z0-9]
        # tokenizer, so the doc is out of the classifier's domain (score 0,
        # no tokens) — identical in both engines by construction
        assert got[4]["score_milli"] == 0 and got[4]["n_words"] == 0
        # punctuation separates tokens: doc 5 hits 3 informative words
        assert got[5]["score_milli"] > 0

    def test_matches_duckdb_mirror(self, docs):
        import duckdb

        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        want = {
            row[0]: tuple(row[1:])
            for row in con.execute(quality_classifier_sql()).fetchall()
        }
        got = {
            r["doc_id"]: (r["score_milli"], r["n_words"], r["is_informative"])
            for r in quality_classifier_scores(docs).collect()
        }
        assert got == want

    def test_threshold_cross_multiplication(self, docs):
        # a positive tau demotes the weakly-positive mixed doc but keeps
        # the strongly-informative one (mean-based, length-normalized)
        res = {
            r["doc_id"]: r["is_informative"]
            for r in quality_classifier_scores(docs, tau_milli=200).collect()
        }
        assert res[0] is True
        assert res[2] is False

    def test_plan_is_jvm_only(self, docs):
        plan = quality_classifier_scores(docs)._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
