"""Stored-query matching (operators/percolate.py) vs hand-computed
matches and the DuckDB mirror."""

from __future__ import annotations

import duckdb
import pytest

from spider_spark.operators.percolate import (
    stored_query_match,
    stored_query_match_sql,
)

QUERIES = [
    ("alert_ab", ["alpha", "beta"]),
    ("alert_g", ["gamma"]),
    ("alert_dup", ["Alpha", "alpha"]),  # dedups to one term
    ("alert_none", ["zzz_nothing"]),
]


@pytest.fixture(scope="module")
def fixture(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "ALPHA only here"),
         (2, "beta and gamma text"), (3, "nothing relevant")],
        "doc_id long, text string")
    queries = spark.createDataFrame(QUERIES, "query_id string, terms array<string>")
    return docs, queries


class TestStoredQueryMatch:
    def test_all_mode(self, spark, fixture):
        docs, queries = fixture
        got = {(r["doc_id"], r["query_id"]): r["n_matched"]
               for r in stored_query_match(docs, queries).collect()}
        assert got == {
            (0, "alert_ab"): 2,   # has both alpha+beta
            (0, "alert_g"): 1,
            (0, "alert_dup"): 1,  # deduped rule needs just "alpha"
            (1, "alert_dup"): 1,  # case-normalized doc term matches
            (2, "alert_g"): 1,
        }

    def test_any_mode(self, spark, fixture):
        docs, queries = fixture
        got = {(r["doc_id"], r["query_id"]): r["n_matched"]
               for r in stored_query_match(docs, queries,
                                           mode="any").collect()}
        # doc 2 now matches alert_ab on beta alone
        assert got[(2, "alert_ab")] == 1
        assert (3, "alert_ab") not in got
        assert all(q != "alert_none" for _, q in got)

    def test_repeated_doc_terms_count_once(self, spark):
        docs = spark.createDataFrame([(0, "alpha alpha alpha beta")],
                                     "doc_id long, text string")
        queries = spark.createDataFrame([("q", ["alpha", "beta"])],
                                        "query_id string, terms array<string>")
        r = stored_query_match(docs, queries).collect()[0]
        assert r["n_matched"] == 2  # distinct matched terms, not occurrences

    def test_sql_mirror(self, spark, fixture):
        docs, queries = fixture
        con = duckdb.connect()
        con.register("pdocs", docs.toPandas())
        for mode in ("all", "any"):
            spark_rows = sorted(map(tuple, stored_query_match(
                docs, queries, mode=mode).collect()))
            duck_rows = sorted(map(tuple, con.execute(stored_query_match_sql(
                QUERIES, mode=mode,
                docs_rel="SELECT * FROM pdocs")).fetchall()))
            assert spark_rows == duck_rows, mode

    def test_rejects_bad_mode(self, spark, fixture):
        docs, queries = fixture
        with pytest.raises(ValueError):
            stored_query_match(docs, queries, mode="phrase")


class TestRuleValidation:
    """Rules must be non-empty ASCII: engines disagree on some
    non-ASCII lowercasings (e.g. U+0130 'İ'), and an empty terms list
    silently never matches even in 'all' mode (ADVICE r4)."""

    def _docs(self, spark):
        return spark.createDataFrame([(0, "alpha beta")],
                                     "doc_id long, text string")

    def test_rejects_empty_terms_df(self, spark):
        queries = spark.createDataFrame([("q_empty", [])],
                                        "query_id string, terms array<string>")
        with pytest.raises(ValueError, match="no terms"):
            stored_query_match(self._docs(spark), queries)

    def test_rejects_non_ascii_term_df(self, spark):
        queries = spark.createDataFrame([("q_tr", ["İstanbul"])],
                                        "query_id string, terms array<string>")
        with pytest.raises(ValueError, match="ASCII"):
            stored_query_match(self._docs(spark), queries)

    def test_rejects_in_sql_mirror_too(self, spark):
        with pytest.raises(ValueError, match="no terms"):
            stored_query_match_sql([("q_empty", [])])
        with pytest.raises(ValueError, match="ASCII"):
            stored_query_match_sql([("q_tr", ["İstanbul"])])

    def test_ascii_rules_still_match(self, spark, fixture):
        docs, queries = fixture
        rows = stored_query_match(docs, queries).collect()
        assert rows  # validation must not disturb the valid-rule path
