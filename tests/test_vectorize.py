"""Feature-hashing vectorizer: DuckDB-mirror bit-parity, the hashing-trick
invariants (tf linearity, bucket/sign determinism), degenerate rows, and
the plan shape (no Python stage, one doc-keyed agg)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from spider_spark.functions.vectorize import hashed_tf_vectors, hashed_vectors_sql

DIM = 16  # small dim keeps the pivot readable in plans; parity is dim-free


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def _mirror_vecs(pdf, dim, table="t"):
    con = duckdb.connect()
    con.register(table, pdf)
    sql = f"WITH {hashed_vectors_sql(dim=dim, table=table)} SELECT * FROM hvecs"
    return {r[0]: tuple(r[1]) for r in con.execute(sql).fetchall()}


class TestMirrorParity:
    def test_corpus_vectors_bit_identical(self, docs):
        got = {
            r["doc_id"]: tuple(r["embedding"])
            for r in hashed_tf_vectors(docs, dim=DIM).collect()
        }
        want = _mirror_vecs(docs.select("doc_id", "text").toPandas(), DIM)
        assert got == want
        assert len(got) == docs.count()

    def test_degenerate_rows(self, spark):
        df = spark.createDataFrame(
            [(0, ""), (1, "   "), (2, "one"), (3, "one one")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: tuple(r["embedding"])
            for r in hashed_tf_vectors(df, dim=DIM).collect()
        }
        want = _mirror_vecs(df.toPandas(), DIM)
        assert got == want
        # empty and whitespace-only normalize identically
        assert got[0] == got[1]


class TestHashingTrick:
    def test_tf_linearity(self, spark):
        df = spark.createDataFrame(
            [(0, "alpha beta"), (1, "alpha alpha beta beta")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["embedding"]
            for r in hashed_tf_vectors(df, dim=DIM).collect()
        }
        assert [2 * x for x in got[0]] == got[1]

    def test_word_order_invariant_and_signs_used(self, spark):
        words = [f"w{i}" for i in range(200)]
        df = spark.createDataFrame(
            [(0, " ".join(words)), (1, " ".join(reversed(words)))],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["embedding"]
            for r in hashed_tf_vectors(df, dim=DIM).collect()
        }
        assert got[0] == got[1]
        assert any(x < 0 for x in got[0]), "sign hash must produce -1s"
        assert sum(abs(x) for x in got[0]) <= 200


class TestPlanShape:
    def test_jvm_only_single_doc_agg(self, docs):
        plan = (
            hashed_tf_vectors(docs.select("doc_id", "text"), dim=DIM)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # one exchange total: the doc-keyed aggregation (partials combine
        # map-side before it)
        assert plan.count("Exchange hashpartitioning(doc_id") == 1, plan
        assert "partial_sum" in plan
