"""Benchmark decontamination: hand-checkable overlap counts, DuckDB-mirror
parity, and the broadcast/shuffle-join toggle equivalence."""

import duckdb
import pytest
from pyspark.sql import functions as F

from spider_spark.operators.decontam import decontaminate, decontaminate_sql


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog tonight"),
        (1, "completely unrelated text about spark engines and parquet files"),
        # contains the benchmark's 5-gram "quick brown fox jumps over"
        (2, "she said the quick brown fox jumps over everything in sight"),
        (3, "short doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


@pytest.fixture(scope="module")
def bench_set(spark):
    return spark.createDataFrame(
        [(100, "quick brown fox jumps over")], "doc_id long, text string"
    ).cache()


class TestDecontaminate:
    def test_any_hit_policy(self, corpus, bench_set):
        got = {
            r["doc_id"]: (r["n_shingles"], r["n_contaminated"], r["contaminated"])
            for r in decontaminate(corpus, bench_set, n=5).collect()
        }
        assert set(got) == {0, 1, 2, 3}
        # doc 0: 10 words -> 6 distinct 5-grams, exactly one matches
        assert got[0] == (6, 1, True)
        assert got[2][1] >= 1 and got[2][2] is True
        assert got[1] == (got[1][0], 0, False)
        # a doc shorter than n yields its whole text as the single shingle
        assert got[3] == (1, 0, False)

    def test_broadcast_and_shuffle_join_agree(self, corpus, bench_set):
        a = {tuple(r) for r in
             decontaminate(corpus, bench_set, n=5, broadcast=True).collect()}
        b = {tuple(r) for r in
             decontaminate(corpus, bench_set, n=5, broadcast=False).collect()}
        assert a == b

    def test_matches_duckdb_mirror(self, spark, sf_dir):
        import duckdb

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        bench = docs.filter(F.col("doc_id") % 97 == 0)
        got = {
            r["doc_id"]: (r["n_shingles"], r["n_contaminated"], r["contaminated"])
            for r in decontaminate(docs, bench, n=8).collect()
        }
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        want = {
            r[0]: (r[1], r[2], r[3])
            for r in con.execute(
                decontaminate_sql("doc_id % 97 = 0", n=8)
            ).fetchall()
        }
        assert got == want
        # every benchmark member is self-contaminated; some non-members too
        assert all(got[k][2] for k in got if k % 97 == 0)


class TestEmbeddingDecontam:
    @pytest.fixture(scope="class")
    def vecs(self, spark):
        # corpus: 0 = exact copy of bench item, 1 = scaled copy (cosine 1),
        # 2 = orthogonal, 3 = close-but-under-threshold direction
        corpus = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 2.0, 0.0, 0.0]),
            (2, [0.0, 0.0, 1.0, 0.0]),
            (3, [1.0, 1.0, 0.0, 0.0]),
        ]
        bench = [
            (100, [1.0, 0.0, 0.0, 0.0]),
            (101, [0.0, 1.0, 0.0, 0.0]),
        ]
        mk = lambda rows: spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")
        return mk(corpus).cache(), mk(bench).cache()

    def test_flags_and_max_sim(self, vecs):
        from spider_spark.operators.decontam import embedding_decontam

        corpus, bench = vecs
        got = {r["vec_id"]: r for r in
               embedding_decontam(corpus, bench, threshold=0.95).collect()}
        assert got[0]["contaminated"] and got[0]["max_bench_sim"] == 1.0
        assert got[1]["contaminated"] and got[1]["max_bench_sim"] == 1.0
        assert not got[2]["contaminated"] and got[2]["max_bench_sim"] == 0.0
        # cos([1,1], [1,0]) = 1/sqrt(2) ~ 0.707107 < 0.95
        assert not got[3]["contaminated"]
        assert abs(got[3]["max_bench_sim"] - 0.707107) < 1e-9
        assert len(got) == 4  # every corpus row reported

    def test_sql_mirror_bit_exact(self, vecs):
        from spider_spark.operators.decontam import (
            embedding_decontam, embedding_decontam_sql)

        corpus, bench = vecs
        spark_rows = sorted(
            tuple(r) for r in
            embedding_decontam(corpus, bench, threshold=0.95).collect()
        )
        con = duckdb.connect()
        con.register("corpus", corpus.toPandas())
        con.register("bench", bench.toPandas())
        duck_rows = sorted(con.execute(
            embedding_decontam_sql("corpus", "bench", threshold=0.95, dim=4)
        ).fetchall())
        assert spark_rows == duck_rows
