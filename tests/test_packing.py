"""Deterministic concat-and-chop sequence packing."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from spider_spark.operators.dedupe import md5_60
from spider_spark.operators.packing import pack_sequences, pack_sequences_sql


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [("g0", f"k{i:03d}", 100 + (i * 37) % 900) for i in range(50)]
    rows += [("g1", f"q{i}", 4000 + i) for i in range(5)]   # docs near seq_len
    rows += [("g2", "solo", 9001)]                          # doc longer than seq_len
    return spark.createDataFrame(rows, "grp string, key string, w long").cache()


SEQ = 4096


class TestPackSequences:
    def _naive(self, df):
        w = (
            Window.partitionBy("grp")
            .orderBy(md5_60(F.col("key")).asc(), F.col("key").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        start = (F.sum("w").over(w) - F.col("w")).cast("long")
        return df.withColumn("_s", start).select(
            "grp", "key", "w",
            F.expr(f"_s div {SEQ}").alias("seq_id"),
            (F.col("_s") % SEQ).alias("seq_offset"),
        )

    def test_matches_naive_reference(self, spark, corpus):
        got = {tuple(r) for r in pack_sequences(corpus, "grp", "key", "w", SEQ).collect()}
        want = {tuple(r) for r in self._naive(corpus).collect()}
        assert got == want

    def test_bucket_count_and_layout_invariant(self, spark, corpus):
        a = {tuple(r) for r in pack_sequences(corpus, "grp", "key", "w", SEQ, n_buckets=4).collect()}
        b = {tuple(r) for r in pack_sequences(corpus.repartition(13), "grp", "key", "w", SEQ, n_buckets=256).collect()}
        assert a == b

    def test_matches_duckdb_mirror(self, spark, corpus):
        got = {tuple(r) for r in
               pack_sequences(corpus, "grp", "key", "w", SEQ)
               .select("grp", "key", "w", "seq_id", "seq_offset").collect()}
        con = duckdb.connect()
        con.register("t", corpus.toPandas())
        sql = pack_sequences_sql("grp", "key", "w", SEQ, "grp, key, w", table="t")
        want = set(con.execute(sql).fetchall())
        assert got == want

    def test_packing_invariants(self, spark, corpus):
        out = pack_sequences(corpus, "grp", "key", "w", SEQ).collect()
        for r in out:
            assert 0 <= r["seq_offset"] < SEQ
            assert r["seq_id"] >= 0
        # group stream is gapless: per group, sum of weights == last start + last w
        for g in ("g0", "g1", "g2"):
            rows = sorted(
                (x for x in out if x["grp"] == g),
                key=lambda x: (x["seq_id"], x["seq_offset"]),
            )
            pos = 0
            for x in rows:
                assert x["seq_id"] * SEQ + x["seq_offset"] == pos
                pos += x["w"]

    def test_first_doc_of_each_group_starts_at_zero(self, spark, corpus):
        out = pack_sequences(corpus, "grp", "key", "w", SEQ)
        firsts = out.groupBy("grp").agg(
            F.min(F.col("seq_id") * SEQ + F.col("seq_offset")).alias("m")
        ).collect()
        assert all(r["m"] == 0 for r in firsts)

    def test_rejects_bad_args(self, corpus):
        with pytest.raises(ValueError):
            pack_sequences(corpus, "grp", "key", "w", 0)
        with pytest.raises(ValueError):
            pack_sequences(corpus, "grp", "key", "w", SEQ, n_buckets=12)


class TestChunkDocuments:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        def words(n):
            return " ".join(f"w{i}" for i in range(1, n + 1))
        rows = [
            (0, words(10)),  # chunk=6, overlap=2 → starts 1,5 (cap at 8)
            (1, words(11)),  # starts 1,5,9 — trailing window adds w11
            (2, words(4)),   # short doc → one chunk
            (3, ""),         # empty → none
        ]
        return spark.createDataFrame(rows, "doc_id long, text string").cache()

    def test_emission_rule_and_windows(self, spark, docs):
        from spider_spark.operators.packing import chunk_documents

        got = {
            (r["doc_id"], r["chunk_idx"]): (r["n_words"], r["chunk_text"])
            for r in chunk_documents(docs, chunk_words=6, overlap=2).collect()
        }
        assert got[(0, 0)] == (6, "w1 w2 w3 w4 w5 w6")
        assert got[(0, 1)] == (6, "w5 w6 w7 w8 w9 w10")
        assert (0, 2) not in got, "window at s=9 adds nothing over s=5 for len=10"
        assert got[(1, 2)] == (3, "w9 w10 w11"), "len=11 trailing window adds w11"
        assert got[(2, 0)] == (4, "w1 w2 w3 w4")
        assert all(k[0] != 3 for k in got), "empty doc yields no chunks"

    def test_overlap_invariant(self, spark, docs):
        from spider_spark.operators.packing import chunk_documents

        rows = chunk_documents(docs, chunk_words=6, overlap=2).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(
                (r["chunk_idx"], r["chunk_text"].split())
            )
        for _, chunks in by_doc.items():
            chunks.sort()
            for (_, a), (_, b) in zip(chunks, chunks[1:]):
                assert a[-2:] == b[:2], "consecutive chunks share the overlap"

    def test_matches_duckdb_mirror(self, spark, docs):
        import duckdb

        from spider_spark.operators.packing import (
            chunk_documents,
            chunk_documents_sql,
        )

        got = sorted(tuple(r) for r in
                     chunk_documents(docs, chunk_words=6, overlap=2).collect())
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        want = sorted(tuple(r) for r in con.execute(
            chunk_documents_sql(chunk_words=6, overlap=2)).fetchall())
        assert got == want

    def test_no_shuffle_no_python(self, docs):
        from spider_spark.operators.packing import chunk_documents

        plan = (
            chunk_documents(docs, chunk_words=6, overlap=2)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, "chunking is scan-local"
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_rejects_bad_params(self, docs):
        from spider_spark.operators.packing import chunk_documents

        with pytest.raises(ValueError):
            chunk_documents(docs, chunk_words=4, overlap=4)


class TestEpochOrder:
    def test_dense_permutation_and_determinism(self, spark):
        from spider_spark.operators.packing import epoch_order

        df = spark.range(500).withColumnRenamed("id", "doc_id")
        out = epoch_order(df, seed=7, epoch=0)
        pos = [r["position"] for r in out.collect()]
        assert sorted(pos) == list(range(500))
        # pure function of (seed, epoch, id): repartitioning changes nothing
        again = {r["doc_id"]: r["position"]
                 for r in epoch_order(df.repartition(13), seed=7,
                                      epoch=0).collect()}
        assert again == {r["doc_id"]: r["position"] for r in out.collect()}

    def test_epochs_and_seeds_decorrelate(self, spark):
        from spider_spark.operators.packing import epoch_order

        df = spark.range(300).withColumnRenamed("id", "doc_id")

        def perm(seed, epoch):
            return {r["doc_id"]: r["position"] for r in
                    epoch_order(df, seed=seed, epoch=epoch).collect()}

        p00, p01, p10 = perm(0, 0), perm(0, 1), perm(1, 0)
        same01 = sum(p00[i] == p01[i] for i in range(300))
        same10 = sum(p00[i] == p10[i] for i in range(300))
        # unrelated permutations agree on ~1 fixed point in expectation
        assert same01 < 10 and same10 < 10
        assert sorted(p01.values()) == list(range(300))

    def test_sql_mirror_bit_exact(self, spark):
        from spider_spark.operators.packing import epoch_order, epoch_order_sql

        import duckdb

        df = spark.range(200).withColumnRenamed("id", "doc_id")
        spark_rows = sorted(
            (r["doc_id"], r["position"])
            for r in epoch_order(df, seed=3, epoch=2).collect())
        con = duckdb.connect()
        con.register("eo", df.toPandas())
        duck_rows = sorted(map(tuple, con.execute(epoch_order_sql(
            seed=3, epoch=2, table="eo")).fetchall()))
        assert spark_rows == duck_rows

    def test_rejects_bad_buckets(self, spark):
        from spider_spark.operators.packing import epoch_order

        df = spark.range(5).withColumnRenamed("id", "doc_id")
        with pytest.raises(ValueError):
            epoch_order(df, n_buckets=48)
