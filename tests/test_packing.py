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
