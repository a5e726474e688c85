"""Spark-level tests of the sharded bloom seen-set prefilter (D1/H3):
distributed build, per-shard probe, and exactness of filter_unseen."""

from pyspark.sql import functions as F

from spider_spark.operators.bloom import build_bloom, filter_unseen


def _keys(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("k")
    )


class TestShardedBuildAndProbe:
    def test_build_counts_and_exact_filtering(self, spark):
        seen = _keys(spark, 0, 1000)
        bloom = build_bloom(seen, "k", fpp=0.01, n_shards=4)
        assert bloom.n_shards == 4
        assert bloom.n_items == 1000  # exact count from the fill pass
        assert not bloom.saturated

        # candidates overlap the seen set half-and-half; the output must be
        # exactly the unseen half regardless of bloom false positives
        cand = _keys(spark, 500, 1500)
        out = filter_unseen(cand, "k", seen, bloom)
        got = sorted(r["k"] for r in out.collect())
        assert got == sorted(f"u{i}" for i in range(1000, 1500))

    def test_single_shard_equivalent(self, spark):
        seen = _keys(spark, 0, 300)
        cand = _keys(spark, 200, 400)
        one = filter_unseen(cand, "k", seen, build_bloom(seen, "k", n_shards=1))
        four = filter_unseen(cand, "k", seen, build_bloom(seen, "k", n_shards=4))
        assert {r["k"] for r in one.collect()} == {r["k"] for r in four.collect()}
