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


class TestBroadcastLifecycle:
    def test_filter_unseen_registers_and_destroy_clears(self, spark):
        """VERDICT r2 next-2: probe broadcasts are tracked on the filter and
        destroyable once the probe's jobs ran; materialized outputs stay
        evaluable after destroy."""
        seen = _keys(spark, 0, 500)
        cand = _keys(spark, 400, 700)
        bloom = build_bloom(seen, "k", n_shards=4)
        ckpt = lambda df: df.localCheckpoint(eager=True)  # noqa: E731
        out = filter_unseen(cand, "k", seen, bloom, materialize=ckpt)
        assert len(bloom._live_bcasts) == 4
        assert bloom.destroy_broadcasts() == 4
        assert bloom._live_bcasts == []
        # both branches were checkpointed inside filter_unseen: the result
        # never re-runs the probe UDF, so it survives the destroy
        assert out.count() == 200

    def test_engine_keeps_live_broadcasts_bounded(self, spark):
        """Across a multi-round crawl the outstanding broadcast count stays
        O(n_shards): each round's handles are destroyed inside the round
        (a 1000-round crawl would otherwise leak ~filter-size × rounds)."""
        import spider_spark.operators.bloom as bm
        from spider_spark.plans.crawl import CrawlConfig, CrawlEngine
        from spider_spark.sources.pages import synthetic_pages

        peak = {"live": 0, "registered": 0, "destroyed": 0}
        orig_reg = bm.ShardedBloom.register_broadcasts
        orig_des = bm.ShardedBloom.destroy_broadcasts

        def reg(self, handles):
            orig_reg(self, handles)
            peak["registered"] += len(handles)
            peak["live"] = max(peak["live"], len(self._live_bcasts))

        def des(self):
            n = orig_des(self)
            peak["destroyed"] += n
            return n

        bm.ShardedBloom.register_broadcasts = reg
        bm.ShardedBloom.destroy_broadcasts = des
        try:
            pages = synthetic_pages(spark, 300).localCheckpoint(eager=True)
            eng = CrawlEngine(
                spark, pages,
                CrawlConfig(depth=6, bloom_shards=2, verify_text=False),
            )
            res = eng.crawl("https://h0.example/d/0")
            rounds = len(res.metrics)
            assert rounds >= 3  # multi-round crawl, or the test proves nothing
        finally:
            bm.ShardedBloom.register_broadcasts = orig_reg
            bm.ShardedBloom.destroy_broadcasts = orig_des
        assert peak["registered"] >= 2 * rounds  # one generation per round...
        assert peak["destroyed"] == peak["registered"]  # ...every one destroyed
        assert peak["live"] <= 2  # never more than one generation outstanding
