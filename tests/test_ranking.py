"""Two-phase global ranking: range mode vs bucket mode equivalence.

The crawl's admission order (L2 / quirk Q2 pinned BFS) rides on
with_global_rank; bucket mode additionally promises that the input is
evaluated exactly once (no range-sampling job) when given a bucket
expression monotone in the order key. These tests pin:

* rank values == a driver-side sort of the same data (both modes),
* start offsets and with_count,
* the contiguity guard fires on a NON-monotone bucket expression instead
  of silently mis-ranking.
"""

import pytest
from pyspark.sql import functions as F

from spider_spark.operators.ranking import with_global_rank


def _mk(spark, n=500, seed=7):
    import random

    rng = random.Random(seed)
    # (depth, parent_rank, link_pos) strict total order: make triples unique
    triples = set()
    while len(triples) < n:
        triples.add((rng.randint(1, 4), rng.randint(0, 99), rng.randint(0, 999)))
    rows = [(f"u{i}", d, p, l) for i, (d, p, l) in enumerate(sorted(triples))]
    rng.shuffle(rows)
    return spark.createDataFrame(
        rows, "canon_url string, depth int, parent_rank long, link_pos int"
    ).repartition(7)


ORDER = ["depth", "parent_rank", "link_pos"]


def _expected(df, start=0):
    rows = sorted(df.collect(), key=lambda r: (r.depth, r.parent_rank, r.link_pos))
    return {r.canon_url: start + i for i, r in enumerate(rows)}


class TestBucketMode:
    def _bucket(self, nb=32, max_rank=100):
        return F.expr(
            f"depth * {nb}L + ((parent_rank * {nb}L) div {max_rank}L)"
        )

    def test_matches_range_mode_and_driver_sort(self, spark):
        df = _mk(spark)
        want = _expected(df, start=1000)
        got_b, n_b = with_global_rank(
            df, ORDER, "rk", start=1000, with_count=True,
            bucket_expr=self._bucket(),
        )
        got_r, n_r = with_global_rank(
            df, ORDER, "rk", start=1000, with_count=True
        )
        assert n_b == n_r == len(want)
        assert {r.canon_url: r.rk for r in got_b.collect()} == want
        assert {r.canon_url: r.rk for r in got_r.collect()} == want

    def test_single_bucket_degenerate(self, spark):
        # every row in one bucket → one partition ranks everything; still
        # exact (this is the tiny-round case, where balance is irrelevant)
        df = _mk(spark, n=60)
        got = with_global_rank(df, ORDER, "rk", bucket_expr=F.lit(0))
        assert {r.canon_url: r.rk for r in got.collect()} == _expected(df)

    def test_empty_input(self, spark):
        df = _mk(spark).limit(0)
        got, n = with_global_rank(
            df, ORDER, "rk", with_count=True, bucket_expr=self._bucket()
        )
        assert n == 0 and got.count() == 0

    def test_bucket_mode_skips_the_sampling_job(self, spark):
        # the whole point of bucket mode: hash partitioning has no
        # boundary-sampling pass, so ranking the same input submits
        # strictly fewer Spark jobs than range mode (which samples the
        # input once before shuffling it)
        sc = spark.sparkContext

        def count_jobs(tag, fn):
            sc.setJobGroup(tag, tag)
            try:
                fn()
            finally:
                sc.setLocalProperty("spark.jobGroup.id", None)
            return len(sc.statusTracker().getJobIdsForGroup(tag))

        df = _mk(spark).localCheckpoint(eager=True)
        nb = count_jobs(
            "rank-bucket",
            lambda: with_global_rank(df, ORDER, "rk", bucket_expr=self._bucket()),
        )
        nr = count_jobs(
            "rank-range", lambda: with_global_rank(df, ORDER, "rk")
        )
        # exact counts depend on AQE's per-shuffle-stage jobs; the claim
        # under test is relative: range mode pays the boundary-sampling
        # job(s) on top of whatever bucket mode submits
        assert nr > nb, f"range mode ({nr} jobs) should exceed bucket ({nb})"

    def test_non_monotone_bucket_fails_loudly(self, spark):
        # a bucket NOT monotone in the order key interleaves two buckets
        # inside a sorted partition → the contiguity guard must fire
        df = _mk(spark, n=200)
        bad = F.pmod(F.xxhash64("canon_url"), F.lit(5))
        with pytest.raises(AssertionError, match="non-contiguous"):
            with_global_rank(df, ORDER, "rk", bucket_expr=bad).collect()
