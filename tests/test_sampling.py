"""Deterministic sampling operators: quotas + weight budgets."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from spider_spark.operators.dedupe import md5_60
from spider_spark.operators.sampling import (
    stratified_sample,
    stratified_sample_sql,
    temperature_mix_sample,
    temperature_mix_sample_sql,
    token_budget_sample,
    token_budget_sample_sql,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # skewed groups: g0 has 60 rows, g1 has 7, g2 has 1
    rows = [(f"g0", f"k{i:03d}", 10 + i % 17) for i in range(60)]
    rows += [("g1", f"q{i}", 25) for i in range(7)]
    rows += [("g2", "solo", 999)]
    return spark.createDataFrame(rows, "grp string, key string, w long").cache()


def _naive_topn(df, n):
    w = Window.partitionBy("grp").orderBy(md5_60(F.col("key")).asc(), F.col("key").asc())
    return df.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= n).drop("_r")


class TestStratifiedSample:
    def test_matches_naive_reference(self, spark, corpus):
        for n in (1, 5, 10):
            got = {tuple(r) for r in stratified_sample(corpus, "grp", "key", n).collect()}
            want = {tuple(r) for r in _naive_topn(corpus, n).collect()}
            assert got == want, f"n={n}"

    def test_quotas_exact_and_small_groups_whole(self, spark, corpus):
        out = stratified_sample(corpus, "grp", "key", 10).groupBy("grp").count()
        got = {r["grp"]: r["count"] for r in out.collect()}
        assert got == {"g0": 10, "g1": 7, "g2": 1}

    def test_partition_layout_invariant(self, spark, corpus):
        a = {tuple(r) for r in stratified_sample(corpus, "grp", "key", 5).collect()}
        b = {
            tuple(r)
            for r in stratified_sample(corpus.repartition(13), "grp", "key", 5, salt=3).collect()
        }
        assert a == b

    def test_matches_duckdb_mirror(self, spark, corpus):
        got = {tuple(r) for r in stratified_sample(corpus, "grp", "key", 4).collect()}
        con = duckdb.connect()
        con.register("t", corpus.toPandas())
        sql = stratified_sample_sql("grp", "key", 4, "grp, key, w", table="t")
        want = set(con.execute(sql).fetchall())
        assert got == want

    def test_rejects_bad_quota(self, corpus):
        with pytest.raises(ValueError):
            stratified_sample(corpus, "grp", "key", 0)


class TestTokenBudgetSample:
    def _naive(self, df, budget):
        w = (
            Window.partitionBy("grp")
            .orderBy(md5_60(F.col("key")).asc(), F.col("key").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            df.withColumn("_c", F.sum("w").over(w))
            .filter(F.col("_c") - F.col("w") < budget)
            .drop("_c")
        )

    def test_matches_naive_reference(self, spark, corpus):
        for budget in (1, 50, 200, 10_000):
            got = {
                tuple(r)
                for r in token_budget_sample(corpus, "grp", "key", "w", budget).collect()
            }
            want = {tuple(r) for r in self._naive(corpus, budget).collect()}
            assert got == want, f"budget={budget}"

    def test_crossing_row_included_first_row_always_kept(self, spark, corpus):
        # budget 1: the first row in hash order of EVERY group is kept
        # (cum - w = 0 < 1), even when its weight alone exceeds the budget
        out = token_budget_sample(corpus, "grp", "key", "w", 1)
        got = {r["grp"]: r["count"] for r in out.groupBy("grp").count().collect()}
        assert got == {"g0": 1, "g1": 1, "g2": 1}

    def test_bucket_count_invariant(self, spark, corpus):
        a = {
            tuple(r)
            for r in token_budget_sample(corpus, "grp", "key", "w", 120, n_buckets=4).collect()
        }
        b = {
            tuple(r)
            for r in token_budget_sample(corpus, "grp", "key", "w", 120, n_buckets=256).collect()
        }
        assert a == b

    def test_matches_duckdb_mirror(self, spark, corpus):
        got = {
            tuple(r)
            for r in token_budget_sample(corpus, "grp", "key", "w", 150).collect()
        }
        con = duckdb.connect()
        con.register("t", corpus.toPandas())
        sql = token_budget_sample_sql("grp", "key", "w", 150, "grp, key, w", table="t")
        want = set(con.execute(sql).fetchall())
        assert got == want

    def test_rejects_non_power_of_two_buckets(self, corpus):
        with pytest.raises(ValueError):
            token_budget_sample(corpus, "grp", "key", "w", 10, n_buckets=12)


class TestTemperatureMix:
    """temperature_mix_sample: √n source flattening with exact integer
    keep thresholds — a pure function of (source counts, row key)."""

    @pytest.fixture(scope="class")
    def mix(self, spark):
        # heavily skewed source sizes: 400 / 49 / 4
        rows = [("head", f"h{i:04d}") for i in range(400)]
        rows += [("mid", f"m{i:03d}") for i in range(49)]
        rows += [("tail", f"t{i}") for i in range(4)]
        return spark.createDataFrame(rows, "src string, key string").cache()

    @staticmethod
    def _py_reference(rows, budget):
        """Independent Python replay: exact integer thresholds +
        hashlib md5 (not the Spark expression)."""
        import hashlib
        import math
        from collections import Counter

        counts = Counter(s for s, _ in rows)
        big_w = sum(int(math.sqrt(n)) for n in counts.values())
        two60 = 1 << 60
        thr = {
            s: min(two60, (two60 * budget * int(math.sqrt(n))) // (big_w * n))
            for s, n in counts.items()
        }
        return {
            (s, k)
            for s, k in rows
            if int(hashlib.md5(k.encode()).hexdigest()[:15], 16) < thr[s]
        }

    def test_matches_python_reference(self, spark, mix):
        rows = [(r["src"], r["key"]) for r in mix.collect()]
        for budget in (10, 100, 450):
            got = {
                tuple(r)
                for r in temperature_mix_sample(mix, "src", "key", budget).collect()
            }
            assert got == self._py_reference(rows, budget), f"budget={budget}"

    def test_matches_duckdb_mirror(self, spark, mix):
        got = {
            tuple(r)
            for r in temperature_mix_sample(mix, "src", "key", 120).collect()
        }
        con = duckdb.connect()
        con.register("t", mix.toPandas())
        sql = temperature_mix_sample_sql("src", "key", 120, "src, key", table="t")
        want = set(con.execute(sql).fetchall())
        assert got == want

    def test_small_sources_taken_whole_tails_upsampled(self, spark, mix):
        # budget 120 over sizes 400/49/4 (w = 20/7/2, W = 29):
        # tail allotment = 120·2/29 ≈ 8.3 > 4  → kept whole;
        # head keep-rate ≈ 120·20/(29·400) ≈ 0.207 ≪ proportional (400/453).
        out = temperature_mix_sample(mix, "src", "key", 120)
        by = {r["src"]: r["count"] for r in out.groupBy("src").count().collect()}
        assert by.get("tail", 0) == 4
        assert 0 < by["head"] < 400
        # flattening: head's keep-rate is strictly below mid's and tail's
        assert by["head"] / 400 < by["mid"] / 49 < by.get("tail", 0) / 4

    def test_budget_monotone_and_deterministic(self, spark, mix):
        small = {
            tuple(r)
            for r in temperature_mix_sample(mix, "src", "key", 50).collect()
        }
        big = {
            tuple(r)
            for r in temperature_mix_sample(mix, "src", "key", 300).collect()
        }
        again = {
            tuple(r)
            for r in temperature_mix_sample(
                mix.repartition(7), "src", "key", 50
            ).collect()
        }
        assert small <= big
        assert small == again

    def test_huge_budget_keeps_everything(self, spark, mix):
        assert temperature_mix_sample(mix, "src", "key", 10**6).count() == mix.count()
