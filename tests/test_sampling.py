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
