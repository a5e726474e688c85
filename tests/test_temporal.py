"""As-of join + deterministic hash split operators."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from spider_spark.operators.sampling import hash_split, split_column
from spider_spark.operators.temporal import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


class TestAsofJoin:
    def _run(self, spark, left_rows, right_rows):
        left = spark.createDataFrame(
            [(k, _ts(s), i) for k, s, i in left_rows],
            "user_id long, ts timestamp, l_id long",
        )
        right = spark.createDataFrame(
            [(k, _ts(s), i) for k, s, i in right_rows],
            "user_id long, ts timestamp, r_id long",
        )
        out = asof_join(left, right, key="user_id", right_payload=["r_id"])
        return {r["l_id"]: r["asof_r_id"] for r in out.collect()}

    def test_latest_at_or_before_wins(self, spark):
        got = self._run(
            spark,
            left_rows=[(1, 50, 100), (1, 10, 101), (1, 5, 102)],
            right_rows=[(1, 7, 1), (1, 20, 2), (1, 60, 3)],
        )
        # l@50 → r@20; l@10 → r@7; l@5 → nothing before it
        assert got == {100: 2, 101: 1, 102: None}

    def test_equal_timestamp_is_inclusive(self, spark):
        got = self._run(
            spark, left_rows=[(1, 10, 100)], right_rows=[(1, 10, 7)]
        )
        assert got == {100: 7}

    def test_keys_do_not_cross(self, spark):
        got = self._run(
            spark,
            left_rows=[(1, 50, 100), (2, 50, 200)],
            right_rows=[(1, 10, 1)],
        )
        assert got == {100: 1, 200: None}

    def test_duplicate_right_timestamps_deterministic(self, spark):
        # two right rows on the same (key, ts): max payload struct wins,
        # regardless of partitioning
        left = spark.createDataFrame(
            [(1, _ts(10), 100)], "user_id long, ts timestamp, l_id long"
        )
        right = spark.createDataFrame(
            [(1, _ts(5), 9), (1, _ts(5), 4)],
            "user_id long, ts timestamp, r_id long",
        ).repartition(4)
        out = asof_join(left, right, key="user_id", right_payload=["r_id"])
        assert out.collect()[0]["asof_r_id"] == 9

    def test_multiple_payload_columns_and_prefix(self, spark):
        left = spark.createDataFrame(
            [(1, _ts(10), 100)], "user_id long, ts timestamp, l_id long"
        )
        right = spark.createDataFrame(
            [(1, _ts(3), 7, 2.5)],
            "user_id long, ts timestamp, r_id long, v double",
        )
        row = asof_join(
            left, right, key="user_id",
            right_payload=["ts", "r_id", "v"], prefix="prev_",
        ).collect()[0]
        assert (row["prev_r_id"], row["prev_v"], row["prev_ts"]) == (7, 2.5, _ts(3))
        assert row["l_id"] == 100

    def test_one_shuffle_on_key(self, spark):
        left = spark.createDataFrame(
            [(1, _ts(10), 100)], "user_id long, ts timestamp, l_id long"
        )
        right = spark.createDataFrame(
            [(1, _ts(3), 7)], "user_id long, ts timestamp, r_id long"
        )
        plan = (
            asof_join(left, right, key="user_id", right_payload=["r_id"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        # window partitioning reuses one hashpartitioning(user_id) exchange
        # on the union side; no join operator appears at all
        assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


class TestHashSplit:
    def test_percentages_and_determinism(self, spark):
        df = spark.range(0, 5000).select(F.col("id").cast("string").alias("k"))
        out = hash_split(df, "k", {"train": 90, "val": 7, "test": 3})
        counts = {r["split"]: r["n"] for r in
                  out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert set(counts) == {"train", "val", "test"}
        assert abs(counts["train"] / 5000 - 0.90) < 0.02
        assert abs(counts["val"] / 5000 - 0.07) < 0.01
        # a second evaluation assigns identical labels (pure function)
        again = {r["k"]: r["split"] for r in out.collect()}
        assert {r["k"]: r["split"] for r in out.collect()} == again

    def test_rejects_bad_percentages(self, spark):
        with pytest.raises(ValueError):
            split_column(F.lit("x"), {"a": 50, "b": 49})

    def test_no_shuffle(self, spark):
        df = spark.range(0, 100).select(F.col("id").cast("string").alias("k"))
        plan = (
            hash_split(df, "k")._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
