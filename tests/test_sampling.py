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


class TestPrioritySample:
    """Priority sampling (Duffield-Lund-Thorup): integer-exact weighted
    sampling without replacement with unbiased subset-sum estimators."""

    def _naive(self, rows, k, grouped=True):
        """Pure-Python reference of the integer spec."""
        import hashlib

        from spider_spark.operators.sampling import PS_MAX_W, PS_U_RES

        def h60(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

        by_g = {}
        for g, key, w in rows:
            gk = g if grouped else 0
            wc = max(1, min(int(w), PS_MAX_W))
            q = (wc * PS_U_RES) // ((h60(key) >> 20) + 1)
            by_g.setdefault(gk, []).append((q, key, g, wc))
        out = set()
        for gk, items in by_g.items():
            items.sort(key=lambda t: (-t[0], t[1]))
            tau = items[k][0] if len(items) > k else 0
            for q, key, g, wc in items[:k]:
                out.add((g, key, q, tau, max(wc, tau)))
        return out

    @pytest.fixture(scope="class")
    def wrows(self):
        rows = [("g0", f"k{i:03d}", 1 + (i * 37) % 500) for i in range(80)]
        rows += [("g1", f"q{i}", 10**9 if i == 0 else 3) for i in range(6)]
        rows += [("g2", "solo", 0)]  # weight 0 → clamped to 1
        return rows

    @pytest.fixture(scope="class")
    def wdf(self, spark, wrows):
        return spark.createDataFrame(
            wrows, "grp string, key string, w long"
        ).cache()

    def test_matches_integer_spec(self, spark, wdf, wrows):
        from spider_spark.operators.sampling import priority_sample

        for k in (1, 5, 20):
            got = {
                (r["grp"], r["key"], r["priority"], r["tau"], r["est_weight"])
                for r in priority_sample(wdf, "key", "w", k, "grp").collect()
            }
            assert got == self._naive(wrows, k), f"k={k}"

    def test_ungrouped_and_layout_invariant(self, spark, wdf, wrows):
        from spider_spark.operators.sampling import priority_sample

        got = {
            (r["grp"], r["key"], r["priority"], r["tau"], r["est_weight"])
            for r in priority_sample(
                wdf.repartition(11), "key", "w", 7, salt=3
            ).collect()
        }
        assert got == self._naive(wrows, 7, grouped=False)

    def test_small_group_kept_whole_tau_zero(self, spark, wdf):
        from spider_spark.operators.sampling import priority_sample

        out = priority_sample(wdf, "key", "w", 10, "grp")
        g2 = [r for r in out.collect() if r["grp"] == "g2"]
        assert len(g2) == 1 and g2[0]["tau"] == 0
        # with tau=0 the estimate is the (clamped) weight itself
        assert g2[0]["est_weight"] == 1

    def test_heavy_item_always_sampled(self, spark, wdf):
        from spider_spark.operators.sampling import priority_sample

        # g1's 10^9-weight row (clamped to 2^20) dominates every priority
        out = priority_sample(wdf, "key", "w", 1, "grp").collect()
        g1 = [r for r in out if r["grp"] == "g1"]
        assert len(g1) == 1 and g1[0]["key"] == "q0"

    def test_matches_duckdb_mirror(self, spark, wdf):
        from spider_spark.operators.sampling import (
            priority_sample,
            priority_sample_sql,
        )

        got = {
            (r["grp"], r["key"], r["w"], r["priority"],
             r["tau"], r["est_weight"])
            for r in priority_sample(wdf, "key", "w", 6, "grp").collect()
        }
        con = duckdb.connect()
        con.register("t", wdf.toPandas())
        sql = priority_sample_sql(
            "key", "w", 6, "grp, key, w", group_col="grp", table="t"
        )
        want = set(con.execute(sql).fetchall())
        assert got == want

    def test_ungrouped_mirror(self, spark, wdf):
        from spider_spark.operators.sampling import (
            priority_sample,
            priority_sample_sql,
        )

        got = {
            (r["key"], r["priority"], r["est_weight"])
            for r in priority_sample(wdf, "key", "w", 9).collect()
        }
        con = duckdb.connect()
        con.register("t", wdf.toPandas())
        sql = priority_sample_sql("key", "w", 9, "key", table="t")
        want = set(con.execute(sql).fetchall())
        # mirror emits (key, priority, tau, est); drop tau for the compare
        assert got == {(k, p, e) for k, p, _t, e in want}

    def test_subset_sum_estimator_unbiased_shape(self, spark):
        """Statistical sanity (not bit-exactness): averaged over many
        disjoint key universes, the estimated total weight of the full
        sample approaches the true total — the DLT guarantee."""
        from spider_spark.operators.sampling import priority_sample

        rows = [
            (f"u{u}", f"u{u}-k{i}", 1 + ((i * 7919 + u * 104729) % 97))
            for u in range(40)
            for i in range(30)
        ]
        df = spark.createDataFrame(rows, "grp string, key string, w long")
        true_total = sum(w for _, _, w in rows)
        est = priority_sample(df, "key", "w", 8, "grp").agg(
            F.sum("est_weight")
        ).collect()[0][0]
        assert abs(est - true_total) / true_total < 0.05
