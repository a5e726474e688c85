"""Exact grouped quantiles: histogram + rational thresholds."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from spider_spark.operators.quantiles import (
    DEFAULT_QS,
    exact_group_quantiles,
    exact_group_quantiles_sql,
    qdigest_build,
    qdigest_merge,
    qdigest_quantiles,
    qdigest_quantiles_sql,
)


def _py_quantile(values, num, den):
    """Independent type-1 quantile: smallest v with cum·den ≥ num·tot."""
    from collections import Counter

    cnt = Counter(values)
    tot = len(values)
    cum = 0
    for v in sorted(cnt):
        cum += cnt[v]
        if cum * den >= num * tot:
            return v
    raise AssertionError("unreachable for num ≤ den")


@pytest.fixture(scope="module")
def data(spark):
    rows = []
    # g0: values 1..100 once each (textbook percentiles)
    rows += [("g0", v) for v in range(1, 101)]
    # g1: heavy ties — 90× value 5, 10× value 50
    rows += [("g1", 5)] * 90 + [("g1", 50)] * 10
    # g2: single row
    rows += [("g2", 7)]
    # g3: negatives + nulls
    rows += [("g3", v) for v in (-10, -5, 0, 5, 10)]
    rows += [("g3", None)] * 3
    return spark.createDataFrame(rows, "grp string, v long").cache()


class TestExactGroupQuantiles:
    def test_matches_independent_python(self, spark, data):
        got = {
            (r["grp"], r["quantile"]): r["value"]
            for r in exact_group_quantiles(data, "grp", "v").collect()
        }
        raw = data.filter(F.col("v").isNotNull()).collect()
        by_g = {}
        for r in raw:
            by_g.setdefault(r["grp"], []).append(r["v"])
        for g, vals in by_g.items():
            for label, (num, den) in DEFAULT_QS.items():
                assert got[(g, label)] == _py_quantile(vals, num, den), (
                    g, label)

    def test_textbook_values(self, spark, data):
        got = {
            (r["grp"], r["quantile"]): r["value"]
            for r in exact_group_quantiles(data, "grp", "v").collect()
        }
        assert got[("g0", "p25")] == 25
        assert got[("g0", "p50")] == 50
        assert got[("g0", "p95")] == 95
        # ties: p50 and p75 both land on the heavy value
        assert got[("g1", "p50")] == 5
        assert got[("g1", "p95")] == 50
        # singleton group: every quantile is the one value
        assert all(got[("g2", q)] == 7 for q in DEFAULT_QS)
        # negatives order correctly: ceil(5/4) = 2nd smallest of 5
        assert got[("g3", "p25")] == -5
        assert got[("g3", "p50")] == 0

    def test_custom_rationals_and_validation(self, spark, data):
        got = {
            (r["grp"], r["quantile"]): r["value"]
            for r in exact_group_quantiles(
                data, "grp", "v", {"min": (1, 1000000), "max": (1, 1)}
            ).collect()
        }
        assert got[("g0", "min")] == 1 and got[("g0", "max")] == 100
        with pytest.raises(ValueError):
            exact_group_quantiles(data, "grp", "v", {})
        with pytest.raises(ValueError):
            exact_group_quantiles(data, "grp", "v", {"bad": (3, 2)})

    def test_matches_duckdb_mirror(self, spark, data):
        got = {
            tuple(r)
            for r in exact_group_quantiles(data, "grp", "v").collect()
        }
        con = duckdb.connect()
        con.register("t", data.toPandas())
        want = set(
            con.execute(exact_group_quantiles_sql("grp", "v", table="t"))
            .fetchall()
        )
        assert got == want

    def test_no_python_nodes_one_histogram_shuffle(self, spark, data):
        plan = exact_group_quantiles(data, "grp", "v")._jdf.queryExecution(
        ).executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def _rank(values, v):
    """Rank of v in the multiset: |{x : x ≤ v}|."""
    return sum(1 for x in values if x <= v)


class TestQDigest:
    """q-digest: deterministic mergeable quantile sketch."""

    BITS, K = 7, 5

    @pytest.fixture(scope="class")
    def digest(self, spark, data):
        # g3 has negatives — outside the [0, 2^bits) domain by design
        return qdigest_build(data.filter("grp != 'g3'"), "grp", "v",
                             k=self.K, bits=self.BITS).cache()

    def test_mass_conserved(self, spark, data, digest):
        got = {r["grp"]: r["m"] for r in
               digest.groupBy("grp").agg(F.sum("cnt").alias("m")).collect()}
        want = {r["grp"]: r["m"] for r in
                data.filter("v is not null and grp != 'g3'").groupBy("grp")
                .agg(F.count("*").alias("m")).collect()}
        assert got == want

    def test_small_groups_exact(self, spark, data, digest):
        # n < k ⇒ thr = 0 ⇒ no compression ⇒ exact type-1 quantiles
        got = {(r["grp"], r["quantile"]): r["value"]
               for r in qdigest_quantiles(digest, "grp").collect()}
        for label, (num, den) in DEFAULT_QS.items():
            assert got[("g2", label)] == 7

    def test_rank_error_bound(self, spark):
        # meaningful bound needs n ≫ k·bits: 4096 values, k=512, bits=12
        # ⇒ thr = 8, bound = 96 ranks (2.3% of n)
        n, bits, k = 4096, 12, 512
        df = spark.createDataFrame([("g", v) for v in range(n)],
                                   "grp string, v long")
        dig = qdigest_build(df, "grp", "v", k=k, bits=bits)
        # classical size bound: ≤ 3k nodes per group
        assert dig.count() <= 3 * k
        got = {r["quantile"]: r["value"]
               for r in qdigest_quantiles(dig, "grp").collect()}
        vals = list(range(n))
        bound = bits * (n // k)
        for label, (num, den) in DEFAULT_QS.items():
            err = abs(_rank(vals, got[label]) - num * n / den)
            assert err <= bound, (label, got[label], err, bound)

    def test_merge_commutative_and_bounded(self, spark, data):
        pool = data.filter("grp != 'g3'")
        a_df = pool.filter("grp != 'g0' or v % 2 = 0")
        b_df = pool.filter("grp = 'g0' and v % 2 = 1")
        a = qdigest_build(a_df, "grp", "v", k=self.K, bits=self.BITS)
        b = qdigest_build(b_df, "grp", "v", k=self.K, bits=self.BITS)
        m1 = qdigest_merge(a, b, k=self.K, bits=self.BITS)
        m2 = qdigest_merge(b, a, k=self.K, bits=self.BITS)
        assert sorted(map(tuple, m1.collect())) == \
            sorted(map(tuple, m2.collect()))
        # merged mass == full-data mass, bound holds vs the union multiset
        assert m1.filter("grp = 'g0'").agg(F.sum("cnt")).first()[0] == 100
        got = {(r["grp"], r["quantile"]): r["value"]
               for r in qdigest_quantiles(m1, "grp").collect()}
        vals = list(range(1, 101))
        bound = self.BITS * (100 // self.K)
        for label, (num, den) in DEFAULT_QS.items():
            err = abs(_rank(vals, got[("g0", label)]) - num * 100 / den)
            assert err <= bound, (label, err, bound)

    def test_matches_duckdb_mirror(self, spark, data, digest):
        got = {tuple(r) for r in qdigest_quantiles(digest, "grp")
               .filter("grp != 'g3'").collect()}
        con = duckdb.connect()
        con.register("t", data.filter("grp != 'g3'").toPandas())
        want = set(con.execute(qdigest_quantiles_sql(
            "grp", "v", self.K, self.BITS, table="t")).fetchall())
        assert got == want

    def test_validation(self, spark, data):
        with pytest.raises(ValueError):
            qdigest_build(data, "grp", "v", k=0, bits=7)
        with pytest.raises(ValueError):
            qdigest_build(data, "grp", "v", k=5, bits=0)
        with pytest.raises(ValueError):
            qdigest_build(data, "grp", "v", k=5, bits=63)
        with pytest.raises(ValueError, match="outside"):
            # g3 has negatives — out of the [0, 2^bits) domain
            qdigest_build(data.filter("grp = 'g3'"), "grp", "v",
                          k=5, bits=7)

    def test_plan_shape(self, spark, data, digest):
        # bits ≤ split ⇒ ONE subtree-keyed Arrow pass builds the digest;
        # extraction adds no Python nodes of its own (JVM window + join)
        raw = qdigest_build(data.filter("grp != 'g3'"), "grp", "v",
                            k=self.K, bits=self.BITS, checkpoint=False)
        plan = raw._jdf.queryExecution().executedPlan().toString()
        assert plan.count("FlatMapGroupsInPandas") == 1
        q_plan = qdigest_quantiles(digest, "grp")._jdf.queryExecution(
        ).executedPlan().toString()
        assert "ArrowEvalPython" not in q_plan
        assert "BatchEvalPython" not in q_plan
        assert "FlatMapGroupsInPandas" not in q_plan

    def test_two_phase_above_split(self, spark):
        # bits > split exercises the group-keyed top pass: force a tiny
        # split boundary by using bits = 22 (> _QDIGEST_SPLIT = 20)
        df = spark.createDataFrame(
            [("g", v * 4096 + 7) for v in range(512)], "grp string, v long")
        dig = qdigest_build(df, "grp", "v", k=64, bits=22)
        # uncheckpointed plan: phase-1 kernel appears under BOTH fin splits
        # plus the phase-2 kernel = 3 (the default eager checkpoint is what
        # collapses phase 1 to a single execution)
        plan = qdigest_build(df, "grp", "v", k=64, bits=22, checkpoint=False
                             )._jdf.queryExecution().executedPlan().toString()
        assert plan.count("FlatMapGroupsInPandas") == 3
        assert dig.agg(F.sum("cnt")).first()[0] == 512
        got = {r["quantile"]: r["value"]
               for r in qdigest_quantiles(dig, "grp").collect()}
        vals = [v * 4096 + 7 for v in range(512)]
        bound = 22 * (512 // 64)
        for label, (num, den) in DEFAULT_QS.items():
            err = abs(_rank(vals, got[label]) - num * 512 / den)
            assert err <= bound, (label, err, bound)
