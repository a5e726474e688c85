"""KMV distinct-count and count-min sketches (operators/sketches.py).

Covers: estimator accuracy on known cardinalities, the exact small-group
path, the mergeability contracts (sketch(A ∪ B) ≡ merge(sketch(A),
sketch(B)) for KMV's retained set, counter-wise sum for CMS), the
never-underestimates CMS guarantee, bounded sketch size, and bit-exact
DuckDB mirror parity of both SQL generators.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_estimate_sql,
    cms_merge,
    kmv_distinct,
    kmv_distinct_sql,
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)

K = 48


def _keys_df(spark, groups: dict[str, int]):
    """One row per (group, key i) with every key repeated twice — the
    distinct count per group is exactly ``groups[g]``."""
    rows = [
        (g, f"{g}-key-{i}")
        for g, n in groups.items()
        for i in range(n)
        for _ in (0, 1)
    ]
    return spark.createDataFrame(rows, "grp string, key string")


class TestKMV:
    def test_small_group_is_exact(self, spark):
        df = _keys_df(spark, {"a": 7, "b": K - 1})
        out = {
            r["grp"]: r
            for r in kmv_distinct(df, "grp", "key", k=K).collect()
        }
        assert out["a"]["est_distinct"] == 7
        assert out["a"]["sketch_size"] == 7
        assert out["b"]["est_distinct"] == K - 1

    def test_estimator_accuracy(self, spark):
        true = {"big": 5000, "mid": 800}
        df = _keys_df(spark, true)
        out = {
            r["grp"]: r["est_distinct"]
            for r in kmv_distinct(df, "grp", "key", k=K).collect()
        }
        for g, n in true.items():
            # std error ≈ 1/sqrt(k-2) ≈ 15%; the fixture is deterministic
            assert abs(out[g] - n) / n < 0.35, (g, out[g], n)

    def test_sketch_is_bounded(self, spark):
        df = _keys_df(spark, {"big": 5000})
        assert kmv_sketch(df, "grp", "key", k=K).count() == K

    def test_merge_equals_union_sketch(self, spark):
        a = _keys_df(spark, {"g": 300})
        # overlapping shard: keys 150..449 (union has 450 distinct)
        b = a.select(
            "grp", F.concat(F.lit("g-key-"),
                            (F.expr("CAST(substr(key, 7) AS INT)")
                             + 150).cast("string")).alias("key")
        )
        merged = kmv_merge(
            [kmv_sketch(a, "grp", "key", k=K),
             kmv_sketch(b, "grp", "key", k=K)],
            "grp", k=K,
        )
        direct = kmv_sketch(a.unionByName(b), "grp", "key", k=K)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )
        est = kmv_estimate(merged, "grp", K).collect()[0]
        assert abs(est["est_distinct"] - 450) / 450 < 0.35

    def test_sql_mirror_parity(self, spark):
        df = _keys_df(spark, {"a": 7, "big": 900, "mid": 120})
        got = sorted(
            map(tuple, kmv_distinct(df, "grp", "key", k=K).collect())
        )
        con = duckdb.connect()
        con.register("rel", df.toPandas())
        want = sorted(
            map(tuple,
                con.execute(
                    kmv_distinct_sql("grp", "key", K, "rel", "grp")
                ).fetchall())
        )
        assert got == want

    def test_k_validation(self, spark):
        df = _keys_df(spark, {"a": 3})
        with pytest.raises(ValueError):
            kmv_sketch(df, "grp", "key", k=1)


DEPTH, WIDTH = 4, 256


def _tokens_df(spark):
    """Zipf-ish token stream: token-i appears (40 - i) times."""
    rows = [(f"tok{i:02d}",) for i in range(40) for _ in range(40 - i)]
    return spark.createDataFrame(rows, "token string")


class TestCMS:
    def test_never_underestimates(self, spark):
        toks = _tokens_df(spark)
        sk = cms_build(toks, "token", DEPTH, WIDTH)
        exact = {
            r["token"]: r["n"]
            for r in toks.groupBy("token").agg(
                F.count(F.lit(1)).alias("n")).collect()
        }
        est = cms_estimate(
            sk, toks.select("token").distinct(), "token", DEPTH, WIDTH
        ).collect()
        n_total = sum(exact.values())
        for r in est:
            assert r["est_count"] >= exact[r["token"]]
            # generous deterministic bound: collisions ≤ total stream mass
            assert r["est_count"] <= exact[r["token"]] + n_total

    def test_sketch_is_bounded(self, spark):
        sk = cms_build(_tokens_df(spark), "token", DEPTH, WIDTH)
        assert sk.count() <= DEPTH * WIDTH
        assert sk.agg(F.sum("cnt")).collect()[0][0] == DEPTH * 820

    def test_unseen_item_estimates_zero_or_collision(self, spark):
        sk = cms_build(_tokens_df(spark), "token", DEPTH, WIDTH)
        q = spark.createDataFrame([("never-seen-token",)], "token string")
        est = cms_estimate(sk, q, "token", DEPTH, WIDTH).collect()[0]
        assert est["est_count"] >= 0  # ≥0 always; 0 unless all 4 cells collide

    def test_merge_equals_union_sketch(self, spark):
        toks = _tokens_df(spark)
        a = toks.filter(F.col("token") < "tok20")
        b = toks.filter(F.col("token") >= "tok20")
        merged = cms_merge(
            cms_build(a, "token", DEPTH, WIDTH),
            cms_build(b, "token", DEPTH, WIDTH),
        )
        direct = cms_build(toks, "token", DEPTH, WIDTH)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )

    def test_sql_mirror_parity(self, spark):
        toks = _tokens_df(spark)
        queries = toks.select("token").distinct()
        got = sorted(
            map(tuple,
                cms_estimate(
                    cms_build(toks, "token", DEPTH, WIDTH),
                    queries, "token", DEPTH, WIDTH,
                ).collect())
        )
        con = duckdb.connect()
        con.register("toks", toks.toPandas())
        con.register("qs", queries.toPandas())
        want = sorted(
            map(tuple,
                con.execute(
                    cms_estimate_sql("toks", "token", "qs", "qs.token",
                                     DEPTH, WIDTH, "token")
                ).fetchall())
        )
        assert got == want

    def test_dim_validation(self, spark):
        with pytest.raises(ValueError):
            cms_build(_tokens_df(spark), "token", depth=0)

    def test_probe_broadcasts_sketch(self, spark):
        toks = _tokens_df(spark)
        plan = cms_estimate(
            cms_build(toks, "token", DEPTH, WIDTH),
            toks.select("token").distinct(), "token", DEPTH, WIDTH,
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestHLL:
    @pytest.fixture(scope="class")
    def keyed(self, spark):
        # group g0: 5000 distinct, g1: 300, g2: 12 (exactly countable)
        rows = (
            [("g0", f"a{i}") for i in range(5000)]
            + [("g1", f"b{i}") for i in range(300)]
            + [("g2", f"c{i}") for i in range(12)]
            + [("g1", f"b{i}") for i in range(100)]  # dups change nothing
        )
        return spark.createDataFrame(rows, "grp string, k string").cache()

    def test_accuracy_within_sketch_error(self, keyed):
        from spider_spark.operators.sketches import hll_distinct

        got = {r["grp"]: r["est"] for r in
               hll_distinct(keyed, "grp", "k", p=12).collect()}
        for grp, true in [("g0", 5000), ("g1", 300), ("g2", 12)]:
            assert abs(got[grp] - true) / true < 0.06, (grp, got[grp])

    def test_raw_branch_fires_at_low_p(self, keyed):
        from spider_spark.operators.sketches import hll_distinct

        # p=4 -> m=16, threshold 2.5m=40: g0 (5000 distinct) must leave
        # linear counting; estimate still within HLL's ~26% at m=16
        got = {r["grp"]: r for r in
               hll_distinct(keyed, "grp", "k", p=4).collect()}
        assert abs(got["g0"]["est"] - 5000) / 5000 < 0.5
        assert got["g2"]["v_zero"] > 0

    def test_merge_equals_whole(self, keyed):
        from spider_spark.operators.sketches import (
            hll_estimate, hll_merge, hll_sketch)

        half_a = keyed.filter(F.md5(F.col("k")).substr(1, 1) < "8")
        half_b = keyed.subtract(half_a)
        merged = hll_merge(
            [hll_sketch(half_a, "grp", "k", p=10),
             hll_sketch(half_b, "grp", "k", p=10)], "grp")
        whole = hll_sketch(keyed, "grp", "k", p=10)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, whole.collect()))
        est_m = sorted(map(tuple, hll_estimate(merged, "grp", p=10).collect()))
        est_w = sorted(map(tuple, hll_estimate(whole, "grp", p=10).collect()))
        assert est_m == est_w

    def test_sql_mirror_bit_exact(self, keyed):
        from spider_spark.operators.sketches import (
            hll_distinct, hll_distinct_sql)

        for p in (4, 12):
            spark_rows = sorted(
                tuple(r) for r in hll_distinct(keyed, "grp", "k", p=p).collect()
            )
            con = duckdb.connect()
            con.register("keyed", keyed.toPandas())
            duck_rows = sorted(con.execute(
                hll_distinct_sql("grp", "k", p, "keyed")
            ).fetchall())
            assert spark_rows == duck_rows, p

    def test_rejects_bad_p(self, keyed):
        from spider_spark.operators.sketches import hll_sketch

        with pytest.raises(ValueError):
            hll_sketch(keyed, "grp", "k", p=3)
        with pytest.raises(ValueError):
            hll_sketch(keyed, "grp", "k", p=17)


class TestThetaOverlap:
    def test_exact_when_sketches_hold_everything(self, spark):
        from spider_spark.operators.sketches import theta_overlap

        # per group: A = {0..29}, B = {20..49} → inter 10, union 50
        a = spark.createDataFrame(
            [("g", i) for i in range(30)] + [("h", i) for i in range(5)],
            "grp string, k long")
        b = spark.createDataFrame(
            [("g", i) for i in range(20, 50)], "grp string, k long")
        got = {r["grp"]: r for r in
               theta_overlap(a, b, "grp", "k", k=64).collect()}
        g = got["g"]
        assert (g["est_intersect"], g["est_union"],
                g["est_a_only"], g["est_b_only"]) == (10, 50, 20, 20)
        assert g["theta"] == 1 << 60
        assert g["jaccard_ppm"] == 10 * 1_000_000 // 50
        h = got["h"]  # group absent from B: clean difference
        assert (h["est_intersect"], h["est_union"], h["est_a_only"],
                h["est_b_only"]) == (0, 5, 5, 0)

    def test_estimates_track_truth_when_sampled(self, spark):
        from spider_spark.operators.sketches import theta_overlap

        # A = 0..999, B = 500..1999 → inter 500, union 2000, jacc 0.25
        a = spark.createDataFrame([("g", i) for i in range(1000)],
                                  "grp string, k long")
        b = spark.createDataFrame([("g", i) for i in range(500, 2000)],
                                  "grp string, k long")
        r = theta_overlap(a, b, "grp", "k", k=256).collect()[0]
        assert abs(r["est_union"] - 2000) / 2000 < 0.2
        assert abs(r["est_intersect"] - 500) / 500 < 0.35
        assert abs(r["jaccard_ppm"] - 250_000) / 250_000 < 0.3
        # identical inputs: jaccard is exactly 1 regardless of sampling
        r2 = theta_overlap(a, a, "grp", "k", k=64).collect()[0]
        assert r2["jaccard_ppm"] == 1_000_000
        assert r2["est_a_only"] == 0 and r2["est_b_only"] == 0

    def test_disjoint_inputs(self, spark):
        from spider_spark.operators.sketches import theta_overlap

        a = spark.createDataFrame([("g", i) for i in range(500)],
                                  "grp string, k long")
        b = spark.createDataFrame([("g", i) for i in range(1000, 1500)],
                                  "grp string, k long")
        r = theta_overlap(a, b, "grp", "k", k=64).collect()[0]
        assert r["n_inter"] == 0 and r["jaccard_ppm"] == 0
        assert r["est_intersect"] == 0

    def test_sql_mirror_bit_exact(self, spark):
        from spider_spark.operators.sketches import (
            theta_overlap, theta_overlap_sql)

        a = spark.createDataFrame(
            [("g", i) for i in range(400)] + [("h", i) for i in range(10)],
            "grp string, k long")
        b = spark.createDataFrame(
            [("g", i) for i in range(200, 700)] + [("z", 1)],
            "grp string, k long")
        for k in (16, 64):
            spark_rows = sorted(map(tuple, theta_overlap(
                a, b, "grp", "k", k=k).collect()))
            con = duckdb.connect()
            con.register("ta", a.toPandas())
            con.register("tb", b.toPandas())
            duck_rows = sorted(map(tuple, con.execute(theta_overlap_sql(
                "SELECT * FROM ta", "SELECT * FROM tb",
                "grp", "k", k, group_name="grp")).fetchall()))
            assert spark_rows == duck_rows, k

    def test_rejects_bad_k(self, spark):
        from spider_spark.operators.sketches import theta_overlap_sketches

        df = spark.createDataFrame([("g", 1)], "grp string, _h long")
        with pytest.raises(ValueError):
            theta_overlap_sketches(df, df, "grp", k=1)
