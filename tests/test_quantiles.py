"""Exact grouped quantiles: histogram + rational thresholds."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from spider_spark.operators.quantiles import (
    DEFAULT_QS,
    exact_group_quantiles,
    exact_group_quantiles_sql,
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
