"""Redirect-chain resolution (operators/redirects.py): pointer-doubling
terminals + hop counts, cycle detection, functionalization, round count,
and recursive-CTE mirror parity."""

from __future__ import annotations

import duckdb
import pandas as pd

from spider_spark.operators.redirects import (
    resolve_redirects,
    resolve_redirects_sql,
)


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _collect(out):
    return {
        r["src_url"]: (r["final_url"], r["hops"], r["status"])
        for r in out.collect()
    }


CHAIN = [("a", "b"), ("b", "c"), ("c", "d")]           # d terminal
CYCLE = [("p", "q"), ("q", "p"), ("o", "p")]           # o drains into p<->q


class TestResolveRedirects:
    def test_chain_terminals_and_hops(self, spark):
        got = _collect(resolve_redirects(_df(spark, CHAIN)))
        assert got == {
            "a": ("d", 3, "ok"),
            "b": ("d", 2, "ok"),
            "c": ("d", 1, "ok"),
        }

    def test_cycle_and_drain_are_nulled(self, spark):
        got = _collect(resolve_redirects(_df(spark, CYCLE)))
        assert got == {
            "p": (None, None, "cycle"),
            "q": (None, None, "cycle"),
            "o": (None, None, "cycle"),
        }

    def test_self_redirect_is_cycle(self, spark):
        got = _collect(resolve_redirects(_df(spark, [("s", "s")])))
        assert got == {"s": (None, None, "cycle")}

    def test_multi_edge_source_functionalizes_to_min(self, spark):
        got = _collect(
            resolve_redirects(_df(spark, [("a", "z"), ("a", "b"), ("b", "c")]))
        )
        assert got["a"] == ("c", 2, "ok")

    def test_doubling_round_count(self, spark):
        # chain of length 8 resolves in ceil(log2 8) = 3 doubling rounds
        chain = [(f"n{i}", f"n{i+1}") for i in range(8)]
        stats: dict = {}
        got = _collect(resolve_redirects(_df(spark, chain), stats=stats))
        assert got["n0"] == ("n8", 8, "ok")
        assert stats["rounds"] == 3

    def test_single_hop_zero_rounds(self, spark):
        stats: dict = {}
        got = _collect(
            resolve_redirects(_df(spark, [("a", "b")]), stats=stats))
        assert got == {"a": ("b", 1, "ok")}
        assert stats["rounds"] == 0  # early exit before any doubling

    def test_mirror_parity(self, spark):
        edges = CHAIN + CYCLE + [("x", "a"), ("y", "y2")]
        got = _collect(resolve_redirects(_df(spark, edges)))
        con = duckdb.connect()
        con.register("edges_rel", pd.DataFrame(
            edges, columns=["src", "dst"]))
        want = {
            r[0]: (r[1], r[2], r[3])
            for r in con.execute(resolve_redirects_sql(
                "SELECT src, dst FROM edges_rel")).fetchall()
        }
        assert got == want
        assert got["x"] == ("d", 4, "ok")
