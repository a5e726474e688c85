"""Crawl-trap detection: per-URL structural signals, host verdicts, and
bit-exact DuckDB-mirror parity (operators/traps.py)."""

from __future__ import annotations

import duckdb
import pytest

from spider_spark.operators.traps import trap_hosts, trap_hosts_sql, url_structure


def _urls(spark, rows):
    return spark.createDataFrame([(u,) for u in rows], "url string")


class TestUrlStructure:
    def test_signals(self, spark):
        df = url_structure(_urls(spark, [
            "https://a.example/d/1",                    # depth 2
            "https://A.EXAMPLE:8080/",                   # depth 0, port+case
            "https://b.example/x/y/x",                   # repeated segment
            "https://c.example/p?q=1",                   # query
            "https://d.example",                         # no path at all
        ]))
        got = {r["url"]: r.asDict() for r in df.collect()}
        r1 = got["https://a.example/d/1"]
        assert (r1["host"], r1["depth"], r1["has_repeat"], r1["has_query"]) == \
            ("a.example", 2, False, False)
        r2 = got["https://A.EXAMPLE:8080/"]
        assert (r2["host"], r2["depth"]) == ("a.example", 0)
        assert got["https://b.example/x/y/x"]["has_repeat"] is True
        assert got["https://c.example/p?q=1"]["has_query"] is True
        assert got["https://d.example"]["depth"] == 0


class TestTrapHosts:
    @pytest.fixture(scope="class")
    def log(self, spark):
        rows = [f"https://ok.example/d/{i}" for i in range(20)]
        # calendar loop: deep, repeated segments
        rows += [f"https://cal.example{'/2024' * 6}/p{i}" for i in range(20)]
        # session-id mill: every URL carries a query string
        rows += [f"https://mill.example/d/{i}?sid={i}" for i in range(20)]
        # trap-shaped but below min_urls
        rows += [f"https://tiny.example{'/2024' * 6}/p{i}" for i in range(3)]
        return _urls(spark, rows)

    def test_verdicts(self, spark, log):
        got = {r["host"]: r.asDict() for r in trap_hosts(log).collect()}
        assert got["ok.example"]["is_trap"] is False
        assert got["cal.example"]["is_trap"] is True
        assert got["cal.example"]["n_repeat"] == 20
        assert got["cal.example"]["max_depth"] == 7
        assert got["mill.example"]["is_trap"] is True
        assert got["mill.example"]["n_query"] == 20
        assert got["tiny.example"]["is_trap"] is False  # min_urls gate

    def test_sql_mirror_bit_exact(self, spark, log):
        spark_rows = sorted(
            tuple(r) for r in trap_hosts(log).collect()
        )
        pdf = log.toPandas()  # noqa: F841 — registered below
        con = duckdb.connect()
        con.register("urls", pdf)
        duck_rows = sorted(
            tuple(r) for r in con.execute(trap_hosts_sql("urls")).fetchall()
        )
        assert spark_rows == duck_rows
