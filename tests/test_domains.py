"""Registrable-domain (Public Suffix List) extraction
(functions/domains.py): the published PSL algorithm over the frozen
rule subset — exact / wildcard / exception / default-rule families,
precedence, bare-suffix NULLs, DuckDB-mirror parity, and the plan shape
(broadcast rules, no Python)."""

from __future__ import annotations

import duckdb
import pytest

from spider_spark.functions.domains import (
    psl_rules,
    registrable_domains,
    registrable_domains_sql,
)

CASES = {
    # exact multi-label rule
    "www.example.co.uk": ("co.uk", "example.co.uk"),
    "a.cdn.example.co.uk": ("co.uk", "example.co.uk"),
    "x.co.uk": ("co.uk", "x.co.uk"),
    "co.uk": ("co.uk", None),               # bare public suffix
    # default rule (* — unlisted TLD)
    "bare": ("bare", None),
    "a.bare": ("bare", "a.bare"),
    # wildcard *.ck: any single label under ck is itself public
    "w123.ck": ("w123.ck", None),
    "v.u.w123.ck": ("w123.ck", "u.w123.ck"),
    # exception !www.ck: www.ck IS registrable
    "www.ck": ("ck", "www.ck"),
    "sub.www.ck": ("ck", "www.ck"),
    # wildcard base with no extra label falls back to the default rule
    "bd": ("bd", None),
    "x.bd": ("x.bd", None),
    "y.x.bd": ("x.bd", "y.x.bd"),
    # case folding
    "WWW.UPPER.COM": ("com", "upper.com"),
}


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame([(h,) for h in CASES], "host string")
    return {
        r.host: (r.public_suffix, r.registrable)
        for r in registrable_domains(df).collect()
    }


class TestSemantics:
    def test_all_families(self, result):
        for host, want in CASES.items():
            assert result[host.lower()] == want, host

    def test_rule_table_shape(self):
        rows = psl_rules()
        assert all(len(r) == 4 for r in rows)
        # the exception rule must carry is_exc=1 and pl = labels-1
        exc = [r for r in rows if r[1] == 1]
        assert exc == [("www.ck", 1, 1, 2)]


class TestMirror:
    def test_duckdb_parity(self, spark):
        df = spark.createDataFrame([(h,) for h in CASES], "host string")
        got = sorted(
            (r.host, r.public_suffix, r.registrable)
            for r in registrable_domains(df).collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE h (host VARCHAR)")
        con.executemany("INSERT INTO h VALUES (?)", [(x,) for x in CASES])
        exp = sorted(map(tuple, con.execute(
            registrable_domains_sql("SELECT host FROM h")).fetchall()))
        assert got == exp


class TestPlan:
    def test_broadcast_rules_no_python(self, spark):
        df = spark.createDataFrame([(h,) for h in CASES], "host string")
        plan = registrable_domains(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Broadcast" in plan
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
