"""Soft-404 content verdict (functions/soft404.py)."""

from __future__ import annotations

import duckdb

from spider_spark.functions.soft404 import soft404_flags, soft404_sql


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, title string, body string")
    out = df.select("doc_id", soft404_flags("title", "body").alias("f")) \
            .select("doc_id", "f.soft404", "f.title_hit", "f.marker_hit",
                    "f.short")
    return {r["doc_id"]: r for r in out.collect()}


class TestVerdict:
    def test_rule_bundle(self, spark):
        long_body = "word " * 200  # > short threshold
        rows = [
            (0, "Page Not Found", long_body),          # title alone flags
            (1, "Doc 1", "sorry, page not found."),    # marker + short
            (2, "Doc 2", long_body + " page not found"),  # quote, long → keep
            (3, "Error 404", "gone"),                  # title variant
            (4, "Doc 4", long_body),                   # clean
            (5, None, ""),                             # empty body, no marker
            (6, "404s are fun facts", long_body),      # NOT standalone '404'
            (7, "Dentist error-free clinic", long_body),  # bare 'error' off
        ]
        got = _run(spark, rows)
        assert [got[i]["soft404"] for i in range(8)] == [
            True, True, False, True, False, False, False, False]
        assert got[2]["marker_hit"] and not got[2]["short"]
        assert not got[7]["title_hit"]

    def test_404_word_boundaries(self, spark):
        got = _run(spark, [
            (0, "RFC 1404 history", "x " * 300),   # inside a number → no
            (1, "HTTP 404 - oops", "x " * 300),    # standalone → yes
            (2, "x404x", "x " * 300),              # letter-bounded → no
        ])
        assert [got[i]["title_hit"] for i in range(3)] == [
            False, True, False]

    def test_sql_mirror_agrees(self, spark):
        rows = [
            (0, "Page Not Found", "body " * 150),
            (1, "Doc", "this page does not exist"),
            (2, "Doc", ("body " * 150) + "no longer available"),
            (3, None, None),
        ]
        got = _run(spark, rows)
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t(doc_id BIGINT, title VARCHAR, body VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
        ex = soft404_sql("title", "body")
        mirror = con.execute(
            f"SELECT doc_id, {ex['soft404']} FROM t ORDER BY doc_id"
        ).fetchall()
        assert [bool(v) for _, v in mirror] == [
            got[i]["soft404"] for i in range(4)]

    def test_jvm_only_plan(self, spark):
        df = spark.createDataFrame(
            [(0, "t", "b")], "doc_id long, title string, body string")
        out = df.select(soft404_flags("title", "body").alias("f"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan, plan
