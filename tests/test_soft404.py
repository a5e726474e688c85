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


class TestCrawlGate:
    def test_soft404_content_gate_in_crawl(self, spark):
        from spider_spark.functions.soft404 import make_soft404_gate
        from spider_spark.plans.crawl import CrawlConfig, CrawlEngine
        from spider_spark.sources.pages import build_pages, seed_url_for

        n = 12
        texts = {i: " ".join(f"tok{i}w{j}" for j in range(80))
                 for i in range(n)}
        # seed 0's children are (2*0+1)%n=1 and (3*0+2)%n=2
        texts[1] = "sorry, this page does not exist."
        ids = spark.createDataFrame(
            [(i, texts[i], "en") for i in range(n)],
            "id long, text string, lang string")
        pages = build_pages(ids, n).localCheckpoint(eager=True)
        eng = CrawlEngine(spark, pages, CrawlConfig(depth=1),
                          content_gate=make_soft404_gate())
        res = eng.crawl(seed_url_for(0, n))
        rows = {r["url"]: r for r in res.results.collect() if r["fetched"]}
        u1 = seed_url_for(1, n)
        u2 = seed_url_for(2, n)
        assert rows[u1]["fetched"] and rows[u1]["content_ref"] is None
        assert rows[u2]["content_ref"] is not None
        # gated page's TITLE is still saved (the page was parsed) — only
        # the content pointer is withheld, matching the near-dup gate
        assert rows[u1]["title"] == "Doc 1"
