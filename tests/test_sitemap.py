"""Sitemap ingestion (sources/sitemap.py): kernel, explode, refresh plan."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from spider_spark.sources.sitemap import (
    CHANGEFREQ_TTL_SEC,
    parse_sitemap,
    sitemap_entries,
    sitemap_refresh_plan,
    sitemap_refresh_sql,
)

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


class TestParseSitemap:
    def test_urlset_full_entry(self):
        xml = f"""<?xml version="1.0" encoding="UTF-8"?>
        <urlset {NS}>
          <url>
            <loc>https://a.example/p1</loc>
            <lastmod>2024-01-02</lastmod>
            <changefreq>daily</changefreq>
            <priority>0.8</priority>
          </url>
          <url><loc> https://a.example/p2 </loc></url>
          <url><lastmod>2024-01-01</lastmod></url>
        </urlset>"""
        got = parse_sitemap(xml)
        assert got == [
            {
                "loc": "https://a.example/p1",
                "lastmod_epoch": 1704153600,  # 2024-01-02T00:00:00Z
                "changefreq": "daily",
                "priority_milli": 800,
                "is_index": False,
            },
            {
                "loc": "https://a.example/p2",
                "lastmod_epoch": None,
                "changefreq": None,
                "priority_milli": None,
                "is_index": False,
            },
        ]  # loc-less entry skipped

    def test_lastmod_variants(self):
        def lm(v):
            xml = (f"<urlset {NS}><url><loc>u</loc>"
                   f"<lastmod>{v}</lastmod></url></urlset>")
            return parse_sitemap(xml)[0]["lastmod_epoch"]

        assert lm("2024-01-01") == 1704067200
        assert lm("2024-01-01T06:00:00Z") == 1704067200 + 6 * 3600
        assert lm("2024-01-01T06:00:00+02:00") == 1704067200 + 4 * 3600
        assert lm("2024-01-01T06:00:00") == 1704067200 + 6 * 3600  # naive=UTC
        assert lm("not-a-date") is None

    def test_sitemapindex(self):
        xml = f"""<sitemapindex {NS}>
          <sitemap><loc>https://a.example/s1.xml</loc>
                   <lastmod>2024-02-01</lastmod></sitemap>
          <sitemap><loc>https://a.example/s2.xml</loc></sitemap>
        </sitemapindex>"""
        got = parse_sitemap(xml)
        assert [e["loc"] for e in got] == [
            "https://a.example/s1.xml", "https://a.example/s2.xml"
        ]
        assert all(e["is_index"] for e in got)

    def test_tolerance(self):
        assert parse_sitemap("<html>not a sitemap</html>") == []
        assert parse_sitemap("<urlset><url><loc>u</loc>") == []  # malformed
        assert parse_sitemap(b"\xff\xfegarbage") == []
        # unknown changefreq dropped to NULL; out-of-range priority too
        xml = (f"<urlset {NS}><url><loc>u</loc>"
               "<changefreq>fortnightly</changefreq>"
               "<priority>7.5</priority></url></urlset>")
        (e,) = parse_sitemap(xml)
        assert e["changefreq"] is None and e["priority_milli"] is None

    def test_never_kept(self):
        xml = (f"<urlset {NS}><url><loc>u</loc>"
               "<changefreq>never</changefreq></url></urlset>")
        assert parse_sitemap(xml)[0]["changefreq"] == "never"


class TestSitemapEntries:
    def test_explode(self, spark):
        xml1 = (f'<urlset {NS}><url><loc>https://a.example/1</loc>'
                '<priority>0.5</priority></url>'
                '<url><loc>https://a.example/2</loc></url></urlset>')
        xml2 = (f'<sitemapindex {NS}><sitemap>'
                '<loc>https://b.example/child.xml</loc></sitemap>'
                '</sitemapindex>')
        df = spark.createDataFrame(
            [("https://a.example/sitemap.xml", xml1),
             ("https://b.example/sitemap.xml", xml2)],
            "url string, xml string",
        )
        got = sorted(tuple(r) for r in sitemap_entries(df).collect())
        assert got == [
            ("https://a.example/sitemap.xml", "https://a.example/1",
             None, None, 500, False),
            ("https://a.example/sitemap.xml", "https://a.example/2",
             None, None, None, False),
            ("https://b.example/sitemap.xml", "https://b.example/child.xml",
             None, None, None, True),
        ]


class TestPlanShape:
    def test_parse_kernel_runs_once(self, spark):
        """Plan pin: one ArrowEvalPython (see test_anchors for the
        InferFiltersFromGenerate double-eval trap)."""
        df = spark.createDataFrame(
            [("u", "<urlset><url><loc>x</loc></url></urlset>")],
            "url string, xml string",
        )
        plan = (
            sitemap_entries(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("ArrowEvalPython") == 1


class TestRefreshPlan:
    NOW = 1704067200 + 30 * 86_400  # 2024-01-31

    def _entries(self, spark):
        rows = [
            # changed: lastmod after fetch
            ("https://a.example/changed", 1704067200 + 86_400, "yearly", 900, False),
            # stale: fetched 30 days ago, daily freq
            ("https://a.example/stale", None, "daily", None, False),
            # fresh: weekly-ish default but lastmod old and freq yearly
            ("https://a.example/fresh", 1704067200 - 5, "yearly", None, False),
            # never: age alone must not refetch
            ("https://a.example/never", None, "never", None, False),
            # new: not in fetched state
            ("https://a.example/new", None, None, 100, False),
            # index rows are excluded
            ("https://a.example/child.xml", None, None, None, True),
            # always: TTL 0 fires every pass
            ("https://a.example/always", None, "always", None, False),
        ]
        return spark.createDataFrame(
            rows,
            "loc string, lastmod_epoch long, changefreq string, "
            "priority_milli int, is_index boolean",
        )

    def _fetched(self, spark):
        t0 = 1704067200
        rows = [
            ("https://a.example/changed", t0),
            ("https://a.example/stale", t0),
            ("https://a.example/fresh", t0 + 29 * 86_400),
            ("https://a.example/never", t0),
            ("https://a.example/child.xml", t0),
            ("https://a.example/always", t0 + 29 * 86_400),
        ]
        return spark.createDataFrame(rows, "url string, fetch_epoch long")

    def test_reasons(self, spark):
        plan = sitemap_refresh_plan(
            self._entries(spark), self._fetched(spark), self.NOW
        )
        got = {r["loc"]: r["reason"] for r in plan.collect()}
        assert got == {
            "https://a.example/changed": "changed",
            "https://a.example/stale": "stale",
            "https://a.example/new": "new",
            "https://a.example/always": "stale",
        }

    def test_matches_duckdb_mirror(self, spark):
        plan = sitemap_refresh_plan(
            self._entries(spark), self._fetched(spark), self.NOW
        )
        got = sorted(tuple(r) for r in plan.collect())
        e = self._entries(spark).toPandas()
        f = self._fetched(spark).toPandas().rename(
            columns={"url": "loc"}
        )
        con = duckdb.connect()
        con.register("e_tab", e)
        con.register("f_tab", f)
        want = sorted(tuple(r) for r in con.sql(
            sitemap_refresh_sql("SELECT * FROM e_tab",
                                "SELECT loc, fetch_epoch FROM f_tab",
                                self.NOW)
        ).fetchall())
        assert got == want

    def test_duplicate_loc_deterministic(self, spark):
        # same loc in two sitemaps: newest lastmod wins (changed verdict)
        rows = [
            ("https://a.example/p", 1704067200 - 10, "never", None, False),
            ("https://a.example/p", 1704067200 + 10, "daily", 300, False),
        ]
        e = spark.createDataFrame(
            rows,
            "loc string, lastmod_epoch long, changefreq string, "
            "priority_milli int, is_index boolean",
        )
        f = spark.createDataFrame(
            [("https://a.example/p", 1704067200)],
            "url string, fetch_epoch long",
        )
        for _ in range(2):
            (row,) = sitemap_refresh_plan(e, f, self.NOW).collect()
            assert (row["reason"], row["lastmod_epoch"],
                    row["priority_milli"]) == ("changed", 1704067210, 300)

    def test_ttl_table_is_protocol(self):
        assert CHANGEFREQ_TTL_SEC["always"] == 0
        assert CHANGEFREQ_TTL_SEC["hourly"] == 3600
        assert "never" not in CHANGEFREQ_TTL_SEC  # NULL TTL, handled apart


class TestWriteSitemap:
    @staticmethod
    def _rows(spark, n=7):
        rows = [
            (f"https://h{i % 2}.example/p/{i}",
             1_700_000_000 + i if i % 3 else None,
             ["daily", "weekly", None][i % 3],
             (i * 100) if i % 2 else None)
            for i in range(n)
        ]
        return spark.createDataFrame(
            rows, "url string, lastmod_epoch long, changefreq string, "
                  "priority_milli int")

    def test_round_trips_through_the_parser(self, spark, tmp_path):
        from spider_spark.sources.sitemap import (
            read_sitemap_files, sitemap_entries, write_sitemap)

        df = self._rows(spark)
        man = write_sitemap(df, str(tmp_path / "sm")).collect()
        assert sum(m["n_urls"] for m in man) == 7
        back = sitemap_entries(
            read_sitemap_files(spark, str(tmp_path / "sm")),
            xml_col="xml").collect()
        got = sorted((r["loc"], r["lastmod_epoch"], r["changefreq"],
                      r["priority_milli"], r["is_index"]) for r in back)
        want = sorted((u, lm, cf, pr, False)
                      for u, lm, cf, pr in map(tuple, df.collect()))
        assert got == want

    def test_split_at_max_urls_and_determinism(self, spark, tmp_path):
        from spider_spark.sources.sitemap import write_sitemap

        df = self._rows(spark, n=11)
        m1 = {(r["host"], r["file_no"]): (r["n_urls"], r["sha256"])
              for r in write_sitemap(df, str(tmp_path / "a"),
                                     max_urls=4).collect()}
        # h0 gets urls 0,2,4,6,8,10 (6 → files of 4+2); h1 gets 5 → 4+1
        assert {k: v[0] for k, v in m1.items()} == {
            ("h0.example", 0): 4, ("h0.example", 1): 2,
            ("h1.example", 0): 4, ("h1.example", 1): 1,
        }
        # byte-determinism: a re-export from a different partitioning
        m2 = {(r["host"], r["file_no"]): (r["n_urls"], r["sha256"])
              for r in write_sitemap(df.repartition(7),
                                     str(tmp_path / "b"),
                                     max_urls=4).collect()}
        assert m1 == m2

    def test_index_document(self, spark, tmp_path):
        from spider_spark.sources.sitemap import (
            parse_sitemap, sitemap_index_xml, write_sitemap)

        man = write_sitemap(self._rows(spark), str(tmp_path / "sm")).collect()
        idx = sitemap_index_xml(
            [(f"https://pub.example/{m['path'].rsplit('/', 1)[1]}", None)
             for m in man])
        parsed = parse_sitemap(idx)
        assert len(parsed) == len(man)
        assert all(e["is_index"] for e in parsed)

    def test_escaping_and_epoch_parity(self, spark, tmp_path):
        from spider_spark.sources.sitemap import parse_sitemap, sitemap_xml

        e = {"loc": "https://h.example/a?x=1&y=<2>", "lastmod_epoch": 0,
             "changefreq": None, "priority_milli": 1000}
        parsed = parse_sitemap(sitemap_xml([e]))
        assert parsed == [{"loc": e["loc"], "lastmod_epoch": 0,
                           "changefreq": None, "priority_milli": 1000,
                           "is_index": False}]
