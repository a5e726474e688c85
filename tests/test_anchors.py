"""Anchor-text extraction + index (functions/parse.py _AnchorParser,
operators/anchors.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from spider_spark.functions.parse import parse_anchors
from spider_spark.operators.anchors import (
    anchor_pairs,
    anchor_text_index,
    anchor_text_index_sql,
)


class TestParseAnchors:
    PAGE = "https://s.example/p"

    def test_basic_alignment_and_filters(self):
        html = (
            "<html><body>"
            '<a>no-href</a>'
            '<a href="https://s.example/p?x=1">query dropped</a>'
            '<a href="https://t.example/a">first <b>bold</b> link</a>'
            '<a href="/rel">relative</a>'
            '<a href="https://s.example/p">self dropped</a>'
            '<a href="https://t.example/img"><img src="x.png"/></a>'
            "</body></html>"
        )
        got = parse_anchors(html, self.PAGE)
        assert [(a["url"], a["anchor_text"]) for a in got] == [
            ("https://t.example/a", "first bold link"),
            ("https://s.example/rel", "relative"),
            ("https://t.example/img", ""),
        ]
        assert [a["host"] for a in got] == [
            "t.example", "s.example", "t.example"
        ]

    def test_unclosed_anchor_implicitly_closed(self):
        # a new <a> must end the open one: text never smears across links
        html = (
            '<a href="https://t.example/1">one'
            '<a href="https://t.example/2">two</a> tail'
        )
        got = parse_anchors(html, self.PAGE)
        assert [(a["url"], a["anchor_text"]) for a in got] == [
            ("https://t.example/1", "one"),
            ("https://t.example/2", "two"),
        ]

    def test_whitespace_collapse(self):
        html = '<a href="https://t.example/1">  a\n\t b   c </a>'
        (a,) = parse_anchors(html, self.PAGE)
        assert a["anchor_text"] == "a b c"

    def test_text_kernel_unchanged(self):
        # the anchor parser subclasses the page parser: its text/title
        # extraction must stay byte-identical to the crawl kernel's
        from spider_spark.functions.parse import _AnchorParser, parse_page

        html = (
            "<html><head><title>T</title></head><body>"
            '<a href="https://t.example/1">one</a><p>body text</p>'
            "<script>skip()</script></body></html>"
        )
        p = _AnchorParser()
        p.feed(html)
        p.close()
        title, hrefs, text = parse_page(html)
        assert "".join(p.title_parts) == title
        assert p.hrefs == hrefs
        assert "\n".join(p.text_parts) == text


class TestAnchorIndex:
    def _pages(self, spark, n=60):
        from spider_spark.sources.pages import synthetic_pages

        return synthetic_pages(spark, n)

    def test_index_matches_duckdb_mirror(self, spark):
        """Spark parse→explode→agg over real HTML == DuckDB arithmetic
        replay of the synthetic link graph (c1/dead/c2/c1b anchors,
        query link dropped, self-links dropped)."""
        n = 60
        idx = anchor_text_index(self._pages(spark, n))
        got = sorted(tuple(r) for r in idx.collect())

        host = ("CASE WHEN ({x}) % 2 = 0 THEN 'h0.example' "
                "ELSE 'h' || (1 + ({x}) % 19) || '.example' END")
        url = "'https://' || " + host + " || '/d/' || ({x})"

        def u(x):
            return url.format(x=x)

        def h(x):
            return host.format(x=x)

        edges = f"""
          WITH ids AS (SELECT unnest(range({n})) AS i),
          raw AS (
            SELECT {u('i')} AS src_url, {h('i')} AS src_host,
                   {u(f'(2*i+1) % {n}')} AS dst_url, 'c1' AS anchor_text
            FROM ids
            UNION ALL
            SELECT {u('i')}, {h('i')},
                   'https://dead.example/d/' || i, 'dead' FROM ids
            UNION ALL
            SELECT {u('i')}, {h('i')},
                   {u(f'(3*i+2) % {n}')}, 'c2' FROM ids
            UNION ALL
            SELECT {u('i')}, {h('i')},
                   {u(f'(2*i+1) % {n}')}, 'c1b' FROM ids
          )
          SELECT * FROM raw WHERE dst_url <> src_url
        """
        want = sorted(
            tuple(r) for r in duckdb.sql(
                anchor_text_index_sql(edges)
            ).fetchall()
        )
        assert got == want

    def test_pairs_apply_crawl_filters(self, spark):
        pairs = anchor_pairs(self._pages(spark, 40))
        # no query-string links, no self links admitted
        assert pairs.filter(F.col("dst_url").contains("?")).count() == 0
        assert pairs.filter(
            F.col("dst_url") == F.col("src_url")
        ).count() == 0
        # every page contributes c1/dead/c2/c1b minus self-links
        texts = {r["anchor_text"] for r in
                 pairs.select("anchor_text").distinct().collect()}
        assert texts == {"c1", "dead", "c2", "c1b"}

    def test_parse_kernel_runs_once(self, spark):
        """Plan pin: exactly ONE ArrowEvalPython node. A plain explode
        lets InferFiltersFromGenerate push a size(udf(..))>0 filter that
        re-evaluates the parse kernel — doubling the operator's dominant
        cost; explode_outer + isNotNull keeps it single-pass."""
        plan = (
            anchor_text_index(self._pages(spark, 20))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("ArrowEvalPython") == 1

    def test_n_src_hosts_is_distinct(self, spark):
        idx = anchor_text_index(self._pages(spark, 60))
        dead = idx.filter(
            F.col("dst_url").contains("dead.example")
        ).agg(F.max("n_src_hosts"), F.max("n_links")).collect()[0]
        # each dead URL is linked once from one host
        assert tuple(dead) == (1, 1)
        # hot even targets: c1 of i lands on (2i+1)%n — odd ids, many hosts
        top = idx.orderBy(F.desc("n_links")).first()
        assert top["n_links"] >= top["n_src_hosts"]


class TestNofollow:
    HTML = (b'<html><body>'
            b'<a href="https://t.example/1">plain</a>'
            b'<a rel="nofollow" href="https://t.example/2">paid</a>'
            b'<a rel="SPONSORED ugc" href="https://t.example/3">ad</a>'
            b'<a rel="noopener" href="https://t.example/4">safe</a>'
            b'</body></html>')

    def test_kernel_flags(self):
        from spider_spark.functions.parse import parse_anchors

        recs = parse_anchors(self.HTML, "https://p.example/x")
        flags = {r["anchor_text"]: r["nofollow"] for r in recs}
        assert flags == {"plain": False, "paid": True, "ad": True,
                         "safe": False}

    def test_honor_nofollow_drops(self, spark):
        df = spark.createDataFrame(
            [("https://p.example/x", bytearray(self.HTML))],
            "url string, html binary")
        kept = {r["anchor_text"]
                for r in anchor_pairs(df, honor_nofollow=True).collect()}
        assert kept == {"plain", "safe"}
        all_ = {r["anchor_text"]: r["nofollow"]
                for r in anchor_pairs(df).collect()}
        assert all_["paid"] is True and all_["plain"] is False

    def test_index_excludes_nofollow(self, spark):
        df = spark.createDataFrame(
            [("https://p.example/x", bytearray(self.HTML))],
            "url string, html binary")
        idx = {r["anchor_text"]
               for r in anchor_text_index(df, honor_nofollow=True).collect()}
        assert idx == {"plain", "safe"}


class TestLinkSpamFeatures:
    def test_features_and_zero_fill(self, spark):
        from spider_spark.operators.anchors import (
            link_spam_features,
            link_spam_features_sql,
        )

        pages = spark.createDataFrame(
            [
                # 2 internal (one self dropped), 2 external on 2 hosts
                ("https://a.example/p", bytearray(
                    b'<html><body>'
                    b'<a href="https://a.example/p">self</a>'
                    b'<a href="/q">inq</a>'
                    b'<a href="https://a.example/r">inr</a>'
                    b'<a href="https://b.example/x">bee</a>'
                    b'<a href="https://c.example/y?k=1">cee</a>'
                    b'<a>nohref</a></body></html>')),
                # every link filtered (no-href + self) -> zero row
                ("https://z.example/only", bytearray(
                    b'<html><body><a>skip</a>'
                    b'<a href="https://z.example/only">me</a></body></html>')),
            ],
            "url string, html binary",
        )
        got = {r["url"]: r for r in link_spam_features(pages).collect()}
        a = got["https://a.example/p"]
        # query-string link dropped (crawl admission), self dropped
        assert (a["n_links"], a["n_internal"], a["n_external"]) == (3, 2, 1)
        assert a["n_dst_hosts"] == 2
        assert a["anchor_chars"] == len("inq") + len("inr") + len("bee")
        z = got["https://z.example/only"]
        assert (z["n_links"], z["n_internal"], z["n_external"],
                z["n_dst_hosts"], z["anchor_chars"]) == (0, 0, 0, 0, 0)

    def test_matches_sql_mirror(self, spark):
        import duckdb as ddb

        from spider_spark.operators.anchors import (
            anchor_pairs,
            link_spam_features,
            link_spam_features_sql,
        )
        from spider_spark.sources.pages import synthetic_pages

        pages = synthetic_pages(spark, 60).localCheckpoint(eager=True)
        got = {
            tuple(r) for r in link_spam_features(pages).collect()
        }
        con = ddb.connect()
        con.register("edges_pd", anchor_pairs(pages).toPandas())
        con.register("pages_pd", pages.select("url").toPandas())
        want = {
            tuple(r)
            for r in con.execute(
                link_spam_features_sql(
                    "SELECT * FROM edges_pd", "SELECT url FROM pages_pd"
                )
            ).fetchall()
        }
        assert got == want


class TestFocusedScores:
    @pytest.fixture(scope="class")
    def index(self, spark):
        # (dst_url, anchor_text, n_links, n_src_hosts)
        rows = [
            ("https://t1.example/", "deep learning tutorial", 100, 2),
            ("https://t1.example/", "click here", 500, 9),
            ("https://t2.example/", "learning resources", 3, 7),
            ("https://t3.example/", "deep deep deep", 50, 1),   # repeats count once
            ("https://t4.example/", "unrelated stuff", 8, 8),
        ]
        return spark.createDataFrame(
            rows, "dst_url string, anchor_text string, n_links long, n_src_hosts long"
        ).cache()

    def test_host_weighted_distinct_term_match(self, spark, index):
        from spider_spark.operators.anchors import focused_scores

        got = {r["dst_url"]: (r["score"], r["n_anchor_texts"])
               for r in focused_scores(index, ["deep", "learning"], k=10).collect()}
        # t1: both terms in one anchor → 2 × 2 hosts = 4 ("click here" adds 0)
        assert got["https://t1.example/"] == (4, 1)
        # t2: one term × 7 hosts = 7 — independent endorsement beats n_links
        assert got["https://t2.example/"] == (7, 1)
        # t3: 'deep' repeated → counts once × 1 host = 1
        assert got["https://t3.example/"] == (1, 1)
        assert "https://t4.example/" not in got

    def test_matches_duckdb_mirror(self, spark):
        import duckdb

        from spider_spark.operators.anchors import (
            anchor_text_index,
            focused_scores,
            focused_scores_sql,
        )

        rows = [
            ("s1", "h1", "https://t.example/a", "deep learning"),
            ("s2", "h2", "https://t.example/a", "deep learning"),
            ("s3", "h2", "https://t.example/a", "deep learning"),
            ("s4", "h3", "https://t.example/b", "learning"),
            ("s5", "h4", "https://t.example/c", "nothing"),
        ]
        edges = spark.createDataFrame(
            rows, "src_url string, src_host string, dst_url string, anchor_text string"
        )
        idx = edges.groupBy("dst_url", "anchor_text", "src_host").count() \
            .groupBy("dst_url", "anchor_text") \
            .agg(F.sum("count").alias("n_links"), F.count(F.lit(1)).alias("n_src_hosts"))
        got = [tuple(r) for r in
               focused_scores(idx, ["deep", "learning"], k=5).collect()]
        con = duckdb.connect()
        con.register("edges", edges.toPandas())
        want = [tuple(r) for r in con.execute(
            focused_scores_sql("SELECT * FROM edges", ["deep", "learning"], k=5)
        ).fetchall()]
        assert got == want

    def test_rejects_empty_query(self, index):
        from spider_spark.operators.anchors import focused_scores

        with pytest.raises(ValueError):
            focused_scores(index, [])
