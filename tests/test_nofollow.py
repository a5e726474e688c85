"""Per-anchor rel=nofollow crawl admission (the RFC-agnostic opt-out a
polite crawler honors: rel=nofollow/ugc/sponsored anchors exist but are
never followed).

Covers: the parse kernel's per-anchor flags, the honor_nofollow parse UDF
mode (links dropped, title/text byte-identical), the nofollow fixture's
HTML (default mode byte-identical to the classic fixture), and the engine
A/B — honor off ≡ classic crawl, honor on ≡ a pure-Python BFS reference
that prunes exactly the opted-out c2 edges.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_spark.functions.parse import (
    make_parse_udf,
    parse_page,
    parse_page_rel,
)
from spider_spark.plans.crawl import CrawlConfig, CrawlEngine
from spider_spark.sources.pages import build_pages, seed_url_for

HTML = b"""<html><head><title>T</title></head><body>
<a href="https://a.example/plain">plain</a>
<a rel="nofollow" href="https://a.example/nf">nf</a>
<a rel="UGC" href="https://a.example/ugc">ugc</a>
<a rel="external sponsored" href="https://a.example/sp">sp</a>
<a rel="external noopener" href="https://a.example/decoy">decoy</a>
<a rel="nofollowish" href="https://a.example/trick">trick</a>
body text</body></html>"""


class TestKernel:
    def test_flags_align_with_hrefs(self):
        title, hrefs, nf, text = parse_page_rel(HTML)
        assert title == "T"
        assert hrefs == [
            "https://a.example/plain", "https://a.example/nf",
            "https://a.example/ugc", "https://a.example/sp",
            "https://a.example/decoy", "https://a.example/trick",
        ]
        # nofollow/ugc/sponsored flagged; affirmative rels and the
        # 'nofollowish' non-token are NOT (whitespace-token semantics)
        assert nf == [False, True, True, True, False, False]

    def test_title_text_identical_to_parse_page(self):
        t1, h1, txt1 = parse_page(HTML)
        t2, h2, _nf, txt2 = parse_page_rel(HTML)
        assert (t1, h1, txt1) == (t2, h2, txt2)


class TestParseUdf:
    def test_honor_mode_drops_only_opted_out(self, spark):
        df = spark.createDataFrame(
            [(HTML, "https://seed.example/")], "html binary, seed string"
        )
        plain = df.select(
            make_parse_udf("seed")(F.col("html"), F.col("seed")).alias("p")
        ).select("p.*").collect()[0]
        honor = df.select(
            make_parse_udf("seed", honor_nofollow=True)(
                F.col("html"), F.col("seed")
            ).alias("p")
        ).select("p.*").collect()[0]
        assert honor.title == plain.title
        assert honor.text == plain.text
        plain_urls = [r.url for r in plain.links]
        honor_urls = [r.url for r in honor.links]
        assert plain_urls == [
            "https://a.example/plain", "https://a.example/nf",
            "https://a.example/ugc", "https://a.example/sp",
            "https://a.example/decoy", "https://a.example/trick",
        ]
        assert honor_urls == [
            "https://a.example/plain",
            "https://a.example/decoy",
            "https://a.example/trick",
        ]


def _ids(spark, n):
    return spark.range(n).select(
        F.col("id"),
        F.format_string("body %d", F.col("id")).alias("text"),
        F.lit("en").alias("lang"),
    )


def _python_seen_reference(n: int, seed_id: int, depth: int,
                           mod: int | None) -> dict[int, int]:
    """Independent BFS over the fixture graph; ids >= n are dead URLs
    (virtual id n + parent). ``mod`` prunes the c2 edge of parents with
    parent % mod == 0 (the nofollow rule); None follows everything."""
    seen = {seed_id: 0}
    level = [seed_id]
    for d in range(1, depth + 1):
        nxt = []
        for p in level:
            children = [(2 * p + 1) % n, n + p]
            c2 = (3 * p + 2) % n
            if mod is None or p % mod != 0:
                children.insert(1, c2)
            for c in children:
                if c == seed_id or c in seen:
                    continue
                seen[c] = d
                if c < n:  # dead URLs never expand
                    nxt.append(c)
        level = nxt
    return seen


def _url_of(i: int, n: int) -> str:
    if i >= n:
        return f"https://dead.example/d/{i - n}"
    return seed_url_for(i, n)


N = 60
SEED_ID = 1
DEPTH = 4
MOD = 5  # bites at this scale: pruning visibly shrinks the seen set


class TestCrawlAdmission:
    @pytest.fixture(scope="class")
    def fixture_pages(self, spark):
        return build_pages(_ids(spark, N), N, nofollow_c2_mod=MOD)

    def test_default_mode_ignores_rel(self, spark, fixture_pages):
        """honor_nofollow=False (reference parity): the rel attributes are
        inert — the seen set equals the classic full-graph BFS."""
        eng = CrawlEngine(spark, fixture_pages, CrawlConfig(depth=DEPTH))
        got = {
            r.canon_url: r.depth
            for r in eng.crawl(seed_url_for(SEED_ID, N)).seen.collect()
        }
        ref = {
            _url_of(i, N): d
            for i, d in _python_seen_reference(N, SEED_ID, DEPTH, None).items()
        }
        assert got == ref

    def test_honor_mode_prunes_opted_out_edges(self, spark, fixture_pages):
        eng = CrawlEngine(
            spark, fixture_pages,
            CrawlConfig(depth=DEPTH, honor_nofollow=True),
        )
        got = {
            r.canon_url: r.depth
            for r in eng.crawl(seed_url_for(SEED_ID, N)).seen.collect()
        }
        ref = {
            _url_of(i, N): d
            for i, d in _python_seen_reference(N, SEED_ID, DEPTH, MOD).items()
        }
        assert got == ref
        # the rule actually bit: some URL reachable in the full graph is
        # gone (or deeper) under nofollow
        full = _python_seen_reference(N, SEED_ID, DEPTH, None)
        pruned = _python_seen_reference(N, SEED_ID, DEPTH, MOD)
        assert set(pruned) < set(full) or any(
            pruned[k] > full[k] for k in pruned
        )

    def test_fixture_default_bytes_unchanged(self, spark):
        """nofollow_c2_mod=None emits byte-identical HTML to the classic
        fixture (so every existing oracle over build_pages stays valid)."""
        a = build_pages(_ids(spark, 12), 12).select("url", "html")
        b = build_pages(_ids(spark, 12), 12, nofollow_c2_mod=None).select(
            "url", "html"
        )
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    def test_fixture_rel_tokens_present(self, spark, fixture_pages):
        html0 = bytes(
            fixture_pages.filter(F.col("url").endswith("/d/0"))
            .select("html").collect()[0].html
        ).decode()
        assert ' rel="nofollow" href=' in html0
        html3 = bytes(
            fixture_pages.filter(F.col("url").endswith("/d/3"))
            .select("html").collect()[0].html
        ).decode()
        assert ' rel="external noopener" href=' in html3
