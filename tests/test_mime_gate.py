"""CrawlConfig.html_only — the MIME parse gate.

Non-HTML payloads (sniff_mime != text/html) are fetched and persisted
like any page (fetched=TRUE, content_ref kept) but never parsed: NULL
html enters the Arrow kernel, so binaries cross neither the Python
boundary nor the link pipeline. The fixture is adversarial: binary pages
carry PDF magic bytes AHEAD of real markup-with-links, so only a real
MIME verdict (not "no links found") keeps their edges out.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_spark.plans.crawl import CrawlConfig, CrawlEngine
from spider_spark.sources.pages import build_pages, seed_url_for

N = 60
SEED_ID = 1
DEPTH = 4
MOD = 3


def _ids(spark, n):
    return spark.range(n).select(
        F.col("id"),
        F.format_string("body %d", F.col("id")).alias("text"),
        F.lit("en").alias("lang"),
    )


def _python_reference(n, seed, depth, mod):
    """Independent BFS; parents with p % mod == 0 are binary — seen and
    fetched, but none of their edges (c1, c2, dead) are emitted."""
    seen = {seed: 0}
    level = [seed]
    for d in range(1, depth + 1):
        nxt = []
        for p in level:
            if mod is not None and p % mod == 0:
                continue
            for c in [(2 * p + 1) % n, (3 * p + 2) % n, n + p]:
                if c == seed or c in seen:
                    continue
                seen[c] = d
                if c < n:
                    nxt.append(c)
        level = nxt
    return seen


def _url_of(i, n):
    if i >= n:
        return f"https://dead.example/d/{i - n}"
    return seed_url_for(i, n)


class TestMimeGate:
    @pytest.fixture(scope="class")
    def fixture_pages(self, spark):
        return build_pages(_ids(spark, N), N, binary_mod=MOD)

    @pytest.fixture(scope="class")
    def gated(self, spark, fixture_pages):
        eng = CrawlEngine(
            spark, fixture_pages, CrawlConfig(depth=DEPTH, html_only=True)
        )
        return eng.crawl(seed_url_for(SEED_ID, N))

    def test_seen_matches_reference(self, gated):
        got = {r.canon_url: r.depth for r in gated.seen.collect()}
        ref = {
            _url_of(i, N): d
            for i, d in _python_reference(N, SEED_ID, DEPTH, MOD).items()
        }
        assert got == ref
        # the gate bit: strictly smaller than the ungated graph
        full = _python_reference(N, SEED_ID, DEPTH, None)
        assert set(_python_reference(N, SEED_ID, DEPTH, MOD)) < set(full)

    def test_binary_pages_fetched_with_null_title(self, gated):
        rows = {r.url: r for r in gated.results.collect()}
        ref = _python_reference(N, SEED_ID, DEPTH, MOD)
        binary_seen = [i for i in ref if i < N and i % MOD == 0]
        assert binary_seen, "fixture must reach at least one binary page"
        for i in binary_seen:
            r = rows[_url_of(i, N)]
            assert r.fetched is True
            assert r.title is None
            assert r.content_ref is not None  # stored as a blob, not parsed

    def test_html_pages_unaffected(self, gated):
        rows = {r.url: r for r in gated.results.collect()}
        ref = _python_reference(N, SEED_ID, DEPTH, MOD)
        html_seen = [
            i for i in ref
            if i < N and i % MOD != 0 and i % 17 != 0 and i != SEED_ID
        ]
        assert html_seen
        for i in html_seen:
            assert rows[_url_of(i, N)].title == f"Doc {i}"

    def test_gate_off_follows_binary_links(self, spark, fixture_pages):
        """Reference parity: without the gate, the magic prefix is inert
        (the HTML parser digs the links out of the PDF 'payload')."""
        eng = CrawlEngine(spark, fixture_pages, CrawlConfig(depth=DEPTH))
        got = {r.canon_url: r.depth for r in eng.crawl(
            seed_url_for(SEED_ID, N)).seen.collect()}
        ref = {
            _url_of(i, N): d
            for i, d in _python_reference(N, SEED_ID, DEPTH, None).items()
        }
        assert got == ref
