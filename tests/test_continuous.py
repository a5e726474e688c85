"""Continuous-crawl plan: cuckoo-backed engine parity + freshness waves."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_spark.operators.cuckoo import ShardedCuckoo
from spider_spark.plans.continuous import ContinuousCrawler
from spider_spark.plans.crawl import CrawlConfig, CrawlEngine
from spider_spark.sources.pages import PAGES_EPOCH, seed_url_for, synthetic_pages

SEED = "h0.example/d/0"
# 30 spread seeds reach 150 of the 300 pages with BFS depth 5, so depth=6
# EXHAUSTS the reachable graph — the wave invariants below rely on that
SEEDS = [seed_url_for(i, 300) for i in range(0, 300, 10)]


@pytest.fixture(scope="module")
def pages(spark):
    return synthetic_pages(spark, 300, partitions=4).localCheckpoint(eager=True)


def _rows(df, *cols):
    return {tuple(r) for r in df.select(*cols).collect()}


class TestCuckooEngineParity:
    """The engine must produce identical crawls whichever seen-filter
    implementation prefilters the dedupe — the filter is a physical-plan
    accelerator, never semantics."""

    def test_results_and_seen_identical(self, spark, pages):
        cfg = CrawlConfig(depth=3, bloom_capacity=10_000)
        a = CrawlEngine(spark, pages, cfg).crawl(SEED)
        ck = ShardedCuckoo(expected=10_000, n_shards=2)
        b = CrawlEngine(spark, pages, cfg, seen_filter=ck).crawl(SEED)
        want_cols = ("url", "depth", "admission_rank", "fetched")
        assert _rows(a.results, *want_cols) == _rows(b.results, *want_cols)
        assert _rows(a.seen, "canon_url", "depth") == _rows(b.seen, "canon_url", "depth")
        assert ck.n_items == sum(m.admitted for m in b.metrics)

    def test_filter_growth_mid_crawl_keeps_parity(self, spark, pages):
        cfg = CrawlConfig(depth=3, bloom_capacity=10_000)
        a = CrawlEngine(spark, pages, cfg).crawl(SEED)
        tiny = ShardedCuckoo(expected=8, n_shards=1)  # saturates round 0
        eng = CrawlEngine(spark, pages, cfg, seen_filter=tiny)
        b = eng.crawl(SEED)
        assert eng.seen_filter is not tiny, "filter must have grown"
        assert _rows(a.seen, "canon_url", "depth") == _rows(b.seen, "canon_url", "depth")


class TestContinuousWaves:
    # a depth-BOUNDED bootstrap leaves horizon pages unexpanded, and a
    # refetch of one legitimately discovers new links — so these tests
    # bootstrap EXHAUSTIVELY (SEEDS + depth 6 cover the reachable graph)
    def _crawler(self, spark, pages):
        cc = ContinuousCrawler(
            spark, pages, CrawlConfig(depth=6, bloom_capacity=10_000),
            expected_urls=10_000, n_shards=2,
        )
        cc.bootstrap(SEEDS)
        return cc

    def test_idle_wave_changes_nothing(self, spark, pages):
        cc = self._crawler(spark, pages)
        seen_before = _rows(cc.seen, "canon_url", "depth", "admission_rank")
        # every page is fresh at 'now' just past the newest snapshot
        rep = cc.wave(PAGES_EPOCH + 301, ttl_sec=10_000, jitter_frac=0.1)
        assert rep.due == 0 and rep.fetched == 0 and rep.new_links == 0
        assert _rows(cc.seen, "canon_url", "depth", "admission_rank") == seen_before

    def test_wave_refetches_exactly_the_due_slice(self, spark, pages):
        cc = self._crawler(spark, pages)
        n_seen = cc.seen.count()
        rank_before = cc.next_rank
        rep = cc.wave(PAGES_EPOCH + 400, ttl_sec=300, jitter_frac=0.2)
        assert 0 < rep.due < n_seen, "fixture must expire a strict subset"
        assert rep.fetched == rep.due, "every due URL exists in the corpus"
        assert rep.new_links == 0, "static corpus: no unseen links appear"
        assert cc.seen.count() == n_seen, "expired rows replaced, none added"
        # refetched URLs carry fresh admission ranks continuing the counter
        refreshed = cc.seen.filter(F.col("admission_rank") >= rank_before)
        assert refreshed.count() == rep.due
        assert cc.next_rank == rank_before + rep.due

    def test_waves_are_deterministic(self, spark, pages):
        reports, seens = [], []
        for _ in range(2):
            cc = self._crawler(spark, pages)
            rep = cc.wave(PAGES_EPOCH + 400, ttl_sec=300, jitter_frac=0.2)
            reports.append((rep.due, rep.fetched, rep.new_links))
            seens.append(_rows(cc.seen, "canon_url", "depth", "admission_rank"))
        assert reports[0] == reports[1]
        assert seens[0] == seens[1]

    def test_second_wave_after_growth(self, spark, pages):
        cc = ContinuousCrawler(
            spark, pages, CrawlConfig(depth=6, bloom_capacity=10_000),
            expected_urls=16, n_shards=1,  # forces growth during bootstrap
        )
        cc.bootstrap(SEEDS)
        assert cc.filter.n_buckets > ShardedCuckoo(16, 1).n_buckets
        n_seen = cc.seen.count()
        rep1 = cc.wave(PAGES_EPOCH + 400, ttl_sec=300, jitter_frac=0.2)
        rep2 = cc.wave(PAGES_EPOCH + 400, ttl_sec=300, jitter_frac=0.2)
        # the same logical time expires the same slice again (it was just
        # refetched but warc_ts in the corpus is unchanged) — the loop is
        # stable and the seen set keeps its cardinality through both waves
        assert rep2.due == rep1.due and rep2.fetched == rep1.fetched
        assert cc.seen.count() == n_seen


class TestExtraDueWave:
    """wave(extra_due=): sitemap-style forced refresh — held URLs expire
    and refetch regardless of TTL; never-crawled URLs join as new seeds."""

    def _crawler(self, spark, pages):
        cc = ContinuousCrawler(
            spark, pages, CrawlConfig(depth=6, bloom_capacity=10_000),
            expected_urls=10_000, n_shards=2,
        )
        cc.bootstrap(SEEDS)
        return cc

    @staticmethod
    def _pick(cc, pages):
        """(held, unseen): a LIVE page we hold, and a live page never
        crawled. Seen also holds dead.example fetch-misses — exclude them,
        a dead 'held' would just miss again."""
        live = F.col("canon_url").startswith("https://h")
        held = (
            cc.seen.filter(live).select("canon_url")
            .orderBy("canon_url").first()[0]
        )
        unseen = (
            pages.select(F.col("url").alias("canon_url"))
            .join(cc.seen.select("canon_url"), on="canon_url", how="left_anti")
            .orderBy("canon_url").first()[0]
        )
        return held, unseen

    def test_changed_and_new_urls(self, spark, pages):
        cc = self._crawler(spark, pages)
        before = _rows(cc.seen, "canon_url")
        rank_before = cc.next_rank
        held, unseen = self._pick(cc, pages)
        extra = spark.createDataFrame(
            [(held,), (unseen,), (held,)], "url string"  # dup row: set semantics
        )
        # TTL huge: nothing is age-due — the wave is driven by extra_due only
        rep = cc.wave(PAGES_EPOCH + 301, ttl_sec=10_000_000,
                      extra_due=extra)
        assert rep.due == 2
        # both live pages fetched; the new URL's unexplored subtree may
        # legitimately add more fetches/admissions beyond the due pair
        assert rep.fetched >= 2
        after = _rows(cc.seen, "canon_url")
        assert before <= after and (unseen,) in after
        fresh = {
            r["canon_url"]
            for r in cc.seen.filter(
                F.col("admission_rank") >= rank_before
            ).select("canon_url").collect()
        }
        assert held in fresh and unseen in fresh
        # the wave's results carry a successful fetch for both
        got = {
            r["url"]
            for r in rep.result.results.filter(F.col("fetched")).collect()
        }
        assert {held, unseen} <= got

    def test_extra_due_deterministic(self, spark, pages):
        outs = []
        for _ in range(2):
            cc = self._crawler(spark, pages)
            held, unseen = self._pick(cc, pages)
            extra = spark.createDataFrame([(held,), (unseen,)], "url string")
            cc.wave(PAGES_EPOCH + 301, ttl_sec=10_000_000, extra_due=extra)
            outs.append(_rows(cc.seen, "canon_url", "depth", "admission_rank"))
        assert outs[0] == outs[1]


class TestIngestDedupGate:
    """MinHashIndex wired into the wave loop: content that near-dups an
    already-indexed document under a DIFFERENT url is dropped before
    persist (NULL content_ref, fetched stays true); a refetch never gates
    itself; surviving wave content joins the index."""

    N = 20
    A, B, C = 2, 5, 7  # A: indexed original; B: becomes near-copy of A; C: changes uniquely

    @staticmethod
    def _texts_v1(n):
        # 48 page-unique words each: cross-page shingle overlap comes only
        # from the fixed anchor/title template and is far too small a
        # fraction to win any minhash band (deterministic either way)
        return {i: " ".join(f"tok{i}w{j}" for j in range(48)) for i in range(n)}

    def _pages(self, spark, texts):
        from spider_spark.sources.pages import build_pages

        ids = spark.createDataFrame(
            [(i, texts[i], "en") for i in sorted(texts)],
            "id long, text string, lang string",
        )
        return build_pages(ids, len(texts)).localCheckpoint(eager=True)

    def _crawler(self, spark, pages, tmp_path, durable=False):
        from spider_spark.operators.dedup_index import MinHashIndex
        from spider_spark.sources.tableio import ParquetManifestIO

        idx_io = ParquetManifestIO(spark, str(tmp_path / "mhx"))
        idx = MinHashIndex(idx_io, name="gate", id_col="canon_url",
                           text_col="text", n_parts=8)
        io = ParquetManifestIO(spark, str(tmp_path / "corpus")) if durable else None
        cc = ContinuousCrawler(
            spark, pages, CrawlConfig(depth=0, bloom_capacity=10_000),
            expected_urls=10_000, io=io, dedup_index=idx,
        )
        cc.bootstrap([seed_url_for(i, self.N) for i in range(self.N)])
        return cc, idx

    def _v2(self, spark):
        texts = self._texts_v1(self.N)
        texts[self.B] = texts[self.A] + " extrabit"   # near-copy of A
        texts[self.C] = " ".join(f"new{self.C}q{j}" for j in range(48))
        return self._pages(spark, texts)

    def _url(self, i):
        return seed_url_for(i, self.N)

    @pytest.mark.parametrize("durable", [False, True])
    def test_wave_gates_cross_url_near_dup_only(self, spark, tmp_path, durable):
        v1 = self._pages(spark, self._texts_v1(self.N))
        cc, idx = self._crawler(spark, v1, tmp_path, durable=durable)
        rank_before = cc.next_rank
        cc.pages = self._v2(spark)  # the web changed; warc_ts unchanged
        rep = cc.wave(PAGES_EPOCH + 10_000_000, ttl_sec=300)  # all due
        assert rep.due == self.N and rep.fetched == self.N
        assert rep.near_dups == 1
        wave_rows = {
            r["url"]: r["content_ref"]
            for r in rep.result.results.filter(F.col("fetched")).collect()
        }
        assert wave_rows[self._url(self.B)] is None, "near-dup content dropped"
        assert wave_rows[self._url(self.A)] is not None, "refetch never self-gates"
        assert wave_rows[self._url(self.C)] is not None, "changed-but-unique kept"
        assert sum(v is None for v in wave_rows.values()) == 1
        if durable:
            # the gate ran BEFORE the round commit: the store itself holds
            # the gated row
            stored = cc.io.read("results").filter(
                (F.col("url") == self._url(self.B))
                & (F.col("admission_rank") >= rank_before)
            ).collect()
            assert len(stored) == 1 and stored[0]["content_ref"] is None

    def test_surviving_content_joins_index_gated_does_not(self, spark, tmp_path):
        v1 = self._pages(spark, self._texts_v1(self.N))
        cc, idx = self._crawler(spark, v1, tmp_path)
        cc.pages = self._v2(spark)
        cc.wave(PAGES_EPOCH + 10_000_000, ttl_sec=300)
        # C's NEW text is now indexed (added post-wave)
        probe_c = spark.createDataFrame(
            [("p1", " ".join(f"new{self.C}q{j}" for j in range(47)) + " tail")],
            "canon_url string, text string",
        )
        got_c = {r["match_id"] for r in idx.probe(probe_c).collect()}
        assert self._url(self.C) in got_c
        # B's gated text matches only A (B's copy was never indexed)
        probe_b = spark.createDataFrame(
            [("p2", self._texts_v1(self.N)[self.A] + " extrabit2")],
            "canon_url string, text string",
        )
        got_b = {r["match_id"] for r in idx.probe(probe_b).collect()}
        assert self._url(self.A) in got_b
        assert self._url(self.B) not in got_b

    def test_requires_crawl_keyed_index(self, spark, tmp_path):
        from spider_spark.operators.dedup_index import MinHashIndex
        from spider_spark.sources.tableio import ParquetManifestIO

        idx = MinHashIndex(ParquetManifestIO(spark, str(tmp_path / "x")))
        with pytest.raises(ValueError, match="canon_url"):
            ContinuousCrawler(spark, synthetic_pages(spark, 10), CrawlConfig(),
                              dedup_index=idx)


class TestDurableContinuous:
    """Durable mode (VERDICT r3 #7): the cross-wave corpus state lives in
    the TableIO store through the engine's per-round persistence, so a
    process restart between (or during) waves loses nothing — attach()
    reloads seen + rank counter and rebuilds the cuckoo filter."""

    def test_attach_after_restart_matches_unbroken_run(self, spark, pages,
                                                       tmp_path):
        from spider_spark.sources.tableio import ParquetManifestIO

        cfg = CrawlConfig(depth=6, bloom_capacity=10_000)
        # reference: one long-lived in-memory crawler, two waves
        ref = ContinuousCrawler(spark, pages, cfg,
                                expected_urls=10_000, n_shards=2)
        ref.bootstrap(SEEDS)
        ref.wave(PAGES_EPOCH + 400, ttl_sec=300, jitter_frac=0.2)
        ref_rep2 = ref.wave(PAGES_EPOCH + 500, ttl_sec=300, jitter_frac=0.2)
        want = _rows(ref.seen, "canon_url", "depth", "admission_rank")

        # durable: bootstrap + wave 1, then the process "dies"
        io = ParquetManifestIO(spark, str(tmp_path / "corpus"))
        cc1 = ContinuousCrawler(spark, pages, cfg, expected_urls=10_000,
                                n_shards=2, io=io)
        cc1.bootstrap(SEEDS)
        cc1.wave(PAGES_EPOCH + 400, ttl_sec=300, jitter_frac=0.2)
        saved_rank = cc1.next_rank
        del cc1

        # restart: attach() reloads everything from the store
        cc2 = ContinuousCrawler(spark, pages, cfg, expected_urls=10_000,
                                n_shards=2, io=io)
        cc2.attach()
        assert cc2.next_rank == saved_rank
        assert cc2.filter.n_items == cc2.seen.count()
        rep2 = cc2.wave(PAGES_EPOCH + 500, ttl_sec=300, jitter_frac=0.2)
        assert (rep2.due, rep2.fetched, rep2.new_links) == (
            ref_rep2.due, ref_rep2.fetched, ref_rep2.new_links
        )
        assert _rows(cc2.seen, "canon_url", "depth", "admission_rank") == want
        # and the STORE carries the same state (not just the live frame)
        assert _rows(io.read("seen"), "canon_url", "depth",
                     "admission_rank") == want

    def test_attach_sanitizes_killed_wave(self, spark, pages, tmp_path):
        from spider_spark.sources.tableio import ParquetManifestIO

        cfg = CrawlConfig(depth=6, bloom_capacity=10_000)
        io = ParquetManifestIO(spark, str(tmp_path / "corpus"))
        cc = ContinuousCrawler(spark, pages, cfg, expected_urls=10_000,
                               n_shards=2, io=io)
        cc.bootstrap(SEEDS)
        pre = _rows(io.read("seen"), "canon_url", "depth", "admission_rank")

        # wave killed before its first metrics commit
        broken = ContinuousCrawler(spark, pages, cfg, expected_urls=10_000,
                                   n_shards=2, io=io)
        broken.attach()

        def boom(*a, **k):
            raise RuntimeError("killed")

        eng = broken._engine()
        eng._checkpoint = boom
        broken._engine = lambda: eng
        with pytest.raises(RuntimeError):
            broken.wave(PAGES_EPOCH + 400, ttl_sec=300, jitter_frac=0.2)

        fresh = ContinuousCrawler(spark, pages, cfg, expected_urls=10_000,
                                  n_shards=2, io=io)
        fresh.attach()
        assert _rows(io.read("seen"), "canon_url", "depth",
                     "admission_rank") == pre
        # the reissued wave completes with globally unique ranks
        fresh.wave(PAGES_EPOCH + 400, ttl_sec=300, jitter_frac=0.2)
        ranks = [r["admission_rank"] for r in io.read("seen").collect()]
        assert len(ranks) == len(set(ranks))

    def test_durable_config_requires_io(self, spark, pages):
        with pytest.raises(ValueError):
            ContinuousCrawler(spark, pages, CrawlConfig(durable=True))


class TestTieredWaveCapacity:
    def test_capped_tiered_waves_match_uncapped_membership(self, spark, pages):
        """Corpus-lifetime host tiers + a per-round fetch cap reschedule
        wave work without changing what gets (re)crawled: bootstrap and
        wave seen sets equal the uncapped crawler's exactly."""
        tiers = spark.createDataFrame(
            [("h0.example", 0)], "host string, tier int"
        )

        def build(capped: bool):
            cfg = CrawlConfig(
                depth=6, bloom_capacity=10_000,
                max_fetch_per_round=7 if capped else None,
            )
            cc = ContinuousCrawler(
                spark, pages, cfg, expected_urls=10_000, n_shards=2,
                host_tiers=tiers if capped else None,
            )
            cc.bootstrap(SEEDS)
            return cc

        base, capped = build(False), build(True)
        key = lambda cc: _rows(cc.seen, "canon_url", "depth")  # noqa: E731
        assert key(capped) == key(base)
        rb = base.wave(PAGES_EPOCH + 400, ttl_sec=300, jitter_frac=0.2)
        rc = capped.wave(PAGES_EPOCH + 400, ttl_sec=300, jitter_frac=0.2)
        assert (rc.due, rc.fetched, rc.new_links) == (
            rb.due, rb.fetched, rb.new_links
        )
        assert key(capped) == key(base)
