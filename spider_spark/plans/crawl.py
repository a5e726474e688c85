"""The crawl plan: level-synchronous BFS frontier rounds (SURVEY I1/§3.1).

The reference's flagship entry is ``crawl URL --depth N`` — a recursive
asyncio expansion (``load(url, level)``, crawler.py:93-119) with a shared
seen-set (use_cache.py:14), fire-and-forget persistence (crawler.py:106-112)
and racy admission order (quirk Q2). This engine re-expresses it as a
driver-side loop of DataFrame jobs, one **round** per BFS level:

    frontier(r) ──schedule──▶ eligible ──fetch-join──▶ pages hit/miss
       ▲                                     │ parse UDF (Arrow)
       │                                     ▼
    carryover ◀──────────── explode links ──▶ results(r)  (append)
       │                         │
       │              min-depth intra-round dedupe (Q2 pinned: BFS)
       │                         │
       │              bloom prefilter + exact anti-join vs seen  (D1/H3)
       │                         │
       └──────── union ◀── rank admissions (depth, parent_rank, link_pos)

Scale notes (the parts that must survive 1000 executors × 100 TB):

* **fetch-join direction** — the frontier round is small relative to the
  pages table, so the engine broadcasts the *frontier* and streams the
  pages scan map-side (inner broadcast join + broadcast anti-join for the
  misses). The 100 TB side is never shuffled. Above a threshold it falls
  back to a key-bucketed sort-merge join.
* **no global sorts** — admission ranks come from the two-phase ranking
  in :mod:`spider_spark.operators.ranking`, in bucket mode: arithmetic
  (depth, parent_rank)-range buckets replace range partitioning's
  sampling job, so the explode → dedupe → seen-gate → rank chain is ONE
  job with one shuffle per round.
* **lineage is cut every round** — either a durable TableIO snapshot commit
  (atomic, resumable: E6 analog) or an eager ``localCheckpoint``.
* **counters** — reference counters (crawler.py:61-62,87-90) map to per
  round metrics rows: ``total_calls`` ≡ admitted URLs (the cache admits
  before the fetch, use_cache.py:22-24, so failures still count —
  crawler.py:98), ``successful_crawls`` ≡ fetch-join hits (crawler.py:101).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spider_spark.functions.parse import make_parse_udf
from spider_spark.functions.urlkit import (
    CanonURL,
    content_ref_col,
    make_seed_canon_udf,
)
from pyspark.storagelevel import StorageLevel

from spider_spark.operators.bloom import (
    ShardedBloom,
    build_into,
    filter_unseen,
    make_fill_stats_collector,
)
from spider_spark.operators.cuckoo import (
    ShardedCuckoo,
    add_into,
    build_cuckoo,
    filter_unseen_cuckoo,
)

# serialized checkpoint storage: ~5× smaller than deserialized rows, far
# less GC pressure, and the extra ser/deser CPU parallelizes with cores
CHECKPOINT_LEVEL = StorageLevel.MEMORY_AND_DISK
from spider_spark.operators.politeness import (
    RobotsRules,
    global_round_cap,
    schedule,
)
from spider_spark.operators.ranking import with_global_rank

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("canon_url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("seed", T.StringType(), False),
        T.StructField("parent", T.StringType(), False),
        T.StructField("admission_rank", T.LongType(), False),
        T.StructField("round_admitted", T.IntegerType(), False),
    ]
)

RESULTS_COLUMNS = [
    "url", "title", "parent", "content_ref", "depth", "crawl_round",
    "admission_rank", "fetched",
]


@dataclass(frozen=True)
class CrawlConfig:
    """Engine knobs (reference CLI surface: cli.py:62-98 + config.ini)."""

    depth: int = 1                  # --depth (cli.py:64-66)
    budget: int | None = None       # per-host per-round; None ≡ reference Q4 no-op
    overwrite: bool = True          # --no-overwrite → False (cli.py:84-88)
    use_cache: bool = True          # --no-cache → False (use_cache.py:19-28):
                                    # seen-set gate off; links refetched each
                                    # round they reappear (intra-round dedupe
                                    # kept for determinism — documented dev.)
    resolve_base: str = "seed"      # Q1 parity; "page" = corrected base
    honor_nofollow: bool = False    # drop rel=nofollow/ugc/sponsored anchors
                                    # at parse time (before dedupe/admission);
                                    # False = reference parity (the reference
                                    # follows every href, crawler.py:140-155)
    html_only: bool = False         # MIME parse gate: non-HTML payloads
                                    # (sniff_mime != text/html) are fetched
                                    # and persisted like any page but NEVER
                                    # parsed — NULL html enters the Arrow
                                    # kernel, so binaries cross neither the
                                    # Python boundary nor the link pipeline;
                                    # False = reference parity (BeautifulSoup
                                    # over every payload, crawler.py:140)
    use_bloom: bool = True
    bloom_fpp: float = 0.01
    bloom_capacity: int = 1_000_000  # initial sizing HINT only: the engine
                                    # tracks the exact seen count and rebuilds
                                    # the filter 4× bigger from the seen table
                                    # whenever the count outgrows capacity
    bloom_shards: int = 1           # 10^10 path: shard by url-hash so each
                                    # executor task pulls only the broadcast
                                    # shards its rows touch (bloom.py)
    filter_spill_dir: str | None = None  # 10^10 path, part 2: seen-filter
                                    # shards live as versioned files on a
                                    # shared filesystem (built/mutated/probed
                                    # executor-side); the driver holds only
                                    # paths — without this an in-memory
                                    # filter puts the WHOLE aggregate on the
                                    # driver at every build/grow (~12 GB
                                    # bloom / ~21 GB cuckoo at 10^10 URLs)
                                    # and fails loudly past 4 GiB (bloom.py)
    salt: int = 8                   # politeness salting factor (H4)
    politeness_site: bool = False   # budget per registrable domain (PSL
                                    # eTLD+1, functions/domains.py) instead
                                    # of per raw host: subdomain farms share
                                    # ONE allowance. host_budgets must then
                                    # be keyed by registrable domain. Seen-
                                    # set invariance is grouping-independent
                                    # (budgets reschedule, never drop)
    strict_bfs: bool = True         # budgeted rounds fetch min-depth level only:
                                    # preserves min-depth discovery, making the
                                    # seen-set budget-invariance a theorem (see
                                    # operators/politeness.py docstring); False =
                                    # max-throughput mode (any depth may fetch)
    waves: int = 1                  # politeness windows batched per Spark round
    max_fetch_per_round: int | None = None  # tiered global round capacity:
                                    # after per-host budgets, keep only the
                                    # top-N eligible URLs by (tier, depth,
                                    # admission) — high-tier hosts (engine
                                    # host_tiers arg) claim bounded round
                                    # capacity first, the rest carry over
                                    # (seen set invariant under strict_bfs,
                                    # operators/politeness.py
                                    # global_round_cap)
    broadcast_threshold: int = 2_000_000  # frontier rows; above → SMJ fetch-join
    durable: bool = False           # checkpoint rounds via TableIO (resume)
    seen_buckets: int = 32          # durable mode: the seen set is kept in a
                                    # catalog table bucketed by canon_url, so
                                    # the per-round anti-join shuffles only
                                    # the candidate delta — never the
                                    # accumulated seen set (VERDICT r1 wrong-3)
    max_rounds: int | None = None
    verify_text: bool = True        # enforce byte-identical text invariant
    rank_bucket_mode: bool = True   # arithmetic rank buckets (no sampling
                                    # pass); False = repartitionByRange
                                    # (A/B escape hatch; results identical
                                    # either way — tests/test_ranking.py)
    vacuum_every: int | None = None  # durable mode: expire superseded
                                    # frontier/seen/results snapshots every K
                                    # rounds (keeps the store O(live data)
                                    # over a long crawl; Iceberg
                                    # expire_snapshots cadence analog)
    vacuum_keep_last: int = 4       # history entries retained per table —
                                    # must cover rollback to the last metrics
                                    # marker (1 round = 1 entry per table)


@dataclass
class RoundMetrics:
    round: int
    admitted: int       # total_calls delta (crawler.py:98)
    fetched: int        # successful_crawls delta (crawler.py:101)
    new_links: int
    carryover: int
    blocked: int
    elapsed_sec: float


@dataclass
class CrawlResult:
    results: DataFrame
    seen: DataFrame
    metrics: list[RoundMetrics] = field(default_factory=list)

    @property
    def total_calls(self) -> int:
        return sum(m.admitted for m in self.metrics)

    @property
    def successful_crawls(self) -> int:
        return sum(m.fetched for m in self.metrics)

    def catch(self, parent_url: str, limit: int = 10) -> DataFrame:
        """P1: ``SELECT url,title WHERE parent=? LIMIT n``
        (postgres_database.py:144-160; parent key is the seed's human_repr,
        db_ops_controller.py:59), presented in admission order (L2)."""
        parent = CanonURL.seed(parent_url).human_repr()
        return (
            self.results.filter(F.col("fetched") & (F.col("parent") == F.lit(parent)))
            .orderBy("admission_rank")
            .select("url", "title")
            .limit(limit)
        )

    def count_all(self) -> int:
        """A1 (postgres_database.py:184-200): saved rows = fetched pages
        (failed downloads are never saved, crawler.py:102-104)."""
        return self.results.filter(F.col("fetched")).count()


class CrawlEngine:
    """Iterative frontier crawler over a pages table.

    **Durability modes.** ``durable=False`` (default, right for bounded
    local runs) cuts lineage with ``localCheckpoint`` — executor-memory
    checkpoints that die with an executor: on a real multi-executor
    cluster a lost executor loses rounds, so LONG crawls should run
    ``durable=True``, where every round commits an atomic TableIO snapshot
    (kill-anywhere ``resume()``, per-round lineage, and the bucketed-seen
    co-located anti-join). The durable path is the production
    configuration; non-durable is the fast path for tests/benchmarks and
    fits single-JVM local mode where executor loss ≡ process loss."""

    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        config: CrawlConfig | None = None,
        io=None,  # TableIO; required when config.durable
        robots: DataFrame | None = None,
        robots_now=None,            # datetime for TTL evaluation
        robots_ttl_sec: float | None = None,
        seen_filter: ShardedCuckoo | None = None,
        content_gate=None,
        blocked_hosts=None,  # list[str] | DataFrame('host') — link-admission gate
        trap_guard: dict | None = None,   # in-crawl trap detection thresholds
        host_stats: DataFrame | None = None,  # prior accrued per-host stats
        host_tiers: DataFrame | None = None,  # ('host', 'tier' int): crawl
                                    # priority tiers (lower = sooner) consumed
                                    # by max_fetch_per_round — e.g. TrustRank/
                                    # OPIC score buckets; unlisted hosts get
                                    # the lowest priority
        host_budgets: DataFrame | None = None,  # ('host', 'budget' int):
                                    # PER-HOST round budgets composing with
                                    # cfg.budget and robots delay caps by
                                    # minimum (operators/politeness.py
                                    # schedule; clamped ≥1, waves-scaled);
                                    # unlisted hosts keep cfg.budget
    ):
        self.spark = spark
        self.pages = pages
        self.config = config or CrawlConfig()
        self.io = io
        self.rules = RobotsRules.from_df(robots, now=robots_now, ttl_sec=robots_ttl_sec)
        self.phase_times: dict[str, float] = {}  # cumulative sec per phase
        # externally-owned DELETABLE seen filter (continuous-crawl mode):
        # must already contain exactly prior_seen's keys; the engine adds
        # this crawl's admissions to it and replaces it on growth (read it
        # back via self.seen_filter after crawl()). Overrides use_bloom.
        # Price of deletability: per-round admissions can't fold into the
        # ranking stats pass (cuckoo tables don't OR-merge), so cuckoo mode
        # pays one extra keyed job per round vs the bloom fill fold.
        self.seen_filter = seen_filter
        # ingest-time content dedup hook (continuous-crawl near-dup gate):
        # called once per round with this round's fetched pages as a
        # ``(canon_url, text)`` DataFrame; returns the ``canon_url``s whose
        # content must NOT be persisted. Gated rows stay ``fetched=true``
        # (the URL was crawled, counts, and is seen) but carry a NULL
        # ``content_ref`` — the same "content not saved" signal a failed
        # download leaves — and the gate runs BEFORE the durable round
        # commit, so duplicate content never reaches the store. Matches
        # only against state the gate closure owns (e.g. a persisted
        # MinHashIndex); intra-round duplicates are out of scope — the
        # one-shot dedup sweep (operators/dedupe.py) is the batch tool.
        self.content_gate = content_gate
        # host-level admission gate (spider-trap / domain-blocklist defense):
        # discovered links whose host is blocked are DROPPED before the
        # intra-round dedupe shuffle — never admitted, never fetched, never
        # recorded (the reference's link filters drop silently the same way,
        # crawler.py:148-155). Seeds are operator-provided and bypass the
        # gate. A list broadcasts; a DataFrame('host') joins keyed (AQE
        # picks the strategy — pass a DataFrame for blocklists too big to
        # broadcast, e.g. a UT1 dump or accumulated trap_hosts verdicts).
        if blocked_hosts is None:
            self._blocked = None
            self._blocked_broadcast = False
        elif isinstance(blocked_hosts, (list, tuple, set)):
            self._blocked = spark.createDataFrame(
                [(h.lower(),) for h in sorted(blocked_hosts)], "host string"
            )
            self._blocked_broadcast = True
        else:
            self._blocked = blocked_hosts.select(F.lower("host").alias("host"))
            self._blocked_broadcast = False
        # in-crawl dynamic trap detection (the Heritrix pathological-path /
        # too-many-paths defense, operators/traps.py): when ``trap_guard``
        # is a dict of trap_verdict thresholds, every round's candidate
        # links accrue into a host-keyed structural-stats table (O(hosts)
        # rows, associative merge — never a rescan of URL history) and
        # hosts whose accrued stats cross a threshold are blocked from the
        # FOLLOWING round on (the round that crossed the threshold already
        # admitted its batch — deterministic either way, and matching
        # Heritrix, which quarantines a queue only after the rule fires).
        # ``host_stats`` seeds the accrual with a prior table (a
        # ContinuousCrawler carries it across waves). Cost when on: one
        # candidate materialization + one tiny host agg per round.
        # tier table for the global round cap: normalized once; joined
        # (broadcast — it is host-level, tiny next to the frontier) onto the
        # eligible set only when max_fetch_per_round is set. Tiers order
        # capacity BETWEEN hosts; per-host rate limits stay the budget's job.
        self._host_tiers = (
            host_tiers.select(
                F.lower(F.col("host")).alias("host"),
                F.col("tier").cast("int").alias("__tier"),
            )
            if host_tiers is not None
            else None
        )
        # per-host budget table: normalization (lowercase, clamp, wave
        # scaling) happens inside schedule(); carried as-is
        self._host_budgets = host_budgets
        self.trap_guard = trap_guard
        self.host_stats = host_stats
        self._dyn_blocked = None
        if trap_guard is not None and host_stats is not None:
            self._refresh_dyn_blocked()
        # durable commits carry a monotone (epoch, round) marker: each
        # crawl() on a store with prior metrics opens a new epoch, so a
        # recrawl wave's round -1/0/… commits can never be mistaken for a
        # previous crawl's (whose round numbers may be higher) — see
        # _rollback_to_marker (ADVICE r3)
        self._epoch = 0
        if self.config.durable and io is None:
            raise ValueError("durable crawl requires a TableIO")

    # -- durable seen membership -----------------------------------------------
    #
    # Durable crawls read the seen MEMBERSHIP through the TableIO's bucketed
    # key mirror (tableio.read_bucketed_keys): a catalog table bucketed +
    # sorted by canon_url, synced O(delta) to the committed manifest. The
    # per-round anti-join then exchanges only the candidate delta into the
    # bucket layout; the accumulated seen set is read in place (no Exchange
    # over its scan — pinned by tests/test_plans.py::TestDurableSeenJoin).
    # Because the mirror syncs from the COMMITTED snapshot, a kill mid-round
    # can never make a stale mirror row block a replayed admission.

    def _seen_keys(self) -> DataFrame:
        return self.io.read_bucketed_keys(
            "seen", "canon_url", self.config.seen_buckets
        )

    def _timed(self, phase: str, fn):
        t0 = time.perf_counter()
        out = fn()
        self.phase_times[phase] = (
            self.phase_times.get(phase, 0.0) + time.perf_counter() - t0
        )
        return out

    # -- in-crawl trap guard --------------------------------------------------

    @property
    def dynamic_blocked_hosts(self) -> DataFrame | None:
        """Hosts the trap guard has flagged so far (``host`` column), or
        None when the guard is off / nothing accrued yet."""
        return self._dyn_blocked

    def _refresh_dyn_blocked(self) -> None:
        """Recompute the dynamic block list from the accrued host stats —
        O(hosts) rows in, O(trap hosts) out, checkpointed tiny."""
        from spider_spark.operators.traps import trap_verdict

        self._dyn_blocked = (
            trap_verdict(self.host_stats, **self.trap_guard)
            .filter(F.col("is_trap"))
            .select("host")
            .localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)
        )

    def _accrue_trap_stats(self, candidates: DataFrame) -> None:
        """Fold one round's candidate links into the running host-stats
        table (associative counters — merging round deltas equals the
        full-history aggregation, operators/traps.py)."""
        from spider_spark.operators.traps import host_stats, merge_host_stats

        delta = host_stats(
            candidates.select(F.col("canon_url").alias("url")),
            depth_limit=self.trap_guard.get("depth_limit", 8),
        )
        merged = (
            delta if self.host_stats is None
            else merge_host_stats(self.host_stats, delta)
        )
        self.host_stats = merged.localCheckpoint(
            eager=True, storageLevel=CHECKPOINT_LEVEL
        )
        self._refresh_dyn_blocked()

    # -- frontier bootstrap -------------------------------------------------

    def _seed_frontier(self, seeds: list[str], start_rank: int = 0) -> DataFrame:
        rows = []
        for rank, raw in enumerate(seeds, start=start_rank):
            cu = CanonURL.seed(raw)  # scheme default, crawler.py:51-52
            rows.append(
                (str(cu), cu.host, 0, str(cu), cu.human_repr(), rank, 0)
            )
        return self.spark.createDataFrame(rows, FRONTIER_SCHEMA)

    def _seed_frontier_df(self, seeds: DataFrame,
                          assume_canonical: bool = False,
                          assume_unique: bool = False,
                          start_rank: int = 0) -> tuple[DataFrame, int]:
        """Distributed seed ingestion (S1 at scale): a DataFrame with a
        ``url`` column; canonicalization runs in an Arrow UDF, admission
        rank is assigned by deterministic url order — the driver never
        materializes the seed list. Returns (frontier, n_seeds).

        ``assume_canonical=True`` is the trusted fast path for seeds that
        come out of this engine's own tables (already canonical, scheme +
        non-empty unencoded path): host extraction stays JVM-side and
        ``human_repr == str``, skipping the Python canonicalization pass."""
        if assume_canonical:
            projected = seeds.select(
                F.col("url").alias("canon_url"),
                F.regexp_extract(F.col("url"), r"^[a-z][a-z0-9+.-]*://([^/]+)", 1)
                .alias("host"),
                F.col("url").alias("parent"),
            )
        else:
            canon_udf = make_seed_canon_udf()
            projected = seeds.select(canon_udf(F.col("url")).alias("c")).select(
                F.col("c.canon_url").alias("canon_url"),
                F.col("c.host").alias("host"),
                F.col("c.human").alias("parent"),
            )
        if assume_unique:
            # trusted-unique seeds (e.g. keys of one of this engine's own
            # tables): skip the dedupe shuffle + its materialization; the
            # ranking shuffle's sampling pass re-evaluates only cheap JVM
            # projections (never a Python pass — assume_unique implies
            # assume_canonical's JVM path in practice)
            canon = projected
        else:
            canon = (
                projected.dropDuplicates(["canon_url"])
                # materialize before ranking: the range partitioner's
                # sampling pass and the real shuffle would otherwise both
                # re-run the canonicalization UDF + dedupe shuffle
                .localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)
            )
        ranked, n = with_global_rank(
            canon, ["canon_url"], "admission_rank", start=start_rank, with_count=True
        )
        frontier = ranked.select(
            "canon_url",
            "host",
            F.lit(0).alias("depth"),
            F.col("canon_url").alias("seed"),
            "parent",
            "admission_rank",
            F.lit(0).alias("round_admitted"),
        )
        return frontier, n

    # -- the round loop -------------------------------------------------------

    def crawl(self, seeds: str | list[str] | DataFrame,
              seeds_canonical: bool = False,
              seeds_unique: bool = False,
              prior_seen: DataFrame | None = None,
              start_rank: int = 0) -> CrawlResult:
        """``prior_seen``/``start_rank`` continue an existing corpus
        (continuous-crawl waves): seeds rank from ``start_rank``, link
        admissions are gated against ``prior_seen`` ∪ this crawl's
        admissions, and — when an external ``seen_filter`` cuckoo is set —
        the filter is trusted to already hold exactly ``prior_seen``'s
        keys (the engine adds only the new admissions)."""
        if isinstance(seeds, str):
            seeds = [seeds]
        if isinstance(seeds, DataFrame):
            # frontier/seen stay lazy projections over the checkpointed
            # ranking intermediate — no extra materialization passes
            frontier, n_seeds = self._timed(
                "seed",
                lambda: self._seed_frontier_df(
                    seeds, assume_canonical=seeds_canonical,
                    assume_unique=seeds_unique, start_rank=start_rank,
                ),
            )
            seen = frontier.select("canon_url", "depth", "admission_rank")
        else:
            n_seeds = len(seeds)
            frontier = self._timed(
                "seed", lambda: self._seed_frontier(seeds, start_rank).localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)
            )
            seen = self._timed(
                "seed",
                lambda: frontier.select(
                    "canon_url", "depth", "admission_rank"
                ).localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL),
            )
        if self.seen_filter is not None:
            # external deletable filter: contains prior_seen already; add
            # the seeds (a recrawl wave's due URLs re-enter here). Grow
            # first if the seeds would push past the design load — the
            # contract is that the filter holds exactly prior_seen's keys,
            # so prior_seen is the full rebuild source (None ⇒ empty).
            ck = self.seen_filter
            if ck.n_items + n_seeds > ck.expected:
                bigger = 4 * max(ck.n_items + n_seeds, 1)
                grown = (
                    build_cuckoo(prior_seen.select("canon_url"), "canon_url",
                                 expected=bigger, n_shards=ck.n_shards,
                                 spill_dir=ck.spill_dir)
                    if prior_seen is not None
                    else ShardedCuckoo(bigger, n_shards=ck.n_shards,
                                       spill_dir=ck.spill_dir)
                )
                grown.n_items = ck.n_items
                ck.destroy_broadcasts()
                if ck.spilled:
                    ck.store.gc([])  # superseded filter's shard files
                self.seen_filter = grown
            add_into(self.seen_filter, seen.select("canon_url"), "canon_url",
                     count_items=False)
            self.seen_filter.n_items += n_seeds
        if prior_seen is not None:
            seen = prior_seen.select(
                "canon_url", "depth", "admission_rank"
            ).unionByName(seen)
        next_rank = start_rank + n_seeds
        results_parts: list[DataFrame] = []
        metrics: list[RoundMetrics] = []
        bloom = (
            ShardedBloom(self.config.bloom_capacity, self.config.bloom_fpp,
                         self.config.bloom_shards,
                         spill_dir=self.config.filter_spill_dir)
            if self.config.use_bloom and self.seen_filter is None
            else None
        )
        if bloom is not None:
            build_into(bloom, seen, "canon_url", count_items=False)
            bloom.n_items += n_seeds + (
                prior_seen.count() if prior_seen is not None else 0
            )
        if self.config.durable:
            # open a new epoch after any prior crawl in this store; the
            # seeds commit below is this wave's first durable write, so a
            # kill at any later point leaves commits tagged (epoch > prior)
            # that resume()/rollback can always identify as the wave's
            prev = self.io.latest_meta("metrics")
            self._epoch = (prev.get("epoch") or 0) + 1 if prev else 0
            # bootstrap commit: the mirror (and resume) read seen membership
            # from the manifest, so the seeds must be committed before the
            # first round's dedupe
            self.io.commit_overwrite("seen", seen, bucket_by="canon_url",
                                     meta={"round": -1, "epoch": self._epoch})

        r = 0
        # round-0 admissions metric counts THIS crawl's seeds (ranks may
        # start past zero when continuing a corpus via start_rank)
        self._seed_count = n_seeds
        state = _RoundState(frontier, seen, next_rank, r, frontier_count=n_seeds)
        try:
            while True:
                state, round_results, m, bloom = self._run_round(state, bloom)
                results_parts.append(round_results)
                metrics.append(m)
                if self.config.durable:
                    self._checkpoint(state, round_results, m)
                    self._maybe_vacuum(m.round)
                if state.frontier_count == 0:
                    break
                if self.config.max_rounds is not None and state.round >= self.config.max_rounds:
                    break

            results = results_parts[0]
            for p in results_parts[1:]:
                results = results.unionByName(p)
            results = self._timed(
                "final_results", lambda: results.localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)
            )
        finally:
            # derived state; the manifest snapshot remains. In the finally
            # so an exception mid-crawl can't leak catalog mirror tables
            # into the warehouse (ADVICE r2).
            if self.config.durable:
                self.io.drop_mirror("seen")
        return CrawlResult(results=results, seen=state.seen, metrics=metrics)

    def _maybe_vacuum(self, completed_round: int) -> None:
        """Every ``vacuum_every`` rounds, expire superseded snapshots so a
        long durable crawl's store stays O(live data): the frontier is
        overwritten per round (pure garbage past the marker), seen/results
        are delta chains whose directories remain referenced — vacuum only
        trims their manifest tail. ``vacuum_keep_last`` entries stay, which
        covers rollback to the latest metrics marker."""
        cfg = self.config
        if not cfg.vacuum_every or (completed_round + 1) % cfg.vacuum_every:
            return
        def _vac():
            for t in ("frontier", "seen", "results", "metrics"):
                if self.io.exists(t):
                    self.io.vacuum(t, keep_last=max(cfg.vacuum_keep_last, 2))
        self._timed("vacuum", _vac)

    # -- internals -------------------------------------------------------------

    def _grow_bloom(self, bloom: ShardedBloom, seen: DataFrame) -> ShardedBloom:
        """The seen count outgrew the filter's sized-for capacity: rebuild
        from the seen table at 4× the current count (geometric growth —
        amortized O(1) rebuilds per key over the whole crawl), keeping fpp
        near nominal instead of silently saturating (VERDICT r1 wrong-1)."""
        bloom.destroy_broadcasts()  # the superseded filter's handles die here
        bigger = ShardedBloom(
            4 * max(bloom.n_items, 1), self.config.bloom_fpp, bloom.n_shards,
            spill_dir=bloom.spill_dir,
        )
        build_into(bigger, seen, "canon_url", count_items=False)
        bigger.n_items = bloom.n_items
        if bloom.spilled:
            bloom.store.gc([])  # superseded filter's shard files
        return bigger

    def _run_round(self, state: "_RoundState", bloom: ShardedBloom | None):
        t0 = time.perf_counter()
        cfg = self.config
        r = state.round

        # fast path: no budget and no robots rules → the whole frontier is
        # eligible, carryover/blocked are statically empty — skip the
        # scheduler plumbing and its count jobs entirely (the reference's
        # semaphore never limits either, quirk Q4).
        no_politeness = (
            cfg.budget is None
            and self.rules.trivially_empty
            and cfg.max_fetch_per_round is None
            and self._host_budgets is None
        )
        if no_politeness:
            eligible = state.frontier  # already checkpointed by the caller
            carryover = state.frontier.limit(0)
            n_eligible = (
                state.frontier_count
                if state.frontier_count >= 0
                else state.frontier.count()
            )
            n_blocked = 0
        else:
            from pyspark.sql import Observation

            sched_in, group_col, host_budgets = (
                state.frontier, "host", self._host_budgets
            )
            if cfg.politeness_site:
                # site-level grouping: map this round's hosts (a bounded,
                # host-keyed relation — never the frontier itself) to
                # their registrable domain and rate-limit per site
                from spider_spark.functions.domains import (
                    registrable_domains,
                )

                site_map = registrable_domains(
                    state.frontier.select("host")
                ).select(
                    "host",
                    F.coalesce("registrable", "host").alias("__site"),
                )
                sched_in = state.frontier.join(
                    site_map, on="host", how="left"
                ).withColumn(
                    "__site", F.coalesce(F.col("__site"), F.col("host"))
                )
                group_col = "__site"
                if host_budgets is not None:
                    host_budgets = host_budgets.withColumnRenamed(
                        "host", "__site"
                    )
            eligible, carryover, blocked = schedule(
                sched_in, cfg.budget, self.rules, salt=cfg.salt,
                strict_bfs=cfg.strict_bfs, waves=cfg.waves,
                host_budgets=host_budgets, group_col=group_col,
            )
            if cfg.politeness_site:
                eligible = eligible.drop("__site")
                carryover = carryover.drop("__site")
                blocked = blocked.drop("__site")
            if cfg.max_fetch_per_round is not None:
                # tiered global round capacity (after per-host budgets):
                # top-N by (tier, depth, admission); the rest defer into
                # carryover and re-compete next round at the min-depth gate
                tier_col = None
                if self._host_tiers is not None:
                    eligible = eligible.join(
                        F.broadcast(self._host_tiers), on="host", how="left"
                    ).withColumn(
                        "__tier",
                        F.coalesce(F.col("__tier"), F.lit(2147483647)),
                    )
                    tier_col = "__tier"
                kept, deferred = global_round_cap(
                    eligible, cfg.max_fetch_per_round,
                    tier_col=tier_col, salt=cfg.salt,
                    strict_bfs=cfg.strict_bfs,
                )
                eligible = kept.drop("__tier")
                carryover = carryover.unionByName(deferred.drop("__tier"))
            # count rides the checkpoint job via observe(): no extra job
            el_obs = Observation()
            eligible = eligible.observe(
                el_obs, F.count(F.lit(1)).alias("n")
            ).localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)
            n_eligible = el_obs.get["n"]
            # blocked is derived from set arithmetic at round end
            # (frontier_in = eligible + carryover + blocked) when the
            # incoming frontier count is known exactly — the only
            # blocked.count() job left is the unknown-count resume edge
            n_blocked = -1 if state.frontier_count >= 0 else blocked.count()

        # ---- fetch-join (S2): frontier ⋈ pages; miss ≡ failed download ----
        pages_cols = self.pages.select(
            F.col("url").alias("canon_url"), "html",
            *(["text"] if cfg.verify_text else []),
        )
        if n_eligible <= cfg.broadcast_threshold:
            # broadcast the small frontier; the pages scan is map-side only
            hits = pages_cols.join(F.broadcast(eligible), on="canon_url", how="inner")
        else:
            hits = eligible.join(pages_cols, on="canon_url", how="inner")

        parse_udf = make_parse_udf(
            cfg.resolve_base, honor_nofollow=cfg.honor_nofollow
        )
        if cfg.html_only:
            # JVM-side sniff; binaries send NULL into the kernel (title
            # NULL, no links, no text) and are exempt from the text
            # invariant — they were fetched, stored, and never parsed
            from spider_spark.functions.mime import sniff_mime

            hits = hits.withColumn(
                "__is_html", sniff_mime(F.col("html")) == F.lit("text/html")
            )
            html_in = F.when(F.col("__is_html"), F.col("html"))
        else:
            html_in = F.col("html")
        parse_args = (
            (html_in, F.col("seed"))
            if cfg.resolve_base == "seed"
            else (html_in, F.col("seed"), F.col("canon_url"))
        )
        # html is dropped before the checkpoint: the parse struct carries
        # everything downstream needs, and storing 100 TB of raw bytes in
        # the round snapshot would be pure GC/storage waste. The fetched
        # count — and, when enabled, the byte-identical-text invariant —
        # ride the same job as observe() metrics (A2's df.observe mapping):
        # no separate count job, no extra verification pass.
        from pyspark.sql import Observation

        obs = Observation()
        obs_exprs = [F.count(F.lit(1)).alias("n_fetched")]
        if cfg.verify_text:
            bad_cond = F.col("p.text") != F.col("text")
            if cfg.html_only:
                bad_cond = F.col("__is_html") & bad_cond
            obs_exprs.append(
                F.sum(F.when(bad_cond, 1).otherwise(0)).alias("bad_text")
            )
        parsed = self._timed(
            "fetch_parse",
            lambda: hits.withColumn("p", parse_udf(*parse_args))
            .drop("html")
            .observe(obs, *obs_exprs)
            .localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL),
        )
        obs_vals = self._timed("counts", lambda: obs.get)
        n_fetched = obs_vals["n_fetched"]
        # misses ≡ failed downloads: anti-join against the *checkpointed*
        # hit set, so the pages scan is never re-run for the miss side
        hit_keys = parsed.select("canon_url")
        if n_eligible <= cfg.broadcast_threshold:
            hit_keys = F.broadcast(hit_keys)
        misses = eligible.join(hit_keys, on="canon_url", how="left_anti")

        if cfg.verify_text and n_fetched:
            bad = obs_vals.get("bad_text") or 0
            if bad:
                raise AssertionError(
                    f"text invariant violated on {bad} rows in round {r}: "
                    "parsed text != pages.text"
                )

        # ---- results batch (S3 analog; reference saves only successes) ----
        # content_ref is pure JVM (sha1-based uuid5, content_ref_col) — the
        # final_results job that evaluates these lazy projections has no
        # Python stage at all
        content_expr = content_ref_col(F.col("canon_url"), F.col("host"))
        fetched_base = parsed
        if self.content_gate is not None and n_fetched:
            gate_input = parsed
            if cfg.html_only:
                # binaries carry no parsed text — content-rule gates
                # (near-dup / soft-404) can only judge HTML rows
                gate_input = parsed.filter(F.col("__is_html"))
            gated = self._timed(
                "content_gate",
                lambda: self.content_gate(
                    # title rides along for content-rule gates (e.g. the
                    # soft-404 verdict); text-keyed gates just ignore it
                    gate_input.select("canon_url",
                                      F.col("p.text").alias("text"),
                                      F.col("p.title").alias("title"))
                )
                .select("canon_url")
                .withColumn("_dup", F.lit(True))
                .localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL),
            )
            # keyed left join (≤ round-sized on both sides; AQE picks the
            # strategy) — gated rows lose only their content pointer
            fetched_base = parsed.join(gated, on="canon_url", how="left")
            content_expr = F.when(F.col("_dup"), F.lit(None).cast("string")) \
                .otherwise(content_expr)
        fetched_rows = fetched_base.select(
            F.col("canon_url").alias("url"),
            F.col("p.title").alias("title"),
            F.col("parent"),
            content_expr.alias("content_ref"),
            F.col("depth"),
            F.lit(r).alias("crawl_round"),
            F.col("admission_rank"),
            F.lit(True).alias("fetched"),
        )
        miss_rows = misses.select(
            F.col("canon_url").alias("url"),
            F.lit(None).cast("string").alias("title"),
            F.col("parent"),
            F.lit(None).cast("string").alias("content_ref"),
            F.col("depth"),
            F.lit(r).alias("crawl_round"),
            F.col("admission_rank"),
            F.lit(False).alias("fetched"),
        )
        # round results stay LAZY: they derive only from checkpointed
        # inputs (parsed, eligible), so the final union materializes all
        # rounds in one job at crawl end instead of one job per round
        round_results = fetched_rows.unionByName(miss_rows)

        # ---- expansion (X2/I1): pages below the depth bound emit links ----
        # the link's host rides along from the parse kernel (the CanonURL
        # object existed there anyway), so no second URL-parse pass / host
        # UDF stage is ever needed downstream
        expanding = parsed.filter(F.col("depth") < cfg.depth)
        links = expanding.select(
            F.col("seed"),
            F.col("parent"),
            (F.col("depth") + 1).alias("depth"),
            F.col("admission_rank").alias("parent_rank"),
            F.posexplode(F.col("p.links")).alias("link_pos", "link"),
        ).select(
            "seed", "parent", "depth", "parent_rank", "link_pos",
            F.col("link.url").alias("canon_url"),
            F.col("link.host").alias("host"),
        )
        if self._blocked is not None:
            # host admission gate BEFORE the dedupe shuffle: blocked links
            # never cost exchange bytes (a trap host's URL flood dies at
            # the scan that discovered it)
            blocked = (
                F.broadcast(self._blocked) if self._blocked_broadcast
                else self._blocked
            )
            links = links.join(blocked, on="host", how="left_anti")
        if self._dyn_blocked is not None:
            # hosts the in-crawl trap guard has flagged so far (O(traps)
            # rows — always broadcastable)
            links = links.join(
                F.broadcast(self._dyn_blocked), on="host", how="left_anti"
            )
        # intra-round min-depth dedupe (Q2 pinned deterministic)
        candidates = links.groupBy("canon_url").agg(
            F.min(
                F.struct("depth", "parent_rank", "link_pos", "seed", "parent", "host")
            ).alias("m")
        ).select(
            "canon_url",
            F.col("m.depth").alias("depth"),
            F.col("m.parent_rank").alias("parent_rank"),
            F.col("m.link_pos").alias("link_pos"),
            F.col("m.seed").alias("seed"),
            F.col("m.parent").alias("parent"),
            F.col("m.host").alias("host"),
        )
        if self.trap_guard is not None:
            # accrue this round's discoveries into the host-stats table and
            # refresh the dynamic block list (effective next round). The
            # checkpoint materializes the explode+dedupe once so the stats
            # agg and the downstream seen-gate share it — one extra pass
            # over ROUND-sized data, never the corpus.
            def _guard():
                ckpt = candidates.localCheckpoint(
                    eager=True, storageLevel=CHECKPOINT_LEVEL
                )
                self._accrue_trap_stats(ckpt)
                return ckpt

            candidates = self._timed("trap_guard", _guard)

        # ---- seen-set gate (D1/H3): bloom prefilter + exact anti-join ----
        # The gate's output feeds the bucket-mode ranking below, which
        # evaluates its input exactly ONCE (hash shuffle on arithmetic
        # buckets — no range-sampling pass), so everything here stays LAZY
        # except the bloom probe (a Python stage consumed by two branches).
        # The whole explode → min-dedupe → seen-gate → rank chain
        # materializes in a single job inside with_global_rank.
        def _dedupe():
            if not cfg.use_cache:
                # the seen gate is off, but the next frontier must still be
                # duplicate-free *within itself*: with a politeness budget a
                # canon_url can sit in carryover while this round's links
                # re-discover it — without this anti-join it would be fetched
                # twice in one round under two admission ranks (CLI-reachable:
                # `crawl --no-cache` with a --concur budget)
                cand = candidates
                if not no_politeness:
                    cand = cand.join(
                        carryover.select("canon_url"), on="canon_url", how="left_anti"
                    )
                return cand
            # durable mode: confirm suspects against the bucketed seen key
            # mirror — the exchange lands only on the candidate delta, the
            # accumulated seen scan stays in its bucket layout. The mirror
            # syncs O(delta) from the manifest (committed through round r-1
            # = exactly the membership this round must gate against).
            seen_side = self._seen_keys() if cfg.durable else state.seen
            ckpt = lambda df: df.localCheckpoint(  # noqa: E731
                eager=True, storageLevel=CHECKPOINT_LEVEL
            )
            if self.seen_filter is not None:
                # continuous mode: the deletable cuckoo prefilters; same
                # one-materialization / fold-into-ranking shape as bloom
                return filter_unseen_cuckoo(
                    candidates, "canon_url", seen_side, self.seen_filter,
                    materialize=ckpt, materialize_confirmed=False,
                )
            if bloom is None:
                # no prefilter: one anti-join over the full candidate set,
                # folded into the ranking job
                return filter_unseen(candidates, "canon_url", seen_side, None)
            # bloom path: ONE materialization pass — the flagged candidates
            # (explode + min-dedupe + probe in one job). Both branches are
            # JVM filters over that checkpoint; the suspects' confirming
            # anti-join folds into the ranking job (materialize_confirmed
            # off — bucket mode reads the union exactly once).
            return filter_unseen(
                candidates, "canon_url", seen_side, bloom, materialize=ckpt,
                materialize_confirmed=False,
            )

        new = self._timed("dedupe", _dedupe)
        if bloom is not None and cfg.use_cache:
            # the probe stage is materialized inside _dedupe (the flagged
            # checkpoint — the only consumer of the shard broadcasts), so
            # this round's broadcasts are dead weight now — destroy them
            # before they accumulate across rounds
            bloom.destroy_broadcasts()
        if self.seen_filter is not None and cfg.use_cache:
            self.seen_filter.destroy_broadcasts()
        # ONE driver job closes the round's bookkeeping: the ranking stats
        # pass doubles as the n_new count AND (when a bloom is live) the
        # bloom-shard fill — mapInPandas over the ranking checkpoint, no
        # groupBy shuffle, no separate bloom job (VERDICT r2 next-3)
        collector = (
            make_fill_stats_collector(bloom, "canon_url")
            if bloom is not None
            else None
        )
        # arithmetic rank buckets: the order key's prefix (depth,
        # parent_rank) is dense — depth is a small bounded int, parent_rank
        # ∈ [0, next_rank) — so equal-width parent_rank ranges stratified
        # by depth are monotone in the order tuple. Hash-partitioning on
        # them replaces repartitionByRange's sampling job (the input is
        # evaluated exactly once) at the cost of balance only under parent
        # skew, which link fan-out spreads in practice.
        n_buckets = 4 * self.spark.sparkContext.defaultParallelism
        bucket = (
            F.expr(
                f"depth * {n_buckets}L + "
                f"((parent_rank * {n_buckets}L) div {max(state.next_rank, 1)}L)"
            )
            if self.config.rank_bucket_mode
            else None
        )
        ranked, n_new = self._timed(
            "rank",
            lambda: with_global_rank(
                new, ["depth", "parent_rank", "link_pos"], "admission_rank",
                start=state.next_rank, with_count=True,
                stats_collector=collector, bucket_expr=bucket,
            ),
        )
        if bloom is not None and bloom.spilled:
            # the fill job just wrote the next shard version; the probe jobs
            # that read the previous one ran inside _dedupe — drop it
            bloom.gc_spill()

        if n_new:
            # pure-JVM projection over the ranking's checkpoint — host came
            # from the parse kernel, so no UDF stage and no extra
            # materialization here
            admitted = ranked.select(
                "canon_url",
                "host",
                "depth",
                "seed",
                "parent",
                "admission_rank",
                F.lit(r + 1).alias("round_admitted"),
            )
            # union of checkpointed deltas — no per-round full rewrite of the
            # seen set (the rewrite is O(total) per round → quadratic over a
            # crawl); lineage stays shallow because the parents are
            # materialized
            seen = state.seen.unionByName(
                admitted.select("canon_url", "depth", "admission_rank")
            )
            if bloom is not None:
                # the fill already rode the ranking stats pass (collector
                # above); only the exact count + growth check remain
                def _add():
                    bloom.n_items += n_new
                    # exact running count outgrew capacity → rebuild bigger
                    # from the seen table before fpp degrades
                    return self._grow_bloom(bloom, seen) if bloom.saturated else bloom

                bloom = self._timed("bloom", _add)
            if self.seen_filter is not None and cfg.use_cache:
                # cuckoo tables don't OR-merge, so the round's admissions
                # are a keyed add job of their own (deletability's price).
                # Growth must happen BEFORE the add — a batch past the 95%
                # design load can physically overflow buckets — and the
                # rebuild source (seen) already includes this round's
                # admissions, so the grown filter needs no separate add.
                def _ck_add():
                    ck = self.seen_filter
                    if ck.n_items + n_new > ck.expected:
                        grown = build_cuckoo(
                            seen.select("canon_url"), "canon_url",
                            expected=4 * max(ck.n_items + n_new, 1),
                            n_shards=ck.n_shards, spill_dir=ck.spill_dir,
                        )
                        grown.n_items = ck.n_items + n_new
                        ck.destroy_broadcasts()
                        if ck.spilled:
                            ck.store.gc([])  # superseded filter's files
                        self.seen_filter = grown
                    else:
                        add_into(ck, ranked.select("canon_url"), "canon_url",
                                 count_items=False)
                        ck.n_items += n_new
                        if ck.spilled:
                            ck.gc_spill()

                self._timed("bloom", _ck_add)
            if no_politeness:
                frontier = admitted  # carryover statically empty
            else:
                frontier = admitted.unionByName(carryover)
        else:
            seen = state.seen
            frontier = carryover

        if no_politeness:
            n_carry = 0
        else:
            # the next-frontier count rides its checkpoint job via observe()
            from pyspark.sql import Observation

            fr_obs = Observation()
            frontier = frontier.observe(
                fr_obs, F.count(F.lit(1)).alias("n")
            ).localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)
            n_carry = fr_obs.get["n"] - n_new
        if n_blocked < 0:
            # set arithmetic: frontier_in = eligible + carryover + blocked
            n_blocked = state.frontier_count - n_eligible - n_carry
        # admitted: URLs newly entered into the seen set this round — the
        # cache admits before the fetch (use_cache.py:22-24), so failures
        # and carryover never re-count (crawler.py:98 fires once per URL).
        # Round 0 additionally accounts for the seeds admitted at bootstrap.
        m = RoundMetrics(
            round=r,
            admitted=(getattr(self, "_seed_count", state.next_rank) if r == 0 else 0)
            + n_new,
            fetched=n_fetched,
            new_links=n_new,
            carryover=n_carry,
            blocked=n_blocked,
            elapsed_sec=time.perf_counter() - t0,
        )
        new_state = _RoundState(
            frontier=frontier,
            seen=seen,
            next_rank=state.next_rank + n_new,
            round=r + 1,
            frontier_count=n_new + n_carry,
            seen_delta=(
                admitted.select("canon_url", "depth", "admission_rank")
                if n_new else None
            ),
        )
        return new_state, round_results, m, bloom

    # -- durable checkpointing (E6 analog) -----------------------------------

    def _checkpoint(self, state: "_RoundState", round_results: DataFrame,
                    m: RoundMetrics) -> None:
        """Per-round durable commit. Write costs: frontier O(working set),
        seen O(delta) after the first round (append of this round's
        admissions only), results O(delta). Every entry carries the round
        number so :meth:`resume` can roll append tables back to the last
        *completed* round (the metrics commit is the completion marker) —
        a kill between commits can therefore never double-append."""
        io = self.io
        rmeta = {"round": m.round, "epoch": self._epoch}
        io.commit_overwrite("frontier", state.frontier, bucket_by="canon_url",
                            meta=rmeta)
        if not io.exists("seen"):
            # first commit carries the seeds + round-0 admissions
            io.commit_overwrite("seen", state.seen, bucket_by="canon_url",
                                meta=rmeta)
        elif state.seen_delta is not None:
            io.append("seen", state.seen_delta, meta=rmeta)
        io.append("results", round_results, meta=rmeta)
        mrow = self.spark.createDataFrame(
            [(m.round, m.admitted, m.fetched, m.new_links, m.carryover, m.blocked,
              m.elapsed_sec)],
            "round int, admitted long, fetched long, new_links long, carryover long, "
            "blocked long, elapsed_sec double",
        )
        io.append(
            "metrics", mrow,
            meta={"round": m.round, "epoch": self._epoch,
                  "next_rank": state.next_rank,
                  "done": state.frontier_count == 0},
        )

    def _rollback_to_marker(self, name: str, committed_epoch: int,
                            committed_round: int) -> None:
        """Restore ``name`` to its latest version whose commit marker is ≤
        the metrics marker under the monotone ``(epoch, round)`` order —
        undoing any table commits of a round (or a whole recrawl wave)
        that was killed before its metrics commit. Comparing rounds alone
        is NOT enough: a recrawl wave restarts the round counter at -1 in
        a store whose previous crawl committed higher rounds, so a killed
        wave's seen overwrite would look 'already covered' (ADVICE r3).
        Pre-epoch history entries read as epoch 0."""
        io = self.io
        if not io.exists(name):
            return
        good = None
        for e in io.history(name):
            meta = e.get("meta") or {}
            r = meta.get("round")
            if r is not None and (meta.get("epoch") or 0, r) <= (
                committed_epoch, committed_round
            ):
                good = e["version"]
        if good is not None and good != io.current_version(name):
            io.restore(name, good)

    def rollback_dangling(self) -> dict:
        """Roll frontier/seen/results back to the latest metrics marker,
        discarding commits from a crawl or recrawl wave killed before its
        first metrics commit. Manifest-pointer ops only (no data moves).
        Safe to call on a clean store (no-op); callers that read the seen
        table before starting a wave (CLI recrawl) run this first so a
        half-applied predecessor can never feed them. Returns the marker."""
        io = self.io
        meta = io.latest_meta("metrics")
        if not meta:
            return {}
        for t in ("frontier", "seen", "results"):
            self._rollback_to_marker(t, meta.get("epoch") or 0, meta["round"])
        return meta

    def resume(self) -> CrawlResult:
        """Continue a killed durable crawl from its last committed round.
        The metrics commit is the round's atomic completion marker; a kill
        between table commits within a round rolls the other tables back
        to the marker and replays that round."""
        io = self.io
        meta = io.latest_meta("metrics")
        if not meta:
            raise ValueError("nothing to resume: no committed rounds")
        self._epoch = meta.get("epoch") or 0
        for t in ("frontier", "seen", "results"):
            self._rollback_to_marker(t, self._epoch, meta["round"])
        frontier = io.read("frontier").localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)
        seen = io.read("seen").localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)
        # the bucketed seen mirror resyncs itself from the rolled-back
        # manifest on first use (any rows a killed round appended past the
        # marker are gone with the rollback) — nothing to rebuild here, and
        # a non-durable config never writes one (ADVICE r2)
        bloom = None
        if self.seen_filter is not None:
            # the in-memory cuckoo died with the killed driver — rebuild it
            # from the rolled-back seen table at the same shard layout
            old = self.seen_filter
            rebuilt = build_cuckoo(
                seen.select("canon_url"), "canon_url",
                expected=max(old.expected, 2 * meta["next_rank"]),
                n_shards=old.n_shards, spill_dir=old.spill_dir,
            )
            rebuilt.n_items = meta["next_rank"]
            self.seen_filter = rebuilt
        elif self.config.use_bloom:
            # size from the resumed crawl's exact seen count (next_rank IS
            # the number of URLs ever admitted), not the config hint
            bloom = ShardedBloom(
                max(self.config.bloom_capacity, 2 * meta["next_rank"]),
                self.config.bloom_fpp, self.config.bloom_shards,
                spill_dir=self.config.filter_spill_dir,
            )
            build_into(bloom, seen, "canon_url", count_items=False)
            bloom.n_items = meta["next_rank"]
        state = _RoundState(
            frontier=frontier, seen=seen, next_rank=meta["next_rank"],
            round=meta["round"] + 1, frontier_count=frontier.count(),
        )
        metrics: list[RoundMetrics] = [
            RoundMetrics(**{k: row[k] for k in (
                "round", "admitted", "fetched", "new_links", "carryover", "blocked",
                "elapsed_sec")})
            for row in io.read("metrics").orderBy("round").collect()
        ]
        try:
            while state.frontier_count > 0 and not meta.get("done"):
                state, round_results, m, bloom = self._run_round(state, bloom)
                metrics.append(m)
                self._checkpoint(state, round_results, m)
                self._maybe_vacuum(m.round)
                if self.config.max_rounds is not None and state.round >= self.config.max_rounds:
                    break
        finally:
            if self.config.durable:
                io.drop_mirror("seen")
        return CrawlResult(results=io.read("results"), seen=state.seen, metrics=metrics)


@dataclass
class _RoundState:
    frontier: DataFrame
    seen: DataFrame
    next_rank: int
    round: int
    frontier_count: int = -1
    seen_delta: DataFrame | None = None  # this round's admissions (3 seen cols)
