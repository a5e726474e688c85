"""Distributed graph operators for web-corpus pipelines.

Operators the crawl/dedupe stack composes with, each paired with a
DuckDB-SQL mirror so the driver's oracle can verify it value-for-value:

* **connected components** — turns a near-duplicate *pair* list (MinHash-LSH
  / SimHash output) into duplicate *clusters* with a canonical document per
  cluster (the reference deduplicates single URLs via its seen-set,
  use_cache.py:14; clustering pairwise matches into groups is the corpus
  analog a training-data pipeline needs before it can "keep one per
  cluster"). Implemented as hash-min label propagation with pointer
  jumping: per round every node takes the minimum label among itself and
  its neighbors, then compresses ``label ← label(label)`` — the classic
  O(log d) two-shuffle-per-round formulation that scales to billions of
  edges because state is only ``(node, label)`` pairs, never adjacency
  lists in memory. The oracle is a DuckDB recursive CTE computing the same
  min-reachable-id fixpoint (exact integers — hash-matchable).

* **PageRank** — link-authority ranking over the host graph extracted from
  crawled pages (priority scores for the frontier scheduler;
  operators/politeness.py orders by (depth, admission) — rank is the
  standard refinement). All arithmetic is **integer fixed-point**
  (rank mass scaled by 10^12, integer division, a fixed iteration count) so
  DuckDB replays the identical computation bit-for-bit: floating-point
  PageRank could never be hash-checked across engines. Per iteration one
  shuffle (contributions grouped by destination); edges are pre-aggregated
  to (src, dst, weight) so the join input is O(distinct host pairs), not
  O(links). Contribution order ``(rank div deg) * w`` keeps every
  intermediate ≤ total rank mass — no 64-bit overflow at any graph size.

* **HITS** — Kleinberg hubs & authorities over the same host graph
  (integer fixed-point with divide-only normalization; see :func:`hits`).

Scale notes: all operators keep per-round state linear in nodes and
shuffle only on stable integer keys; ``localCheckpoint`` truncates the
iterative lineage (Spark's plan would otherwise double per round). The
driver loop's one action per round is inherent to fixpoint iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# -- connected components ----------------------------------------------------


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", max_iter: int = 50,
                         stats: dict | None = None) -> DataFrame:
    """``(id, cluster_id)`` for every node appearing in ``pairs``, where
    ``cluster_id`` is the minimum node id of the connected component.

    Hash-min propagation with pointer jumping: converges in O(log d)
    rounds (d = component diameter), two shuffles per round, state is one
    (id, label) row per node. Near-dup components are shallow (dups of a
    page are dups of each other), so this terminates in a handful of
    rounds on real corpora; ``max_iter`` is a defensive bound. When a
    ``stats`` dict is supplied, the executed round count is written to
    ``stats['rounds']`` (the measurable form of the O(log d) claim)."""
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    # Undirected doubling, pre-partitioned by src and persisted: the
    # per-round hash-min join then shuffles only the (node, label) state
    # (O(nodes)) while the O(edges) side stays stationary across all
    # rounds. No distinct(): hash-min is idempotent under parallel
    # edges, so deduping would buy nothing but a full O(edges) shuffle.
    n_part = int(
        pairs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    edges = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition(n_part, "src")
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Observation

    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # min label among neighbors, one groupBy(dst) shuffle
        nbr_min = (
            edges.join(labels, edges["src"] == labels["id"])
            .groupBy(edges["dst"].alias("nid"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # the pre-jump label rides along as _old so the convergence
        # check folds into the checkpoint materialization below via
        # observe() — ONE job and ONE full-state write per round
        # (previously a separate labels⋈jumped count job per round)
        stepped = (
            labels.join(nbr_min, labels["id"] == nbr_min["nid"], "left")
            .select(
                F.col("id"),
                F.col("label").alias("_old"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            # lazy checkpoint: the pointer-jump self-join below reads
            # stepped on BOTH sides — without this the whole hash-min
            # chain (the O(edges) join + agg) computes twice per round;
            # lazy materialization keeps it one compute and one job
            .localCheckpoint(eager=False)
        )
        # pointer jumping: label <- label(label) (path compression)
        by_id = stepped.select(
            F.col("id").alias("jid"), F.col("label").alias("jlabel")
        )
        obs = Observation()
        jumped = (
            stepped.join(by_id, stepped["label"] == by_id["jid"], "left")
            .select(
                F.col("id"),
                F.col("_old"),
                F.coalesce(F.col("jlabel"), F.col("label")).alias("label"),
            )
            .observe(obs, F.sum(
                (F.col("_old") != F.col("label")).cast("long")
            ).alias("n_changed"))
            .localCheckpoint(eager=True)
        )
        changed = obs.get["n_changed"] or 0
        labels = jumped.select("id", "label")
        if changed == 0:
            break
    if stats is not None:
        stats["rounds"] = rounds
    edges.unpersist()
    return labels.select(F.col("id"), F.col("label").alias("cluster_id"))


def connected_components_sql(pairs_sql: str, id_a: str = "id_a",
                             id_b: str = "id_b") -> str:
    """DuckDB mirror: min reachable id via a recursive transitive-closure
    CTE (small-scale oracle; the Spark operator is the scale path)."""
    return f"""
    WITH RECURSIVE pairs AS ({pairs_sql}),
    edges AS (
      SELECT {id_a} AS src, {id_b} AS dst FROM pairs
      UNION
      SELECT {id_b}, {id_a} FROM pairs
    ),
    reach(id, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, reach.lbl FROM reach JOIN edges e ON e.src = reach.id
    )
    SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id
    """


# -- integer fixed-point PageRank --------------------------------------------

PR_SCALE = 10**12          # total rank mass in fixed-point units
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping factor 0.85 as a rational


def _iter_edge_relation(edges: DataFrame) -> DataFrame:
    """Materialized per-iteration edge relation ``(src, dst, w, deg)``,
    hash-partitioned by ``src`` and persisted: every power-iteration
    contribution join reads these cached partitions and shuffles only
    the O(nodes) rank state. Without this the lazy ``wedges ⋈ deg``
    plan recomputes BOTH edge aggregations and re-shuffles the
    O(edges) relation once per iteration — the dominant cost at 10
    iterations over a 10M-edge graph (measured: ~2× whole-op)."""
    wedges = edges.groupBy("src", "dst").agg(F.count("*").alias("w"))
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    n_part = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return wedges.join(deg, on="src").repartition(n_part, "src").persist()


def pagerank(edges: DataFrame, n_iter: int = 10,
             scale: int = PR_SCALE) -> DataFrame:
    """``(node, rank_fp)`` after ``n_iter`` damped power iterations over the
    multigraph ``edges(src, dst)`` (one row per link; parallel links act as
    weight). ``rank_fp`` is integer fixed-point: initial mass ``scale //
    n_nodes`` per node, per-iteration update

        rank'(v) = (15*scale) div (100*n)
                   + (85 * (Σ_in contrib + dangling div n)) div 100
        contrib(u→v) = (rank(u) div deg(u)) * w(u,v)
        dangling    = Σ rank(u) over nodes with no out-edges

    — all integer division, so the DuckDB mirror reproduces it exactly.
    Dangling (sink) mass is redistributed uniformly, the standard
    formulation: web graphs are full of sinks, and dropping their mass
    shrinks total rank per iteration and distorts rankings (VERDICT r3
    finding #6). The per-node share is ``dangling div n`` — the ≤ n-1
    fixed-point units lost to the floor are deterministic on both
    engines. ``(rank div deg) * w ≤ rank`` and ``85*(inc + share) <
    2^63`` keep everything inside int64 regardless of graph size. Per
    iteration: one contribution shuffle over the host-level
    (pre-aggregated) edge list plus a one-row dangling-sum broadcast."""
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    base = (PR_DAMP_DEN - PR_DAMP_NUM) * scale // (PR_DAMP_DEN * n_nodes)
    # the dangling-node set is fixed (deg never changes), so the rank state
    # carries a has-out-edges flag: per iteration the sink mass is a scan +
    # 1-row aggregate over the checkpointed ranks, never a repeated
    # anti-join against deg
    ranks = (
        nodes.join(
            deg.select(F.col("src").alias("node"),
                       F.lit(True).alias("__out")),
            on="node", how="left",
        )
        .select(
            "node",
            F.lit(scale // n_nodes).cast("long").alias("rank"),
            F.coalesce("__out", F.lit(False)).alias("__out"),
        )
        .localCheckpoint(eager=True)
    )
    srcs = _iter_edge_relation(edges)
    for _ in range(n_iter):
        contrib = (
            srcs.join(ranks, srcs["src"] == ranks["node"])
            .select(
                F.col("dst"),
                F.expr("(rank div deg) * w").alias("c"),
            )
        )
        incoming = contrib.groupBy(F.col("dst").alias("inode")).agg(
            F.sum("c").alias("inc")
        )
        # sink mass: one-row aggregate, broadcast into the update
        dangling = ranks.filter(~F.col("__out")).agg(
            F.coalesce(F.sum("rank"), F.lit(0)).cast("long").alias("dang")
        )
        ranks = (
            ranks.select("node", "__out")
            .join(incoming, F.col("node") == incoming["inode"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                F.col("node"),
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"({PR_DAMP_NUM} * (coalesce(inc, 0L)"
                        f" + (dang div {n_nodes}L))) div {PR_DAMP_DEN}"
                    )
                ).alias("rank"),
                F.col("__out"),
            )
            .localCheckpoint(eager=True)
        )
    srcs.unpersist()
    nodes.unpersist()
    return ranks.select(F.col("node"), F.col("rank").alias("rank_fp"))


def trustrank(edges: DataFrame, seeds: DataFrame, n_iter: int = 10,
              scale: int = PR_SCALE) -> DataFrame:
    """``(node, trust_fp)`` — TrustRank (Gyöngyi et al. 2004): PageRank
    with the teleport vector concentrated on a TRUSTED seed set instead
    of uniform. Trust flows outward from vetted hosts, so spam farms —
    which inflate plain PageRank via dense self-linking — score near
    zero unless a trusted page links toward them. The crawl uses it to
    demote frontier priority for link-farm neighborhoods the trap guard
    can't see structurally.

    Same integer fixed-point contract as :func:`pagerank` (bit-exact
    DuckDB mirror), with two deviations that ARE the algorithm:
    teleport mass ``(15*scale) div (100*|S|)`` lands only on seeds, and
    dangling mass redistributes to seeds (``dang div |S|``) — the
    teleport distribution, per the paper, not uniform. Seeds are
    intersected with the graph's nodes on both engines. Per-iteration
    cost is identical to a PageRank step; the seed flag rides the
    checkpointed rank state like ``__out`` does."""
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    seed_nodes = nodes.join(
        seeds.select(F.col(seeds.columns[0]).alias("node")).distinct(),
        on="node", how="left_semi",
    ).persist()
    n_seeds = seed_nodes.count()
    if n_seeds == 0:
        raise ValueError("trustrank: no seed appears in the graph")
    base = (PR_DAMP_DEN - PR_DAMP_NUM) * scale // (PR_DAMP_DEN * n_seeds)
    ranks = (
        nodes
        .join(deg.select(F.col("src").alias("node"),
                         F.lit(True).alias("__out")), on="node", how="left")
        .join(seed_nodes.withColumn("__seed", F.lit(True)),
              on="node", how="left")
        .select(
            "node",
            F.when(F.col("__seed").isNotNull(),
                   F.lit(scale // n_seeds)).otherwise(F.lit(0))
             .cast("long").alias("rank"),
            F.coalesce("__out", F.lit(False)).alias("__out"),
            F.col("__seed").isNotNull().alias("__seed"),
        )
        .localCheckpoint(eager=True)
    )
    srcs = _iter_edge_relation(edges)
    for _ in range(n_iter):
        contrib = (
            srcs.join(ranks, srcs["src"] == ranks["node"])
            .select(F.col("dst"), F.expr("(rank div deg) * w").alias("c"))
        )
        incoming = contrib.groupBy(F.col("dst").alias("inode")).agg(
            F.sum("c").alias("inc")
        )
        dangling = ranks.filter(~F.col("__out")).agg(
            F.coalesce(F.sum("rank"), F.lit(0)).cast("long").alias("dang")
        )
        ranks = (
            ranks.select("node", "__out", "__seed")
            .join(incoming, F.col("node") == incoming["inode"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                F.col("node"),
                (
                    F.when(F.col("__seed"), F.lit(base)).otherwise(F.lit(0))
                    .cast("long")
                    + F.expr(
                        f"({PR_DAMP_NUM} * (coalesce(inc, 0L)"
                        f" + (CASE WHEN __seed THEN dang div {n_seeds}L"
                        f" ELSE 0L END))) div {PR_DAMP_DEN}"
                    )
                ).alias("rank"),
                F.col("__out"),
                F.col("__seed"),
            )
            .localCheckpoint(eager=True)
        )
    srcs.unpersist()
    nodes.unpersist()
    seed_nodes.unpersist()
    return ranks.select(F.col("node"), F.col("rank").alias("trust_fp"))


def trustrank_sql(edges_sql: str, seeds_sql: str, n_iter: int = 10,
                  scale: int = PR_SCALE) -> str:
    """DuckDB mirror of :func:`trustrank` — the pagerank chain with
    seed-gated teleport and seed-directed dangling redistribution."""
    steps = []
    for k in range(n_iter):
        steps.append(f"""
    d{k} AS MATERIALIZED (
      SELECT coalesce(sum(rank), 0)::BIGINT AS dang FROM r{k}
      WHERE node NOT IN (SELECT src FROM deg)
    ),
    r{k + 1} AS MATERIALIZED (
      SELECT n.node,
             ((CASE WHEN n.node IN (SELECT node FROM seedset)
               THEN ({PR_DAMP_DEN - PR_DAMP_NUM}::BIGINT * {scale}) // ({PR_DAMP_DEN} * ns.n)
               ELSE 0 END)
              + ({PR_DAMP_NUM} * (coalesce(s.inc, 0)
                 + CASE WHEN n.node IN (SELECT node FROM seedset)
                   THEN dd.dang // ns.n ELSE 0 END)) // {PR_DAMP_DEN}
             )::BIGINT AS rank
      FROM nodes n CROSS JOIN ns CROSS JOIN d{k} dd
      LEFT JOIN (
        SELECT w.dst AS node, sum((r.rank // d.deg) * w.w) AS inc
        FROM wed w
        JOIN deg d ON d.src = w.src
        JOIN r{k} r ON r.node = w.src
        GROUP BY w.dst
      ) s ON s.node = n.node
    )""")
    chain = ",".join(steps)
    return f"""
    WITH edges AS MATERIALIZED ({edges_sql}),
    wed AS MATERIALIZED (
      SELECT src, dst, count(*)::BIGINT AS w FROM edges GROUP BY 1, 2),
    deg AS MATERIALIZED (
      SELECT src, count(*)::BIGINT AS deg FROM edges GROUP BY 1),
    nodes AS MATERIALIZED (
      SELECT DISTINCT src AS node FROM edges
      UNION SELECT DISTINCT dst FROM edges),
    seedset AS MATERIALIZED (
      SELECT DISTINCT node FROM nodes
      WHERE node IN (SELECT * FROM ({seeds_sql}))),
    ns AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM seedset),
    r0 AS MATERIALIZED (
      SELECT node, (CASE WHEN node IN (SELECT node FROM seedset)
        THEN {scale} // ns.n ELSE 0 END)::BIGINT AS rank
      FROM nodes CROSS JOIN ns),{chain}
    SELECT node, rank AS trust_fp FROM r{n_iter}
    """


# -- OPIC (online page importance) --------------------------------------------


def opic(edges: DataFrame, n_iter: int = 10, scale: int = PR_SCALE,
         stats: dict | None = None) -> DataFrame:
    """``(node, hist_fp, cash_fp)`` — OPIC, the Online Page Importance
    Computation (Abiteboul, Preda & Cobéna, WWW 2003): the importance
    measure a crawler can maintain *while* crawling, without storing the
    link matrix or waiting for a batch PageRank to converge. Every node
    holds "cash"; a fetch banks the node's cash into its history and
    distributes it over the out-links, plus one share to a **virtual
    node** linked from/to every page (the paper's connectivity fix —
    it plays the role PageRank's teleport does); the virtual node's
    accumulated cash redistributes uniformly each round. A node's
    importance estimate is its accumulated history.

    This is the batch-synchronous variant (every node "fetched" each
    round) in the same integer fixed-point contract as :func:`pagerank`:

        share(u)   = cash(u) div (deg(u) + 1)          (the +1 = virtual)
        cash'(v)   = Σ_in share(u)·w(u,v) + virt div n
        hist'(u)   = hist(u) + cash(u)
        virt'      = Σ_u (cash(u) − share(u)·deg(u)) + (virt − (virt div n)·n)

    — all integer division, so the DuckDB mirror replays it bit-for-bit,
    and **total cash (Σ cash + virt) is conserved exactly** at ``scale``
    every round (floors route remainders to the virtual node, never drop
    them) — the conservation law is asserted in tests. Dangling nodes
    need no special case: deg 0 sends everything to the virtual node,
    which is precisely the paper's semantics.

    Per iteration: one contribution shuffle over the pre-aggregated edge
    list + one 1-row aggregate (the virtual inflow — a driver scalar,
    O(1) state at any graph size). When ``stats`` is supplied, the final
    virtual-node cash and round count are written to it."""
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    state = (
        nodes.join(deg.select(F.col("src").alias("node"),
                              F.col("deg").alias("__deg")),
                   on="node", how="left")
        .select(
            "node",
            F.lit(scale // n_nodes).cast("long").alias("cash"),
            F.lit(0).cast("long").alias("hist"),
            F.coalesce("__deg", F.lit(0)).cast("long").alias("__deg"),
        )
        .localCheckpoint(eager=True)
    )
    virt = scale - (scale // n_nodes) * n_nodes
    srcs = _iter_edge_relation(edges)
    for r in range(n_iter):
        vshare, vkeep = virt // n_nodes, virt % n_nodes
        # cash flowing to the virtual node: own share + floor remainders
        tv = state.agg(
            F.coalesce(
                F.sum(F.expr("cash - (cash div (__deg + 1)) * __deg")),
                F.lit(0),
            ).cast("long")
        ).collect()[0][0]
        contrib = (
            srcs.join(state, srcs["src"] == state["node"])
            .select(
                F.col("dst"),
                F.expr("(cash div (deg + 1)) * w").alias("c"),
            )
        )
        incoming = contrib.groupBy(F.col("dst").alias("inode")).agg(
            F.sum("c").alias("inc")
        )
        state = (
            state.join(incoming, state["node"] == incoming["inode"], "left")
            .select(
                "node",
                (F.coalesce("inc", F.lit(0)) + F.lit(vshare))
                .cast("long").alias("cash"),
                (F.col("hist") + F.col("cash")).alias("hist"),
                "__deg",
            )
            .localCheckpoint(eager=True)
        )
        virt = tv + vkeep
    if stats is not None:
        stats["virt"] = virt
        stats["rounds"] = n_iter
    srcs.unpersist()
    nodes.unpersist()
    return state.select(
        F.col("node"), F.col("hist").alias("hist_fp"),
        F.col("cash").alias("cash_fp"),
    )


def opic_sql(edges_sql: str, n_iter: int = 10, scale: int = PR_SCALE) -> str:
    """DuckDB mirror of :func:`opic` — the unrolled MATERIALIZED-CTE
    chain carrying (node, cash, hist) state plus a one-row virtual-node
    relation per round, identical integer arithmetic."""
    steps = []
    for k in range(n_iter):
        steps.append(f"""
    tv{k} AS MATERIALIZED (
      SELECT coalesce(sum(
        r.cash - (r.cash // (coalesce(d.deg, 0) + 1)) * coalesce(d.deg, 0)
      ), 0)::BIGINT AS tv
      FROM s{k} r LEFT JOIN deg d ON d.src = r.node
    ),
    s{k + 1} AS MATERIALIZED (
      SELECT r.node,
             (coalesce(i.inc, 0) + (v.virt // nn.n))::BIGINT AS cash,
             (r.hist + r.cash)::BIGINT AS hist
      FROM s{k} r CROSS JOIN v{k} v CROSS JOIN nn
      LEFT JOIN (
        SELECT w.dst AS node, sum((r2.cash // (d.deg + 1)) * w.w) AS inc
        FROM wed w
        JOIN deg d ON d.src = w.src
        JOIN s{k} r2 ON r2.node = w.src
        GROUP BY w.dst
      ) i ON i.node = r.node
    ),
    v{k + 1} AS MATERIALIZED (
      SELECT (t.tv + v.virt - (v.virt // nn.n) * nn.n)::BIGINT AS virt
      FROM tv{k} t CROSS JOIN v{k} v CROSS JOIN nn
    )""")
    chain = ",".join(steps)
    return f"""
    WITH edges AS MATERIALIZED ({edges_sql}),
    wed AS MATERIALIZED (
      SELECT src, dst, count(*)::BIGINT AS w FROM edges GROUP BY 1, 2),
    deg AS MATERIALIZED (
      SELECT src, count(*)::BIGINT AS deg FROM edges GROUP BY 1),
    nodes AS MATERIALIZED (
      SELECT DISTINCT src AS node FROM edges
      UNION SELECT DISTINCT dst FROM edges),
    nn AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM nodes),
    s0 AS MATERIALIZED (
      SELECT node, ({scale} // nn.n)::BIGINT AS cash, 0::BIGINT AS hist
      FROM nodes CROSS JOIN nn),
    v0 AS MATERIALIZED (
      SELECT ({scale} - ({scale} // nn.n) * nn.n)::BIGINT AS virt
      FROM nn),{chain}
    SELECT node, hist AS hist_fp, cash AS cash_fp FROM s{n_iter}
    """


# -- integer fixed-point HITS (hubs & authorities) ----------------------------

HITS_SCALE = 10**8  # per-iteration normalization target (see overflow note)


def hits(edges: DataFrame, n_iter: int = 10,
         scale: int = HITS_SCALE) -> DataFrame:
    """``(node, auth_fp, hub_fp)`` after ``n_iter`` HITS iterations
    (Kleinberg 1999) over the multigraph ``edges(src, dst)`` — the
    companion signal to :func:`pagerank` for frontier prioritization:
    hubs are the directory/index pages worth re-crawling for link
    discovery, authorities the content pages worth ranking up.

    All integer fixed-point so the DuckDB oracle replays it exactly:

        auth_raw(v) = Σ_in  w(u,v) · hub(u)
        auth'(v)    = auth_raw(v) div max(1, (Σ auth_raw) div scale)
        hub_raw(u)  = Σ_out w(u,v) · auth'(v)
        hub'(u)     = hub_raw(u) div max(1, (Σ hub_raw) div scale)

    The divide-by-quotient normalization (instead of the textbook
    multiply-then-divide) keeps every intermediate inside int64 with
    pure divisions: normalized totals stay < 2·scale (the quotient
    floor can under-divide by at most a factor of two), so the raw
    sums next iteration are bounded by ``2 · total_link_weight ·
    scale`` — within int64 for ~4·10^10 weighted links at the default
    scale (a documented ceiling; lower ``scale`` to raise it). Per iteration:
    two keyed shuffles over the pre-aggregated (src, dst, w) edge list
    plus two one-row broadcast sums — same cost class as a PageRank
    step. ``localCheckpoint`` truncates the iterative lineage."""
    # two persisted layouts of the pre-aggregated edge list — the auth
    # step joins on src, the hub step on dst; pinning each side's hash
    # partitioning means every iteration shuffles only the O(nodes)
    # score state, never the O(edges) relation (the _iter_edge_relation
    # rationale, doubled because HITS alternates join keys)
    n_part = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    wedges = (
        edges.groupBy("src", "dst").agg(F.count("*").alias("w"))
        .repartition(n_part, "src")
        .persist()
    )
    wedges_dst = wedges.repartition(n_part, "dst").persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )

    def _normalize(raw: DataFrame, col: str) -> DataFrame:
        total = raw.agg(
            F.coalesce(F.sum("raw"), F.lit(0)).cast("long").alias("tot")
        )
        return (
            nodes.join(raw, F.col("node") == raw["rnode"], "left")
            .crossJoin(F.broadcast(total))
            .select(
                "node",
                F.expr(
                    f"coalesce(raw, 0L) div greatest(1L, tot div {scale}L)"
                ).alias(col),
            )
        )

    hubs = nodes.select(
        "node", F.lit(scale).cast("long").alias("hub")
    ).localCheckpoint(eager=True)
    auth = None
    for _ in range(n_iter):
        araw = (
            wedges.join(hubs, wedges["src"] == hubs["node"])
            .groupBy(wedges["dst"].alias("rnode"))
            .agg(F.sum(F.col("w") * F.col("hub")).alias("raw"))
        )
        auth = _normalize(araw, "auth").localCheckpoint(eager=True)
        hraw = (
            wedges_dst.join(auth, wedges_dst["dst"] == auth["node"])
            .groupBy(wedges_dst["src"].alias("rnode"))
            .agg(F.sum(F.col("w") * F.col("auth")).alias("raw"))
        )
        hubs = _normalize(hraw, "hub").localCheckpoint(eager=True)
    wedges.unpersist()
    wedges_dst.unpersist()
    nodes.unpersist()
    return (
        auth.join(hubs, on="node")
        .select(
            "node",
            F.col("auth").alias("auth_fp"),
            F.col("hub").alias("hub_fp"),
        )
    )


def hits_sql(edges_sql: str, n_iter: int = 10,
             scale: int = HITS_SCALE) -> str:
    """DuckDB mirror of :func:`hits`: the iteration chain unrolled as
    MATERIALIZED CTEs (h0 → a1 → h1 → …) with identical integer
    arithmetic — each state CTE is referenced by both the next raw-sum
    and its normalization total, so inlining would expand the chain
    exponentially (the pagerank_sql lesson)."""
    steps = []
    for k in range(n_iter):
        steps.append(f"""
    ar{k} AS MATERIALIZED (
      SELECT w.dst AS node, sum(w.w * h.hub)::BIGINT AS raw
      FROM wed w JOIN h{k} h ON h.node = w.src GROUP BY w.dst
    ),
    at{k} AS MATERIALIZED (
      SELECT coalesce(sum(raw), 0)::BIGINT AS tot FROM ar{k}
    ),
    a{k + 1} AS MATERIALIZED (
      SELECT n.node,
             (coalesce(r.raw, 0) // greatest(1, t.tot // {scale}))::BIGINT AS auth
      FROM nodes n CROSS JOIN at{k} t LEFT JOIN ar{k} r ON r.node = n.node
    ),
    hr{k} AS MATERIALIZED (
      SELECT w.src AS node, sum(w.w * a.auth)::BIGINT AS raw
      FROM wed w JOIN a{k + 1} a ON a.node = w.dst GROUP BY w.src
    ),
    ht{k} AS MATERIALIZED (
      SELECT coalesce(sum(raw), 0)::BIGINT AS tot FROM hr{k}
    ),
    h{k + 1} AS MATERIALIZED (
      SELECT n.node,
             (coalesce(r.raw, 0) // greatest(1, t.tot // {scale}))::BIGINT AS hub
      FROM nodes n CROSS JOIN ht{k} t LEFT JOIN hr{k} r ON r.node = n.node
    )""")
    chain = ",".join(steps)
    return f"""
    WITH edges AS MATERIALIZED ({edges_sql}),
    wed AS MATERIALIZED (
      SELECT src, dst, count(*)::BIGINT AS w FROM edges GROUP BY 1, 2),
    nodes AS MATERIALIZED (
      SELECT DISTINCT src AS node FROM edges
      UNION SELECT DISTINCT dst FROM edges),
    h0 AS MATERIALIZED (
      SELECT node, {scale}::BIGINT AS hub FROM nodes),{chain}
    SELECT a.node, a.auth AS auth_fp, h.hub AS hub_fp
    FROM a{n_iter} a JOIN h{n_iter} h ON h.node = a.node
    """


def pagerank_sql(edges_sql: str, n_iter: int = 10,
                 scale: int = PR_SCALE) -> str:
    """DuckDB mirror of :func:`pagerank`: the iteration chain is unrolled
    as CTEs r0..r{n_iter} with the identical integer arithmetic, including
    the uniform dangling-mass redistribution. Every chain CTE is
    MATERIALIZED: each r{k} is referenced twice (contributions + dangling
    sum), and DuckDB's default inlining would expand the chain
    exponentially (and re-scan the base parquet per expansion)."""
    steps = []
    for k in range(n_iter):
        steps.append(f"""
    d{k} AS MATERIALIZED (
      SELECT coalesce(sum(rank), 0)::BIGINT AS dang FROM r{k}
      WHERE node NOT IN (SELECT src FROM deg)
    ),
    r{k + 1} AS MATERIALIZED (
      SELECT n.node,
             ((({PR_DAMP_DEN - PR_DAMP_NUM}::BIGINT * {scale}) // ({PR_DAMP_DEN} * nn.n))
              + ({PR_DAMP_NUM} * (coalesce(s.inc, 0) + dd.dang // nn.n)) // {PR_DAMP_DEN}
             )::BIGINT AS rank
      FROM nodes n CROSS JOIN nn CROSS JOIN d{k} dd
      LEFT JOIN (
        SELECT w.dst AS node, sum((r.rank // d.deg) * w.w) AS inc
        FROM wed w
        JOIN deg d ON d.src = w.src
        JOIN r{k} r ON r.node = w.src
        GROUP BY w.dst
      ) s ON s.node = n.node
    )""")
    chain = ",".join(steps)
    return f"""
    WITH edges AS MATERIALIZED ({edges_sql}),
    wed AS MATERIALIZED (
      SELECT src, dst, count(*)::BIGINT AS w FROM edges GROUP BY 1, 2),
    deg AS MATERIALIZED (
      SELECT src, count(*)::BIGINT AS deg FROM edges GROUP BY 1),
    nodes AS MATERIALIZED (
      SELECT DISTINCT src AS node FROM edges
      UNION SELECT DISTINCT dst FROM edges),
    nn AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM nodes),
    r0 AS MATERIALIZED (SELECT node, ({scale} // nn.n)::BIGINT AS rank
           FROM nodes CROSS JOIN nn),{chain}
    SELECT node, rank AS rank_fp FROM r{n_iter}
    """


# ---------------------------------------------------------------------------
# label propagation (community detection)
# ---------------------------------------------------------------------------


def label_propagation(edges: DataFrame, n_iter: int = 5,
                      src: str = "src", dst: str = "dst",
                      checkpoint: bool = True) -> DataFrame:
    """Synchronous label-propagation communities (Raghavan et al. 2007)
    over the undirected multigraph ``edges`` — the site-cluster
    structure behind crawl partitioning (co-hosted site families,
    mirror clusters) that connected components cannot see (CC merges
    everything reachable; LPA finds densely-linked cores inside one
    component).

    Deterministic variant: every node starts labeled with itself; each
    round every node adopts the majority label among its neighbors
    (parallel edges count as weight) with the frozen total order
    ``(count DESC, label ASC)`` — the classic random tie-break and
    asynchronous schedule are replaced so the DuckDB mirror replays
    rounds exactly. Synchronous LPA can oscillate on bipartite
    structures; ``n_iter`` bounds the rounds (the standard remedy) and
    the output is the round-``n`` labeling.

    Scale shape per round: ONE label-keyed join (messages = undirected
    edges × current labels), one (node, label)-keyed count with
    map-side partials, and a node-keyed ``min(struct(-count, label))``
    argmax — no windows, no global sort. State is one (node, label) row
    per node, ``localCheckpoint``ed per round (the CC/PageRank lineage
    contract)."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be ≥1: {n_iter}")
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    und = e.unionAll(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    if checkpoint:
        # source-partitioned + cached once (the CC/PageRank layout
        # contract): the per-round message join reads these partitions
        # in place and shuffles only the O(nodes) label state
        n_part = int(
            edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        und = und.repartition(n_part, "s").localCheckpoint(eager=True)
    labels = (
        und.select(F.col("s").alias("node")).distinct()
        .select("node", F.col("node").alias("label"))
    )
    if checkpoint:
        labels = labels.localCheckpoint(eager=True)
    for _ in range(n_iter):
        msgs = und.join(
            labels.withColumnRenamed("node", "s"), on="s"
        ).select(F.col("d").alias("node"), "label")
        counts = msgs.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("cnt"))
        pick = (
            counts.groupBy("node")
            .agg(F.min(F.struct((-F.col("cnt")).alias("nc"),
                                F.col("label"))).alias("m"))
            .select("node", F.col("m.label").alias("new_label"))
        )
        labels = (
            labels.join(pick, on="node", how="left")
            .select("node",
                    F.coalesce("new_label", "label").alias("label"))
        )
        if checkpoint:
            labels = labels.localCheckpoint(eager=True)
    return labels


def label_propagation_sql(edges_rel: str, n_iter: int = 5,
                          src: str = "src", dst: str = "dst") -> str:
    """DuckDB mirror of :func:`label_propagation` — identical rounds,
    majority rule, and tie order, unrolled as MATERIALIZED CTEs (each
    round's labeling is referenced twice)."""
    parts = [
        f"e AS (SELECT {src} AS s, {dst} AS d FROM ({edges_rel}))",
        "und AS MATERIALIZED (SELECT s, d FROM e "
        "UNION ALL SELECT d, s FROM e)",
        "l0 AS MATERIALIZED (SELECT node, node AS label FROM "
        "(SELECT DISTINCT s AS node FROM und))",
    ]
    for k in range(n_iter):
        parts.append(f"""c{k + 1} AS (
      SELECT u.d AS node, l.label, count(*) AS cnt
      FROM und u JOIN l{k} l ON u.s = l.node GROUP BY 1, 2
    )""")
        parts.append(f"""p{k + 1} AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY cnt DESC, label ASC) AS rn
        FROM c{k + 1}
      ) WHERE rn = 1
    )""")
        parts.append(
            f"l{k + 1} AS MATERIALIZED (SELECT l.node, "
            f"coalesce(p.label, l.label) AS label "
            f"FROM l{k} l LEFT JOIN p{k + 1} p USING (node))"
        )
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT node, label FROM l{n_iter}
    """


# -- triangle counting / local clustering coefficient ------------------------

CC_PPM = 1_000_000


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst",
                    checkpoint: bool = True) -> DataFrame:
    """Per-node triangle counts and local clustering coefficient over the
    undirected simple graph induced by ``edges`` — the link-farm /
    mirror-ring signal rank alone misses: spam cliques and boilerplate
    blogrolls are triangle-dense, genuine editorial link neighborhoods are
    sparse (Becchetti et al. 2008 use exactly this feature for web-spam
    demotion, alongside the Ntoulas content half in
    operators/anchors.py link_spam_features).

    Output: ``(node, degree, triangles, cc_ppm)`` where ``degree`` counts
    the node's distinct neighbors, ``triangles`` the triangles through it,
    and ``cc_ppm = (2·triangles·10^6) div (degree·(degree−1))`` — the
    local clustering coefficient in exact integer parts-per-million
    (0 when degree < 2), so the DuckDB mirror hash-matches.

    Scale shape — the degree-ordered orientation formulation (Cohen 2009
    MapReduce triangle counting; the standard answer to hub skew): every
    undirected edge is oriented from its lower endpoint to its higher
    endpoint under the total order ``(degree, node)``, which bounds every
    node's OUT-degree by O(√m) regardless of how large its real degree is
    (a hub's edges all point *into* it). Wedges are then one self-join of
    the oriented edge list on the source node — fan-out per node is
    out-degree², i.e. O(m·arboricity) total, never hub-degree² — and a
    triangle closes iff the (order-directed) third edge exists: one more
    keyed join. No iteration; three shuffles total (degree, wedge,
    closure). The oriented list is ``localCheckpoint``ed because the plan
    references it three times."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    und = (
        e.select(F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi"))
        .distinct()
    )
    if checkpoint:
        und = und.localCheckpoint(eager=False)
    nodes = und.select(F.col("lo").alias("node")).unionAll(
        und.select(F.col("hi").alias("node")))
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    if checkpoint:
        deg = deg.localCheckpoint(eager=False)
    g = (
        und.join(deg.select(F.col("node").alias("lo"),
                            F.col("degree").alias("dlo")), on="lo")
        .join(deg.select(F.col("node").alias("hi"),
                         F.col("degree").alias("dhi")), on="hi")
    )
    lo_first = F.struct(F.col("dlo"), F.col("lo")) < F.struct(F.col("dhi"), F.col("hi"))
    o = g.select(
        F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("u"),
        F.when(lo_first, F.col("hi")).otherwise(F.col("lo")).alias("v"),
        F.when(lo_first, F.col("dhi")).otherwise(F.col("dlo")).alias("dv"),
    )
    if checkpoint:
        o = o.localCheckpoint(eager=True)
    o1 = o.select(F.col("u"), F.col("v").alias("v1"), F.col("dv").alias("dv1"))
    o2 = o.select(F.col("u"), F.col("v").alias("v2"), F.col("dv").alias("dv2"))
    wedges = o1.join(o2, on="u").filter(
        F.struct(F.col("dv1"), F.col("v1")) < F.struct(F.col("dv2"), F.col("v2"))
    )
    tri = wedges.join(
        o.select(F.col("u").alias("v1"), F.col("v").alias("v2")),
        on=["v1", "v2"],
    ).select("u", "v1", "v2")
    per_node = (
        tri.select(F.explode(F.array("u", "v1", "v2")).alias("node"))
        .groupBy("node").agg(F.count(F.lit(1)).alias("triangles"))
    )
    out = deg.join(per_node, on="node", how="left").select(
        "node", "degree",
        F.coalesce("triangles", F.lit(0)).alias("triangles"),
    )
    cc = F.when(
        F.col("degree") >= 2,
        F.expr(f"(2 * triangles * {CC_PPM}) div (degree * (degree - 1))"),
    ).otherwise(F.lit(0))
    return out.withColumn("cc_ppm", cc.cast("long"))


def triangle_counts_sql(edges_rel: str, src: str = "src",
                        dst: str = "dst") -> str:
    """DuckDB mirror of :func:`triangle_counts` — identical orientation
    order, wedge/closure joins, and integer coefficient."""
    return f"""
    WITH te AS (SELECT {src} AS a, {dst} AS b FROM ({edges_rel})
                WHERE {src} <> {dst}),
    und AS MATERIALIZED (
      SELECT DISTINCT least(a, b) AS lo, greatest(a, b) AS hi FROM te
    ),
    deg AS MATERIALIZED (
      SELECT node, count(*) AS degree FROM (
        SELECT lo AS node FROM und UNION ALL SELECT hi FROM und
      ) GROUP BY 1
    ),
    o AS MATERIALIZED (
      SELECT CASE WHEN (dl.degree, u.lo) < (dh.degree, u.hi)
                  THEN u.lo ELSE u.hi END AS u,
             CASE WHEN (dl.degree, u.lo) < (dh.degree, u.hi)
                  THEN u.hi ELSE u.lo END AS v,
             CASE WHEN (dl.degree, u.lo) < (dh.degree, u.hi)
                  THEN dh.degree ELSE dl.degree END AS dv
      FROM und u
      JOIN deg dl ON u.lo = dl.node
      JOIN deg dh ON u.hi = dh.node
    ),
    tri AS (
      SELECT o1.u AS x, o1.v AS y, o2.v AS z
      FROM o o1
      JOIN o o2 ON o1.u = o2.u AND (o1.dv, o1.v) < (o2.dv, o2.v)
      JOIN o oc ON oc.u = o1.v AND oc.v = o2.v
    ),
    cnt AS (
      SELECT node, count(*) AS triangles FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      ) GROUP BY 1
    )
    SELECT d.node, d.degree,
           coalesce(c.triangles, 0) AS triangles,
           CASE WHEN d.degree >= 2
                THEN (2 * coalesce(c.triangles, 0) * {CC_PPM})
                     // (d.degree * (d.degree - 1))
                ELSE 0 END AS cc_ppm
    FROM deg d LEFT JOIN cnt c USING (node)
    """


# -- multi-source BFS hop distance -------------------------------------------


def bfs_distance(edges: DataFrame, seeds: DataFrame, max_hops: int = 8,
                 src: str = "src", dst: str = "dst", node: str = "node",
                 directed: bool = True, checkpoint: bool = True) -> DataFrame:
    """``(node, hops)`` — the minimum link distance from the ``seeds`` set
    to every node reachable within ``max_hops`` over ``edges``. The
    materialized form of "trust decays with link distance from the vetted
    set" (Gyöngyi et al.'s seed-distance intuition that
    :func:`trustrank` smooths into a score): frontier schedulers gate or
    tier admission on hop distance from a whitelist, and the crawl's own
    depth bound is exactly this quantity over the page graph.

    Frontier BFS, the textbook distributed form: the visited set carries
    final distances (first visit over an unweighted graph IS the
    shortest path), each round expands only the previous round's
    frontier (ONE keyed join) and anti-joins the visited set, so total
    work is O(edges-touched), not O(rounds·edges). Early exit when the
    frontier empties — ``max_hops`` is a defensive bound. Both the
    frontier and visited set are ``localCheckpoint``ed per round (the
    iterative-lineage contract shared with :func:`connected_components`).

    Seeds outside the edge set still report ``hops = 0`` (they are
    members of the vetted set by definition)."""
    if max_hops < 0:
        raise ValueError(f"max_hops must be ≥0: {max_hops}")
    from pyspark.sql import Observation

    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    if not directed:
        e = e.unionAll(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    e = e.filter(F.col("s") != F.col("d")).distinct()
    if checkpoint:
        # source-partitioned + cached once: every round's expansion join
        # reads these partitions in place and shuffles only the frontier
        n_part = int(
            edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        e = e.repartition(n_part, "s").localCheckpoint(eager=False)
    dist = seeds.select(F.col(node).alias("node")).distinct().withColumn(
        "hops", F.lit(0))
    if checkpoint:
        dist = dist.localCheckpoint(eager=True)
    frontier = dist.select("node")
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["s"])
            .select(F.col("d").alias("node")).distinct()
            .join(dist.select("node"), on="node", how="left_anti")
            .withColumn("hops", F.lit(h))
        )
        if checkpoint:
            # the frontier size rides the checkpoint job via observe()
            # (no separate isEmpty job), and the visited set is a UNION
            # of per-round checkpointed deltas — never re-written whole
            # per round (the old per-round dist checkpoint cost one
            # O(visited) write per hop; each delta is already
            # materialized, so lineage stays shallow without it)
            obs = Observation()
            nxt = nxt.observe(
                obs, F.count(F.lit(1)).alias("n")
            ).localCheckpoint(eager=True)
            if (obs.get["n"] or 0) == 0:
                break
        elif nxt.isEmpty():
            break
        dist = dist.unionByName(nxt)
        frontier = nxt.select("node")
    return dist


def bfs_distance_sql(edges_rel: str, seeds_rel: str, max_hops: int = 8,
                     src: str = "src", dst: str = "dst",
                     node: str = "node", directed: bool = True) -> str:
    """DuckDB mirror of :func:`bfs_distance` — a UNION-recursive CTE
    (recursive-term dedup keeps the working set ≤ nodes·hops rows even on
    cyclic graphs; UNION ALL would walk every path) bounded by the same
    ``max_hops``, collapsed with ``min(hops)``."""
    rev = (f" UNION SELECT {dst}, {src} FROM ({edges_rel}) "
           f"WHERE {src} <> {dst}" if not directed else "")
    return f"""
    WITH RECURSIVE be AS (
      SELECT {src} AS s, {dst} AS d FROM ({edges_rel})
      WHERE {src} <> {dst}{rev}
    ),
    walk(wnode, hops) AS (
      SELECT DISTINCT {node}, 0 FROM ({seeds_rel})
      UNION
      SELECT be.d, w.hops + 1
      FROM walk w JOIN be ON be.s = w.wnode
      WHERE w.hops < {max_hops}
    )
    SELECT wnode AS node, min(hops) AS hops FROM walk GROUP BY 1
    """


# -- incremental connected components ----------------------------------------


def cc_add_pairs(labels: DataFrame, new_pairs: DataFrame,
                 id_a: str = "id_a", id_b: str = "id_b",
                 max_iter: int = 50, stats: dict | None = None) -> DataFrame:
    """Update an existing ``(id, cluster_id)`` labeling with a batch of
    new near-dup pairs WITHOUT re-walking the original edge list — the
    connected-components member of the engine's O(batch) delta-add
    family (ExactIndex / MinHashIndex / LexicalIndex / IVFIndex all
    grow this way; the cluster table they feed now does too, so an
    ingest wave's new pairs fold into the corpus dedup clusters at
    wave cost, not corpus cost).

    The compression trick: a finished labeling IS its own connectivity
    certificate — the star edges ``id — cluster_id`` have exactly the
    original components (with diameter ≤ 2), so hash-min over
    ``stars ∪ new_pairs`` equals hash-min over ``original ∪ new_pairs``
    while touching only O(nodes + batch) edges, and converges in
    O(log diameter(batch)) rounds because the old structure is already
    flat. Canonical labels stay the min node id, so
    **incremental ≡ one-shot recompute, bit-for-bit** (tested) — the
    DuckDB oracle for the grown clustering is simply the full closure
    mirror over the union pair list.

    Nodes whose cluster is untouched by the batch keep their row (the
    output covers ``labels ∪ nodes(new_pairs)``, including singleton
    clusters, which the star form alone would drop)."""
    stars = labels.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_a), F.col("cluster_id").alias(id_b))
    delta = new_pairs.select(id_a, id_b)
    grown = connected_components(stars.unionByName(delta), id_a, id_b,
                                 max_iter=max_iter, stats=stats)
    untouched = labels.join(grown.select("id"), on="id", how="left_anti")
    return grown.unionByName(untouched)


# -- community modularity ----------------------------------------------------


def modularity_contributions(edges: DataFrame, labels: DataFrame,
                             src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-community Newman modularity contributions over the undirected
    multigraph ``edges`` under the ``(node, label)`` assignment
    ``labels`` — the number that says whether label_propagation's
    clusters (or any partition) are real structure or noise, so the
    "densely-linked site families" claim is measured, not asserted.

    Newman's Q = Σ_c [ m_c/m − (d_c/2m)² ] where ``m`` is the edge
    count, ``m_c`` the intra-community edges, ``d_c`` the community's
    degree mass (multiplicities counted throughout — LPA votes with
    parallel edges, so its quality metric must too). To stay
    hash-checkable the division is never performed: each community
    reports ``contrib_num = 4·m·m_c − d_c²`` as decimal(38,0)
    (``4·m·m_c`` overflows int64 on a 10^10-edge graph) and
    ``Q = Σ contrib_num / (4m²)`` is the caller's exact rational —
    no floats, no floor-semantics drift between engines. Self-loops
    are dropped (the simple-graph convention the rest of the module
    uses).

    ``m`` is taken over the LABELED subgraph (both endpoints carry a
    label), so the numerator and the 4·m normalization describe the
    same edge set — a partial labeling yields the modularity of the
    labeled subgraph rather than a silently inconsistent Q. With a
    total labeling (the usual case: LPA labels every endpoint) this is
    identical to counting all non-self-loop edges.

    Output: ``(label, n_nodes, intra_edges, degree_sum, contrib_num)``
    including zero-edge communities (isolated labels score negative —
    exactly what a quality metric must surface). Scale shape: one
    label join per endpoint (node-keyed), one label-keyed agg, one
    1-row edge count — no windows, no collects beyond the scalar; the
    tagged edge set is lazily checkpointed so the scalar count and the
    downstream aggs share one compute of the joins."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b"))
    lab = labels.select(F.col("node"), F.col("label"))
    la = lab.select(F.col("node").alias("a"), F.col("label").alias("la"))
    lb = lab.select(F.col("node").alias("b"), F.col("label").alias("lb"))
    tagged = e.join(la, on="a").join(lb, on="b").localCheckpoint(eager=False)
    m = tagged.count()
    intra = tagged.filter(F.col("la") == F.col("lb")).groupBy(
        F.col("la").alias("label")).agg(
        F.count(F.lit(1)).alias("intra_edges"))
    ends = tagged.select(F.col("la").alias("label")).unionAll(
        tagged.select(F.col("lb").alias("label")))
    dsum = ends.groupBy("label").agg(F.count(F.lit(1)).alias("degree_sum"))
    nodes = lab.groupBy("label").agg(F.count(F.lit(1)).alias("n_nodes"))
    out = (
        nodes.join(dsum, on="label", how="left")
        .join(intra, on="label", how="left")
        .select(
            "label", "n_nodes",
            F.coalesce("intra_edges", F.lit(0)).alias("intra_edges"),
            F.coalesce("degree_sum", F.lit(0)).alias("degree_sum"),
        )
    )
    return out.withColumn(
        "contrib_num",
        F.expr(f"CAST(4 AS DECIMAL(38,0)) * {m} * intra_edges "
               f"- CAST(degree_sum AS DECIMAL(38,0)) * degree_sum"),
    )


def modularity_contributions_sql(edges_rel: str, labels_rel: str,
                                 src: str = "src", dst: str = "dst") -> str:
    """DuckDB mirror of :func:`modularity_contributions` — identical
    joins, zero-fills, and HUGEINT-exact numerators (cast back to
    decimal(38,0) to match Spark's type hash)."""
    return f"""
    WITH me AS (SELECT {src} AS a, {dst} AS b FROM ({edges_rel})
                WHERE {src} <> {dst}),
    ml AS (SELECT node, label FROM ({labels_rel})),
    tagged AS (
      SELECT la.label AS la, lb.label AS lb
      FROM me JOIN ml la ON me.a = la.node JOIN ml lb ON me.b = lb.node
    ),
    mm AS (SELECT count(*)::BIGINT AS m FROM tagged),
    intra AS (
      SELECT la AS label, count(*)::BIGINT AS intra_edges
      FROM tagged WHERE la = lb GROUP BY 1
    ),
    dsum AS (
      SELECT label, count(*)::BIGINT AS degree_sum FROM (
        SELECT la AS label FROM tagged UNION ALL SELECT lb FROM tagged
      ) GROUP BY 1
    ),
    mn AS (SELECT label, count(*)::BIGINT AS n_nodes FROM ml GROUP BY 1)
    SELECT mn.label, mn.n_nodes,
           coalesce(intra.intra_edges, 0) AS intra_edges,
           coalesce(dsum.degree_sum, 0) AS degree_sum,
           (4::HUGEINT * mm.m * coalesce(intra.intra_edges, 0)
            - coalesce(dsum.degree_sum, 0)::HUGEINT
              * coalesce(dsum.degree_sum, 0))::DECIMAL(38,0) AS contrib_num
    FROM mn
    LEFT JOIN dsum USING (label)
    LEFT JOIN intra USING (label)
    CROSS JOIN mm
    """


# -- k-core extraction -------------------------------------------------------


def k_core(edges: DataFrame, k: int = 2, n_iter: int = 10,
           src: str = "src", dst: str = "dst",
           checkpoint: bool = True) -> DataFrame:
    """Nodes of the ``k``-core of the undirected simple graph — the
    maximal subgraph where every member keeps ≥ ``k`` neighbors INSIDE
    the subgraph. The classic cohesion filter: pendant chains and
    loosely-attached tendrils peel away no matter how large, so what
    survives is the densely-woven center (link farms concentrate in
    high cores — Becchetti et al. 2008 use core membership beside the
    triangle signal; for dedup-cluster graphs the 2-core separates
    genuinely interlinked near-dup families from chains of borderline
    pairs).

    Synchronous peeling, ``n_iter`` fixed rounds (the LPA contract: a
    fixed round count keeps the DuckDB mirror an exact unrolled
    replay; peeling converges when a round removes nothing, and each
    effective round removes ≥1 node, so ``n_iter`` ≥ the true peel
    depth gives the exact k-core — the peel depth is the number of
    peel WAVES, typically ≪ nodes; the output is the round-``n`` state
    either way). Per round: one degree aggregation over the surviving
    edge set + two semi-joins — node-keyed, no windows. Output:
    ``(node, degree)`` with the within-core degree."""
    if k < 1:
        raise ValueError(f"k must be ≥1: {k}")
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b"))
    und = (
        e.select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
    )
    if checkpoint:
        und = und.localCheckpoint(eager=True)
    for _ in range(n_iter):
        deg = (
            und.select(F.col("a").alias("node")).unionAll(
                und.select(F.col("b").alias("node")))
            .groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
        )
        keep = deg.filter(F.col("degree") >= k).select("node")
        und = (
            und.join(keep.withColumnRenamed("node", "a"), on="a",
                     how="left_semi")
            .join(keep.withColumnRenamed("node", "b"), on="b",
                  how="left_semi")
        )
        if checkpoint:
            und = und.localCheckpoint(eager=True)
    return (
        und.select(F.col("a").alias("node")).unionAll(
            und.select(F.col("b").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
        .filter(F.col("degree") >= k)
    )


def k_core_sql(edges_rel: str, k: int = 2, n_iter: int = 10,
               src: str = "src", dst: str = "dst") -> str:
    """DuckDB mirror of :func:`k_core` — identical rounds unrolled as
    MATERIALIZED CTEs."""
    parts = [
        f"kc_e AS (SELECT {src} AS a, {dst} AS b FROM ({edges_rel}) "
        f"WHERE {src} <> {dst})",
        "u0 AS MATERIALIZED (SELECT DISTINCT least(a, b) AS a, "
        "greatest(a, b) AS b FROM kc_e)",
    ]
    for r in range(n_iter):
        parts.append(f"""d{r} AS (
      SELECT node, count(*) AS degree FROM (
        SELECT a AS node FROM u{r} UNION ALL SELECT b FROM u{r}
      ) GROUP BY 1
    )""")
        parts.append(f"""kp{r} AS (SELECT node FROM d{r} WHERE degree >= {k})""")
        parts.append(
            f"u{r + 1} AS MATERIALIZED (SELECT u.a, u.b FROM u{r} u "
            f"WHERE u.a IN (SELECT node FROM kp{r}) "
            f"AND u.b IN (SELECT node FROM kp{r}))"
        )
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT node, degree FROM (
      SELECT node, count(*) AS degree FROM (
        SELECT a AS node FROM u{n_iter} UNION ALL SELECT b FROM u{n_iter}
      ) GROUP BY 1
    ) WHERE degree >= {k}
    """


# -- edge reciprocity --------------------------------------------------------


def edge_reciprocity(edges: DataFrame, src: str = "src",
                     dst: str = "dst") -> DataFrame:
    """Per-node link reciprocity over the directed simple graph:
    ``(node, n_out, n_reciprocal, reciprocity_ppm)`` — the fraction of
    a node's distinct out-links whose target links straight back.
    Organic web linking is strongly asymmetric (authorities are cited,
    they rarely cite back); wholesale reciprocation is the signature
    of link-exchange rings, so this rides beside the triangle and
    k-core signals in the spam-demotion feature set (Becchetti et al.
    2008 measure exactly this asymmetry).

    One distinct over the 2-column edge projection, one self-join
    against its own reversal (both sides keyed on the full edge — the
    join key is (src, dst), so hubs don't skew it), one src-keyed
    count. Exact integer ppm."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")).distinct()
    rev = e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    recip = e.join(rev, on=["a", "b"], how="left_semi")
    n_out = e.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("n_out"))
    n_rec = recip.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("n_reciprocal"))
    return (
        n_out.join(n_rec, on="node", how="left")
        .select(
            "node", "n_out",
            F.coalesce("n_reciprocal", F.lit(0)).alias("n_reciprocal"),
        )
        .withColumn("reciprocity_ppm", F.expr(
            "(n_reciprocal * 1000000) div greatest(n_out, 1)"))
    )


def edge_reciprocity_sql(edges_rel: str, src: str = "src",
                         dst: str = "dst") -> str:
    """DuckDB mirror of :func:`edge_reciprocity`."""
    return f"""
    WITH re AS (
      SELECT DISTINCT {src} AS a, {dst} AS b FROM ({edges_rel})
      WHERE {src} <> {dst}
    ),
    rc AS (
      SELECT e.a, e.b FROM re e
      WHERE EXISTS (SELECT 1 FROM re r WHERE r.a = e.b AND r.b = e.a)
    ),
    n_out AS (SELECT a AS node, count(*)::BIGINT AS n_out FROM re GROUP BY 1),
    n_rec AS (SELECT a AS node, count(*)::BIGINT AS n_reciprocal
              FROM rc GROUP BY 1)
    SELECT node, n_out,
           coalesce(n_reciprocal, 0) AS n_reciprocal,
           (coalesce(n_reciprocal, 0) * 1000000) // greatest(n_out, 1)
             AS reciprocity_ppm
    FROM n_out LEFT JOIN n_rec USING (node)
    """
