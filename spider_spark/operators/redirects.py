"""Redirect-chain resolution — 3xx alias consolidation for the frontier.

A crawl's fetch layer observes one-hop redirects (``src → dst``). The
frontier, seen-set, and results table should key on the FINAL target of
each chain (the reference follows redirects implicitly through aiohttp
and keys on the landed URL, crawler.py:121-138; at corpus scale the
hops arrive as a table and resolution is a graph problem). This module
resolves every observed source to its terminal URL, detects redirect
cycles (and chains that lead into one), and reports exact hop counts —
the alias edges then feed the same consolidation joins as
``rel=canonical`` clusters.

Algorithm: **pointer doubling** over the functional redirect graph.
The mapping ``m_k`` sends each source 2^k hops forward (saturating at a
terminal); one self-join per round squares the stride, so a chain of
length L resolves in ceil(log2 L) rounds — two orders of magnitude
fewer shuffles than hop-at-a-time walking, and state stays one
``(src, cur, hops)`` row per source. Browsers cap redirect chains
around 20 hops; the default ``max_doublings=6`` resolves chains to
length 64. A source still pointing at a non-terminal after the final
round is in (or drains into) a cycle: its ``final_url``/``hops`` are
NULL and ``status='cycle'`` — position inside a cycle after k
doublings is stride-dependent, so reporting it would be an artifact of
the round count, not a property of the graph.

Scale shape: per round ONE keyed equi-join of two (string, string, int)
relations plus a lineage-cutting localCheckpoint; early exit the round
after every source lands on a terminal. Multi-edge sources (the same
URL observed redirecting to different targets across fetches) collapse
deterministically to the minimum target before iteration — the walk
must be functional for resolution to be well-defined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REDIRECT_OK = "ok"
REDIRECT_CYCLE = "cycle"


def resolve_redirects(edges: DataFrame, src: str = "src", dst: str = "dst",
                      max_doublings: int = 6,
                      stats: dict | None = None) -> DataFrame:
    """``(src_url, final_url, hops, status)`` for every distinct source in
    ``edges``. ``status='ok'`` rows carry the terminal URL and the exact
    chain length; ``status='cycle'`` rows (cycle members and chains
    draining into one) carry NULLs. When ``stats`` is supplied the
    executed doubling-round count lands in ``stats['rounds']``."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .groupBy("src").agg(F.min("dst").alias("dst"))
        .persist()
    )
    heads = e.select(F.col("src").alias("h"))
    m = e.select(
        "src", F.col("dst").alias("cur"), F.lit(1).alias("hops")
    ).localCheckpoint(eager=True)
    rounds = 0
    for _ in range(max_doublings):
        # early exit: done when no current position has an out-edge
        if m.join(heads, m["cur"] == heads["h"], "left_semi").isEmpty():
            break
        rounds += 1
        nxt = m.select(
            F.col("src").alias("jsrc"), F.col("cur").alias("jcur"),
            F.col("hops").alias("jhops"),
        )
        m = (
            m.join(nxt, m["cur"] == nxt["jsrc"], "left")
            .select(
                "src",
                F.coalesce("jcur", "cur").alias("cur"),
                (F.col("hops") + F.coalesce("jhops", F.lit(0))).alias("hops"),
            )
            .localCheckpoint(eager=True)
        )
    if stats is not None:
        stats["rounds"] = rounds
    looped = m.join(heads, m["cur"] == heads["h"], "left") \
              .withColumn("in_cycle", F.col("h").isNotNull())
    return looped.select(
        F.col("src").alias("src_url"),
        F.when(F.col("in_cycle"), F.lit(None)).otherwise(F.col("cur"))
         .alias("final_url"),
        F.when(F.col("in_cycle"), F.lit(None).cast("int"))
         .otherwise(F.col("hops")).alias("hops"),
        F.when(F.col("in_cycle"), F.lit(REDIRECT_CYCLE))
         .otherwise(F.lit(REDIRECT_OK)).alias("status"),
    )


def resolve_redirects_sql(edges_sql: str, walk_cap: int = 64) -> str:
    """DuckDB mirror: a recursive-CTE walk over the same (deterministically
    functionalized) edge set, capped at ``walk_cap`` hops. The max-hops row
    per source is the resolution; a final position that still has an
    out-edge means the walk never terminated — a cycle, NULLed exactly as
    the engine NULLs it. ``walk_cap`` must exceed the longest acyclic
    chain (engine analog: 2^max_doublings)."""
    return f"""
WITH RECURSIVE
  e AS (SELECT src, MIN(dst) AS dst FROM ({edges_sql}) GROUP BY src),
  walk(src, cur, hops) AS (
    SELECT src, dst, 1 FROM e
    UNION ALL
    SELECT w.src, e.dst, w.hops + 1
    FROM walk w JOIN e ON w.cur = e.src
    WHERE w.hops < {walk_cap}
  ),
  fin AS (
    SELECT src, cur, hops,
           row_number() OVER (PARTITION BY src ORDER BY hops DESC) AS rn
    FROM walk
  )
SELECT fin.src AS src_url,
       CASE WHEN h.src IS NULL THEN fin.cur END AS final_url,
       CASE WHEN h.src IS NULL THEN fin.hops END AS hops,
       CASE WHEN h.src IS NULL THEN '{REDIRECT_OK}'
            ELSE '{REDIRECT_CYCLE}' END AS status
FROM fin LEFT JOIN (SELECT DISTINCT src FROM e) h ON fin.cur = h.src
WHERE fin.rn = 1
"""
