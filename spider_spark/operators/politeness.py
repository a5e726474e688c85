"""Per-host politeness scheduler + robots filter (SURVEY I2, north rule).

The reference's "politeness" is an ``asyncio.Semaphore(concurrency_limit)``
acquired once around the entire crawl — a no-op in practice (quirk Q4,
crawler.py:82-83; default limit 5, cli.py:67-74, config.ini.example:9).
The north rule requires the real thing: a per-host budget per round with a
priority queue, expressed as ``groupBy(host).applyInPandas``.

Scale design (hard item H4 — one hot host can hold ~50% of the frontier):
a single ``groupBy(host)`` would funnel the hot host into one task. The
scheduler therefore selects top-k-per-host in **two stages**:

1. **salted stage** — group by ``(host, xxhash64(url) % salt)`` and keep at
   most ``budget`` rows per salted group (each group's local top-k by the
   priority key). This bounds any group to ``budget`` rows and spreads the
   hot host over ``salt`` tasks.
2. **exact stage** — group the ≤ ``salt × budget`` survivors per host and
   keep the true top-``budget``.

Both stages sort by the BFS priority key ``(depth, admission_rank)`` (the
north rule's crawl-depth/priority score), so the result is exactly the
rows a single per-host priority queue would emit. URLs beyond the budget
are *carryover*: they stay in the frontier for the next round, preserving
the final URL-seen set (budget changes scheduling, never membership).

Robots: a small ``host → (disallow_prefixes, crawl_delay)`` table is
broadcast-joined; URLs matching a disallowed path prefix are excluded from
fetching entirely (marked ``blocked``), and ``crawl_delay`` caps the
per-round host budget at ``round_window / crawl_delay`` fetches.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PRIORITY_COLS = ["depth", "admission_rank"]


@dataclass(frozen=True)
class RobotsRules:
    """host → rules map, broadcast to executors (robots.txt is fetched once
    per host in a real deployment and cached with a TTL; in the sandbox the
    rules come from a config table)."""

    disallow: dict[str, tuple[str, ...]]
    crawl_delay: dict[str, float]

    @staticmethod
    def from_df(robots_df: DataFrame | None, *, now=None,
                ttl_sec: float | None = None) -> "RobotsRules":
        """Load the host→rules map, honoring the TTL cache column: rows
        whose ``fetched_ts`` is older than ``ttl_sec`` (relative to
        ``now``, a datetime) are treated as expired — a live deployment
        would re-fetch robots.txt for those hosts; offline they simply
        stop constraining (crawl-allowed default, like an expired cache
        entry). Tables without a ``fetched_ts`` column never expire."""
        if robots_df is None:
            return RobotsRules({}, {})
        rows = robots_df.collect()
        if ttl_sec is not None and now is not None and rows and \
                "fetched_ts" in robots_df.columns:
            rows = [
                r for r in rows
                if r["fetched_ts"] is not None
                and (now - r["fetched_ts"]).total_seconds() <= ttl_sec
            ]
        return RobotsRules(
            {r["host"]: tuple(r["disallow_prefixes"] or ()) for r in rows},
            {r["host"]: float(r["crawl_delay"] or 0.0) for r in rows},
        )


def apply_robots(frontier: DataFrame, rules: RobotsRules) -> tuple[DataFrame, DataFrame]:
    """Split frontier into (allowed, blocked) by disallow-prefix match.
    Pure JVM when there are no rules; vectorized prefix check otherwise."""
    if not rules.disallow:
        return frontier, frontier.limit(0)
    bcast = frontier.sparkSession.sparkContext.broadcast(rules.disallow)

    @F.pandas_udf("boolean")
    def blocked(url: pd.Series, host: pd.Series) -> pd.Series:
        dis = bcast.value
        out = []
        for u, h in zip(url, host):
            pfx = dis.get(h)
            if not pfx:
                out.append(False)
                continue
            # prefix match on the path part
            path_start = u.find("/", len("https://"))
            path = u[path_start:] if path_start >= 0 else "/"
            out.append(any(path.startswith(p) for p in pfx))
        return pd.Series(out)

    flagged = frontier.withColumn("__blocked", blocked(F.col("canon_url"), F.col("host")))
    allowed = flagged.filter(~F.col("__blocked")).drop("__blocked")
    denied = flagged.filter(F.col("__blocked")).drop("__blocked")
    return allowed, denied


def _topk_fn(budget: int, delay_budget: dict[str, int] | None):
    """applyInPandas kernel: per-group priority queue emitting top-k by
    (depth, admission_rank)."""

    def topk(pdf: pd.DataFrame) -> pd.DataFrame:
        k = budget
        if delay_budget:
            k = min(k, delay_budget.get(pdf["host"].iat[0], k))
        return pdf.nsmallest(k, PRIORITY_COLS)

    return topk


def schedule(
    frontier: DataFrame,
    budget: int | None,
    rules: RobotsRules | None = None,
    salt: int = 8,
    round_window_sec: float = 60.0,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Return ``(eligible, carryover, blocked)`` for this round.

    ``budget=None`` (reference parity: the semaphore never actually limits,
    Q4) makes every allowed URL eligible. ``eligible ∪ carryover ∪ blocked``
    == frontier exactly.
    """
    rules = rules or RobotsRules({}, {})
    allowed, blocked_df = apply_robots(frontier, rules)
    if budget is None:
        return allowed, allowed.limit(0), blocked_df

    delay_budget = {
        h: max(1, int(round_window_sec / d)) for h, d in rules.crawl_delay.items() if d > 0
    }
    schema = allowed.schema

    stage1 = (
        allowed.withColumn("__salt", F.pmod(F.xxhash64(F.col("canon_url")), F.lit(salt)))
        .groupBy("host", "__salt")
        .applyInPandas(
            lambda pdf: _topk_fn(budget, delay_budget)(pdf.drop(columns="__salt")),
            schema=schema,
        )
    )
    eligible = stage1.groupBy("host").applyInPandas(
        _topk_fn(budget, delay_budget), schema=schema
    )
    carryover = allowed.join(
        eligible.select("canon_url"), on="canon_url", how="left_anti"
    )
    return eligible, carryover, blocked_df
