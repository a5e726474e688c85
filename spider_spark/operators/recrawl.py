"""Recrawl (freshness) scheduling for continuous crawls.

The reference engine crawls once and stops (crawler.py:93-119 expands to
a depth bound); a production web corpus is *maintained*: every stored
page has a fetch timestamp, and a scheduler periodically decides which
URLs are stale enough to refetch. This operator is that decision as one
JVM-side projection + filter over the pages table:

* ``age = now − warc_ts``;
* each URL's TTL is jittered deterministically by its key hash —
  ``ttl · (1 − jitter_frac · h01(url))`` with ``h01`` the shared 60-bit
  md5 hash scaled into [0, 1) — so pages ingested in the same burst
  (a whole WARC dump shares one timestamp) do NOT all come due in the
  same round: the expiry wave spreads over ``jitter_frac`` of a TTL
  instead of thundering-herding the scheduler and the origin hosts;
* ``urgency = age / effective_ttl`` (≥ 1 ⇔ due) gives the frontier a
  priority score compatible with the admission ranking.

No shuffle at all — filter + projection push down to the parquet scan.
The due set feeds back into the crawl as seeds
(``CrawlEngine.crawl(due_df, seeds_canonical=True)``) after the seen-set
forgets them: exact rows leave the seen table, fingerprints leave the
:mod:`.cuckoo` filter via ``delete_from`` (the bloom filter cannot
forget — that is why the continuous path uses the cuckoo variant).

Determinism: ``now_epoch`` is an explicit parameter, never wall-clock,
so a killed scheduler pass replays bit-identically and the DuckDB mirror
can verify the due set value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_spark.operators.dedupe import md5_60, md5_60_sql

_H_SCALE = float(1 << 60)


def recrawl_due(pages: DataFrame, now_epoch: int, ttl_sec: int,
                jitter_frac: float = 0.1, url_col: str = "url",
                ts_col: str = "warc_ts",
                ttl_mult_col: str | None = None) -> DataFrame:
    """URLs due for refetch at ``now_epoch``: ``(url, age_sec, urgency)``
    for every page whose age meets its hash-jittered TTL.
    ``0 ≤ jitter_frac < 1``; 0 disables jitter.

    ``ttl_mult_col`` names an optional per-URL TTL multiplier column —
    the change-rate-aware refresh policy (Cho & Garcia-Molina, "Effective
    page refresh policies for web crawlers", TODS 2003): pages observed
    to change get a short multiplier (refetched sooner), stable pages a
    long one. The caller derives the multiplier from observed history —
    e.g. the cross-release diff status (operators/release.py); see the
    ``recrawl_change_aware`` driver query."""
    if not (0 <= jitter_frac < 1):
        raise ValueError(f"jitter_frac must be in [0, 1): {jitter_frac}")
    if ttl_sec <= 0:
        raise ValueError(f"ttl_sec must be positive: {ttl_sec}")
    h01 = md5_60(F.col(url_col)) / F.lit(_H_SCALE)
    base = F.lit(float(ttl_sec))
    if ttl_mult_col is not None:
        base = base * F.col(ttl_mult_col)
    eff_ttl = base * (F.lit(1.0) - F.lit(float(jitter_frac)) * h01)
    age = (F.lit(now_epoch) - F.unix_timestamp(F.col(ts_col))).cast("long")
    return (
        pages.select(
            F.col(url_col).alias("url"),
            age.alias("age_sec"),
            (age / eff_ttl).alias("urgency"),
        )
        .filter(F.col("urgency") >= 1.0)
    )


def recrawl_due_sql(now_epoch: int, ttl_sec: int, jitter_frac: float = 0.1,
                    url_expr: str = "url", ts_epoch_expr: str = "epoch(warc_ts)",
                    table: str = "pages",
                    ttl_mult_expr: str | None = None) -> str:
    """DuckDB mirror of :func:`recrawl_due` (same hash, scale constants,
    and float evaluation order, so urgency matches bit-for-bit)."""
    h01 = f"(({md5_60_sql(url_expr)}) / {_H_SCALE!r})"
    base = f"{float(ttl_sec)!r}"
    if ttl_mult_expr is not None:
        base = f"({base} * {ttl_mult_expr})"
    eff = f"({base} * (1.0 - {float(jitter_frac)!r} * {h01}))"
    age = f"({now_epoch} - {ts_epoch_expr})::BIGINT"
    return f"""
    SELECT url, age_sec, urgency FROM (
      SELECT {url_expr} AS url, {age} AS age_sec, {age} / {eff} AS urgency
      FROM {table}
    ) WHERE urgency >= 1.0
    """


# ---------------------------------------------------------------------------
# change-rate estimation from capture history
# ---------------------------------------------------------------------------


def capture_change_rates(captures: DataFrame, min_caps: int = 2,
                         url_col: str = "url", ts_col: str = "ts",
                         digest_col: str = "digest") -> DataFrame:
    """Per-URL change statistics from a capture log (the CDX relation of
    :mod:`spider_spark.operators.cdx`): ``(url, n_caps, n_changes,
    span_sec, change_interval_sec)`` for every URL captured at least
    ``min_caps`` times.

    ``n_changes`` counts consecutive captures whose content digests
    differ (the observable the adaptive-revisit literature estimates a
    Poisson change rate from — Cho & Garcia-Molina TODS 2003); the
    recommended refetch interval ``change_interval_sec = span_sec div
    (n_changes + 1)`` is the mean observed change spacing, exact integer
    (+1 keeps a never-changed URL at its full observed span instead of
    ∞). A caller turns it into :func:`recrawl_due`'s ``ttl_mult_col`` by
    dividing against the fleet's base TTL — the measured-history upgrade
    over the release-diff heuristic in ``recrawl_change_aware``.

    Scale shape: ONE url-keyed window (lag over capture order) feeding a
    url-keyed agg — same shuffle key, one exchange total; no driver
    state. Capture order is ``(ts, digest)`` — total per URL even if a
    replayed dump duplicates a timestamp."""
    from pyspark.sql import Window

    w = Window.partitionBy(url_col).orderBy(F.col(ts_col).asc(),
                                            F.col(digest_col).asc())
    with_prev = captures.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).cast("long").alias("ts"),
        F.col(digest_col).alias("digest"),
        F.lag(F.col(digest_col)).over(w).alias("prev_digest"),
    )
    agg = with_prev.groupBy("url").agg(
        F.count("*").alias("n_caps"),
        F.sum(
            F.when(
                F.col("prev_digest").isNotNull()
                & (F.col("digest") != F.col("prev_digest")),
                1,
            ).otherwise(0)
        ).cast("long").alias("n_changes"),
        (F.max("ts") - F.min("ts")).cast("long").alias("span_sec"),
    )
    return agg.filter(F.col("n_caps") >= min_caps).select(
        "url", "n_caps", "n_changes", "span_sec",
        F.expr("span_sec div (n_changes + 1)").alias("change_interval_sec"),
    )


def capture_change_rates_sql(captures_rel: str, min_caps: int = 2,
                             url_col: str = "url", ts_col: str = "ts",
                             digest_col: str = "digest") -> str:
    """DuckDB mirror of :func:`capture_change_rates` — same capture
    order, change predicate, and integer interval arithmetic."""
    return f"""
    WITH __caps AS (
      SELECT {url_col} AS url, {ts_col}::BIGINT AS ts,
             {digest_col} AS digest,
             lag({digest_col}) OVER (
               PARTITION BY {url_col} ORDER BY {ts_col} ASC, {digest_col} ASC
             ) AS prev_digest
      FROM {captures_rel}
    ),
    agg AS (
      SELECT url, count(*) AS n_caps,
             sum(CASE WHEN prev_digest IS NOT NULL
                       AND digest <> prev_digest THEN 1 ELSE 0 END) AS n_changes,
             max(ts) - min(ts) AS span_sec
      FROM __caps GROUP BY 1
    )
    SELECT url, n_caps::BIGINT AS n_caps, n_changes::BIGINT AS n_changes,
           span_sec::BIGINT AS span_sec,
           (span_sec // (n_changes + 1))::BIGINT AS change_interval_sec
    FROM agg WHERE n_caps >= {min_caps}
    """
