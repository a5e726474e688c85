"""Deterministic corpus sampling / splitting.

Training pipelines need *reproducible* subsets: the train/val/test split
of a 100 TB corpus must be a pure function of each record's key — never
``rand()`` (changes across runs/retries/partitions) and never a sort-based
slice (a global sort of the corpus). All three operators here rank or
bucket rows by the same md5-derived integer hash the dedupe suite shares
with DuckDB (:func:`spider_spark.operators.dedupe.md5_60`), so every
subset is a pure function of record keys and the oracle replays it
exactly:

* :func:`hash_split` — percentage train/val/test labels; one JVM
  expression, no shuffle at all;
* :func:`stratified_sample` — exact ``n``-per-group quotas (docs per
  language, pages per host) via a salted two-stage top-k, so a hot
  group (half the corpus is ``en``) never sorts on one task;
* :func:`token_budget_sample` — fill each group up to a weight budget
  (tokens per source domain) in hash order, computed as a two-stage
  prefix sum: per-(group, hash-range-bucket) partial sums roll up to
  tiny per-bucket offsets, so no single task ever scans a whole group;
* :func:`temperature_mix_sample` — multi-corpus rebalancing with
  temperature-flattened source weights (∝ √n_s), exact integer keep
  thresholds, zero-shuffle keep/drop scan;
* :func:`priority_sample` — weighted sampling without replacement with
  unbiased subset-sum estimators (Duffield, Lund & Thorup, JACM 2007),
  in an exact 64-bit integer formulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spider_spark.operators.dedupe import md5_60, md5_60_sql


def _ranges(splits: dict[str, int]) -> list[tuple[str, int, int]]:
    if sum(splits.values()) != 100:
        raise ValueError(f"split percentages must sum to 100: {splits}")
    out, lo = [], 0
    for name, pct in splits.items():
        out.append((name, lo, lo + pct))
        lo += pct
    return out


def split_column(key: Column, splits: dict[str, int]) -> Column:
    """Label column assigning ``key`` to a split by hash percentile.
    ``splits`` maps label → integer percentage (must sum to 100); dict
    order defines the ranges, so keep it stable across runs."""
    h = F.pmod(md5_60(key), F.lit(100))
    expr = None
    for name, lo, hi in _ranges(splits):
        cond = (h >= lo) & (h < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr


def hash_split(df: DataFrame, key_col: str,
               splits: dict[str, int] | None = None,
               out_col: str = "split") -> DataFrame:
    """``df`` plus a deterministic ``split`` label per row. Default 95/5
    train/val. Pure projection — no shuffle, safe at any scale."""
    splits = splits or {"train": 95, "val": 5}
    return df.withColumn(out_col, split_column(F.col(key_col), splits))


def hash_split_sql(key_expr: str, splits: dict[str, int] | None = None) -> str:
    """DuckDB mirror of :func:`split_column` as a CASE expression over the
    shared 60-bit md5 hash."""
    splits = splits or {"train": 95, "val": 5}
    h = f"(({md5_60_sql(key_expr)}) % 100 + 100) % 100"
    arms = " ".join(
        f"WHEN {h} >= {lo} AND {h} < {hi} THEN '{name}'"
        for name, lo, hi in _ranges(splits)
    )
    return f"CASE {arms} END"


# ---------------------------------------------------------------------------
# stratified quota sampling
# ---------------------------------------------------------------------------


def stratified_sample(df: DataFrame, group_col: str, key_col: str,
                      n_per_group: int, salt: int = 8) -> DataFrame:
    """The ``n_per_group`` rows of each group with the smallest
    ``(md5_60(key), key)`` — a deterministic uniform quota sample (docs
    per language, pages per host) that is stable across runs, retries,
    and partition layouts.

    Two-stage top-k: stage 1 ranks within ``(group, hash mod salt)``
    partitions and keeps ``n`` per salt shard, so no task ever sorts more
    than one shard of a hot group; stage 2 ranks the ≤ ``salt × n``
    survivors per group. The global per-group top-n is always contained
    in the union of per-shard top-n, so the result is exact — the same
    salted pattern the politeness scheduler uses for per-host budgets
    (operators/politeness.py)."""
    if n_per_group < 1:
        raise ValueError(f"n_per_group must be ≥1: {n_per_group}")
    h = md5_60(F.col(key_col))
    w1 = Window.partitionBy(group_col, F.pmod(h, F.lit(salt))).orderBy(
        h.asc(), F.col(key_col).asc()
    )
    stage1 = (
        df.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= n_per_group)
        .drop("_r1")
    )
    w2 = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        stage1.withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= n_per_group)
        .drop("_r2")
    )


def stratified_sample_sql(group_col: str, key_col: str, n_per_group: int,
                          select_cols: str, table: str = "documents") -> str:
    """DuckDB mirror: plain per-group ``row_number`` over the shared hash
    order (the salt is a physical-plan detail — the result set is
    identical)."""
    h = md5_60_sql(key_col)
    return f"""
    SELECT {select_cols} FROM (
      SELECT *, row_number() OVER (
        PARTITION BY {group_col} ORDER BY {h}, {key_col}
      ) AS _r FROM {table}
    ) WHERE _r <= {n_per_group}
    """


# ---------------------------------------------------------------------------
# token-budget sampling
# ---------------------------------------------------------------------------


def token_budget_sample(df: DataFrame, group_col: str, key_col: str,
                        weight_col: str, budget: int,
                        n_buckets: int = 64) -> DataFrame:
    """Fill each group with rows in ``(md5_60(key), key)`` order until the
    running ``weight_col`` sum reaches ``budget`` — the "N tokens per
    source domain" sampler. The row that first crosses the budget is
    included (every group with data uses its full budget); rows after it
    are dropped.

    A naive per-group prefix sum sorts the whole group on one task. This
    runs it in two stages instead: the hash's [0, 2^60) range splits into
    ``n_buckets`` equal slices (bucket order ≡ hash order, uniform by
    construction); within-(group, bucket) prefix sums run in parallel,
    and the per-bucket totals — ``groups × n_buckets`` rows — roll up
    into broadcast offsets. No task ever scans more than one bucket of
    one group."""
    if n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two: {n_buckets}")
    # Integer shift, not float division: _h is a 60-bit value, beyond
    # double's 53-bit exact range, so `/ step` could round hashes near a
    # bucket boundary into the wrong bucket and perturb the prefix-sum
    # order at the budget cutoff.
    shift = 60 - (n_buckets.bit_length() - 1)
    h = md5_60(F.col(key_col))
    rows = df.withColumn("_h", h).withColumn(
        "_b", F.shiftrightunsigned(F.col("_h"), shift)
    )
    win = (
        Window.partitionBy(group_col, "_b")
        .orderBy(F.col("_h").asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rows = rows.withColumn("_cum_in", F.sum(weight_col).over(win))
    totals = rows.groupBy(group_col, "_b").agg(F.sum(weight_col).alias("_tot"))
    off_win = (
        Window.partitionBy(group_col)
        .orderBy(F.col("_b").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(off_win), F.lit(0))
    ).select(group_col, "_b", "_off")
    return (
        rows.join(F.broadcast(offsets), on=[group_col, "_b"])
        .filter(F.col("_off") + F.col("_cum_in") - F.col(weight_col) < budget)
        .drop("_h", "_b", "_cum_in", "_off")
    )


def token_budget_sample_sql(group_col: str, key_col: str, weight_col: str,
                            budget: int, select_cols: str,
                            table: str = "documents") -> str:
    """DuckDB mirror: one inclusive windowed prefix sum per group over the
    shared hash order (bucketing is a physical-plan detail)."""
    h = md5_60_sql(key_col)
    return f"""
    SELECT {select_cols} FROM (
      SELECT *, sum({weight_col}) OVER (
        PARTITION BY {group_col} ORDER BY {h}, {key_col}
        ROWS UNBOUNDED PRECEDING
      ) AS _cum FROM {table}
    ) WHERE _cum - {weight_col} < {budget}
    """


def temperature_mix_sample(df: DataFrame, source_col: str, key_col: str,
                           budget: int) -> DataFrame:
    """Temperature-flattened source mixing (the multi-corpus rebalancing
    step of training-data pipelines — sampling weights ∝ n_s^α with
    α = 1/2, which upsamples tail sources relative to proportional
    sampling): each source ``s`` keeps rows with probability

        p_s = min(1, budget · w_s / (W · n_s)),   w_s = ⌊√n_s⌋, W = Σ w_s

    so the expected sample size is ``budget`` rows distributed ∝ √n_s
    (sources smaller than their allotment are taken whole). Deterministic:
    a row is kept iff ``md5_60(key) < ⌊2^60 · p_s⌋`` — a pure function of
    the row key, no ``rand()``.

    α is fixed at 1/2 because ⌊√n⌋ is the one power law both engines
    evaluate bit-identically (IEEE sqrt is correctly rounded; a general
    ``pow`` is not) — the DuckDB mirror replays the thresholds exactly,
    in 128-bit integer arithmetic.

    Scale shape: one count-by-source aggregation (rows = #sources, tiny),
    thresholds computed driver-side in exact integer math and broadcast;
    the sample itself is a zero-shuffle filter scan."""
    import math

    counts = {
        r[0]: r[1] for r in df.groupBy(source_col).count().collect()
    }
    if not counts:
        return df
    big_w = sum(int(math.sqrt(n)) for n in counts.values())
    two60 = 1 << 60
    thr_rows = [
        (s, min(two60, (two60 * budget * int(math.sqrt(n))) // (big_w * n)))
        for s, n in counts.items()
    ]
    thr = df.sparkSession.createDataFrame(thr_rows, [source_col, "__thr"])
    return (
        df.join(F.broadcast(thr), on=source_col)
        .filter(md5_60(F.col(key_col)) < F.col("__thr"))
        .drop("__thr")
    )


# ---------------------------------------------------------------------------
# priority sampling (weighted, without replacement)
# ---------------------------------------------------------------------------

PS_U_RES = 1 << 40   # resolution of the deterministic uniform u ∈ (0,1]
PS_MAX_W = 1 << 20   # weight clamp so w·PS_U_RES ≤ 2^60 stays inside int64


def priority_sample(df: DataFrame, key_col: str, weight_col: str, k: int,
                    group_col: str | None = None, salt: int = 8) -> DataFrame:
    """Priority sampling (Duffield, Lund & Thorup, "Priority sampling for
    estimation of arbitrary subset sums", JACM 2007): a weighted sample of
    ``k`` rows (per group) *without replacement* whose ``est_weight``
    column is an unbiased estimator of any subset's total weight — the
    canonical "sample documents ∝ token count, but still be able to
    report exact-in-expectation token totals" primitive for corpus
    datacards and mixture studies.

    The scheme: draw u_i uniform in (0,1], give row i priority
    q_i = w_i / u_i, keep the k largest priorities; with τ = the (k+1)-th
    priority, ŵ_i = max(w_i, τ) is unbiased for w_i over any subset of
    the kept rows. Here u_i is deterministic — the top 40 bits of the
    md5-derived hash every sampler in this module shares with DuckDB,
    u_i = (h40+1)/2^40 — and the priority is computed in **exact 64-bit
    integer arithmetic, in natural weight units**:

        q = (w · 2^40) div (h40 + 1),   w clamped to [1, 2^20]

    so the DuckDB mirror replays selection, threshold, and estimates
    bit-for-bit (a float w/u could round differently across engines).
    The 40-bit u and the floor introduce O(2^-40) quantization — far
    below the estimator's sampling variance; ties break
    deterministically on ``key``. Output rows carry ``priority``,
    ``tau`` (the per-group threshold, 0 when the group has ≤ k rows)
    and ``est_weight`` = max(w, τ) — all plain integers.

    Scale shape: the per-group top-(k+1) runs as the salted two-stage
    top-k (stage 1 ranks within (group, h mod salt) shards — a hot group
    never sorts on one task); the threshold is one window over the ≤
    (k+1)·groups survivors. No global sort, no driver collect."""
    if k < 1:
        raise ValueError(f"k must be ≥1: {k}")
    gcol = group_col if group_col is not None else "_g"
    work = df if group_col is not None else df.withColumn("_g", F.lit(0))
    h = md5_60(F.col(key_col))
    work = (
        work.withColumn("_h", h)
        .withColumn(
            "_w",
            F.greatest(
                F.lit(1).cast("long"),
                F.least(F.col(weight_col).cast("long"), F.lit(PS_MAX_W)),
            ),
        )
        .withColumn(
            "_q",
            F.expr(f"(_w * {PS_U_RES}L) div (shiftrightunsigned(_h, 20) + 1L)"),
        )
    )
    order = [F.col("_q").desc(), F.col(key_col).asc()]
    w1 = Window.partitionBy(gcol, F.pmod(F.col("_h"), F.lit(salt))).orderBy(*order)
    stage1 = (
        work.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k + 1)
        .drop("_r1")
    )
    w2 = Window.partitionBy(gcol).orderBy(*order)
    ranked = stage1.withColumn("_rn", F.row_number().over(w2)).filter(
        F.col("_rn") <= k + 1
    )
    wg = Window.partitionBy(gcol)
    out = (
        ranked.withColumn(
            "tau",
            F.coalesce(
                F.max(F.when(F.col("_rn") == k + 1, F.col("_q"))).over(wg),
                F.lit(0).cast("long"),
            ),
        )
        .filter(F.col("_rn") <= k)
        .withColumn("priority", F.col("_q"))
        .withColumn("est_weight", F.greatest(F.col("_w"), F.col("tau")))
        .drop("_h", "_w", "_q", "_rn")
    )
    return out.drop("_g") if group_col is None else out


def priority_sample_sql(key_col: str, weight_col: str, k: int,
                        select_cols: str, group_col: str | None = None,
                        table: str = "documents") -> str:
    """DuckDB mirror of :func:`priority_sample`: identical integer
    priorities and threshold via BIGINT ``//`` (the salt is a
    physical-plan detail — the selected set is identical). ``select_cols``
    are emitted alongside ``priority``, ``tau`` and ``est_weight``."""
    h = md5_60_sql(key_col)
    g = group_col if group_col is not None else "0"
    return f"""
    WITH scored AS (
      SELECT *,
        greatest(1, least({weight_col}::BIGINT, {PS_MAX_W})) AS _w,
        (greatest(1, least({weight_col}::BIGINT, {PS_MAX_W})) * {PS_U_RES})
          // ((({h}) // 1048576) + 1) AS _q
      FROM {table}
    ), ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY {g} ORDER BY _q DESC, {key_col}
      ) AS _rn FROM scored
    ), thr AS (
      SELECT {g} AS _tg,
        coalesce(max(CASE WHEN _rn = {k + 1} THEN _q END), 0) AS _tau
      FROM ranked GROUP BY 1
    )
    SELECT {select_cols},
      _q AS priority,
      _tau AS tau,
      greatest(_w, _tau) AS est_weight
    FROM ranked JOIN thr ON {g} = _tg
    WHERE _rn <= {k}
    """


def temperature_mix_sample_sql(source_col: str, key_col: str, budget: int,
                               select_cols: str,
                               table: str = "documents") -> str:
    """DuckDB mirror of :func:`temperature_mix_sample`: identical integer
    thresholds via HUGEINT (2^60·budget·w fits in 128 bits at any corpus
    size this side of 10^18 rows)."""
    h = md5_60_sql(key_col)
    return f"""
    WITH counts AS (
      SELECT {source_col} AS s, count(*)::HUGEINT AS n
      FROM {table} GROUP BY 1
    ),
    w AS (SELECT s, n, floor(sqrt(n))::HUGEINT AS w FROM counts),
    thr AS (
      SELECT s, least(
        1152921504606846976::HUGEINT,
        (1152921504606846976::HUGEINT * {budget} * w)
          // ((SELECT sum(w) FROM w)::HUGEINT * n)
      ) AS thr
      FROM w
    )
    SELECT {select_cols}
    FROM {table} d JOIN thr ON d.{source_col} = thr.s
    WHERE ({h})::HUGEINT < thr
    """
