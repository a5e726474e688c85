"""Exact distributed quantiles over bounded-cardinality integer domains.

Corpus datacards and curation thresholds need per-group quantiles (doc
length p50/p95 per language, token-count cutoffs per source). The usual
distributed answers are approximate sketches (t-digest, KLL) whose
merge order perturbs results — unacceptable under this repo's bit-exact
oracle contract. For the integer domains these pipelines actually
measure (char/token counts, milli-scaled scores), **exact** quantiles
are cheap at any corpus size: aggregate a ``(group, value) → count``
histogram (state bounded by the value domain's cardinality, NOT the row
count — a 100 TB corpus of documents has at most ~10^6 distinct
lengths), take a cumulative window over the tiny histogram, and pick
the smallest value whose cumulative count crosses each quantile's
rational threshold:

    q(num/den) = min{ v : cum(v) · den ≥ num · total }

— the type-1 (lower) quantile, in pure integer comparisons, so the
DuckDB mirror agrees bit-for-bit. This generalizes the per-language
tercile machinery of :mod:`spider_spark.functions.perplexity` into a
first-class operator, and unlike that path it is fully relational: no
driver-side histogram collect, so a million groups cost one shuffle.

Scale shape: one (group, value)-keyed aggregation with map-side
partials over the scan; the window + threshold join run over histogram
rows only. Reference analog: the reference exposes only count(*)
(postgres_database.py:184-200) — quantile rollups are part of the
datacard surface this engine adds for training pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "DEFAULT_QS", "exact_group_quantiles", "exact_group_quantiles_sql",
    "qdigest_build", "qdigest_merge", "qdigest_quantiles",
    "qdigest_quantiles_sql",
]

#: default datacard quantiles as exact rationals (label → (num, den))
DEFAULT_QS: dict[str, tuple[int, int]] = {
    "p25": (1, 4),
    "p50": (1, 2),
    "p75": (3, 4),
    "p95": (19, 20),
}


def exact_group_quantiles(df: DataFrame, group_col: str, value_col: str,
                          qs: dict[str, tuple[int, int]] | None = None,
                          ) -> DataFrame:
    """``(group_col, quantile, value)`` — one row per (group, requested
    quantile), where ``value`` is the exact type-1 quantile of
    ``value_col`` within the group: the smallest v with
    ``cum_count(v) · den ≥ num · total``. ``qs`` maps output labels to
    ``(num, den)`` rationals (defaults to :data:`DEFAULT_QS`); rationals,
    not floats, so the threshold comparison is integer-exact on both
    engines. NULL values are excluded (they have no order position).

    One (group, value) histogram shuffle over the scan; everything after
    runs on histogram rows (≤ |groups| × |value domain|)."""
    qs = qs if qs is not None else DEFAULT_QS
    if not qs:
        raise ValueError("qs must name at least one quantile")
    for label, (num, den) in qs.items():
        if not (0 < num <= den):
            raise ValueError(f"quantile {label}: need 0 < num ≤ den, "
                             f"got {num}/{den}")
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count("*").alias("__cnt"))
    )
    cum_w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(value_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy(group_col)
    cumh = hist.withColumn("__cum", F.sum("__cnt").over(cum_w)).withColumn(
        "__tot", F.sum("__cnt").over(tot_w)
    )
    qdf = df.sparkSession.createDataFrame(
        [(label, num, den) for label, (num, den) in qs.items()],
        "quantile string, __num long, __den long",
    )
    return (
        cumh.crossJoin(F.broadcast(qdf))
        .filter(F.col("__cum") * F.col("__den")
                >= F.col("__num") * F.col("__tot"))
        .groupBy(group_col, "quantile")
        .agg(F.min(value_col).alias("value"))
    )


def exact_group_quantiles_sql(group_col: str, value_col: str,
                              qs: dict[str, tuple[int, int]] | None = None,
                              table: str = "documents") -> str:
    """DuckDB mirror of :func:`exact_group_quantiles`: identical
    histogram, cumulative window, and integer threshold comparison."""
    qs = qs if qs is not None else DEFAULT_QS
    values = ", ".join(f"('{label}', {num}, {den})"
                       for label, (num, den) in qs.items())
    return f"""
    WITH hist AS (
      SELECT {group_col} AS grp, {value_col} AS v, count(*)::BIGINT AS cnt
      FROM {table} WHERE {value_col} IS NOT NULL GROUP BY 1, 2
    ),
    cumh AS (
      SELECT grp, v,
        sum(cnt) OVER (PARTITION BY grp ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cum,
        sum(cnt) OVER (PARTITION BY grp) AS tot
      FROM hist
    ),
    q(quantile, num, den) AS (VALUES {values})
    SELECT grp AS {group_col}, quantile, min(v) AS value
    FROM cumh CROSS JOIN q
    WHERE cum * den >= num * tot
    GROUP BY 1, 2
    """


# ---------------------------------------------------------------------------
# q-digest: deterministic mergeable quantile sketch
# ---------------------------------------------------------------------------
#
# :func:`exact_group_quantiles` above is the right answer when the value
# domain is small (doc lengths, milli-scores): histogram state is bounded
# by domain cardinality. When the domain is HUGE (byte offsets, epoch
# timestamps in ms — 2^40+ distinct values), the exact histogram is
# itself corpus-sized and a sketch is the scale path. KLL/t-digest are
# out: their compaction depends on arrival order, which breaks this
# repo's bit-exact oracle contract. The **q-digest** (Shrivastava et al.
# SenSys 2004) does not: given a value multiset it compresses a binary
# tree over the integer domain [0, 2^bits) bottom-up — a pair of sibling
# nodes (plus any mass already at their parent) merges into the parent
# iff the combined count ≤ ⌊n/k⌋ — which is a pure function of the
# multiset. Build, merge (sum counts node-wise, re-compress under the
# combined threshold), and query (postorder prefix-sum over ≤ O(k·bits)
# nodes) are all deterministic, so the DuckDB mirror replays them
# bit-for-bit with `bits` unrolled CTE steps.
#
# Guarantee: a reported quantile's rank error is bounded by the mass
# sitting on proper ancestors of the reported node — each internal node
# holds ≤ ⌊n/k⌋ by construction and there are ≤ `bits` ancestors, so
# |rank(reported) − q·n| ≤ bits·⌊n/k⌋ (+ the node's own width in value
# space). tests/test_quantiles.py asserts the bound on both a one-shot
# build and a shard-merge.
#
# Scale shape: ONE (group, value)-keyed histogram shuffle over the scan
# (map-side partials), then TWO Arrow passes — subtree-keyed below the
# split level (per-task state ≤ 2^SPLIT entries by construction, so a
# hot group spreads over more prefixes instead of one task), group-keyed
# above it (≤ 2^(bits−SPLIT) survivor rows per group). No task ever
# holds a whole group's raw values, no global sort, and per-group digest
# state is O(k·bits) rows regardless of corpus size. Shard digests merge
# without rescanning the corpus (the KMV/count-min property,
# operators/sketches.py). Reference analog: none (asyncio crawler);
# datacard/threshold layer for the training pipelines.

#: phase-1 split level: subtrees rooted at this level compress
#: independently, so per-task state is hard-bounded by 2^SPLIT leaves
#: (≈1M entries) no matter how large or skewed a group is.
_QDIGEST_SPLIT = 20

_QDIGEST_SCHEMA = ("grp string, level int, node long, cnt long, "
                   "tot long, thr long, fin boolean")


def _compress_levels(rows, lo: int, hi: int, thr: int):
    """Sequential bottom-up q-digest compression of one unit's mass —
    ``rows`` iterates (level, node, cnt) with lo ≤ level ≤ hi — running
    the merge tests for parents at levels lo+1..hi: children at level ℓ
    group by parent; their sum plus any existing parent mass promotes
    iff ≤ thr, else the children become final digest nodes. Returns
    (final, remaining) where remaining is the non-final mass at level
    hi. Pure function of the input multiset — iteration order never
    affects the result (decisions are per-parent from summed counts)."""
    mass: dict[int, dict[int, int]] = {}
    for level, node, cnt in rows:
        lvlmap = mass.setdefault(level, {})
        lvlmap[node] = lvlmap.get(node, 0) + cnt
    final: list[tuple[int, int, int]] = []
    for lvl in range(lo, hi):
        cur = mass.pop(lvl, None)
        if not cur:
            continue
        nxt = mass.setdefault(lvl + 1, {})
        by_parent: dict[int, int] = {}
        for node, cnt in cur.items():
            by_parent[node >> 1] = by_parent.get(node >> 1, 0) + cnt
        for pnode, s in by_parent.items():
            if s + nxt.get(pnode, 0) <= thr:
                nxt[pnode] = nxt.get(pnode, 0) + s
            else:
                final.extend(
                    (lvl, node, cnt) for node, cnt in cur.items()
                    if node >> 1 == pnode)
    remaining = [(hi, node, cnt) for node, cnt in mass.get(hi, {}).items()]
    return final, remaining


def _qdigest_compress(pending: DataFrame, bits: int,
                      checkpoint: bool = True) -> DataFrame:
    """Bottom-up q-digest compression of ``pending`` — rows
    ``(grp, level, node, cnt, tot, thr)`` with mass at any level (all at
    level 0 for a fresh build; mixed for a merge). Returns the digest
    relation (same schema).

    Two Arrow passes, independent of ``bits`` (a per-level relational
    loop is `bits` sequential shuffle barriers — job overhead dominates
    long before data does):

    1. mass below the split level keys by its level-S subtree prefix
       (``node >> (S − level)``) — merge decisions below a node depend
       only on that node's subtree, so each (grp, prefix) compresses
       levels 0..S in one task whose state is ≤ 2^S entries by
       construction (skew-proof: a hot group just spreads over more
       prefixes);
    2. the survivors (≤ 2^(bits−S) non-final rows per group, plus any
       high-level mass from a merge input) compress levels S..bits in
       one task per group.

    Both kernels run the identical per-parent merge rule, so the result
    is the same pure function of the multiset the unrolled SQL mirror
    replays — partitioning never leaks into the digest."""
    import pandas as pd

    split = min(_QDIGEST_SPLIT, bits)

    def _run(pdf: pd.DataFrame, lo: int, hi: int) -> pd.DataFrame:
        grp = pdf["grp"].iloc[0]
        tot = int(pdf["tot"].iloc[0])
        thr = int(pdf["thr"].iloc[0])
        final, remaining = _compress_levels(
            zip(pdf["level"], pdf["node"], pdf["cnt"]), lo, hi, thr)
        out = [(grp, lv, nd, c, tot, thr, True) for lv, nd, c in final]
        out += [(grp, lv, nd, c, tot, thr, hi >= bits) for lv, nd, c
                in remaining]
        return pd.DataFrame(
            out, columns=["grp", "level", "node", "cnt", "tot", "thr",
                          "fin"])

    low = (
        pending.filter(F.col("level") <= split)
        .withColumn("_pfx", F.expr(
            f"shiftright(node, cast({split} - level as int))"))
        .groupBy("grp", "_pfx")
        .applyInPandas(lambda pdf: _run(pdf, 0, split), _QDIGEST_SCHEMA)
    )
    if checkpoint:
        low = low.localCheckpoint(eager=True)
    if split >= bits:
        return low.drop("fin")
    phase2_in = (
        low.filter(~F.col("fin"))
        .unionByName(pending.filter(F.col("level") > split)
                     .withColumn("fin", F.lit(False)))
        .groupBy("grp")
        .applyInPandas(lambda pdf: _run(pdf, split, bits), _QDIGEST_SCHEMA)
    )
    return low.filter(F.col("fin")).unionByName(phase2_in).drop("fin")


def qdigest_build(df: DataFrame, group_col: str, value_col: str,
                  k: int, bits: int, checkpoint: bool = True) -> DataFrame:
    """Per-group q-digest over integer ``value_col`` ∈ [0, 2^bits):
    rows ``(grp, level, node, cnt, tot, thr)`` where node ``v`` at level
    ``ℓ`` covers values ``[v·2^ℓ, (v+1)·2^ℓ)``, ``tot`` is the group's
    row count and ``thr = tot div k`` the compression threshold — 0 for
    groups with fewer than ``k`` rows, so small groups never compress
    and their quantiles come back exact (the sketch only spends error
    where it buys state).
    NULLs are excluded; out-of-domain values raise (silently clamping
    would corrupt every downstream rank). Deterministic: the digest is a
    pure function of the value multiset."""
    if k < 1:
        raise ValueError(f"k must be ≥ 1, got {k}")
    if not (1 <= bits <= 62):
        raise ValueError(f"bits must be in [1, 62], got {bits}")
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("grp"),
                 F.col(value_col).cast("long").alias("node"))
        .agg(F.count("*").alias("cnt"))
    )
    if checkpoint:
        hist = hist.localCheckpoint(eager=True)
    bad = hist.filter((F.col("node") < 0) | (F.col("node") >= (1 << bits)))
    bad_row = bad.select("node").limit(1).collect()
    if bad_row:
        raise ValueError(
            f"qdigest_build: {value_col}={bad_row[0]['node']} outside the "
            f"[0, 2^{bits}) domain — raise `bits` or pre-scale the column")
    totals = hist.groupBy("grp").agg(F.sum("cnt").alias("tot")).withColumn(
        "thr", F.expr(f"tot div {k}"))
    pending = hist.join(totals, "grp").select(
        "grp", F.lit(0).alias("level"), "node", "cnt", "tot", "thr")
    return _qdigest_compress(pending, bits, checkpoint=checkpoint)


def qdigest_merge(a: DataFrame, b: DataFrame, k: int, bits: int,
                  checkpoint: bool = True) -> DataFrame:
    """Merge two digests built with the same ``bits``: counts sum
    node-wise, the threshold recomputes from the combined mass, and the
    combined relation re-compresses bottom-up. Commutative bit-for-bit
    (union + sum + a deterministic pure function of the result)."""
    combined = (
        a.select("grp", "level", "node", "cnt")
        .unionByName(b.select("grp", "level", "node", "cnt"))
        .groupBy("grp", "level", "node").agg(F.sum("cnt").alias("cnt"))
    )
    if checkpoint:
        combined = combined.localCheckpoint(eager=True)
    totals = combined.groupBy("grp").agg(F.sum("cnt").alias("tot")).withColumn(
        "thr", F.expr(f"tot div {k}"))
    pending = combined.join(totals, "grp").select(
        "grp", "level", "node", "cnt", "tot", "thr")
    return _qdigest_compress(pending, bits, checkpoint=checkpoint)


def qdigest_quantiles(digest: DataFrame, group_col: str,
                      qs: dict[str, tuple[int, int]] | None = None,
                      ) -> DataFrame:
    """``(group_col, quantile, value)`` from a digest: postorder
    traversal (right endpoint asc, level asc — narrower node first on
    ties), running prefix sum, and for each rational ``num/den`` the
    first node whose cumulative mass crosses ``num·tot`` reports its
    range's right endpoint. Integer comparisons only. Runs over digest
    rows (≤ O(k·bits) per group), never the corpus."""
    qs = qs if qs is not None else DEFAULT_QS
    if not qs:
        raise ValueError("qs must name at least one quantile")
    for label, (num, den) in qs.items():
        if not (0 < num <= den):
            raise ValueError(f"quantile {label}: need 0 < num ≤ den, "
                             f"got {num}/{den}")
    hi = (F.col("node") + 1) * F.expr("shiftleft(1L, cast(level as int))") - 1
    cum_w = (
        Window.partitionBy("grp")
        .orderBy(F.col("_hi").asc(), F.col("level").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = digest.withColumn("_hi", hi).withColumn(
        "_cum", F.sum("cnt").over(cum_w))
    qdf = digest.sparkSession.createDataFrame(
        [(label, num, den) for label, (num, den) in qs.items()],
        "quantile string, __num long, __den long",
    )
    return (
        ranked.crossJoin(F.broadcast(qdf))
        .filter(F.col("_cum") * F.col("__den") >= F.col("__num") * F.col("tot"))
        .groupBy(F.col("grp").alias(group_col), "quantile")
        .agg(F.min("_hi").alias("value"))
    )


def qdigest_quantiles_sql(group_col: str, value_col: str, k: int, bits: int,
                          qs: dict[str, tuple[int, int]] | None = None,
                          table: str = "documents") -> str:
    """DuckDB mirror of build → quantiles: the same histogram, `bits`
    unrolled compression steps (MATERIALIZED — each step's relations are
    referenced more than once, the PageRank-mirror lesson), and the same
    postorder prefix-sum extraction."""
    qs = qs if qs is not None else DEFAULT_QS
    values = ", ".join(f"('{label}', {num}, {den})"
                       for label, (num, den) in qs.items())
    steps = [f"""
    hist AS MATERIALIZED (
      SELECT {group_col} AS grp, {value_col}::BIGINT AS node,
             count(*)::BIGINT AS cnt
      FROM {table} WHERE {value_col} IS NOT NULL GROUP BY 1, 2
    ),
    tots AS (
      SELECT grp, sum(cnt)::BIGINT AS tot,
             sum(cnt)::BIGINT // {k} AS thr
      FROM hist GROUP BY 1
    ),
    p0 AS MATERIALIZED (
      SELECT h.grp, 0 AS level, node, cnt, tot, thr
      FROM hist h JOIN tots USING (grp)
    )"""]
    for lvl in range(bits):
        nxt = lvl + 1
        steps.append(f"""
    a{lvl} AS MATERIALIZED (
      SELECT grp, node >> 1 AS pnode, sum(cnt) AS s,
             max(tot) AS tot, max(thr) AS thr
      FROM p{lvl} WHERE level = {lvl} GROUP BY 1, 2
    ),
    v{lvl} AS MATERIALIZED (
      SELECT a.grp, a.pnode, a.s + coalesce(e.cnt, 0) AS newcnt,
             a.tot, a.thr, (a.s + coalesce(e.cnt, 0)) <= a.thr AS merged
      FROM a{lvl} a LEFT JOIN (
        SELECT grp, node, cnt FROM p{lvl} WHERE level = {nxt}
      ) e ON a.grp = e.grp AND a.pnode = e.node
    ),
    kk{lvl} AS MATERIALIZED (
      SELECT c.grp, c.level, c.node, c.cnt, c.tot, c.thr
      FROM p{lvl} c JOIN v{lvl} v
        ON c.grp = v.grp AND c.node >> 1 = v.pnode
      WHERE c.level = {lvl} AND NOT v.merged
    ),
    p{nxt} AS MATERIALIZED (
      SELECT * FROM p{lvl} WHERE level > {nxt}
      UNION ALL
      SELECT p.* FROM p{lvl} p
      LEFT JOIN (SELECT grp, pnode FROM v{lvl} WHERE merged) m
        ON p.grp = m.grp AND p.node = m.pnode
      WHERE p.level = {nxt} AND m.pnode IS NULL
      UNION ALL
      SELECT grp, {nxt} AS level, pnode AS node, newcnt AS cnt, tot, thr
      FROM v{lvl} WHERE merged
    )""")
    kept_union = "\n      UNION ALL\n      ".join(
        [f"SELECT * FROM kk{lvl}" for lvl in range(bits)]
        + [f"SELECT * FROM p{bits}"])
    return f"""
    WITH {','.join(steps)},
    dig AS (
      {kept_union}
    ),
    ranked AS (
      SELECT grp, (node + 1) * (1::BIGINT << level) - 1 AS hi, level,
             cnt, tot,
             sum(cnt) OVER (
               PARTITION BY grp
               ORDER BY (node + 1) * (1::BIGINT << level) - 1, level
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM dig
    ),
    q(quantile, num, den) AS (VALUES {values})
    SELECT grp AS {group_col}, quantile, min(hi) AS value
    FROM ranked CROSS JOIN q
    WHERE cum * den >= num * tot
    GROUP BY 1, 2
    """
