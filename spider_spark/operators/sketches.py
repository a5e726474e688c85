"""Mergeable bounded-state sketches: KMV distinct-count, count-min freq.

A 100 TB corpus is summarized continuously — distinct URLs per host for
frontier sizing, distinct fingerprints per release for datacards, token
frequencies for boilerplate/stopword discovery. Exact answers need a
full-width shuffle per question; a *sketch* is a fixed-size, mergeable
summary built in one pass, so per-shard / per-day sketches combine
without rescanning the corpus (the same union-then-reduce shape the
bloom/cuckoo seen filters use for membership).

Two classic sketches, both exact-integer so the DuckDB oracle replays
them bit-for-bit:

* **KMV (k-minimum-values)** distinct-count estimator (Bar-Yossef et
  al. 2002; Beyer et al. 2007 "On synopses for distinct-value
  estimation"): keep the ``k`` smallest distinct ``md5_60`` hashes per
  group; the k-th smallest ``h_k`` of ``D`` uniform draws over
  ``[0, 2^60)`` sits near ``k·2^60/D``, so ``D̂ = (k-1)·2^60 / h_k``
  (the unbiased form). Groups with fewer than ``k`` distinct keys keep
  everything — the estimate is exact there. The retained-hash set is
  the sketch: ``KMV(A ∪ B)`` ≡ re-minimize(``KMV(A) ∪ KMV(B)``),
  verified in tests/test_sketches.py.

* **Count-min** frequency sketch (Cormode & Muthukrishnan 2005):
  ``depth × width`` integer counters; item ``x`` increments cell
  ``(r, md5_60(r‖x) mod width)`` for each row ``r``; the estimate is
  the min over rows — always ≥ the true count, over by at most the
  collision mass in the lightest row. Sketches merge counter-wise.

Scale shape:

* ``kmv_sketch`` — one narrow ``(group, hash)`` distinct (8-byte
  values, map-side partial aggregation collapses duplicates before the
  exchange) followed by the salted two-stage bottom-k the stratified
  sampler uses (operators/sampling.py): no task ever ranks more than
  one salt shard of a hot group, stage 2 sees ≤ ``salt·k`` rows/group.
* ``cms_build`` — one scan: a ``depth``-element literal array explodes
  per item, then ONE cell-keyed count with map-side partials. The
  output is ≤ ``depth·width`` rows no matter the corpus — the whole
  point. ``cms_estimate`` broadcasts the sketch (it is tiny by
  construction) so probing is a zero-shuffle scan of the query items.

Reference parity: no analog in the reference (an asyncio crawler);
training-data extension layer, same family as operators/ngrams.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spider_spark.operators.dedupe import md5_60, md5_60_sql

__all__ = [
    "kmv_sketch", "kmv_merge", "kmv_estimate", "kmv_distinct",
    "kmv_distinct_sql",
    "cms_build", "cms_merge", "cms_estimate", "cms_estimate_sql",
    "hll_sketch", "hll_merge", "hll_estimate", "hll_distinct",
    "hll_distinct_sql",
    "theta_overlap", "theta_overlap_sketches", "theta_overlap_sql",
]

HASH_SPACE = 1 << 60  # md5_60 values are uniform in [0, 2^60)


# ---------------------------------------------------------------------------
# KMV distinct-count
# ---------------------------------------------------------------------------


def _bottom_k(hashes: DataFrame, group_col: str, k: int, salt: int) -> DataFrame:
    """The ``k`` smallest ``_h`` per group from a distinct ``(group, _h)``
    relation — salted two-stage so hot groups never rank on one task.
    The global bottom-k is contained in the union of per-shard bottom-k,
    so the result is exact."""
    h = F.col("_h")
    w1 = Window.partitionBy(group_col, F.pmod(h, F.lit(salt))).orderBy(h.asc())
    stage1 = (
        hashes.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1")
    )
    w2 = Window.partitionBy(group_col).orderBy(h.asc())
    return (
        stage1.withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= k)
        .drop("_r2")
    )


def kmv_sketch(df: DataFrame, group_col: str, key_col: str | Column,
               k: int = 64, salt: int = 8) -> DataFrame:
    """``(group, _h)`` rows: the ``k`` smallest distinct 60-bit hashes of
    ``key_col`` per group — the mergeable KMV synopsis. ≤ ``k`` rows per
    group regardless of input size."""
    if k < 2:
        raise ValueError(f"k must be ≥2 (the estimator divides by k-1): {k}")
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    hashes = df.select(
        F.col(group_col), md5_60(key.cast("string")).alias("_h")
    ).distinct()
    return _bottom_k(hashes, group_col, k, salt)


def kmv_merge(sketches: list[DataFrame], group_col: str,
              k: int = 64, salt: int = 8) -> DataFrame:
    """Union per-shard sketches and re-minimize: identical to sketching
    the concatenated inputs (KMV's defining property — tested)."""
    if not sketches:
        raise ValueError("kmv_merge needs at least one sketch")
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return _bottom_k(merged.distinct(), group_col, k, salt)


def kmv_estimate(sketch: DataFrame, group_col: str, k: int) -> DataFrame:
    """Collapse a sketch to ``(group, sketch_size, kth_hash,
    est_distinct)``. Groups that retained fewer than ``k`` hashes saw
    their whole key set — the estimate is the exact count. The
    ``(k-1)·2^60 / h_k`` quotient runs in overflow-safe int64: with
    ``q = 2^60 div h_k`` and ``r = 2^60 mod h_k`` the exact value is
    ``(k-1)·q + ((k-1)·r) div h_k`` — every intermediate is bounded by
    the estimate itself for any real cardinality."""
    agg = sketch.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("sketch_size"),
        F.max("_h").alias("kth_hash"),
    )
    q = F.expr(f"{HASH_SPACE} div greatest(kth_hash, 1)")
    r = F.expr(f"{HASH_SPACE} % greatest(kth_hash, 1)")
    full = F.lit(k - 1) * q + F.expr(
        f"({k - 1} * ({HASH_SPACE} % greatest(kth_hash, 1))) "
        "div greatest(kth_hash, 1)"
    )
    est = F.when(F.col("sketch_size") < k, F.col("sketch_size")).otherwise(full)
    return agg.select(
        group_col, "sketch_size", "kth_hash",
        est.cast("long").alias("est_distinct"),
    )


def kmv_distinct(df: DataFrame, group_col: str, key_col: str | Column,
                 k: int = 64, salt: int = 8) -> DataFrame:
    """One-call form: sketch + estimate."""
    return kmv_estimate(kmv_sketch(df, group_col, key_col, k, salt),
                        group_col, k)


def kmv_distinct_sql(group_expr: str, key_expr: str, k: int,
                     rel: str, group_name: str = "grp") -> str:
    """DuckDB mirror of :func:`kmv_distinct` (the salt is a physical-plan
    detail — the retained set is identical). Same q/r integer-quotient
    decomposition, so the estimate matches bit-for-bit."""
    h = md5_60_sql(f"CAST({key_expr} AS VARCHAR)")
    return f"""
    WITH hashes AS (
      SELECT DISTINCT {group_expr} AS {group_name}, {h} AS _h FROM {rel}
    ), ranked AS (
      SELECT {group_name}, _h,
             row_number() OVER (PARTITION BY {group_name} ORDER BY _h) AS _rn
      FROM hashes
    ), agg AS (
      SELECT {group_name},
             count(*)::BIGINT AS sketch_size,
             max(_h) AS kth_hash
      FROM ranked WHERE _rn <= {k} GROUP BY {group_name}
    )
    SELECT {group_name}, sketch_size, kth_hash,
           (CASE WHEN sketch_size < {k} THEN sketch_size
                 ELSE {k - 1} * ({HASH_SPACE} // greatest(kth_hash, 1))
                      + ({k - 1} * ({HASH_SPACE} % greatest(kth_hash, 1)))
                        // greatest(kth_hash, 1)
            END)::BIGINT AS est_distinct
    FROM agg
    """


# ---------------------------------------------------------------------------
# count-min frequency
# ---------------------------------------------------------------------------


def _cms_cells(item: Column, depth: int, width: int) -> Column:
    """``depth`` ``(r, c)`` structs for one item: row ``r`` hashes
    ``'r|item'`` — independent-enough hash rows from the one shared
    md5_60, identical in the SQL mirror."""
    return F.array(*[
        F.struct(
            F.lit(r).alias("r"),
            F.pmod(md5_60(F.concat(F.lit(f"{r}|"), item)),
                   F.lit(width)).alias("c"),
        )
        for r in range(depth)
    ])


def _check_dims(depth: int, width: int) -> None:
    if depth < 1 or width < 2:
        raise ValueError(f"need depth ≥1 and width ≥2: {depth}×{width}")


def cms_build(items: DataFrame, item_col: str,
              depth: int = 4, width: int = 1024) -> DataFrame:
    """``(r, c, cnt)`` counter table over one item per input row (explode
    tokens upstream). ≤ ``depth·width`` output rows; one scan, one
    cell-keyed count with map-side partials."""
    _check_dims(depth, width)
    cells = _cms_cells(F.col(item_col).cast("string"), depth, width)
    return (
        items.select(F.explode(cells).alias("cell"))
        .groupBy(F.col("cell.r").alias("r"), F.col("cell.c").alias("c"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Counter-wise sum — sketches over disjoint shards combine into the
    sketch of the union (tested)."""
    return (
        a.unionByName(b)
        .groupBy("r", "c")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, queries: DataFrame, item_col: str,
                 depth: int = 4, width: int = 1024) -> DataFrame:
    """``(item, est_count)`` for each query item: min over the item's
    ``depth`` cells. The sketch is ≤ ``depth·width`` rows by
    construction — broadcast it, so probing never shuffles the queries.
    Items the sketch never saw estimate to 0 (count-min never
    underestimates, so 0 is exact there)."""
    _check_dims(depth, width)
    cells = _cms_cells(F.col(item_col).cast("string"), depth, width)
    probes = queries.select(
        F.col(item_col), F.explode(cells).alias("cell")
    ).select(item_col, F.col("cell.r").alias("r"), F.col("cell.c").alias("c"))
    return (
        probes.join(F.broadcast(sketch), ["r", "c"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
        .groupBy(item_col)
        .agg(F.min("cnt").alias("est_count"))
    )


def cms_estimate_sql(items_rel: str, item_expr: str, queries_rel: str,
                     query_expr: str, depth: int = 4,
                     width: int = 1024, item_name: str = "item") -> str:
    """DuckDB mirror: build the sketch over ``items_rel`` and probe it
    with ``queries_rel`` — the same two relations the Spark pair sees."""
    def cell(x: str) -> str:
        return (md5_60_sql(f"rows.r::VARCHAR || '|' || {x}")
                + f" % {width}")

    return f"""
    WITH rows AS (SELECT unnest(range({depth})) AS r),
    sketch AS (
      SELECT rows.r AS r, {cell(f"CAST({item_expr} AS VARCHAR)")} AS c,
             count(*)::BIGINT AS cnt
      FROM {items_rel} CROSS JOIN rows
      GROUP BY 1, 2
    ), probes AS (
      SELECT {query_expr} AS {item_name}, rows.r AS r,
             {cell(f"CAST({query_expr} AS VARCHAR)")} AS c
      FROM {queries_rel} CROSS JOIN rows
    )
    SELECT probes.{item_name} AS {item_name},
           min(coalesce(sketch.cnt, 0))::BIGINT AS est_count
    FROM probes LEFT JOIN sketch USING (r, c)
    GROUP BY 1
    """


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count
# ---------------------------------------------------------------------------


def _hll_parts(key: Column, p: int) -> tuple[Column, Column]:
    """``(bucket, rho)`` of one key under the shared ``md5_60`` hash:
    bucket = top ``p`` bits; rho = 1 + leading zeros of the remaining
    ``60-p`` bits (the all-zero suffix scores ``61-p``). The MSB
    position comes from ``length(bin(x))`` — pure integer, identical in
    both engines."""
    kbits = 60 - p
    h = md5_60(key)
    bucket = F.shiftrightunsigned(h, kbits)
    low = h.bitwiseAND(F.lit((1 << kbits) - 1))
    rho = F.when(low == 0, F.lit(kbits + 1)).otherwise(
        F.lit(kbits) - F.length(F.bin(low)) + 1
    )
    return bucket, rho


def hll_sketch(df: DataFrame, group_col: str, key_col: str | Column,
               p: int = 12) -> DataFrame:
    """Per-group HyperLogLog registers (Flajolet et al. 2007):
    ``(group, bucket, m_j)`` rows for the ≤ ``2^p`` NON-zero registers
    (sparse — a group with few keys stores few rows). One scan + one
    (group, bucket)-keyed max with map-side partials; state is bounded
    by ``2^p`` rows per group no matter the corpus."""
    if not (4 <= p <= 16):
        raise ValueError(f"p must be in [4, 16]: {p}")
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    bucket, rho = _hll_parts(key.cast("string"), p)
    return (
        df.select(F.col(group_col), bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(group_col, "bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_merge(sketches: list[DataFrame], group_col: str) -> DataFrame:
    """Union registers and re-maximize — ``HLL(A ∪ B)`` exactly."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionAll(s)
    return u.groupBy(group_col, "bucket").agg(F.max("m_j").alias("m_j"))


def hll_estimate(sketch: DataFrame, group_col: str, p: int = 12) -> DataFrame:
    """``(group, v_zero, est)`` from a register relation: the standard
    estimator — ``E = α_m·m²/Σ2^(-M_j)`` with linear counting
    ``m·ln(m/V)`` when ``V > 0`` zero registers and ``E ≤ 2.5m``.

    Everything stays integer until the last step: ``Σ2^(-M_j)`` scales
    to ``S = Σ2^(K-M_j) + V·2^K`` (int64 — ≤ ``m·2^K = 2^(61-... )``),
    ``α_m = 7213m/(10000m+10790)`` is kept rational, and the branch
    test ``E_raw ≤ 2.5m`` evaluates as the exact cross-multiplication
    ``2·num ≤ 5·m·den`` in decimal(38,0). Only the final division /
    logarithm runs in doubles, rounded to 6 decimals (the PMI/BM25
    determinism recipe), so the DuckDB mirror agrees."""
    m = 1 << p
    kbits = 60 - p
    kmax = kbits + 1
    dec = "decimal(38,0)"
    per_group = sketch.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_used"),
        F.sum(F.expr(f"shiftleft(1L, {kmax} - m_j)")).alias("_s0"),
    )
    v = F.lit(m) - F.col("_used")
    s = (F.col("_s0").cast(dec)
         + v.cast(dec) * F.lit(1 << kmax).cast(dec))
    num = (F.lit(7213).cast(dec) * F.lit(m).cast(dec) * F.lit(m).cast(dec)
           * F.lit(m).cast(dec) * F.lit(1 << kmax).cast(dec))
    den = F.lit(10000 * m + 10790).cast(dec) * s
    est_raw = F.round(num.cast("double") / den.cast("double"), 6)
    est_lc = F.round(
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")), 6
    )
    small = (v > 0) & (
        F.lit(2).cast(dec) * num
        <= F.lit(5 * m).cast(dec) * den
    )
    return per_group.select(
        F.col(group_col),
        v.cast("long").alias("v_zero"),
        F.when(small, est_lc).otherwise(est_raw).alias("est"),
    )


def hll_distinct(df: DataFrame, group_col: str, key_col: str | Column,
                 p: int = 12) -> DataFrame:
    """Sketch + estimate in one call — the one-shot form."""
    return hll_estimate(hll_sketch(df, group_col, key_col, p), group_col, p)


def hll_distinct_sql(group_expr: str, key_expr: str, p: int,
                     table: str, out_name: str | None = None) -> str:
    """DuckDB mirror of :func:`hll_distinct` — same hash split, register
    max, integer scaling, exact branch test, and 6-decimal rounding.
    ``out_name`` names the group column in the output (defaults to
    ``group_expr`` when that is a bare identifier)."""
    m = 1 << p
    kbits = 60 - p
    kmax = kbits + 1
    h = md5_60_sql(f"CAST({key_expr} AS STRING)")
    return f"""
    WITH hashed AS (
      SELECT {group_expr} AS grp, {h} AS h FROM {table}
    ),
    regs AS (
      SELECT grp, h >> {kbits} AS bucket,
             max(CASE WHEN (h & {(1 << kbits) - 1}) = 0 THEN {kmax}
                 ELSE {kbits} - length(bin(h & {(1 << kbits) - 1})) + 1
                 END) AS m_j
      FROM hashed GROUP BY 1, 2
    ),
    agg AS (
      SELECT grp, count(*) AS used,
             sum((1::BIGINT << ({kmax} - m_j)))::BIGINT AS s0
      FROM regs GROUP BY 1
    ),
    terms AS (
      SELECT grp, ({m} - used)::BIGINT AS v_zero,
             s0::HUGEINT + ({m} - used)::HUGEINT * {1 << kmax}::HUGEINT AS s,
             7213::HUGEINT * {m}::HUGEINT * {m}::HUGEINT * {m}::HUGEINT
               * {1 << kmax}::HUGEINT AS num
      FROM agg
    )
    SELECT grp AS {out_name or (group_expr if group_expr.isidentifier() else 'grp')},
           v_zero,
           CASE WHEN v_zero > 0
                 AND 2::HUGEINT * num
                     <= 5::HUGEINT * {m}::HUGEINT * ({10000 * m + 10790}::HUGEINT * s)
                THEN round({m}::DOUBLE * ln({m}::DOUBLE / v_zero::DOUBLE), 6)
                ELSE round(num::DOUBLE / ({10000 * m + 10790}::HUGEINT * s)::DOUBLE, 6)
           END AS est
    FROM terms
    """


# ---------------------------------------------------------------------------
# theta set operations over KMV sketches
# ---------------------------------------------------------------------------

JACCARD_PPM = 1_000_000


def _theta_est(count: str, theta: str) -> Column:
    """``count · 2^60 div theta``, exact, via decimal(38,0) — unlike
    :func:`kmv_estimate`'s q/r int64 decomposition (valid there because
    its count is tied to ITS theta), the combined theta can be far larger
    than either sketch's own threshold, so ``count · (2^60 mod θ)``
    overflows int64; the 128-bit product cannot (count ≤ 2k)."""
    return F.expr(
        f"CAST({count} AS DECIMAL(38, 0)) * {HASH_SPACE} "
        f"div greatest({theta}, 1)"
    )


def theta_overlap_sketches(sketch_a: DataFrame, sketch_b: DataFrame,
                           group_col: str, k: int = 64) -> DataFrame:
    """Theta-sketch set operations (Dasgupta et al. 2016, the
    DataSketches theta framework) over two per-group KMV synopses built
    with the same ``k``: distinct-count estimates for A∩B, A∪B, A∖B,
    B∖A — the questions a union-only distinct counter (KMV/HLL alone)
    cannot answer, and the exact forms (``INTERSECT``/``EXCEPT`` over
    raw keys) answer only with a corpus-wide shuffle per question.

    The theta trick: each sketch is a uniform sample of its key-hash
    set below a per-sketch threshold ``θ_X`` (``2^60`` while the sketch
    holds everything — estimates are then EXACT — else its k-th
    smallest hash). Below ``θ = min(θ_A, θ_B)`` BOTH sketches retain
    every hash they saw, so set algebra on the retained rows is set
    algebra on a fair sample of the true sets, and each count scales by
    ``2^60/θ`` — an exact decimal(38,0)/HUGEINT quotient (see
    :func:`_theta_est`), so everything stays exact-integer and the
    DuckDB mirror hash-matches.

    Output per group: ``(group, theta, n_inter, n_union, est_intersect,
    est_union, est_a_only, est_b_only, jaccard_ppm)`` where
    ``jaccard_ppm = n_inter·10^6 div n_union`` (the sample's exact
    rational). Groups present in only one input get ``θ_other = 2^60``
    and zero intersection. Scale shape: sketches are ≤ ``k`` rows per
    group by construction, so everything here — the flag union, the
    per-(group, hash) max, the threshold join, the final agg — runs on
    bounded-size relations; the corpus was touched only by
    ``kmv_sketch``'s one narrow distinct."""
    if k < 2:
        raise ValueError(f"k must be ≥2: {k}")
    g = group_col

    def thresholds(s: DataFrame, n_name: str, t_name: str) -> DataFrame:
        agg = s.groupBy(g).agg(F.count(F.lit(1)).alias(n_name),
                               F.max("_h").alias("_kth"))
        theta = F.when(F.col(n_name) < k, F.lit(HASH_SPACE)).otherwise(
            F.col("_kth"))
        return agg.select(g, theta.alias(t_name))

    th = (
        thresholds(sketch_a, "_na", "theta_a")
        .join(thresholds(sketch_b, "_nb", "theta_b"), on=g, how="full_outer")
        .select(g,
                F.coalesce("theta_a", F.lit(HASH_SPACE)).alias("theta_a"),
                F.coalesce("theta_b", F.lit(HASH_SPACE)).alias("theta_b"))
        .withColumn("theta", F.least("theta_a", "theta_b"))
    )
    flags = (
        sketch_a.select(g, "_h", F.lit(1).alias("a"), F.lit(0).alias("b"))
        .unionByName(
            sketch_b.select(g, "_h", F.lit(0).alias("a"), F.lit(1).alias("b")))
        .groupBy(g, "_h").agg(F.max("a").alias("a"), F.max("b").alias("b"))
    )
    below = flags.join(th.select(g, "theta"), on=g).filter(
        F.col("_h") < F.col("theta"))
    counts = below.groupBy(g).agg(
        F.sum(F.col("a") * F.col("b")).alias("n_inter"),
        F.count(F.lit(1)).alias("n_union"),
        F.sum(F.col("a") * (1 - F.col("b"))).alias("n_a_only"),
        F.sum(F.col("b") * (1 - F.col("a"))).alias("n_b_only"),
    )
    out = th.join(counts, on=g, how="left").select(
        g, "theta",
        F.coalesce("n_inter", F.lit(0)).alias("n_inter"),
        F.coalesce("n_union", F.lit(0)).alias("n_union"),
        F.coalesce("n_a_only", F.lit(0)).alias("n_a_only"),
        F.coalesce("n_b_only", F.lit(0)).alias("n_b_only"),
    )
    jac = F.expr(f"(n_inter * {JACCARD_PPM}) div greatest(n_union, 1)")
    return out.select(
        g, "theta", "n_inter", "n_union",
        _theta_est("n_inter", "theta").cast("long").alias("est_intersect"),
        _theta_est("n_union", "theta").cast("long").alias("est_union"),
        _theta_est("n_a_only", "theta").cast("long").alias("est_a_only"),
        _theta_est("n_b_only", "theta").cast("long").alias("est_b_only"),
        jac.cast("long").alias("jaccard_ppm"),
    )


def theta_overlap(a: DataFrame, b: DataFrame, group_col: str,
                  key_col: str | Column, k: int = 64,
                  salt: int = 8) -> DataFrame:
    """One-call form: sketch both inputs, then set algebra."""
    return theta_overlap_sketches(
        kmv_sketch(a, group_col, key_col, k, salt),
        kmv_sketch(b, group_col, key_col, k, salt),
        group_col, k)


def theta_overlap_sql(a_rel: str, b_rel: str, group_expr: str,
                      key_expr: str, k: int,
                      group_name: str = "grp") -> str:
    """DuckDB mirror of :func:`theta_overlap` — identical sketches,
    thresholds, flag algebra, and q/r estimates."""
    h = md5_60_sql(f"CAST({key_expr} AS VARCHAR)")

    def sk(rel: str, name: str) -> str:
        return f"""{name}_h AS (
      SELECT DISTINCT {group_expr} AS {group_name}, {h} AS _h FROM ({rel})
    ), {name} AS (
      SELECT {group_name}, _h FROM (
        SELECT {group_name}, _h,
               row_number() OVER (PARTITION BY {group_name}
                                  ORDER BY _h) AS _rn
        FROM {name}_h
      ) WHERE _rn <= {k}
    ), {name}_t AS (
      SELECT {group_name},
             CASE WHEN count(*) < {k} THEN {HASH_SPACE}
                  ELSE max(_h) END AS theta_{name}
      FROM {name} GROUP BY {group_name}
    )"""

    def est(n: str) -> str:
        return (f"(({n}::HUGEINT * {HASH_SPACE}) "
                f"// greatest(theta, 1))::BIGINT")

    return f"""
    WITH {sk(a_rel, 'tha')}, {sk(b_rel, 'thb')},
    th AS (
      SELECT coalesce(a.{group_name}, b.{group_name}) AS {group_name},
             least(coalesce(theta_tha, {HASH_SPACE}),
                   coalesce(theta_thb, {HASH_SPACE})) AS theta
      FROM tha_t a FULL OUTER JOIN thb_t b USING ({group_name})
    ),
    fl AS (
      SELECT {group_name}, _h, max(a) AS a, max(b) AS b FROM (
        SELECT {group_name}, _h, 1 AS a, 0 AS b FROM tha
        UNION ALL
        SELECT {group_name}, _h, 0, 1 FROM thb
      ) GROUP BY 1, 2
    ),
    cnt AS (
      SELECT fl.{group_name},
             sum(a * b)::BIGINT AS n_inter,
             count(*)::BIGINT AS n_union,
             sum(a * (1 - b))::BIGINT AS n_a_only,
             sum(b * (1 - a))::BIGINT AS n_b_only
      FROM fl JOIN th USING ({group_name})
      WHERE _h < theta GROUP BY 1
    )
    SELECT th.{group_name}, theta,
           coalesce(n_inter, 0) AS n_inter,
           coalesce(n_union, 0) AS n_union,
           {est('coalesce(n_inter, 0)')} AS est_intersect,
           {est('coalesce(n_union, 0)')} AS est_union,
           {est('coalesce(n_a_only, 0)')} AS est_a_only,
           {est('coalesce(n_b_only, 0)')} AS est_b_only,
           (coalesce(n_inter, 0) * {JACCARD_PPM})
             // greatest(coalesce(n_union, 0), 1) AS jaccard_ppm
    FROM th LEFT JOIN cnt USING ({group_name})
    """
