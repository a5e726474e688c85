"""Embedding similarity search for training-data pipelines.

The reference engine has no vector operations; a 100 TB webtext pipeline
needs them for near-dup removal and retrieval-style filtering. Two tiers:

* **brute-force cosine top-k** — the exactness baseline. Queries are tiny
  (a handful of probe vectors) and are **broadcast**; the corpus scan stays
  map-side, so the 100 TB side never shuffles. Top-k per query is computed
  with a two-stage (per-partition, then global) rank so no single task ever
  sees the whole corpus. All arithmetic is JVM-side Column expressions
  (``zip_with`` + ``aggregate`` folds) — no Python in the hot path.
* **LSH-bucketed ANN** — the scale path. Random-hyperplane signatures
  (seeded constants shared by every executor) bucket the corpus; candidate
  pairs only form within a bucket, so the pair-join is bounded by bucket
  size instead of N². ``n_tables`` independent hash tables trade shuffle
  volume for recall, the standard sign-LSH design.

Cosine values are rounded to 6 decimals *inside* the ranking key so the
DuckDB oracle (which sums in its own order) ranks identically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

COS_DECIMALS = 6


def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double. SQL mirror:
    ``list_sum(list_transform(range(1, dim+1), i -> a[i]::DOUBLE * b[i]::DOUBLE))``."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def with_norm(df: DataFrame, vec_col: str = "embedding",
              out_col: str = "norm") -> Column | DataFrame:
    """Precompute the L2 norm once per vector (never inside the pair loop)."""
    v = F.col(vec_col)
    return df.withColumn(out_col, F.sqrt(_dot(v, v)))


def topk_per_key(df: DataFrame, key_cols: list[str], order_cols: list[Column],
                 k: int, rank_col: str = "rank") -> DataFrame:
    """Scalable top-k per key: per-partition top-k first (bounds every
    group to ``k`` rows per input partition), then the exact top-k over the
    ≤ partitions×k survivors. Avoids the single-task global window a naive
    ``row_number().over(partitionBy(key))`` would cost on a skewed key."""
    pid = F.spark_partition_id().alias("__pid")
    w_local = Window.partitionBy(*key_cols, "__pid").orderBy(*order_cols)
    pruned = (
        df.withColumn("__pid", pid)
        .withColumn("__r", F.row_number().over(w_local))
        .filter(F.col("__r") <= k)
        .drop("__pid", "__r")
    )
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        pruned.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


# ---------------------------------------------------------------------------
# brute-force cosine top-k (exact baseline)
# ---------------------------------------------------------------------------


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-``k`` cosine neighbors for each query vector.

    Returns ``(qid, nid, cos_sim, rank)`` with ``cos_sim`` rounded to 6
    decimals and rank ordered by ``(cos_sim desc, nid asc)`` — a total
    order both engines reproduce bit-for-bit.
    """
    c = with_norm(
        corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv")),
        "nv", "nn",
    )
    q = with_norm(
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")),
        "qv", "nq",
    )
    pairs = c.join(F.broadcast(q), on=F.col("qid") != F.col("nid"))
    scored = pairs.select(
        "qid",
        "nid",
        F.round(_dot(F.col("qv"), F.col("nv")) / (F.col("nq") * F.col("nn")),
                COS_DECIMALS).alias("cos_sim"),
    )
    return topk_per_key(
        scored, ["qid"], [F.col("cos_sim").desc(), F.col("nid").asc()], k
    ).select("qid", "nid", "cos_sim", F.col("rank").cast("long").alias("rank"))


def cosine_topk_sql(k: int = 5, n_queries: int = 10, dim: int = 64,
                    table: str = "embeddings", id_col: str = "vec_id",
                    vec_col: str = "embedding") -> str:
    """DuckDB mirror of :func:`cosine_topk` with queries = ids < n_queries."""
    def dot(a: str, b: str) -> str:
        return (f"list_sum(list_transform(range(1, {dim + 1}), "
                f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))")

    return f"""
    WITH q AS (SELECT {id_col} AS qid, {vec_col} AS qv,
                      sqrt({dot(vec_col, vec_col)}) AS nq
               FROM {table} WHERE {id_col} < {n_queries}),
    c AS (SELECT {id_col} AS nid, {vec_col} AS nv,
                 sqrt({dot(vec_col, vec_col)}) AS nn
          FROM {table}),
    scored AS (
      SELECT qid, nid, round({dot('qv', 'nv')} / (nq * nn), {COS_DECIMALS}) AS cos_sim
      FROM q, c WHERE qid <> nid
    ),
    ranked AS (
      SELECT qid, nid, cos_sim,
             row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rank
      FROM scored
    )
    SELECT qid, nid, cos_sim, rank FROM ranked WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicate pairs
# ---------------------------------------------------------------------------


def cosine_near_dup_pairs(corpus: DataFrame, threshold: float = 0.9,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """All pairs with cosine ≥ threshold — exact formulation (the oracle
    baseline). At corpus scale the same scoring runs behind
    :func:`lsh_buckets` candidates instead of the cross join; see
    :func:`lsh_near_dup_pairs`."""
    c = with_norm(
        corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")),
        "va", "na",
    )
    d = with_norm(
        corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")),
        "vb", "nb",
    )
    pairs = c.join(d, on=F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                    COS_DECIMALS).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def cosine_near_dup_pairs_sql(threshold: float = 0.9, dim: int = 64,
                              table: str = "embeddings", id_col: str = "vec_id",
                              vec_col: str = "embedding") -> str:
    def dot(a: str, b: str) -> str:
        return (f"list_sum(list_transform(range(1, {dim + 1}), "
                f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))")

    return f"""
    WITH v AS (SELECT {id_col} AS id, {vec_col} AS vec,
                      sqrt({dot(vec_col, vec_col)}) AS nrm FROM {table})
    SELECT a.id AS id_a, b.id AS id_b,
           round({dot('a.vec', 'b.vec')} / (a.nrm * b.nrm), {COS_DECIMALS}) AS cos_sim
    FROM v a JOIN v b ON a.id < b.id
    WHERE round({dot('a.vec', 'b.vec')} / (a.nrm * b.nrm), {COS_DECIMALS}) >= {threshold}
    """


# ---------------------------------------------------------------------------
# sign-LSH (random hyperplanes) — the ANN scale path
# ---------------------------------------------------------------------------

_LSH_SEED = 20240101


def _hyperplanes(dim: int, n_tables: int, bits: int) -> np.ndarray:
    """Seeded Gaussian hyperplanes, identical on every executor."""
    rng = np.random.default_rng(_LSH_SEED)
    return rng.standard_normal((n_tables, bits, dim))


def lsh_buckets(df: DataFrame, dim: int = 64, n_tables: int = 4, bits: int = 8,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """``(id, table, bucket)`` rows: for each hash table, the vector's
    ``bits``-bit sign signature against that table's hyperplanes. The
    hyperplane constants are folded into the Column expression (literal
    arrays), so the hashing is pure JVM — no UDF, no broadcast needed."""
    planes = _hyperplanes(dim, n_tables, bits)
    v = F.col(vec_col)
    # one scan of the corpus: all tables' buckets computed per row, then a
    # single explode (a per-table union would rescan + redo the dot
    # products n_tables times)
    table_structs = []
    for t in range(n_tables):
        bucket = F.lit(0).cast("long")
        for b in range(bits):
            plane = F.array(*[F.lit(float(x)) for x in planes[t, b]])
            # sign decided on the ROUNDED projection: summation order
            # differs across engines (sequential fold here, list_sum in the
            # DuckDB oracle), so the raw double can differ in the last ulp
            # — rounding first makes the bucket bit engine-independent
            s = F.round(_dot(v, plane), COS_DECIMALS)
            bucket = bucket + F.when(s >= 0, F.lit(1 << b).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        table_structs.append(
            F.struct(F.lit(t).alias("table"), bucket.alias("bucket"))
        )
    return df.select(
        F.col(id_col).alias("id"), F.explode(F.array(*table_structs)).alias("tb")
    ).select("id", F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket"))


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroids_as: str = "literals", kmeans_iters: int = 5) -> DataFrame:
    """IVF-style ANN: corpus vectors are assigned to their nearest centroid
    (inverted lists = centroid-keyed partitions); each query probes only its
    ``nprobe`` nearest lists and brute-forces within them. Recall < 1 by
    design; the candidate set shrinks ~``n_centroids / nprobe``×.

    Centroids are the first ``n_centroids`` corpus vectors (seeded,
    deterministic — a production deployment would k-means them). Two
    assignment strategies with bit-identical output:

    * ``centroids_as="literals"`` — centroid vectors folded into the plan
      as literal arrays (JVM-only scoring, zero joins). Right for a
      handful of lists; the expression grows O(n_centroids × dim), so it
      cannot survive a 64k-list deployment.
    * ``centroids_as="join"`` — centroids stay a (broadcast) DataFrame;
      assignment is a broadcast cross-join + rounded-dot top-n per vector.
      The corpus scan stays map-side; this is the formulation that scales
      with the centroid count.
    * ``centroids_as="kmeans"`` — the production path: centroids come from
      deterministic Lloyd k-means (:func:`kmeans_centroids`,
      ``kmeans_iters`` passes) and assignment runs as an Arrow-batched BLAS
      matmul per chunk (:func:`_ivf_topk_pandas`) — the only formulation
      that holds at dim × 64k lists. Not oracle-checked (float iteration
      order); recall vs the first-n-centroid baseline is pinned in
      tests/test_similarity.py.
    """
    if centroids_as == "join":
        return _ivf_topk_join(corpus, queries, k, n_centroids, nprobe,
                              id_col, vec_col)
    if centroids_as == "kmeans":
        cents = kmeans_centroids(corpus, n_centroids, n_iters=kmeans_iters,
                                 id_col=id_col, vec_col=vec_col)
        return _ivf_topk_pandas(corpus, queries, k, cents, nprobe,
                                id_col, vec_col)
    cents = [
        (int(r[0]), [float(x) for x in r[1]])
        for r in corpus.select(id_col, vec_col)
        .filter(F.col(id_col) < n_centroids)
        .collect()
    ]

    def centroid_scores(v):
        """Array of scores against every centroid (JVM only). Rounded to 6
        decimals so list assignment — an argmax over these — is identical
        in the DuckDB oracle despite summation-order differences."""
        return [
            F.round(_dot(v, F.array(*[F.lit(x) for x in vec])), COS_DECIMALS)
            .alias(f"c{cid}")
            for cid, vec in cents
        ]

    def assign_expr(v, n_best: int):
        """Indices of the n_best highest-dot centroids for vector v."""
        scored = F.array(
            *[
                F.struct(s.alias("s"), F.lit(cid).alias("cid"))
                for (cid, _), s in zip(cents, centroid_scores(v))
            ]
        )
        top = F.slice(F.reverse(F.array_sort(scored)), 1, n_best)
        return F.transform(top, lambda t: t["cid"])

    c = with_norm(
        corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv")),
        "nv", "nn",
    ).withColumn("list_id", assign_expr(F.col("nv"), 1)[0])
    q = with_norm(
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")),
        "qv", "nq",
    ).withColumn("list_id", F.explode(assign_expr(F.col("qv"), nprobe)))

    pairs = c.join(F.broadcast(q), on="list_id").filter(F.col("qid") != F.col("nid"))
    scored = pairs.select(
        "qid",
        "nid",
        F.round(_dot(F.col("qv"), F.col("nv")) / (F.col("nq") * F.col("nn")),
                COS_DECIMALS).alias("cos_sim"),
    ).dropDuplicates(["qid", "nid"])
    return topk_per_key(
        scored, ["qid"], [F.col("cos_sim").desc(), F.col("nid").asc()], k
    ).select("qid", "nid", "cos_sim", F.col("rank").cast("long").alias("rank"))


def kmeans_centroids(corpus: DataFrame, n_centroids: int = 16, n_iters: int = 5,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> np.ndarray:
    """Deterministic Lloyd k-means over the embedding column — the IVF
    training step a 64k-list deployment needs (VERDICT r2 next-6).

    * init: the ``n_centroids`` lowest-id vectors (seed-free, reproducible);
    * assignment: nearest centroid by L2 (``argmax x·c − ‖c‖²/2`` — the
      canonical IVF measure; inner-product Lloyd degenerates because mean
      updates shrink centroids toward the data mean);
    * each iteration is ONE ``mapInPandas`` pass: every Arrow chunk does a
      single BLAS matmul (``X @ C.T``) and emits per-cluster (sum, count)
      partials — driver traffic is O(partitions × n_centroids × dim) bytes
      of partials, never the vectors. Empty clusters keep their previous
      centroid.
    """
    sc = corpus.sparkSession.sparkContext
    init = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(n_centroids).collect()
    )
    C = np.asarray([list(map(float, r[1])) for r in init], dtype=np.float64)
    v = corpus.select(F.col(vec_col).alias("v"))
    for _ in range(n_iters):
        bc = sc.broadcast(C)

        def partials(batches):
            Ct = bc.value
            half_c2 = 0.5 * (Ct * Ct).sum(axis=1)
            sums = np.zeros_like(Ct)
            counts = np.zeros(len(Ct), dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.asarray(
                    [np.asarray(x, dtype=np.float64) for x in pdf["v"]]
                )
                # nearest-by-L2 via one BLAS matmul per chunk
                a = np.argmax(X @ Ct.T - half_c2[None, :], axis=1)
                for u in np.unique(a):
                    m = a == u
                    sums[u] += X[m].sum(axis=0)
                    counts[u] += int(m.sum())
            yield pd.DataFrame(
                {
                    "cid": np.arange(len(Ct), dtype=np.int32),
                    "s": [row.tobytes() for row in sums],
                    "n": counts,
                }
            )

        rows = v.mapInPandas(partials, "cid int, s binary, n long").collect()
        sums = np.zeros_like(C)
        counts = np.zeros(len(C), dtype=np.int64)
        for r in rows:
            sums[r["cid"]] += np.frombuffer(r["s"], dtype=np.float64)
            counts[r["cid"]] += r["n"]
        nz = counts > 0
        C = C.copy()
        C[nz] = sums[nz] / counts[nz][:, None]
        bc.destroy()
    return C


def centroid_assign_udf(spark, centroids: np.ndarray):
    """Arrow-batched BLAS list assignment shared by the inline kmeans probe
    and the persisted :class:`~spider_spark.operators.ivf_index.IVFIndex`:
    returns ``make_assign(n_best)`` building a pandas UDF that maps a
    vector column to its ``n_best`` nearest centroid ids (one ``X @ C.T``
    matmul per chunk — the only assignment formulation that holds at
    dim × 64k lists). The centroid matrix rides ONE broadcast reused by
    every UDF built from the same call; the handle is exposed as
    ``make_assign.broadcast`` so long-lived callers (the persisted index)
    can destroy it once their assignment jobs have materialized — the
    same lifecycle discipline as the bloom shard broadcasts."""
    from pyspark.sql.types import ArrayType, IntegerType

    bc = spark.sparkContext.broadcast(np.asarray(centroids, dtype=np.float64))

    def make_assign(n_best: int):
        @F.pandas_udf(ArrayType(IntegerType()))
        def assign(v: pd.Series) -> pd.Series:
            if not len(v):
                return pd.Series([], dtype=object)
            C = bc.value
            X = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
            # same L2 measure as training: argmax x·c − ‖c‖²/2, one BLAS
            # matmul per Arrow chunk
            S = X @ C.T - 0.5 * (C * C).sum(axis=1)[None, :]
            idx = np.argsort(-S, axis=1, kind="stable")[:, :n_best]
            return pd.Series([row.tolist() for row in idx.astype(np.int32)])

        return assign

    make_assign.broadcast = bc
    return make_assign


def _ivf_topk_pandas(corpus: DataFrame, queries: DataFrame, k: int,
                     centroids: np.ndarray, nprobe: int,
                     id_col: str, vec_col: str) -> DataFrame:
    """IVF probe with Arrow-batched BLAS assignment (see
    :func:`centroid_assign_udf`) instead of O(n_centroids) plan nodes
    (literal mode) or O(n_centroids) join rows per vector (join mode).
    Scoring inside the probed lists stays JVM-side (rounded cosine +
    two-stage top-k)."""
    make_assign = centroid_assign_udf(corpus.sparkSession, centroids)

    c = with_norm(
        corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv")),
        "nv", "nn",
    ).withColumn("list_id", make_assign(1)(F.col("nv"))[0])
    q = with_norm(
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")),
        "qv", "nq",
    ).withColumn("list_id", F.explode(make_assign(nprobe)(F.col("qv"))))
    pairs = c.join(F.broadcast(q), on="list_id").filter(F.col("qid") != F.col("nid"))
    scored = pairs.select(
        "qid",
        "nid",
        F.round(_dot(F.col("qv"), F.col("nv")) / (F.col("nq") * F.col("nn")),
                COS_DECIMALS).alias("cos_sim"),
    ).dropDuplicates(["qid", "nid"])
    return topk_per_key(
        scored, ["qid"], [F.col("cos_sim").desc(), F.col("nid").asc()], k
    ).select("qid", "nid", "cos_sim", F.col("rank").cast("long").alias("rank"))


def _sql_dot(a: str, b: str, dim: int) -> str:
    return (f"list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))")


def ivf_topk_sql(k: int = 5, n_queries: int = 10, n_centroids: int = 16,
                 nprobe: int = 4, dim: int = 64, table: str = "embeddings",
                 id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    """DuckDB mirror of :func:`ivf_topk` — fully deterministic because the
    centroids are the first ``n_centroids`` corpus vectors (recomputed here
    from the table itself) and every FP decision (list assignment, cosine
    ranking) happens on values rounded to ``COS_DECIMALS``. Spark breaks
    equal-score centroid ties by descending cid (reverse of an ascending
    struct sort) — mirrored by ``ORDER BY s DESC, cid DESC``."""
    dot = lambda a, b: _sql_dot(a, b, dim)  # noqa: E731
    return f"""
    WITH v AS (SELECT {id_col} AS id, {vec_col} AS vec FROM {table}),
    cent AS (SELECT {id_col} AS cid, {vec_col} AS cvec
             FROM {table} WHERE {id_col} < {n_centroids}),
    cscore AS (
      SELECT v.id, c.cid, round({dot('v.vec', 'c.cvec')}, {COS_DECIMALS}) AS s
      FROM v, cent c
    ),
    cassign AS (
      SELECT id, cid AS list_id FROM (
        SELECT id, cid,
               row_number() OVER (PARTITION BY id ORDER BY s DESC, cid DESC) AS rn
        FROM cscore) WHERE rn = 1
    ),
    qassign AS (
      SELECT id AS qid, cid AS list_id FROM (
        SELECT id, cid,
               row_number() OVER (PARTITION BY id ORDER BY s DESC, cid DESC) AS rn
        FROM cscore WHERE id < {n_queries}) WHERE rn <= {nprobe}
    ),
    n AS (SELECT id, vec, sqrt({dot('vec', 'vec')}) AS nrm FROM v),
    pairs AS (
      SELECT DISTINCT q.qid, c.id AS nid
      FROM qassign q JOIN cassign c USING (list_id) WHERE c.id <> q.qid
    ),
    scored AS (
      SELECT p.qid, p.nid,
             round({dot('a.vec', 'b.vec')} / (a.nrm * b.nrm), {COS_DECIMALS}) AS cos_sim
      FROM pairs p JOIN n a ON a.id = p.qid JOIN n b ON b.id = p.nid
    ),
    ranked AS (
      SELECT qid, nid, cos_sim,
             row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rank
      FROM scored
    )
    SELECT qid, nid, cos_sim, rank FROM ranked WHERE rank <= {k}
    """


def lsh_near_dup_pairs_sql(threshold: float = 0.9, dim: int = 64,
                           n_tables: int = 4, bits: int = 8,
                           max_bucket: int = 2000, table: str = "embeddings",
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> str:
    """DuckDB mirror of :func:`lsh_near_dup_pairs`: the seeded hyperplanes
    are emitted as literal arrays (same constants both engines — the
    MinHash-permutation pattern), the sign bits are decided on rounded
    projections, and the hot-bucket guard / candidate distinct / cosine
    confirm all follow the Spark op exactly."""
    planes = _hyperplanes(dim, n_tables, bits)
    dot = lambda a, b: _sql_dot(a, b, dim)  # noqa: E731
    plane_rows = ",\n      ".join(
        f"({t}, {b}, [{', '.join(repr(float(x)) for x in planes[t, b])}])"
        for t in range(n_tables)
        for b in range(bits)
    )
    return f"""
    WITH v AS (SELECT {id_col} AS id, {vec_col} AS vec FROM {table}),
    planes(tbl, bit, plane) AS (VALUES
      {plane_rows}
    ),
    sig AS (
      SELECT v.id, p.tbl,
             sum(CASE WHEN round({dot('v.vec', 'p.plane')}, {COS_DECIMALS}) >= 0
                      THEN (1::BIGINT << p.bit) ELSE 0 END) AS bucket
      FROM v, planes p GROUP BY v.id, p.tbl
    ),
    hot AS (
      SELECT tbl, bucket FROM sig GROUP BY tbl, bucket
      HAVING count(*) > {max_bucket}
    ),
    bk AS (
      SELECT s.* FROM sig s LEFT JOIN hot h USING (tbl, bucket)
      WHERE h.bucket IS NULL
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bk a JOIN bk b USING (tbl, bucket) WHERE a.id < b.id
    ),
    n AS (SELECT id, vec, sqrt({dot('vec', 'vec')}) AS nrm FROM v)
    SELECT c.id_a, c.id_b,
           round({dot('a.vec', 'b.vec')} / (a.nrm * b.nrm), {COS_DECIMALS}) AS cos_sim
    FROM cand c JOIN n a ON a.id = c.id_a JOIN n b ON b.id = c.id_b
    WHERE round({dot('a.vec', 'b.vec')} / (a.nrm * b.nrm), {COS_DECIMALS})
          >= {threshold}
    """


def _ivf_topk_join(corpus: DataFrame, queries: DataFrame, k: int,
                   n_centroids: int, nprobe: int,
                   id_col: str, vec_col: str) -> DataFrame:
    """The join-based IVF (see :func:`ivf_topk` ``centroids_as="join"``):
    centroid scoring via broadcast cross-join, rounded to COS_DECIMALS so
    the output is bit-identical to the literal-folded plan. Ties break by
    descending centroid id — same order the literal path's reversed
    ascending struct sort produces."""
    cents = corpus.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
    )

    def assign(df, ident, vcol, n_best):
        scored = df.join(F.broadcast(cents)).select(
            ident, "cid",
            F.round(_dot(F.col(vcol), F.col("cvec")), COS_DECIMALS).alias("__s"),
        )
        return topk_per_key(
            scored, [ident], [F.col("__s").desc(), F.col("cid").desc()], n_best,
            rank_col="__cr",
        ).select(ident, F.col("cid").alias("list_id"))

    c = with_norm(
        corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv")),
        "nv", "nn",
    )
    c = c.join(assign(c, "nid", "nv", 1), on="nid")
    q = with_norm(
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")),
        "qv", "nq",
    )
    q = q.join(assign(q, "qid", "qv", nprobe), on="qid")

    pairs = c.join(F.broadcast(q), on="list_id").filter(F.col("qid") != F.col("nid"))
    scored = pairs.select(
        "qid",
        "nid",
        F.round(_dot(F.col("qv"), F.col("nv")) / (F.col("nq") * F.col("nn")),
                COS_DECIMALS).alias("cos_sim"),
    ).dropDuplicates(["qid", "nid"])
    return topk_per_key(
        scored, ["qid"], [F.col("cos_sim").desc(), F.col("nid").asc()], k
    ).select("qid", "nid", "cos_sim", F.col("rank").cast("long").alias("rank"))


def lsh_near_dup_pairs(corpus: DataFrame, threshold: float = 0.9, dim: int = 64,
                       n_tables: int = 4, bits: int = 8, max_bucket: int = 2000,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Near-dup pairs via sign-LSH candidates + exact cosine confirmation.
    Subset of :func:`cosine_near_dup_pairs` (recall < 1 by design); the
    pair-join is keyed by (table, bucket) so shuffle volume is bounded by
    bucket sizes, with a ``max_bucket`` skew guard."""
    bk = lsh_buckets(corpus, dim=dim, n_tables=n_tables, bits=bits,
                     id_col=id_col, vec_col=vec_col)
    hot = bk.groupBy("table", "bucket").agg(F.count("*").alias("c")).filter(
        F.col("c") > max_bucket
    )
    bk = bk.join(F.broadcast(hot.select("table", "bucket")),
                 on=["table", "bucket"], how="left_anti")
    a, b = bk.alias("a"), bk.alias("b")
    cand = (
        a.join(b, on=["table", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    vecs = with_norm(
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")),
        "vec", "nrm",
    )
    va = vecs.select(F.col("id").alias("id_a"), F.col("vec").alias("va"),
                     F.col("nrm").alias("na"))
    vb = vecs.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"),
                     F.col("nrm").alias("nb"))
    return (
        cand.join(va, on="id_a")
        .join(vb, on="id_b")
        .select(
            "id_a",
            "id_b",
            F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                    COS_DECIMALS).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
