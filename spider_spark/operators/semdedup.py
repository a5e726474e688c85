"""SemDeDup — semantic deduplication over embedding clusters.

The published recipe (Abbas et al. 2023, "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication"): k-means the corpus
embeddings, form candidate pairs ONLY within a cluster, call a pair a
semantic duplicate when its cosine similarity clears a threshold, and keep
the pair member that is FARTHER from its cluster centroid (low
centroid-similarity examples were measured to be the most valuable to
keep). The clustering is what makes it a 10^9-document operator: the pair
join is cluster-keyed, so candidate volume is Σ|cluster|² with k chosen
∝ N (the paper used 50k clusters for LAION) instead of N².

Reference parity: the reference engine (an asyncio HTTP crawler —
/root/reference/spider/crawler.py) has no vector ops at all; this module is
part of the training-data-pipeline extension the 100 TB target needs,
alongside :mod:`spider_spark.operators.dedupe` (lexical near-dup) and
:mod:`spider_spark.operators.similarity` (ANN retrieval).

Determinism / oracle contract:

* ``centroids_as="literals"`` — centroids are the ``n_centroids`` lowest-id
  corpus vectors folded into the plan as literal arrays (the proven
  :func:`~spider_spark.operators.similarity.ivf_topk` pattern). Every FP
  decision — cluster assignment, centroid similarity, the pair threshold —
  happens on cosines rounded to 6 decimals, so the DuckDB mirror
  (:func:`semdedup_sql`) recomputes identical flags from the same table.
* ``centroids_as="kmeans"`` — the production path: deterministic Lloyd
  centroids (:func:`~spider_spark.operators.similarity.kmeans_centroids`)
  with Arrow-batched BLAS assignment. Not SQL-mirrorable (float iteration
  order); behavior is pinned by tests instead.

Keep rule, made total: within a duplicate pair the member with the HIGHER
``(cent_sim, id)`` is removed — "keep the outlier" per the paper, with the
id tie-break making the rule a total order both engines reproduce. The
rule is applied pairwise (a document is removed iff ANY of its duplicate
pairs removes it), which is the paper's semantics and is one keyed
aggregation — no per-cluster iteration.

Skew guard: ``max_cluster`` excludes clusters larger than the cap from
pair formation entirely (their members are all kept). Recall-safe drift —
fewer removals, never a wrong removal — and the same idiom as the
hot-bucket guards in :mod:`spider_spark.operators.dedupe`. At production
scale the primary defense is choosing k ∝ N; the cap is the backstop that
keeps one degenerate cluster (e.g. a null-embedding pile) from going B².
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_spark.operators.similarity import (
    COS_DECIMALS,
    _dot,
    _sql_dot,
    kmeans_centroids,
    with_norm,
)


def _assign_literals(corpus: DataFrame, n_centroids: int,
                     id_col: str, vec_col: str) -> DataFrame:
    """``(id, vec, nrm, cluster, cent_sim)`` with centroids = the
    ``n_centroids`` lowest-id corpus vectors as literal arrays. Assignment
    = argmax rounded cosine, ties to the HIGHEST centroid id (the
    ``reverse(array_sort(...))`` struct order, identical to the IVF
    literal mode and its mirror's ``ORDER BY s DESC, cid DESC``)."""
    cents = [
        (int(r[0]), [float(x) for x in r[1]])
        for r in corpus.select(id_col, vec_col)
        .filter(F.col(id_col) < n_centroids)
        .collect()
    ]
    base = with_norm(
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")),
        "vec", "nrm",
    )
    v = F.col("vec")
    scored = []
    for cid, cvec in cents:
        c = F.array(*[F.lit(x) for x in cvec])
        # centroid norm as the same JVM fold, evaluated on literals —
        # Catalyst constant-folds it; the mirror recomputes it with its
        # own sqrt(list_sum(...)) and the post-division rounding absorbs
        # the summation-order ulp (the embed_near_dups-proven pattern)
        s = F.round(
            _dot(v, c) / (F.col("nrm") * F.sqrt(_dot(c, c))), COS_DECIMALS
        )
        scored.append(F.struct(s.alias("s"), F.lit(cid).alias("cid")))
    top = F.reverse(F.array_sort(F.array(*scored)))[0]
    return base.select(
        "id", "vec", "nrm",
        top["cid"].alias("cluster"), top["s"].alias("cent_sim"),
    )


def _assign_kmeans(corpus: DataFrame, centroids: np.ndarray,
                   id_col: str, vec_col: str) -> DataFrame:
    """Arrow-batched BLAS assignment against trained centroids: one
    ``X @ C.T`` matmul per chunk, cosine measure (the paper clusters on
    normalized embeddings). Ties go to the lowest centroid id
    (``np.argmax`` order) — documented, not oracle-checked."""
    from pyspark.sql.types import (DoubleType, IntegerType, StructField,
                                   StructType)

    spark = corpus.sparkSession
    C = np.asarray(centroids, dtype=np.float64)
    bc = spark.sparkContext.broadcast(C / np.linalg.norm(C, axis=1)[:, None])

    @F.pandas_udf(StructType([
        StructField("cluster", IntegerType()),
        StructField("cent_sim", DoubleType()),
    ]))
    def assign(v: pd.Series) -> pd.DataFrame:
        if not len(v):
            return pd.DataFrame({"cluster": [], "cent_sim": []})
        Cn = bc.value
        X = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        S = (X / np.linalg.norm(X, axis=1)[:, None]) @ Cn.T
        a = np.argmax(S, axis=1)
        return pd.DataFrame({
            "cluster": a.astype(np.int32),
            "cent_sim": np.round(S[np.arange(len(a)), a], COS_DECIMALS),
        })

    base = with_norm(
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")),
        "vec", "nrm",
    )
    return base.select(
        "id", "vec", "nrm", assign(F.col("vec")).alias("a")
    ).select("id", "vec", "nrm", F.col("a.cluster").alias("cluster"),
             F.col("a.cent_sim").alias("cent_sim"))


def _flags_from_assign(assigned: DataFrame, threshold: float,
                       max_cluster: int | None) -> DataFrame:
    """Pair → keep-rule stage shared by both centroid modes. ``assigned``
    carries ``(id, vec, nrm, cluster, cent_sim)``; returns
    ``(id, cluster, cent_sim, kept)``."""
    elig = assigned
    if max_cluster is not None:
        hot = (
            assigned.groupBy("cluster")
            .agg(F.count("*").alias("c"))
            .filter(F.col("c") > max_cluster)
            .select("cluster")
        )
        # hot clusters opt out of pair formation (members all kept) —
        # broadcast anti-join; the hot set is tiny by construction
        elig = assigned.join(F.broadcast(hot), on="cluster", how="left_anti")
    a = elig.select(
        F.col("cluster"), F.col("id").alias("id_a"), F.col("vec").alias("va"),
        F.col("nrm").alias("na"), F.col("cent_sim").alias("ca"),
    )
    b = elig.select(
        F.col("cluster"), F.col("id").alias("id_b"), F.col("vec").alias("vb"),
        F.col("nrm").alias("nb"), F.col("cent_sim").alias("cb"),
    )
    # cluster-keyed self-join: candidate volume is Σ|cluster|², never N²
    pairs = a.join(b, on="cluster").filter(F.col("id_a") < F.col("id_b"))
    dup = pairs.filter(
        F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                COS_DECIMALS) >= threshold
    )
    losers = dup.select(
        F.when(F.col("ca") > F.col("cb"), F.col("id_a"))
        .when(F.col("ca") < F.col("cb"), F.col("id_b"))
        .otherwise(F.col("id_b"))  # cent_sim tie → higher id (id_a < id_b)
        .alias("id")
    ).distinct()
    return (
        assigned.join(losers.withColumn("_lose", F.lit(True)), on="id", how="left")
        .select(
            "id", "cluster", "cent_sim",
            F.coalesce(~F.col("_lose"), F.lit(True)).alias("kept"),
        )
    )


def semdedup_flags(corpus: DataFrame, threshold: float = 0.9,
                   n_centroids: int = 8, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   centroids_as: str = "literals",
                   max_cluster: int | None = None,
                   kmeans_iters: int = 5,
                   checkpoint: bool = True) -> DataFrame:
    """Per-document SemDeDup verdicts: ``(vec_id, cluster, cent_sim,
    kept)``. ``kept=false`` ⇔ some same-cluster document with cosine ≥
    ``threshold`` outranks it under the keep rule (module docstring).
    Survivors are ``.filter("kept")``; the flags form is returned so
    audits can see WHY a document fell (its cluster + centroid
    similarity).

    ``checkpoint`` (default on) lazily ``localCheckpoint``s the assigned
    relation before the pair stage: it is consumed THREE times (both
    pair-join sides + the verdict join), so without it the assignment —
    and everything upstream, e.g. a hashed-TF vectorization — recomputes
    3×. Semantically transparent; costs one materialization of
    (id, vec, nrm, cluster, cent_sim). Disable when the input is a cheap
    re-scannable source and executor storage is the scarcer resource."""
    if centroids_as == "kmeans":
        cents = kmeans_centroids(corpus, n_centroids, n_iters=kmeans_iters,
                                 id_col=id_col, vec_col=vec_col)
        assigned = _assign_kmeans(corpus, cents, id_col, vec_col)
    elif centroids_as == "literals":
        assigned = _assign_literals(corpus, n_centroids, id_col, vec_col)
    else:
        raise ValueError(f"unknown centroids_as: {centroids_as!r}")
    if checkpoint:
        assigned = assigned.localCheckpoint(eager=False)
    out = _flags_from_assign(assigned, threshold, max_cluster)
    return out.select(F.col("id").alias(id_col), "cluster", "cent_sim", "kept")


def semdedup_sql(threshold: float = 0.9, n_centroids: int = 8,
                 dim: int = 64, table: str = "embeddings",
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 max_cluster: int | None = None) -> str:
    """DuckDB mirror of :func:`semdedup_flags` (literal-centroid mode):
    same lowest-id centroids recomputed from the table, same rounded
    cosines, same ``(cent_sim, id)`` keep rule."""
    dot = lambda x, y: _sql_dot(x, y, dim)  # noqa: E731
    elig = "assign"
    hot_cte = ""
    if max_cluster is not None:
        hot_cte = f"""
    sizes AS (SELECT cluster, count(*) AS c FROM assign GROUP BY cluster),
    elig AS (SELECT a.* FROM assign a JOIN sizes USING (cluster)
             WHERE c <= {max_cluster}),"""
        elig = "elig"
    return f"""
    WITH v AS (SELECT {id_col} AS id, {vec_col} AS vec,
                      sqrt({dot(vec_col, vec_col)}) AS nrm FROM {table}),
    cent AS (SELECT {id_col} AS cid, {vec_col} AS cvec,
                    sqrt({dot(vec_col, vec_col)}) AS cnrm
             FROM {table} WHERE {id_col} < {n_centroids}),
    cscore AS (
      SELECT v.id, c.cid,
             round({dot('v.vec', 'c.cvec')} / (v.nrm * c.cnrm),
                   {COS_DECIMALS}) AS s
      FROM v, cent c
    ),
    assign AS (
      SELECT id, cid AS cluster, s AS cent_sim FROM (
        SELECT id, cid, s,
               row_number() OVER (PARTITION BY id ORDER BY s DESC, cid DESC)
                 AS rn
        FROM cscore) WHERE rn = 1
    ),{hot_cte}
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b, a.cent_sim AS ca, b.cent_sim AS cb
      FROM {elig} a JOIN {elig} b
        ON a.cluster = b.cluster AND a.id < b.id
      JOIN v va ON va.id = a.id JOIN v vb ON vb.id = b.id
      WHERE round({dot('va.vec', 'vb.vec')} / (va.nrm * vb.nrm),
                  {COS_DECIMALS}) >= {threshold}
    ),
    losers AS (
      SELECT DISTINCT CASE WHEN ca > cb THEN id_a
                           WHEN ca < cb THEN id_b
                           ELSE id_b END AS id
      FROM pairs
    )
    SELECT a.id AS {id_col}, a.cluster, a.cent_sim,
           (l.id IS NULL) AS kept
    FROM assign a LEFT JOIN losers l ON l.id = a.id
    """
