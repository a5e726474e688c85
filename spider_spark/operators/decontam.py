"""Benchmark decontamination for training corpora.

A training corpus must not contain the evaluation benchmarks it will be
scored against: the standard remedy (GPT-3 appendix C; The Pile; Llama)
flags every training document sharing a word ``n``-gram with any benchmark
document. The reference engine has no analog (it stores pages, not
corpora); this belongs to the LLM-training-data toolkit built alongside
the dedup suite and reuses its shingling (:func:`~spider_spark.operators.
dedupe.shingles` — same normalization, same grams in the DuckDB mirror).

Plan shape (all JVM Columns, no Python in the hot path):

1. the benchmark's distinct shingles — usually millions of rows against a
   corpus of billions — hash to 60-bit ints and become the small join
   side; ``auto`` broadcast when an exact count says they fit, else a
   shingle-keyed shuffle join (the corpus side shuffles once, keyed by
   the same hash the dedup family already uses);
2. per-document overlap counts are one map-side-combinable groupBy;
3. docs with zero hits survive via a left join (never dropped from the
   report — the downstream filter decides the policy).

Output: ``(doc_id, n_shingles, n_contaminated, contaminated)`` —
``contaminated`` applies the standard "any hit" policy; callers wanting
fractional thresholds use the counts. Exact integers end to end, so the
oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_spark.operators.dedupe import md5_60, md5_60_sql, shingles, shingles_sql

BROADCAST_SHINGLE_LIMIT = 5_000_000  # ~40 MB of 60-bit hashes


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                  id_col: str = "doc_id", text_col: str = "text",
                  bench_id_col: str = "doc_id",
                  bench_text_col: str = "text",
                  broadcast: bool | None = None) -> DataFrame:
    """Per-document benchmark-overlap report (see module docstring).

    ``n`` defaults to 8 — between GPT-3's 13-gram and the 6-7-gram floor
    contamination studies use; short enough to catch paraphrase-adjacent
    leaks, long enough that English prose rarely collides by chance.
    ``broadcast=None`` decides from an exact count of the benchmark's
    distinct shingles."""
    doc_sh = shingles(docs, n=n, id_col=id_col, text_col=text_col).select(
        F.col(id_col), md5_60(F.col("shingle")).alias("h")
    )
    bench_sh = (
        shingles(benchmark, n=n, id_col=bench_id_col, text_col=bench_text_col)
        .select(md5_60(F.col("shingle")).alias("h"))
        .distinct()
    )
    if broadcast is None:
        broadcast = bench_sh.count() <= BROADCAST_SHINGLE_LIMIT
    if broadcast:
        bench_sh = F.broadcast(bench_sh)
    per_doc = doc_sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    hits = (
        doc_sh.join(bench_sh, on="h", how="left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated"))
    )
    return per_doc.join(hits, on=id_col, how="left").select(
        id_col,
        "n_shingles",
        F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
        (F.coalesce("n_contaminated", F.lit(0)) > 0).alias("contaminated"),
    )


def decontaminate_sql(bench_filter: str, n: int = 8, table: str = "documents",
                      id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB mirror: the benchmark is the same table filtered by
    ``bench_filter`` (the driver oracle derives both sides from one
    deterministic corpus)."""
    doc_sh = shingles_sql(n=n, id_col=id_col, text_col=text_col, table=table)
    h = md5_60_sql("shingle")
    return f"""
    WITH doc_sh AS MATERIALIZED (
      SELECT {id_col}, {h} AS h FROM ({doc_sh})
    ),
    bench_sh AS MATERIALIZED (
      SELECT DISTINCT h FROM doc_sh WHERE {bench_filter}
    ),
    per_doc AS (SELECT {id_col}, count(*) AS n_shingles FROM doc_sh GROUP BY 1),
    hits AS (
      SELECT {id_col}, count(*) AS n_contaminated
      FROM doc_sh WHERE h IN (SELECT h FROM bench_sh)
      GROUP BY 1
    )
    SELECT p.{id_col}, p.n_shingles,
           coalesce(h.n_contaminated, 0) AS n_contaminated,
           coalesce(h.n_contaminated, 0) > 0 AS contaminated
    FROM per_doc p LEFT JOIN hits h USING ({id_col})
    """


# ---------------------------------------------------------------------------
# embedding-space decontamination (semantic benchmark leakage)
# ---------------------------------------------------------------------------


def embedding_decontam(corpus: DataFrame, benchmark: DataFrame,
                       threshold: float = 0.95, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Semantic benchmark-leakage scan: flag every corpus document whose
    embedding is within cosine ``threshold`` of ANY benchmark
    embedding. The n-gram scan (:func:`decontaminate`) misses
    paraphrased or re-formatted benchmark items; embedding similarity
    is the standard second net (the near-dup-to-eval check in
    Llama/phi-style data reports). Output: ``(id, max_bench_sim,
    contaminated)`` for EVERY corpus row — zero-hit docs report their
    true maximum, and the downstream filter decides the policy.

    ``max_bench_sim`` is rounded to 6 decimals (the similarity suite's
    determinism recipe) BEFORE the threshold compare, so the DuckDB
    mirror agrees bit-for-bit.

    Scale shape: benchmark sets are small by definition (an eval suite,
    not a corpus) — the join broadcasts the benchmark side and the
    per-document max is a map-side-combinable ``groupBy(id).max()``:
    fan-out |bench| per doc collapses to one row per doc per partition
    before the exchange. For benchmark sets past broadcast size, probe
    the persisted IVF index (:mod:`spider_spark.operators.ivf_index`)
    with the benchmark as the query batch instead.
    """
    from spider_spark.operators.similarity import COS_DECIMALS, _dot, with_norm

    c = with_norm(
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("cv")),
        "cv", "cn",
    )
    b = with_norm(
        benchmark.select(F.col(vec_col).alias("bv")), "bv", "bn",
    )
    sims = c.join(F.broadcast(b)).select(
        "id",
        F.round(
            _dot(F.col("cv"), F.col("bv")) / (F.col("cn") * F.col("bn")),
            COS_DECIMALS,
        ).alias("sim"),
    )
    return (
        sims.groupBy("id")
        .agg(F.max("sim").alias("max_bench_sim"))
        .select(
            F.col("id").alias(id_col), "max_bench_sim",
            (F.col("max_bench_sim") >= F.lit(threshold)).alias("contaminated"),
        )
    )


def embedding_decontam_sql(corpus_rel: str, bench_rel: str,
                           threshold: float = 0.95, dim: int = 64,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> str:
    """DuckDB mirror of :func:`embedding_decontam` — same dot product,
    norm, 6-decimal round, max, and threshold compare."""
    def dot(a: str, b: str) -> str:
        return (f"list_sum(list_transform(range(1, {dim + 1}), "
                f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))")

    return f"""
    WITH c AS (SELECT {id_col} AS id, {vec_col} AS cv,
                      sqrt({dot(vec_col, vec_col)}) AS cn
               FROM {corpus_rel}),
    b AS (SELECT {vec_col} AS bv, sqrt({dot(vec_col, vec_col)}) AS bn
          FROM {bench_rel}),
    sims AS (
      SELECT id, round({dot('cv', 'bv')} / (cn * bn), 6) AS sim
      FROM c, b
    )
    SELECT id AS {id_col}, max(sim) AS max_bench_sim,
           max(sim) >= {threshold} AS contaminated
    FROM sims GROUP BY id
    """
