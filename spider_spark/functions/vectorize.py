"""Deterministic text vectorization: signed feature hashing ("the hashing
trick", Weinberger et al. 2009).

The similarity family (:mod:`spider_spark.operators.similarity`,
:mod:`spider_spark.operators.semdedup`, the persisted
:class:`~spider_spark.operators.ivf_index.IVFIndex`) consumes an embedding
column; in a production pipeline that column comes from a model. This
module gives the engine an IN-HOUSE text→vector path with no model
dependency: each word hashes to one of ``dim`` buckets with a ±1 sign from
a second hash bit, and the vector is the per-bucket sum of signs over the
document's words (term frequency built in — a word occurring twice
contributes twice). Classic properties: sparse-text inner products are
preserved in expectation, and the signed sum makes E[collision noise] = 0.

Everything is exact integer arithmetic over the shared ``md5_60`` hash, so
the DuckDB mirror reproduces vectors bit-for-bit, and any composition with
the rounded-cosine similarity ops stays oracle-checkable end-to-end
(text → hashed vectors → ANN / near-dup / SemDeDup).

Scale shape: one explode over the corpus words, one document-keyed shuffle
with map-side partial aggregation (the ``dim`` conditional sums combine
per-partition before the exchange). No UDF, no driver state; the plan is
whole-stage-codegen JVM throughout.

Reference parity: the reference engine has no vector operations
(/root/reference/spider — an asyncio HTTP crawler); this is part of the
training-data extension layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_spark.operators.dedupe import (
    NORM_SQL,
    md5_60,
    md5_60_sql,
    normalized_text,
)

__all__ = ["hashed_tf_vectors", "hashed_vectors_sql"]

# appended to the word before the sign hash so bucket and sign are
# independent bits of two different md5 digests
_SIGN_SALT = "#sign"


def hashed_tf_vectors(docs: DataFrame, dim: int = 64,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """``(id_col, embedding array<long>)`` — the signed hashed-TF vector of
    each document. Empty/whitespace-only text normalizes to one empty-string
    "word" (the :func:`~spider_spark.operators.dedupe.shingles` convention),
    so every document gets a vector and both engines agree on the
    degenerate rows."""
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("w"),
    )
    hb = words.select(
        id_col,
        F.pmod(md5_60(F.col("w")), F.lit(dim)).alias("b"),
        F.when(
            F.pmod(md5_60(F.concat(F.col("w"), F.lit(_SIGN_SALT))), 2) == 0,
            F.lit(1),
        ).otherwise(F.lit(-1)).alias("s"),
    )
    # dim conditional sums in ONE doc-keyed agg (map-side partials combine
    # before the shuffle); the array assembly is a pure projection
    agg = hb.groupBy(id_col).agg(
        *[
            F.sum(F.when(F.col("b") == i, F.col("s")).otherwise(0)).alias(f"v{i}")
            for i in range(dim)
        ]
    )
    return agg.select(
        id_col,
        F.array(*[F.col(f"v{i}").cast("long") for i in range(dim)]).alias(
            "embedding"
        ),
    )


def hashed_vectors_sql(dim: int = 64, table: str = "documents",
                       id_col: str = "doc_id", text_col: str = "text",
                       cte_name: str = "hvecs") -> str:
    """DuckDB CTE-body mirror of :func:`hashed_tf_vectors`: embed as
    ``WITH {cte_name} AS (...)`` — yields ``({id_col}, embedding)`` with
    identical integer vectors. The pivot is the same ``dim`` conditional
    sums, emitted as explicit columns."""
    norm = NORM_SQL.format(x=text_col)
    cells = ",\n             ".join(
        f"coalesce(sum(CASE WHEN b = {i} THEN s END), 0) AS v{i}"
        for i in range(dim)
    )
    arr = ", ".join(f"v{i}" for i in range(dim))
    return f"""
    {cte_name} AS (
      SELECT {id_col}, [{arr}] AS embedding FROM (
        SELECT {id_col},
             {cells}
        FROM (
          SELECT {id_col},
                 {md5_60_sql('w')} % {dim} AS b,
                 CASE WHEN {md5_60_sql(f"w || '{_SIGN_SALT}'")} % 2 = 0
                      THEN 1 ELSE -1 END AS s
          FROM (SELECT {id_col}, unnest(string_split({norm}, ' ')) AS w
                FROM {table})
        ) GROUP BY {id_col}
      )
    )"""
