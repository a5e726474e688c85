"""Cross-release corpus diff: what changed between two dataset releases.

A maintained training corpus ships as versioned releases; the audit every
release pipeline runs is "what did this release add / remove / change?".
This module answers it at document granularity by exact content
fingerprint — the same md5-of-normalized-text key as
:func:`spider_spark.operators.dedupe.exact_duplicates` and the persisted
:class:`~spider_spark.operators.dedup_index.ExactIndex`, so a doc counts
as *changed* precisely when the exact-dedup family would treat old and new
as different documents.

Scale shape: each side is a 2-column (id, fingerprint) projection — the
text column is consumed by the md5 inside the scan, never shuffled — and
the diff is ONE id-keyed full outer join. Releases committed through
TableIO's bucketed mirror co-locate on the id, making the join
exchange-free at rest; unbucketed inputs pay one shuffle of
O(ids + 16-byte fingerprints), independent of corpus bytes. No driver
state, no all-pairs.

Reference parity: the reference engine has no versioning/diff surface
(/root/reference/spider — an asyncio HTTP crawler); this is part of the
training-data extension layer, the release-audit sibling of
``corpus_datacard``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_spark.operators.dedupe import NORM_SQL, normalized_text

__all__ = ["release_diff", "release_diff_sql"]


def release_diff(old_docs: DataFrame, new_docs: DataFrame,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """``(id_col, status)`` for every document present in either release:
    ``added`` (new only), ``removed`` (old only), ``changed`` (both, text
    fingerprint differs), ``unchanged`` (both, same fingerprint). Rows are
    keyed by ``id_col`` — callers wanting per-status totals aggregate the
    result (one tiny 4-group agg)."""
    def fp(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.md5(normalized_text(F.col(text_col))).alias(name),
        )

    o = fp(old_docs, "old_fp")
    n = fp(new_docs, "new_fp")
    j = o.join(n, on=id_col, how="full_outer")
    return j.select(
        id_col,
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


def release_diff_sql(old_table: str, new_table: str,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> str:
    """DuckDB mirror of :func:`release_diff`. ``old_table`` / ``new_table``
    are table names or parenthesized subqueries exposing
    ``(id_col, text_col)``."""
    norm = NORM_SQL.format(x=text_col)
    return f"""
    SELECT coalesce(o.{id_col}, n.{id_col}) AS {id_col},
           CASE WHEN o.{id_col} IS NULL THEN 'added'
                WHEN n.{id_col} IS NULL THEN 'removed'
                WHEN o.fp = n.fp THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM (SELECT {id_col}, md5({norm}) AS fp FROM {old_table}) o
    FULL OUTER JOIN (SELECT {id_col}, md5({norm}) AS fp FROM {new_table}) n
      ON o.{id_col} = n.{id_col}
    """
