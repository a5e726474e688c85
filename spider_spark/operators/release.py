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

__all__ = ["release_diff", "release_diff_sql", "token_drift", "token_drift_sql"]


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


# ---------------------------------------------------------------------------
# token drift: which terms' rates moved between releases
# ---------------------------------------------------------------------------


def token_drift(old_docs: DataFrame, new_docs: DataFrame, k: int = 50,
                text_col: str = "text") -> DataFrame:
    """Top-``k`` terms by rate shift between two releases:
    ``(term, n_old, n_new, drift)`` where ``drift = n_new·T_old −
    n_old·T_new`` (``T`` = each release's total token count) — the
    cross-multiplied difference of occurrence *rates* scaled by
    ``T_old·T_new``, so it is an exact integer (no float division) and
    positive exactly when the term's share grew. Ordered by
    ``(abs(drift) DESC, term ASC)`` — a total order.

    The distribution-shift audit a release pipeline runs next to
    :func:`release_diff`'s document-level statuses: a new boilerplate
    family, a source mix change, or a scrubbing regression all surface
    as terms with outsized ``drift``.

    Scale shape: one term-keyed count per side (map-side combinable —
    shuffle rows are O(distinct terms)), two 1-row totals, ONE
    term-keyed full outer join, top-k heap. The cross-multiplication
    runs in ``decimal(38,0)``: at 10^14 tokens per release the products
    reach ~10^28, past int64 — decimal keeps them exact (the DuckDB
    mirror uses HUGEINT, exact to 10^38).
    """
    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(
                F.explode(
                    F.split(normalized_text(F.col(text_col)), " ")
                ).alias("term")
            )
            .groupBy("term")
            .agg(F.count("*").alias(name))
        )

    o = counts(old_docs, "n_old")
    n = counts(new_docs, "n_new")
    t_old = int(o.agg(F.sum("n_old")).collect()[0][0] or 0)
    t_new = int(n.agg(F.sum("n_new")).collect()[0][0] or 0)
    dec = "decimal(38,0)"
    j = o.join(n, on="term", how="full_outer").select(
        "term",
        F.coalesce("n_old", F.lit(0)).cast("long").alias("n_old"),
        F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
    )
    j = j.withColumn(
        "drift",
        F.col("n_new").cast(dec) * F.lit(t_old).cast(dec)
        - F.col("n_old").cast(dec) * F.lit(t_new).cast(dec),
    )
    return j.orderBy(F.abs(F.col("drift")).desc(), F.col("term").asc()).limit(k)


def token_drift_sql(old_table: str, new_table: str, k: int = 50,
                    text_col: str = "text") -> str:
    """DuckDB mirror of :func:`token_drift` — HUGEINT cross-multiplication
    (exact to 10^38), same zero-fill, ordering, and tie-break."""
    norm = NORM_SQL.format(x=text_col)
    return f"""
    WITH oc AS (
      SELECT term, count(*) AS n_old FROM (
        SELECT unnest(string_split({norm}, ' ')) AS term FROM {old_table}
      ) GROUP BY 1
    ),
    nc AS (
      SELECT term, count(*) AS n_new FROM (
        SELECT unnest(string_split({norm}, ' ')) AS term FROM {new_table}
      ) GROUP BY 1
    ),
    tot AS (
      SELECT (SELECT coalesce(sum(n_old), 0) FROM oc)::HUGEINT AS t_old,
             (SELECT coalesce(sum(n_new), 0) FROM nc)::HUGEINT AS t_new
    )
    SELECT coalesce(oc.term, nc.term) AS term,
           coalesce(n_old, 0)::BIGINT AS n_old,
           coalesce(n_new, 0)::BIGINT AS n_new,
           (coalesce(n_new, 0)::HUGEINT * t_old
            - coalesce(n_old, 0)::HUGEINT * t_new) AS drift
    FROM oc FULL OUTER JOIN nc ON oc.term = nc.term
    CROSS JOIN tot
    ORDER BY abs(drift) DESC, term ASC LIMIT {k}
    """
