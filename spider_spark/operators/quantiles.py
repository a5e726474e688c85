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
