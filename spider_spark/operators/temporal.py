"""Temporal operators: distributed as-of join.

The as-of join — "for each left row, the latest right row with
``right_ts <= left_ts`` on the same key" — is the temporal primitive
training-data and analytics pipelines use to attach trailing context
(last click before an error, last price before a trade, last crawl of a
URL before a given snapshot). Spark has no built-in as-of join (pandas
``merge_asof`` exists only driver-side); the scalable formulation here is
the standard union + window one:

1. tag left and right rows and union them on ``(key, ts)``;
2. one window per key, ordered by ``(ts, right-before-left)``, carrying
   ``last(right_payload, ignorenulls=True)`` over the unbounded-preceding
   frame;
3. keep the left rows — each now holds the most recent right payload at
   or before its timestamp.

Cost: ONE shuffle on the key plus a per-partition sort — the same price
as a plain equi-join on the key, independent of how many right rows
precede each left row (the naive inequality-join is O(L × R) per key).
Skewed keys behave like any window skew (a hot key's rows sort on one
task); keys here are users/hosts, bounded cardinality per key.

Determinism: right rows are pre-aggregated to one row per ``(key, ts)``
(max payload struct wins), so equal-timestamp duplicates cannot make the
result depend on sort stability. Ties ``left_ts == right_ts`` match (the
inclusive convention, same as DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``,
which is the oracle used by the driver's ``events_asof`` query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_payload: list[str] | None = None,
              prefix: str = "asof_") -> DataFrame:
    """Left as-of join: every ``left`` row plus the payload of the latest
    ``right`` row with ``right[right_ts] <= left[left_ts]`` and the same
    ``key`` (NULL payload when no right row precedes). Right payload
    columns appear as ``{prefix}{col}``."""
    payload = right_payload or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    r_struct = F.struct(*[F.col(c) for c in payload])
    r_one = (
        right.groupBy(F.col(key), F.col(right_ts).alias("_t"))
        .agg(F.max(r_struct).alias("_r"))
        .select(key, "_t", F.lit(1).alias("_is_r"), "_r")
    )
    l_cols = left.columns
    l_tagged = left.select(
        F.col(key),
        F.col(left_ts).alias("_t"),
        F.lit(0).alias("_is_r"),
        F.lit(None).cast(r_one.schema["_r"].dataType).alias("_r"),
        F.struct(*[F.col(c) for c in l_cols]).alias("_l"),
    )
    r_tagged = r_one.withColumn(
        "_l", F.lit(None).cast(l_tagged.schema["_l"].dataType)
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_t").asc(), F.col("_is_r").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    out_cols = [F.col(f"_l.{c}").alias(c) for c in l_cols] + [
        F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in payload
    ]
    return matched.filter(F.col("_is_r") == 0).select(*out_cols)


def asof_join_sql(left_sql: str, right_sql: str, key: str,
                  left_ts: str = "ts", right_ts: str = "ts",
                  right_payload: list[str] | None = None,
                  left_cols: list[str] | None = None,
                  prefix: str = "asof_") -> str:
    """DuckDB mirror via the native ``ASOF LEFT JOIN`` over the same
    deduplicated right side. ``right_payload``/``left_cols`` must list the
    concrete columns (SQL has no schema introspection here)."""
    payload = right_payload or []
    lcols = left_cols or []
    pay_struct = ", ".join(f"'{c}': {c}" for c in payload)
    sel_l = ", ".join(f"l.{c}" for c in lcols)
    sel_r = ", ".join(f"r._r.{c} AS {prefix}{c}" for c in payload)
    return f"""
    WITH l AS ({left_sql}),
    r AS (
      SELECT {key}, {right_ts} AS _t, max({{{pay_struct}}}) AS _r
      FROM ({right_sql}) GROUP BY 1, 2
    )
    SELECT {sel_l}, {sel_r}
    FROM l ASOF LEFT JOIN r
      ON l.{key} = r.{key} AND l.{left_ts} >= r._t
    """
