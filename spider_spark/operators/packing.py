"""Deterministic sequence packing — training-batch assembly.

The last step of a training-data pipeline: concatenate documents and chop
the stream into fixed-length token windows (GPT-style "concat-and-chop"
packing). Order is the pipeline's shared deterministic hash order
``(md5_60(key), key)`` within each group (source/shard), so packing is a
pure function of the corpus — no rand(), reproducible across runs and
engines.

Each document is assigned the sequence its first token lands in
(``seq_id``) and its offset inside that sequence; documents longer than
the remaining window simply span into following sequences (the standard
causal-LM packing semantics — spans are derivable from
``offset + weight``).

Scale shape: the per-group token prefix sum runs in the same two-stage
form as :func:`~spider_spark.operators.sampling.token_budget_sample` —
within-(group, hash-range-bucket) sums in parallel, ``groups ×
n_buckets`` bucket totals rolled into broadcast offsets. No task ever
scans more than one bucket of one group; a 10^10-document source never
meets a single-task global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spider_spark.operators.dedupe import md5_60, md5_60_sql

__all__ = ["pack_sequences", "pack_sequences_sql"]


def pack_sequences(df: DataFrame, group_col: str, key_col: str,
                   weight_col: str, seq_len: int,
                   n_buckets: int = 64) -> DataFrame:
    """Input rows + ``(seq_id, seq_offset)``: the fixed-``seq_len`` window
    each document starts in when the group's documents are concatenated in
    hash order, and the position within it. Pure integer arithmetic on
    the exclusive prefix sum — engine-exact."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive: {seq_len}")
    if n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two: {n_buckets}")
    shift = 60 - (n_buckets.bit_length() - 1)
    h = md5_60(F.col(key_col))
    rows = df.withColumn("_h", h).withColumn(
        "_b", F.shiftrightunsigned(F.col("_h"), shift)
    )
    win = (
        Window.partitionBy(group_col, "_b")
        .orderBy(F.col("_h").asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rows = rows.withColumn("_cum_in", F.sum(weight_col).over(win))
    totals = rows.groupBy(group_col, "_b").agg(F.sum(weight_col).alias("_tot"))
    off_win = (
        Window.partitionBy(group_col)
        .orderBy(F.col("_b").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(off_win), F.lit(0))
    ).select(group_col, "_b", "_off")
    return (
        rows.join(F.broadcast(offsets), on=[group_col, "_b"])
        .withColumn(
            "_start",
            (F.col("_off") + F.col("_cum_in") - F.col(weight_col)).cast("long"),
        )
        # integer `div`, not float `/`: starts past 2^53 would lose
        # exactness through a double
        .withColumn("seq_id", F.expr(f"_start div {seq_len}"))
        .withColumn("seq_offset", F.col("_start") % seq_len)
        .drop("_h", "_b", "_cum_in", "_off", "_start")
    )


def pack_sequences_sql(group_col: str, key_col: str, weight_col: str,
                       seq_len: int, select_cols: str,
                       table: str = "documents") -> str:
    """DuckDB mirror: one exclusive prefix sum per group over the shared
    hash order (the bucketing is a physical-plan detail), identical
    integer div/mod."""
    h = md5_60_sql(key_col)
    return f"""
    SELECT {select_cols},
           (_start // {seq_len})::BIGINT AS seq_id,
           (_start % {seq_len})::BIGINT AS seq_offset
    FROM (
      SELECT *, (sum({weight_col}) OVER (
        PARTITION BY {group_col} ORDER BY {h}, {key_col}
        ROWS UNBOUNDED PRECEDING
      ) - {weight_col})::BIGINT AS _start FROM {table}
    )
    """
