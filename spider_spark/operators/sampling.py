"""Deterministic corpus sampling / splitting.

Training pipelines need *reproducible* subsets: the train/val/test split
of a 100 TB corpus must be a pure function of each record's key — never
``rand()`` (changes across runs/retries/partitions) and never a sort-based
slice (a global sort of the corpus). The operator hashes the key into
[0, 100) with the same md5-derived integer hash the dedupe suite shares
with DuckDB (:func:`spider_spark.operators.dedupe.md5_60`), then maps
cumulative percentage ranges to split labels — one JVM-side expression,
no shuffle at all, and the oracle replays it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spider_spark.operators.dedupe import md5_60, md5_60_sql


def _ranges(splits: dict[str, int]) -> list[tuple[str, int, int]]:
    if sum(splits.values()) != 100:
        raise ValueError(f"split percentages must sum to 100: {splits}")
    out, lo = [], 0
    for name, pct in splits.items():
        out.append((name, lo, lo + pct))
        lo += pct
    return out


def split_column(key: Column, splits: dict[str, int]) -> Column:
    """Label column assigning ``key`` to a split by hash percentile.
    ``splits`` maps label → integer percentage (must sum to 100); dict
    order defines the ranges, so keep it stable across runs."""
    h = F.pmod(md5_60(key), F.lit(100))
    expr = None
    for name, lo, hi in _ranges(splits):
        cond = (h >= lo) & (h < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr


def hash_split(df: DataFrame, key_col: str,
               splits: dict[str, int] | None = None,
               out_col: str = "split") -> DataFrame:
    """``df`` plus a deterministic ``split`` label per row. Default 95/5
    train/val. Pure projection — no shuffle, safe at any scale."""
    splits = splits or {"train": 95, "val": 5}
    return df.withColumn(out_col, split_column(F.col(key_col), splits))


def hash_split_sql(key_expr: str, splits: dict[str, int] | None = None) -> str:
    """DuckDB mirror of :func:`split_column` as a CASE expression over the
    shared 60-bit md5 hash."""
    splits = splits or {"train": 95, "val": 5}
    h = f"(({md5_60_sql(key_expr)}) % 100 + 100) % 100"
    arms = " ".join(
        f"WHEN {h} >= {lo} AND {h} < {hi} THEN '{name}'"
        for name, lo, hi in _ranges(splits)
    )
    return f"CASE {arms} END"
