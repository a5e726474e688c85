"""Scalable deterministic ranking (L2 analog).

The reference's only ordering is insertion order, presented as ``#N url |
title`` (db_ops_controller.py:60-65, record.py:19-36). The engine needs a
deterministic **total admission order** for parity (which URL was admitted
first decides nothing in the reference only because its async timing is
racy — quirk Q2; we pin BFS order: round, then (parent_rank, link_pos)).

A naive ``row_number().over(Window.orderBy(...))`` collapses the whole
frontier onto one task. This module ranks in two passes instead:

1. range-repartition on the order key + sort within partitions,
2. count rows per partition (one tiny job), broadcast the prefix offsets,
   and add ``offset + local row_number`` with a per-partition window.

Each partition ranks independently — no single-task global sort — which is
what a 10^10-row frontier needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    start: int = 0,
    num_partitions: int | None = None,
    with_count: bool = False,
    stats_collector=None,
) -> DataFrame:
    """Add a dense 0-based global rank column ordered by ``order_cols``
    (which must be a strict total order — no ties). ``start`` offsets the
    rank (continuing a cross-round running counter). ``with_count=True``
    returns ``(df, total_rows)`` — the total falls out of the size-collect
    pass for free, saving callers a separate count job.

    ``stats_collector`` (optional) replaces the built-in per-partition
    size collect: it receives the materialized, ``__pid``/``__mid``-stamped
    DataFrame and must return rows/dicts with ``__pid``/``cnt``/``max_mid``.
    Callers use it to piggyback OTHER per-partition reductions (e.g. the
    crawl's bloom-shard fill, bloom.make_fill_stats_collector) onto the
    stats pass — one driver job instead of two, and the default groupBy
    shuffle disappears (the combined pass is mapInPandas over the
    checkpoint, no exchange)."""
    sc = df.sparkSession.sparkContext
    parts = num_partitions or sc.defaultParallelism
    # One materialization: range-partition + sort once, stamp each row with
    # (partition id, monotonically_increasing_id) in the same narrow
    # projection, checkpoint. ``monotonically_increasing_id`` encodes
    # ``(pid << 33) + row_index_in_partition`` and the partition is sorted,
    # so ``mid - (pid << 33)`` IS the local sorted row number — no window,
    # no second shuffle, no second range-sample pass.
    parted = (
        df.repartitionByRange(parts, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    if stats_collector is not None:
        stats = stats_collector(parted)
    else:
        stats = parted.groupBy("__pid").agg(
            F.count("*").alias("cnt"), F.max("__mid").alias("max_mid")
        ).collect()
    sizes = {r["__pid"]: r["cnt"] for r in stats}
    # Guard the monotonically_increasing_id layout assumption (mid ==
    # (pid << 33) + local_row_index over a freshly-sorted partition): if
    # Spark ever changes the encoding, or a partition exceeds 2^33 rows,
    # fail loudly instead of silently mis-ranking — admission_rank feeds
    # the crawl's determinism contract.
    for r in stats:
        expect = (r["__pid"] << 33) + r["cnt"] - 1
        if r["max_mid"] != expect:
            raise AssertionError(
                "monotonically_increasing_id encoding mismatch in partition "
                f"{r['__pid']}: max id {r['max_mid']} != {expect} "
                f"(cnt={r['cnt']}); global ranking would be corrupted"
            )
    offsets, acc = {}, start
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    if offsets:
        offmap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
        offset_col = F.coalesce(offmap[F.col("__pid")], F.lit(0))
    else:  # empty input: typed zero (an empty create_map() is VOID-typed)
        offset_col = F.lit(0)
    local_rn = F.col("__mid") - (F.col("__pid").cast("long") * F.lit(1 << 33))
    out = (
        parted.withColumn(
            rank_col,
            (offset_col + local_rn).cast("long"),
        )
        .drop("__pid", "__mid")
    )
    if with_count:
        return out, acc - start
    return out
