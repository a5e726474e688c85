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

__all__ = ["pack_sequences", "pack_sequences_sql",
           "chunk_documents", "chunk_documents_sql",
           "epoch_order", "epoch_order_sql"]


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


# ---------------------------------------------------------------------------
# overlapping word-window chunking (RAG / retrieval-unit preparation)
# ---------------------------------------------------------------------------


def chunk_documents(docs: DataFrame, chunk_words: int = 128,
                    overlap: int = 16, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Split each document into overlapping word windows — the retrieval
    (RAG) unit preparation step: ``(id, chunk_idx, n_words, chunk_text)``
    with windows of ``chunk_words`` words every ``stride = chunk_words −
    overlap`` words, over the pipeline's shared tokenization.

    Window-emission rule (exact, both engines): a window starting at
    1-based word offset ``s`` adds content beyond its predecessor iff
    ``s ≤ len − overlap`` (its predecessor ends at ``s + overlap − 1``),
    so starts are ``sequence(1, greatest(len − overlap, 1), stride)`` —
    the final partial window is emitted, a fully-contained trailing
    window never is, and a short document yields exactly one chunk.
    Empty documents yield none.

    Scale shape: per-row array arithmetic (sequence + transform) and ONE
    explode — no shuffle at all; chunk ids derive from the start offset
    (``(s−1) div stride``), not from a window function."""
    if chunk_words < 1 or not (0 <= overlap < chunk_words):
        raise ValueError(f"need 0 <= overlap < chunk_words: {chunk_words}, {overlap}")
    stride = chunk_words - overlap
    from spider_spark.functions.text import normalized_text

    words = F.split(normalized_text(F.col(text_col)), " ")
    n = F.size(words)
    starts = F.when(
        (n > 0) & ~(
            (n == 1) & (F.element_at(words, 1) == "")
        ),
        F.sequence(F.lit(1), F.greatest(n - overlap, F.lit(1)), F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            ((s - 1) / stride).cast("long").alias("chunk_idx"),
            F.least(F.lit(chunk_words), n - s + 1).cast("long").alias("n_words"),
            F.array_join(F.slice(words, s, chunk_words), " ").alias("chunk_text"),
        ),
    )
    return (
        docs.select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.n_words").alias("n_words"),
            F.col("c.chunk_text").alias("chunk_text"),
        )
    )


def chunk_documents_sql(chunk_words: int = 128, overlap: int = 16,
                        id_col: str = "doc_id", text_col: str = "text",
                        table: str = "documents") -> str:
    """DuckDB mirror of :func:`chunk_documents` — same emission rule,
    window arithmetic, and tokenization."""
    from spider_spark.operators.dedupe import NORM_SQL

    stride = chunk_words - overlap
    norm = NORM_SQL.format(x=text_col)
    return f"""
    WITH toks AS (
      SELECT {id_col}, string_split({norm}, ' ') AS words FROM {table}
    ),
    expanded AS (
      SELECT {id_col}, words,
             unnest(range(1, greatest(len(words) - {overlap}, 1) + 1, {stride}))
               AS s
      FROM toks
      WHERE len(words) > 0 AND NOT (len(words) = 1 AND words[1] = '')
    )
    SELECT {id_col},
           ((s - 1) // {stride})::BIGINT AS chunk_idx,
           least({chunk_words}, len(words) - s + 1)::BIGINT AS n_words,
           array_to_string(list_slice(words, s, s + {chunk_words - 1}), ' ')
             AS chunk_text
    FROM expanded
    """


# ---------------------------------------------------------------------------
# deterministic epoch shuffle (training-order permutation)
# ---------------------------------------------------------------------------


def epoch_order(df: DataFrame, id_col: str = "doc_id", seed: int = 0,
                epoch: int = 0, n_buckets: int = 64) -> DataFrame:
    """Input rows + ``position``: a dense 0-based training-order
    permutation that is a pure function of ``(seed, epoch, id)`` — the
    reproducible epoch shuffle every training run needs (bit-identical
    across runs, cluster sizes, and restarts; a different epoch value
    yields an unrelated permutation, so data order varies across epochs
    without any mutable shuffle state). The id is salted with
    ``seed:epoch:`` BEFORE hashing — reusing the corpus's unsalted hash
    order would train every epoch in the same order as the dedup/packing
    stream.

    Scale shape: the same two-stage bucket rank as
    :func:`pack_sequences` — ``md5_60``'s top bits are monotone in the
    hash, so per-bucket ``row_number`` + broadcast exclusive bucket
    offsets compose into the exact global rank with no global sort and
    no sampling pass. One shuffle (the bucket partition)."""
    if n_buckets & (n_buckets - 1) or n_buckets < 1:
        raise ValueError(f"n_buckets must be a power of two: {n_buckets}")
    shift = 60 - (n_buckets.bit_length() - 1)
    key = F.concat(F.lit(f"{seed}:{epoch}:"), F.col(id_col).cast("string"))
    rows = df.withColumn("_h", md5_60(key)).withColumn(
        "_b", F.shiftrightunsigned(F.col("_h"), shift))
    win = Window.partitionBy("_b").orderBy(
        F.col("_h").asc(), F.col(id_col).asc())
    rows = rows.withColumn("_r", F.row_number().over(win))
    # exclusive prefix over the ≤ n_buckets bucket totals as a keyed
    # self-join (n_buckets² tiny rows) — an unpartitioned window would
    # drag the whole relation to one task and WARN for nothing
    totals = rows.groupBy("_b").agg(F.count(F.lit(1)).alias("_tot"))
    lower = totals.select(F.col("_b").alias("_lb"),
                          F.col("_tot").alias("_lt"))
    offsets = (
        totals.join(lower, F.col("_lb") < F.col("_b"), how="left")
        .groupBy("_b")
        .agg(F.coalesce(F.sum("_lt"), F.lit(0)).alias("_off"))
    )
    return (
        rows.join(F.broadcast(offsets), on="_b")
        .withColumn("position", (F.col("_off") + F.col("_r") - 1).cast("long"))
        .drop("_h", "_b", "_r", "_off")
    )


def epoch_order_sql(id_col: str = "doc_id", seed: int = 0, epoch: int = 0,
                    select_cols: str = "doc_id",
                    table: str = "documents") -> str:
    """DuckDB mirror: one global ``row_number`` over the identical salted
    hash order (the bucketing is a physical-plan detail)."""
    h = md5_60_sql(f"'{seed}:{epoch}:' || CAST({id_col} AS VARCHAR)")
    return f"""
    SELECT {select_cols},
           (row_number() OVER (ORDER BY {h}, {id_col}) - 1)::BIGINT
             AS position
    FROM {table}
    """
