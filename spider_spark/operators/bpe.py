"""Distributed BPE tokenizer training + encoding over the corpus vocab.

Byte-pair-encoding merges (Sennrich et al. ACL 2016) are THE tokenizer
construction a training-data pipeline runs over its own corpus. The
classic driver-side trainer folds the corpus into a word-frequency dict
and loops in one process; this module keeps the SAME algorithm but holds
the state as a DataFrame of ``(word, freq, syms)`` rows — corpus-size
drops out after the first aggregation (the inner loop touches only the
distinct-word vocabulary), and every step is relational:

* **pair counting** — one explode of adjacent symbol pairs over the
  vocab + a pair-keyed ``sum(freq)`` with map-side partials (shuffle
  rows = distinct pairs). Overlapping occurrences count, exactly like
  the reference ``get_stats`` ('aaa' contributes (a,a) twice).
* **argmax** — ``(count DESC, left ASC, right ASC)``: the classic
  implementation's dict-order tie-break is nondeterministic, so the
  total order is frozen here and in the mirror.
* **merge** — leftmost-greedy non-overlapping substitution as ONE
  scan-local array fold (``F.aggregate``): append each symbol unless
  the accumulator's last element is ``left`` and the incoming is
  ``right``, in which case replace the last with the merged token.
  Greedy-overlap is handled by construction — a freshly merged token
  can never equal ``left`` (it is strictly longer), so 'aaaa' under
  (a,a) folds to [aa, aa], never [aa, a, a] or a triple merge. No
  window, no shuffle, no Python.

The driver holds O(n_merges) scalars (one argmax row per round — the
BM25 two-value pattern), never the vocabulary. Per round: one pair
aggregation + one ``TakeOrderedAndProject(1)`` + a checkpointed
projection.

The DuckDB mirror unrolls the rounds as MATERIALIZED CTEs (the
PageRank lesson: DuckDB inlines multiply-referenced CTEs, and each
round's vocab is referenced twice) with the identical fold via
``list_reduce``; an empty round collapses to a ``chr(1)`` sentinel pair
that can never match, so the chain degrades gracefully instead of
annihilating on a CROSS JOIN against an empty best-pair relation.

End-of-word markers are deliberately omitted (symbols never cross word
boundaries here, which is the property the marker exists to enforce);
encoders needing GPT-2-compatible vocabularies add the marker at the
word_vocab layer.

Reference parity: no analog in the reference (an asyncio crawler);
training-data extension layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spider_spark.functions.text import normalized_text
from spider_spark.operators.dedupe import NORM_SQL

__all__ = [
    "word_vocab",
    "pair_counts",
    "merge_pair",
    "bpe_train",
    "bpe_apply",
    "bpe_train_sql",
    "bpe_apply_sql",
]


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, freq, syms)`` over the shared tokenization — distinct
    words with corpus frequency, symbols initialized to characters."""
    words = (
        docs.select(
            F.explode(
                F.split(normalized_text(F.col(text_col)), " ")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    syms = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    return words.select("word", "freq", syms.alias("syms"))


def pair_counts(vocab: DataFrame) -> DataFrame:
    """``(left_sym, right_sym, cnt)`` — adjacent-symbol pair counts
    weighted by word frequency (overlapping occurrences count)."""
    pairs = F.when(
        F.size("syms") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(
                F.element_at("syms", i).alias("l"),
                F.element_at("syms", i + 1).alias("r"),
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS array<struct<l:string,r:string>>)"))
    return (
        vocab.select(F.col("freq"), F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym")
        )
        .agg(F.sum("freq").alias("cnt"))
    )


def merge_pair(syms: Column, left: str, right: str) -> Column:
    """Leftmost-greedy non-overlapping merge of ``(left, right)`` into
    one token — the scan-local array fold described in the module doc."""
    merged = left + right
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(docs: DataFrame, n_merges: int = 8, text_col: str = "text",
              checkpoint: bool = True) -> DataFrame:
    """Train ``n_merges`` BPE merges over the corpus; returns the merge
    table ``(rank, left_sym, right_sym, pair_count)`` in learned order.
    Stops early if the vocabulary runs out of pairs."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be ≥1: {n_merges}")
    spark = docs.sparkSession
    vocab = word_vocab(docs, text_col)
    if checkpoint:
        vocab = vocab.localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for k in range(n_merges):
        best = (
            pair_counts(vocab)
            .orderBy(F.desc("cnt"), F.asc("left_sym"), F.asc("right_sym"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, cnt = best[0]["left_sym"], best[0]["right_sym"], best[0]["cnt"]
        merges.append((k, l, r, int(cnt)))
        vocab = vocab.withColumn("syms", merge_pair(F.col("syms"), l, r))
        if checkpoint:
            vocab = vocab.localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "rank long, left_sym string, right_sym string, pair_count long"
    )


def bpe_apply(docs: DataFrame, merges: list[tuple[str, str]] | DataFrame,
              id_col: str = "doc_id", text_col: str = "text",
              checkpoint_every: int = 8) -> DataFrame:
    """Encode every document with a learned merge list: ``(id, n_tokens,
    tokens)`` where ``tokens`` is the space-joined symbol stream.

    Scale shape: the merges apply to the DISTINCT-word vocabulary (one
    fold per merge, checkpointed every ``checkpoint_every`` to bound
    expression depth), which then joins back to the word-position
    relation — encoding cost is O(vocab) + one word-keyed join, not
    O(corpus · n_merges). Docs with no words survive with empty output.
    """
    if isinstance(merges, DataFrame):
        merges = [
            (r["left_sym"], r["right_sym"])
            for r in merges.orderBy("rank").collect()
        ]
    doc_words = (
        docs.select(
            F.col(id_col),
            F.posexplode(
                F.split(normalized_text(F.col(text_col)), " ")
            ).alias("wpos", "word"),
        )
        .filter(F.col("word") != "")
    )
    vocab = word_vocab(docs, text_col)
    for i, (l, r) in enumerate(merges):
        vocab = vocab.withColumn("syms", merge_pair(F.col("syms"), l, r))
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    enc = doc_words.join(vocab.select("word", "syms"), on="word")
    agg = enc.groupBy(id_col).agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("wpos", "syms"))),
                lambda x: x["syms"],
            )
        ).alias("toks")
    )
    return (
        docs.select(id_col).distinct()
        .join(agg, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.size("toks"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.array_join("toks", " "), F.lit("")).alias("tokens"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB mirrors (unrolled MATERIALIZED-CTE chains)
# ---------------------------------------------------------------------------


def _train_ctes(n_merges: int, rel: str, text_col: str) -> str:
    """The shared CTE chain: words → v0 → (p_k, b_k, bg_k, v_{k+1})*."""
    norm = NORM_SQL.format(x=text_col)
    parts = [
        f"""words AS (
      SELECT word, count(*) AS freq FROM (
        SELECT unnest(string_split({norm}, ' ')) AS word FROM {rel}
      ) WHERE word <> '' GROUP BY 1
    )""",
        """v0 AS MATERIALIZED (
      SELECT word, freq,
             list_transform(range(1, len(word) + 1), i -> word[i:i]) AS syms
      FROM words
    )""",
    ]
    for k in range(n_merges):
        parts.append(f"""p{k} AS (
      SELECT syms[i] AS l, syms[i + 1] AS r, sum(freq)::BIGINT AS cnt
      FROM (SELECT syms, freq, unnest(range(1, len(syms))) AS i FROM v{k})
      GROUP BY 1, 2
    )""")
        parts.append(
            f"b{k} AS MATERIALIZED (SELECT l, r, cnt FROM p{k} "
            f"ORDER BY cnt DESC, l, r LIMIT 1)"
        )
        parts.append(
            f"bg{k} AS MATERIALIZED (SELECT coalesce(min(l), chr(1)) AS l, "
            f"coalesce(min(r), chr(1)) AS r FROM b{k})"
        )
        parts.append(f"""v{k + 1} AS MATERIALIZED (
      SELECT word, freq,
             list_reduce(
               list_transform(syms, s -> [s]),
               (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = bg{k}.l
                                 AND x[1] = bg{k}.r
                           THEN acc[1:len(acc) - 1] || [bg{k}.l || bg{k}.r]
                           ELSE acc || x END
             ) AS syms
      FROM v{k}, bg{k}
    )""")
    return ",\n    ".join(parts)


def bpe_train_sql(n_merges: int = 8, rel: str = "documents",
                  text_col: str = "text") -> str:
    """DuckDB mirror of :func:`bpe_train` — identical counts, argmax
    order, and fold, one unrolled round per merge."""
    union = "\n      UNION ALL ".join(
        f"SELECT {k}::BIGINT AS rank, l AS left_sym, r AS right_sym, "
        f"cnt AS pair_count FROM b{k}"
        for k in range(n_merges)
    )
    return f"""
    WITH {_train_ctes(n_merges, rel, text_col)}
    SELECT * FROM ({union})
    ORDER BY rank
    """


def bpe_apply_sql(n_merges: int = 8, rel: str = "documents",
                  id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB mirror of ``bpe_apply(docs, bpe_train(docs, n_merges))`` —
    trains the same chain, then encodes through the final vocab."""
    norm = NORM_SQL.format(x=text_col)
    n = n_merges
    return f"""
    WITH {_train_ctes(n, rel, text_col)},
    dw AS (
      SELECT {id_col}, i AS wpos, w[i] AS word
      FROM (SELECT {id_col}, w, unnest(range(1, len(w) + 1)) AS i
            FROM (SELECT {id_col}, string_split({norm}, ' ') AS w FROM {rel}))
      WHERE w[i] <> ''
    ),
    enc AS (
      SELECT dw.{id_col}, dw.wpos, v.syms
      FROM dw JOIN v{n} v USING (word)
    ),
    agg AS (
      SELECT {id_col}, flatten(list(syms ORDER BY wpos)) AS toks
      FROM enc GROUP BY 1
    )
    SELECT d.{id_col},
           coalesce(len(toks), 0)::BIGINT AS n_tokens,
           coalesce(array_to_string(toks, ' '), '') AS tokens
    FROM (SELECT DISTINCT {id_col} FROM {rel}) d
    LEFT JOIN agg USING ({id_col})
    """
