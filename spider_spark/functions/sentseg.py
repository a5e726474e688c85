"""Deterministic sentence segmentation + sentence-level corpus dedup.

CCNet deduplicates at the paragraph level and C4 at the line level; the
third granularity real pipelines use is the *sentence* (e.g. RefinedWeb's
line-wise rules and the classic "dedupe the boilerplate sentence that
appears on every page" pass). Crawled HTML text has no newlines left
after extraction, so a pipeline needs a splitter before it can run any
segment-level rule.

The splitter is the naive deterministic rule — a sentence boundary is
``terminal punctuation ([.!?]+) + one space + a capital/digit/quote
opener`` — applied as ONE whole-stage-codegen regexp pass: collapse
whitespace, insert a ``\\x1e`` record separator at every boundary via a
capture-group rewrite (no lookahead — RE2, and therefore the DuckDB
mirror, has none), split on the separator. Abbreviation handling ("e.g.
Foo") is deliberately out of scope: the rule is frozen and mirrored
bit-for-bit, which a heuristic abbreviation list would compromise; for
dedup purposes an oversplit sentence is still deduplicated consistently
because BOTH occurrences oversplit identically.

Scale shape: the split is per-row JVM string surgery (no Python, no
shuffle); the dedup composition reuses
:func:`spider_spark.operators.spans.segment_frequency_filter` — a
(segment-hash)-keyed document-frequency count + broadcast hot set +
anti-join, shuffle rows = distinct sentences.

Reference parity: no analog in the reference (an asyncio crawler);
training-data extension layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spider_spark.operators.dedupe import md5_60_sql

__all__ = [
    "split_sentences",
    "split_sentences_sql",
    "sentence_dedup",
    "sentence_dedup_sql",
]

# terminal punct, ONE space (whitespace is pre-collapsed), then an
# upper-case letter / digit / quote-or-paren opener starts a new sentence
_BOUNDARY = '([.!?]+) ([A-Z0-9"(])'
_SEP = "\x1e"  # ASCII record separator — never survives text extraction


def split_sentences(col: Column) -> Column:
    """``array<string>`` of sentences of ``col`` under the frozen
    boundary rule. Empty/whitespace-only input yields ``['']`` (one
    empty sentence) — callers that care filter it; the dedup composition
    hashes it consistently on both engines."""
    collapsed = F.trim(F.regexp_replace(col, r"\s+", " "))
    marked = F.regexp_replace(collapsed, _BOUNDARY, "$1" + _SEP + "$2")
    return F.split(marked, _SEP)


def split_sentences_sql(x: str) -> str:
    """DuckDB mirror of :func:`split_sentences` (RE2 capture-group
    rewrite — same pattern, same replacement, literal split)."""
    collapsed = f"trim(regexp_replace({x}, '\\s+', ' ', 'g'))"
    marked = (
        f"regexp_replace({collapsed}, '([.!?]+) ([A-Z0-9\"(])', "
        f"'\\1' || chr(30) || '\\2', 'g')"
    )
    return f"string_split({marked}, chr(30))"


def sentence_dedup(docs: DataFrame, max_df: int, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Corpus-wide sentence-level dedup: split every document into
    sentences, drop any sentence whose document frequency (distinct docs,
    within-doc repeats count once) exceeds ``max_df``, re-join survivors
    in original order. Output ``(id, clean_text, n_segments, n_kept)``
    for every input document — :func:`segment_frequency_filter` over the
    sentence relation."""
    from spider_spark.operators.spans import segment_frequency_filter

    with_segs = docs.select(
        F.col(id_col), split_sentences(F.col(text_col)).alias("__sents")
    )
    return segment_frequency_filter(with_segs, "__sents", max_df, id_col=id_col)


def sentence_dedup_sql(max_df: int, id_col: str = "doc_id",
                       text_col: str = "text",
                       table: str = "documents") -> str:
    """DuckDB mirror of :func:`sentence_dedup` — same splitter, df rule,
    hash, and reassembly as the chunk-segment mirror in
    :mod:`spider_spark.operators.spans`."""
    sents = split_sentences_sql(text_col)
    h = md5_60_sql("seg")
    return f"""
    WITH s AS (SELECT {id_col}, {sents} AS sents FROM {table}),
    segs AS (
      SELECT {id_col}, i AS pos, sents[i] AS seg
      FROM (SELECT {id_col}, sents,
                   unnest(range(1, len(sents) + 1)) AS i
            FROM s)
    ),
    hot AS (
      SELECT h FROM (
        SELECT DISTINCT {id_col}, {h} AS h FROM segs
      ) GROUP BY h HAVING count(*) > {max_df}
    ),
    kept AS (SELECT * FROM segs WHERE {h} NOT IN (SELECT h FROM hot)),
    rebuilt AS (
      SELECT {id_col},
             string_agg(seg, ' ' ORDER BY pos) AS clean_text,
             count(*) AS n_kept
      FROM kept GROUP BY {id_col}
    )
    SELECT d.{id_col},
           coalesce(clean_text, '') AS clean_text,
           len(sents)::BIGINT AS n_segments,
           coalesce(n_kept, 0)::BIGINT AS n_kept
    FROM s d LEFT JOIN rebuilt USING ({id_col})
    """
