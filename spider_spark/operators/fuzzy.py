"""Fuzzy vocabulary matching via the delete-neighborhood (SymSpell) join.

Typo-tolerant term lookup is the retrieval-side complement of the
lexical search stack (operators/search.py, operators/lexindex.py): a
query term that matches nothing ("recieve") should still find its
corpus spelling ("receive"). The classic answers are Norvig's
generate-all-edits (≈ 54·len+25 candidates per query — substitutions
and insertions explode with alphabet size, and are unicode-hostile) and
a levenshtein cross-join (O(|queries|·|vocab|) — a scale-killer).
SymSpell (Garbe 2012) observes that **deletes alone close the
edit-distance-1 relation**: if ``levenshtein(q, t) ≤ 1`` then ``q`` and
``t`` share a member of each other's delete neighborhood (the string
itself plus every single-character deletion) — a substitution is a
delete on both sides at the same position, an insertion/deletion a
delete on one side. So matching is an equi-join on delete keys, with a
cheap char-exact confirm (:func:`_within_one_edit` — NOT the builtin
``levenshtein``, whose byte-vs-char semantics differ between Spark and
DuckDB) to drop the neighborhood's false positives (e.g. "ab" and "bc"
share key "b" at distance 2 — dropped; "act" and "cat" share NO delete
key — correctly out of reach at d=1).

Scale shape: the vocab side explodes its ≤ ``len+1``-element delete
array inside the scan (a per-row transform, no join fan-out before the
key exists); the query side — spell-check batches are small by nature —
is **broadcast**, so the candidate join never shuffles the vocab.
Candidates per key are vocab terms one delete apart, a tiny set for
natural language; the confirm + per-query argmin run on that small
relation. The argmin is a ``min(struct(dist, -freq, term))`` — the
frozen total order ``(dist ASC, freq DESC, term ASC)``, no window, no
skew. Edit distance is fixed at 1: distance-2 needs deletes-of-deletes
(O(len²) keys per term) and is better served by composing this operator
with itself on the miss set.

Tokenization for :func:`vocab_counts` is the pipeline's shared one
(functions/text.py ``normalized_text`` split on single spaces —
identical to the BM25 / span-dedup / n-gram word streams, so the vocab
joins against those tables).

Reference parity: no analog in the reference (an asyncio crawler);
training-data / retrieval extension layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_spark.functions.text import normalized_text
from spider_spark.operators.dedupe import NORM_SQL, md5_60

__all__ = [
    "vocab_counts",
    "delete_neighborhood",
    "delete_neighborhood_sql",
    "fuzzy_match",
    "fuzzy_match_sql",
    "FuzzyIndex",
]


def vocab_counts(docs: DataFrame, text_col: str = "text",
                 min_len: int = 3) -> DataFrame:
    """``(term, freq)`` word counts over the shared tokenization; terms
    shorter than ``min_len`` are dropped (their delete keys are near-empty
    strings shared by half the alphabet — all noise, no signal)."""
    if min_len < 2:
        raise ValueError(f"min_len must be ≥2: {min_len}")
    words = F.split(normalized_text(F.col(text_col)), " ")
    return (
        docs.select(F.explode(words).alias("term"))
        .filter(F.length("term") >= min_len)
        .groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    )


def delete_neighborhood(col: str) -> F.Column:
    """Array of ``col`` itself plus every single-character deletion —
    the SymSpell distance-1 key set, built inside the scan."""
    return F.expr(
        f"transform(sequence(0, length({col})), i -> "
        f"CASE WHEN i = 0 THEN {col} "
        f"ELSE concat(substring({col}, 1, i - 1), substring({col}, i + 1)) "
        f"END)"
    )


def delete_neighborhood_sql(expr: str) -> str:
    """DuckDB mirror of :func:`delete_neighborhood` (identical per-index
    string surgery; ``range`` upper bound is exclusive)."""
    return (
        f"list_transform(range(0, length({expr}) + 1), i -> "
        f"CASE WHEN i = 0 THEN {expr} "
        f"ELSE substr({expr}, 1, i - 1) || substr({expr}, i + 1) END)"
    )


def _within_one_edit(a: str, b: str) -> str:
    """SQL boolean: ``a`` and ``b`` are within ONE character edit
    (equal / one substitution / one insertion-deletion). Deliberately
    NOT ``levenshtein()``: Spark's builtin counts characters while
    DuckDB's counts BYTES, so any multibyte candidate ('café' vs
    'cafe' — 1 vs 2) would diverge between the engine and its oracle.
    This rule is pure char-indexed string algebra — identical in both:

    * equal length → exactly one differing position;
    * length ±1 → with ``p`` the common-prefix length (prefix equality
      is monotone, so counting equal-prefix indices IS ``p``), the
      shorter equals the longer with the char at ``p+1`` removed.

    Per-pair cost is O(len²) in the prefix scan — the candidate
    relation is tiny (delete-key collisions), never the corpus."""
    same_sub = (
        f"size(filter(sequence(1, length({a})), "
        f"i -> substring({a}, i, 1) != substring({b}, i, 1))) = 1"
    )

    def del_case(s: str, l: str) -> str:
        pfx = (f"size(filter(sequence(1, length({s})), "
               f"i -> substring({s}, 1, i) = substring({l}, 1, i)))")
        return f"substring({s}, {pfx} + 1) = substring({l}, {pfx} + 2)"

    return (
        f"CASE WHEN {a} = {b} THEN true "
        f"WHEN length({a}) = length({b}) THEN {same_sub} "
        f"WHEN length({a}) = length({b}) + 1 THEN {del_case(b, a)} "
        f"WHEN length({b}) = length({a}) + 1 THEN {del_case(a, b)} "
        f"ELSE false END"
    )


def fuzzy_match(queries: DataFrame, vocab: DataFrame,
                query_col: str = "query") -> DataFrame:
    """Best edit-distance-≤1 vocabulary term per query string:
    ``(query, term, freq, dist)`` under the frozen preference order
    ``(dist ASC, freq DESC, term ASC)`` — an exact match always wins,
    otherwise the most frequent correction. Queries with no term within
    one edit are absent from the output (the caller's miss set).

    ``vocab`` is ``(term, freq)`` — :func:`vocab_counts` or any
    frequency table (a persisted LexicalIndex postings rollup works).
    The query side is broadcast; see the module docstring for why the
    vocab never shuffles. The distance confirm is the char-exact
    :func:`_within_one_edit` rule, not ``levenshtein`` (byte-vs-char
    semantics differ across engines)."""
    q = queries.select(F.col(query_col).alias("query")).distinct()
    qd = q.select(
        "query", F.explode(delete_neighborhood("query")).alias("dkey"))
    vd = vocab.select(
        F.col("term"), F.col("freq"),
        F.explode(delete_neighborhood("term")).alias("dkey"))
    cand = (
        vd.join(F.broadcast(qd), on="dkey")
        .select("query", "term", "freq").distinct()
        .filter(F.expr(_within_one_edit("query", "term")))
        .withColumn("dist",
                    F.when(F.col("query") == F.col("term"), 0).otherwise(1))
    )
    best = cand.groupBy("query").agg(
        F.min(F.struct(F.col("dist"), (-F.col("freq")).alias("nf"),
                       F.col("term"))).alias("m"))
    return best.select(
        "query", F.col("m.term").alias("term"),
        (-F.col("m.nf")).alias("freq"), F.col("m.dist").alias("dist"))


def _within_one_edit_sql(a: str, b: str) -> str:
    """DuckDB rendering of :func:`_within_one_edit` (list_filter/range/
    substr are char-indexed, like Spark's)."""
    same_sub = (
        f"len(list_filter(range(1, length({a}) + 1), "
        f"i -> substr({a}, i, 1) != substr({b}, i, 1))) = 1"
    )

    def del_case(s: str, l: str) -> str:
        pfx = (f"len(list_filter(range(1, length({s}) + 1), "
               f"i -> substr({s}, 1, i) = substr({l}, 1, i)))")
        return f"substr({s}, {pfx} + 1) = substr({l}, {pfx} + 2)"

    return (
        f"CASE WHEN {a} = {b} THEN true "
        f"WHEN length({a}) = length({b}) THEN {same_sub} "
        f"WHEN length({a}) = length({b}) + 1 THEN {del_case(b, a)} "
        f"WHEN length({b}) = length({a}) + 1 THEN {del_case(a, b)} "
        f"ELSE false END"
    )


def fuzzy_match_sql(queries_rel: str,
                    docs_rel: str = "SELECT * FROM documents",
                    text_col: str = "text", min_len: int = 3,
                    query_col: str = "query") -> str:
    """DuckDB mirror of ``fuzzy_match(queries, vocab_counts(docs))`` —
    identical tokenization, delete keys, confirm, and preference order."""
    norm = NORM_SQL.format(x=text_col)
    return f"""
    WITH fvocab AS (
      SELECT term, count(*) AS freq FROM (
        SELECT unnest(string_split({norm}, ' ')) AS term FROM ({docs_rel})
      ) WHERE length(term) >= {min_len} GROUP BY 1
    ),
    fq AS (SELECT DISTINCT {query_col} AS query FROM ({queries_rel})),
    qd AS (
      SELECT query, unnest({delete_neighborhood_sql('query')}) AS dkey
      FROM fq
    ),
    vd AS (
      SELECT term, freq, unnest({delete_neighborhood_sql('term')}) AS dkey
      FROM fvocab
    ),
    cand AS (
      SELECT DISTINCT query, term, freq,
             CASE WHEN query = term THEN 0 ELSE 1 END AS dist
      FROM vd JOIN qd USING (dkey)
      WHERE {_within_one_edit_sql('query', 'term')}
    )
    SELECT query, term, freq, dist FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query ORDER BY dist ASC, freq DESC, term ASC) AS rn
      FROM cand
    ) WHERE rn = 1
    """


# ---------------------------------------------------------------------------
# persisted delete-key index (probe-many spell correction)
# ---------------------------------------------------------------------------


def _py_deletes(s: str) -> list[str]:
    """Python mirror of :func:`delete_neighborhood` (char slicing — the
    identical char-indexed surgery, parity-tested)."""
    return [s] + [s[:i] + s[i + 1:] for i in range(len(s))]


def _bucket_of(key: str, n_buckets: int) -> int:
    """Python mirror of ``md5_60(key) % n_buckets`` — lets :meth:`search`
    compute its bucket set driver-side for planning-time pruning (the
    LexicalIndex recipe, operators/lexindex.py)."""
    import hashlib

    return int(hashlib.md5(key.encode("utf-8")).hexdigest()[:15],
               16) % n_buckets


class FuzzyIndex:
    """Persisted delete-neighborhood index — the probe-many form of
    :func:`fuzzy_match`. The inline operator re-explodes the vocabulary
    per call; a spell-correcting ingest pipeline probes thousands of
    query batches against the SAME corpus vocabulary, so the exploded
    ``(dkey, term, freq)`` relation is committed once, Hive-partitioned
    by ``dkey_bucket = md5_60(dkey) % n_buckets``, and every search
    reads only its queries' buckets (planning-time partition pruning;
    the bucket set is computed driver-side with a parity-tested Python
    md5 mirror — query batches are small by nature, the documented
    driver-collect class). ``add()`` appends O(batch) delta rows for
    new vocabulary counts; search sums frequency partials per term, so
    a grown index answers exactly like a one-shot rebuild (tested).

    The same TableIO/versioned-manifest contract as the other persisted
    indexes (Exact / MinHash / Lexical / IVF): killed builds leave the
    previous snapshot."""

    def __init__(self, io, name: str = "fuzzy", n_buckets: int = 64):
        self.io = io
        self.name = name
        self.n_buckets = n_buckets

    @property
    def _table(self) -> str:
        return f"{self.name}_deletes"

    def exists(self) -> bool:
        return self.io.exists(self._table)

    def _rows(self, vocab: DataFrame) -> DataFrame:
        return (
            vocab.select(
                F.col("term"), F.col("freq"),
                F.explode(delete_neighborhood("term")).alias("dkey"))
            .withColumn("dkey_bucket",
                        F.pmod(md5_60(F.col("dkey")), F.lit(self.n_buckets)))
        )

    def build(self, vocab: DataFrame) -> None:
        """Commit the exploded delete relation of ``vocab`` (term, freq)."""
        self.io.commit_overwrite(
            self._table, self._rows(vocab), partition_by="dkey_bucket",
            meta={"n_buckets": int(self.n_buckets)})

    def add(self, vocab_delta: DataFrame) -> None:
        """Append additional counts (new terms or increments for known
        ones) — O(batch) rows into the bucket layout; never rewrites."""
        self.io.append(self._table, self._rows(vocab_delta),
                       partition_by="dkey_bucket")

    def search(self, queries: DataFrame,
               query_col: str = "query") -> DataFrame:
        """Best correction per query — same output contract and frozen
        preference order as :func:`fuzzy_match`; reads only the probed
        buckets."""
        spark = queries.sparkSession
        qs = [r["q"] for r in queries.select(
            F.col(query_col).alias("q")).distinct().collect()]
        if not qs:
            return spark.createDataFrame(
                [], "query string, term string, freq long, dist int")
        pairs = [(q, d) for q in qs for d in dict.fromkeys(_py_deletes(q))]
        buckets = sorted({_bucket_of(d, self.n_buckets) for _, d in pairs})
        keys = sorted({d for _, d in pairs})
        qd = spark.createDataFrame(pairs, "query string, dkey string")
        scan = (
            self.io.read(self._table)
            .filter(F.col("dkey_bucket").isin(buckets))
            .filter(F.col("dkey").isin(keys))
            # collapse add() partials FIRST: after this, every dkey row of
            # a term carries the same total frequency
            .groupBy("term", "dkey").agg(F.sum("freq").alias("freq"))
        )
        cand = (
            scan.join(F.broadcast(qd), on="dkey")
            # a (query, term) pair matches through MULTIPLE shared keys
            # (an exact match shares the whole neighborhood) — max, never
            # sum, or the frequency would multiply-count per key
            .groupBy("query", "term").agg(F.max("freq").alias("freq"))
            .filter(F.expr(_within_one_edit("query", "term")))
            .withColumn("dist",
                        F.when(F.col("query") == F.col("term"), 0)
                        .otherwise(1))
        )
        best = cand.groupBy("query").agg(
            F.min(F.struct(F.col("dist"), (-F.col("freq")).alias("nf"),
                           F.col("term"))).alias("m"))
        return best.select(
            "query", F.col("m.term").alias("term"),
            (-F.col("m.nf")).alias("freq"), F.col("m.dist").alias("dist"))
