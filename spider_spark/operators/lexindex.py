"""Persisted BM25 postings index: build once, probe many.

:func:`~spider_spark.operators.search.bm25_topk` recomputes the corpus
statistics — the full explode, term frequencies, document lengths, N and
avgdl — on every call. Right for an oracle-checked query; wrong for a
retrieval service where a 100 TB corpus answers thousands of query
batches. This module is the lexical analog of
:class:`~spider_spark.operators.ivf_index.IVFIndex` (VERDICT r3 finding
#5): the expensive corpus passes are committed once through
:class:`~spider_spark.sources.tableio.TableIO` (Iceberg-analog snapshots —
atomic swap, versioned, vacuumable) and a search touches only the
partitions its query terms hash into.

Tables (``<name>_`` prefixed):

* ``postings`` — one row per (doc, term): ``(term, doc_id, tf, dl)``,
  **Hive-partitioned by** ``term_bucket = md5_60(term) % n_buckets`` so a
  query's ``term_bucket IN (...)`` filter prunes at planning time. The
  doc length rides denormalized on every posting (one extra int) so
  scoring never joins a corpus-sized doc-length table per query.
* ``termstats`` — ``(term, df)`` per distinct term, partitioned the same
  way (the idf lookup reads only the query's buckets).
* ``stats`` — one row ``(n_docs, avgdl)``; committed LAST so a killed
  build leaves the previous index fully readable (the IVFIndex contract).

Search cost per query: a pruned scan of ``|query terms|`` buckets of the
postings (≈ ``|query|/n_buckets`` of the corpus' postings), an O(|query|)
broadcast idf, one doc-keyed partial-score sum, TakeOrderedAndProject
top-k. Identical output to ``bm25_topk`` — same constants, expression
order, 6-decimal rounding and (score desc, id asc) tie-break — so the
same DuckDB mirror (``bm25_topk_sql``) oracles both paths.

Incremental growth: :meth:`LexicalIndex.add` appends an O(batch) delta
into the same bucket layout (new docs only — the ExactIndex/MinHashIndex
delta contract) and updates the corpus scalars with exact integer
accumulation; term document-frequencies come from the pruned postings
scan while the termstats table is stale, and :meth:`LexicalIndex.compact`
restores the optimized layout. Grown and one-shot indexes score
bit-identically (pinned in tests/test_lexindex.py::TestIncrementalAdd).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spider_spark.functions.text import normalized_text
from spider_spark.operators.dedupe import md5_60
from spider_spark.operators.search import B, K1
from spider_spark.sources.tableio import TableIO


def _bucket_of(term: str, n_buckets: int) -> int:
    """Python mirror of ``md5_60(term) % n_buckets`` (dedupe.md5_60) — lets
    a search compute its pruned bucket set driver-side with zero jobs."""
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:15], 16) % n_buckets


class LexicalIndex:
    """A named, versioned BM25 postings index over a document corpus."""

    def __init__(self, io: TableIO, name: str = "lex",
                 id_col: str = "doc_id", text_col: str = "text",
                 n_buckets: int = 64):
        self.io = io
        self.name = name
        self.id_col = id_col
        self.text_col = text_col
        self.n_buckets = n_buckets

    @property
    def _postings(self) -> str:
        return f"{self.name}_postings"

    @property
    def _termstats(self) -> str:
        return f"{self.name}_termstats"

    @property
    def _stats(self) -> str:
        return f"{self.name}_stats"

    def exists(self) -> bool:
        return all(self.io.exists(t)
                   for t in (self._postings, self._termstats, self._stats))

    # -- build ----------------------------------------------------------------

    def _batch_postings(self, corpus: DataFrame) -> DataFrame:
        """The shared explode → tf → denormalized-dl → bucket projection
        used by both :meth:`build` and :meth:`add` (identical expressions,
        so an incrementally-grown index is bit-identical to a one-shot
        build over the unioned corpus)."""
        terms = corpus.select(
            F.col(self.id_col).alias("doc_id"),
            F.explode(
                F.split(normalized_text(F.col(self.text_col)), " ")
            ).alias("term"),
        )
        tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
        return tf.withColumn(
            "dl", F.sum("tf").over(Window.partitionBy("doc_id"))
        ).withColumn(
            "term_bucket", F.pmod(md5_60(F.col("term")), F.lit(self.n_buckets))
        )

    def build(self, corpus: DataFrame) -> dict:
        """One explode pass over the corpus → postings + per-term df +
        corpus scalars, committed through the manifest. The doc length is
        a window sum over the tf rows (doc-keyed — same shuffle key as the
        tf groupBy, no second corpus pass). Returns the stats meta."""
        postings = self._batch_postings(corpus)
        meta = {"n_buckets": int(self.n_buckets)}
        self.io.commit_overwrite(self._postings, postings,
                                 partition_by="term_bucket", meta=meta)
        # df per term from the COMMITTED postings: reuses the materialized
        # tf rows instead of re-running the corpus explode
        committed = self.io.read(self._postings)
        termstats = committed.groupBy("term").agg(
            F.count("*").alias("df")
        ).withColumn(
            "term_bucket", F.pmod(md5_60(F.col("term")), F.lit(self.n_buckets))
        )
        self.io.commit_overwrite(self._termstats, termstats,
                                 partition_by="term_bucket", meta=meta)
        scalars = committed.groupBy("doc_id").agg(F.first("dl").alias("dl")).agg(
            F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
        ).collect()[0]
        return self._commit_stats(corpus.sparkSession,
                                  int(scalars["n_docs"]),
                                  int(scalars["sum_dl"]),
                                  dirty_termstats=False)

    def _commit_stats(self, spark, n_docs: int, sum_dl: int, *,
                      dirty_termstats: bool) -> dict:
        """``avgdl = double(sum_dl) / double(n_docs)`` — the identical IEEE
        division both engines' integer-summed ``avg`` performs, so an
        index grown by :meth:`add` scores bit-identically to a one-shot
        build (and to the inline ``bm25_topk``)."""
        avgdl = float(sum_dl) / float(n_docs) if n_docs else 0.0
        stats_meta = {"n_docs": n_docs, "sum_dl": sum_dl, "avgdl": avgdl,
                      "dirty_termstats": bool(dirty_termstats),
                      "n_buckets": int(self.n_buckets)}
        stats_df = spark.createDataFrame(
            [(n_docs, sum_dl, avgdl)], "n_docs long, sum_dl long, avgdl double"
        )
        self.io.commit_overwrite(self._stats, stats_df, meta=stats_meta)
        return stats_meta

    # -- incremental growth -----------------------------------------------------

    def add(self, batch: DataFrame) -> dict:
        """O(batch) delta: append the batch's postings into the same
        Hive-partitioned bucket layout and update the corpus scalars
        exactly (integer ``n_docs``/``sum_dl`` accumulation — ``avgdl``
        re-derives from the exact totals, never from a float running
        mean). The per-term ``termstats`` table is NOT rewritten — the
        stats meta marks it dirty and :meth:`search` derives the query
        terms' document frequencies from the pruned postings scan instead
        (exact: ``df(term)`` = posting-row count; one extra agg over rows
        the query already reads). :meth:`compact` restores the optimized
        termstats layout.

        Caller contract (the ExactIndex/MinHashIndex delta rule): batch
        ids must be NEW — re-adding an indexed doc double-counts it.
        Empty batches commit nothing."""
        prev = self.io.latest_meta(self._stats)
        if "sum_dl" in prev:
            sum_dl = int(prev["sum_dl"])
        else:  # index built before sum_dl was recorded: one recovery scan
            sum_dl = int(
                self.io.read(self._postings)
                .groupBy("doc_id").agg(F.first("dl").alias("dl"))
                .agg(F.sum("dl")).collect()[0][0] or 0
            )
        delta = self._batch_postings(batch)
        agg = delta.groupBy("doc_id").agg(F.first("dl").alias("dl")).agg(
            F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
        ).collect()[0]
        if not agg["n_docs"]:
            return prev
        self.io.append(self._postings, delta, partition_by="term_bucket")
        return self._commit_stats(
            batch.sparkSession,
            int(prev["n_docs"]) + int(agg["n_docs"]),
            sum_dl + int(agg["sum_dl"]),
            dirty_termstats=True,
        )

    def compact(self) -> dict:
        """Rebuild the per-term ``termstats`` table and re-commit the
        postings as one partitioned version (delta directories fold into
        a single pruned layout), clearing the dirty flag. Search output
        is identical before and after — compaction is purely physical."""
        prev = self.io.latest_meta(self._stats)
        postings = self.io.read(self._postings)
        meta = {"n_buckets": int(self.n_buckets)}
        self.io.commit_overwrite(self._postings, postings,
                                 partition_by="term_bucket", meta=meta)
        committed = self.io.read(self._postings)
        termstats = committed.groupBy("term").agg(
            F.count("*").alias("df")
        ).withColumn(
            "term_bucket", F.pmod(md5_60(F.col("term")), F.lit(self.n_buckets))
        )
        self.io.commit_overwrite(self._termstats, termstats,
                                 partition_by="term_bucket", meta=meta)
        spark = postings.sparkSession
        return self._commit_stats(spark, int(prev["n_docs"]),
                                  int(prev["sum_dl"]), dirty_termstats=False)

    # -- search ---------------------------------------------------------------

    def search(self, query_terms: list[str], k: int = 10) -> DataFrame:
        """BM25 top-``k`` — bit-identical to
        :func:`~spider_spark.operators.search.bm25_topk` on the indexed
        corpus. The postings/termstats scans carry a planning-time
        ``term_bucket IN (...)`` partition filter computed driver-side."""
        if not query_terms:
            raise ValueError("query_terms must be non-empty")
        qt = sorted({t.lower() for t in query_terms})
        buckets = sorted({_bucket_of(t, self.n_buckets) for t in qt})
        stats = self.io.latest_meta(self._stats)
        n_docs, avgdl = stats["n_docs"], stats["avgdl"]
        qtf = self.io.read(self._postings).filter(
            F.col("term_bucket").isin(buckets) & F.col("term").isin(qt)
        )
        if stats.get("dirty_termstats"):
            # deltas landed since the last compaction: termstats is stale,
            # but df(term) is exactly the posting-row count over rows this
            # query already scans (pruned) — bit-identical, one extra agg
            dfreq = qtf.groupBy("term").agg(F.count("*").alias("df"))
        else:
            dfreq = self.io.read(self._termstats).filter(
                F.col("term_bucket").isin(buckets) & F.col("term").isin(qt)
            )
        idf = dfreq.select(
            "term",
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ).alias("idf"),
        )
        scored = (
            qtf.join(F.broadcast(idf), on="term")
            .select(
                "doc_id",
                (
                    F.col("idf")
                    * (F.col("tf") * F.lit(K1 + 1.0))
                    / (
                        F.col("tf")
                        + F.lit(K1)
                        * (F.lit(1.0 - B)
                           + F.lit(B) * F.col("dl") / F.lit(float(avgdl)))
                    )
                ).alias("part"),
            )
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_matched"),
                 F.round(F.sum("part"), 6).alias("score"))
        )
        out = scored.orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        ).limit(k)
        if self.id_col != "doc_id":
            out = out.withColumnRenamed("doc_id", self.id_col)
        return out

    def drop(self) -> None:
        for t in (self._postings, self._termstats, self._stats):
            if self.io.exists(t):
                self.io.drop(t, check_first=True)
