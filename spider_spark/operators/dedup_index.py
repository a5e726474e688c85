"""Persisted MinHash-LSH near-duplicate index: build once, probe per batch.

:func:`~spider_spark.operators.dedupe.lsh_candidate_pairs` recomputes
signatures for the WHOLE corpus to answer "which documents are near-dups"
— right for a one-shot dedup sweep, wrong for ingestion, where every crawl
wave asks "is anything in this (small) batch a near-dup of the 100 TB
corpus?". This module is the dedup member of the persisted-index trio
(:class:`~spider_spark.operators.lexindex.LexicalIndex` for lexical,
:class:`~spider_spark.operators.ivf_index.IVFIndex` for vectors): the
corpus band keys are committed once through
:class:`~spider_spark.sources.tableio.TableIO` (atomic snapshot swap,
versioned), **Hive-partitioned by** ``bkt = md5_60(bucket) % n_parts``;
a probe computes the batch's band keys (a batch-sized job — shingle
explode + 32-way min over the batch only), collects the distinct
partition ids it touches (≤ 8·|batch|, capped at ``n_parts``), and scans
ONLY those partitions of the corpus index.

Build-time hot-bucket guard: corpus buckets holding more than
``max_bucket`` docs are dropped — the same skew guard as the one-shot
sweep. A probe into a dropped bucket finds no candidates by design (such
buckets are boilerplate-degenerate; at 10^10 docs one hot bucket would
otherwise make a single probe fan out B candidate rows).

Probe cost: batch-sized signature job + pruned scan of ≤ 8·|batch|
partitions + one (band, bucket)-keyed join whose corpus side is bounded
by ``max_bucket`` per key. Nothing scans the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from spider_spark.operators.dedupe import (
    NORM_SQL,
    banded_keys,
    banded_keys_sql,
    md5_60,
    normalized_text,
)
from spider_spark.sources.tableio import TableIO

__all__ = ["ExactIndex", "MinHashIndex", "exact_probe_sql",
           "minhash_probe_sql"]


class MinHashIndex:
    """A named, versioned LSH band-key index over a document corpus."""

    def __init__(self, io: TableIO, name: str = "mhx",
                 id_col: str = "doc_id", text_col: str = "text",
                 n: int = 3, n_parts: int = 64, max_bucket: int = 200):
        self.io = io
        self.name = name
        self.id_col = id_col
        self.text_col = text_col
        self.n = n
        self.n_parts = n_parts
        self.max_bucket = max_bucket

    @property
    def _bands(self) -> str:
        return f"{self.name}_bands"

    def exists(self) -> bool:
        return self.io.exists(self._bands)

    def build(self, corpus: DataFrame) -> dict:
        """Corpus band keys → hot-bucket drop → partitioned commit. One
        signature pass over the corpus (the same cost as one LSH sweep);
        the hot set is a (band, bucket)-keyed agg broadcast back."""
        banded = banded_keys(corpus, n=self.n, id_col=self.id_col,
                             text_col=self.text_col)
        hot = (
            banded.groupBy("band", "bucket")
            .agg(F.count("*").alias("c"))
            .filter(F.col("c") > self.max_bucket)
            .select("band", "bucket")
        )
        kept = banded.join(F.broadcast(hot), on=["band", "bucket"],
                           how="left_anti")
        out = kept.withColumn(
            "bkt", F.pmod(md5_60(F.col("bucket")), F.lit(self.n_parts))
        )
        meta = {"n_parts": int(self.n_parts), "n": int(self.n),
                "max_bucket": int(self.max_bucket)}
        self.io.commit_overwrite(self._bands, out, partition_by="bkt",
                                 meta=meta)
        return meta

    def add(self, batch: DataFrame) -> None:
        """Incremental ingest: append the batch's band keys as an O(batch)
        delta commit (no corpus rewrite — the manifest's delta-append is
        exactly the Iceberg fast-append shape). The hot-bucket guard is
        applied *within the batch* only: a bucket that becomes hot across
        many small adds drifts past ``max_bucket`` until the next full
        :meth:`build` (the compaction pass); probes into such a bucket
        return more candidates, never fewer — a recall-safe drift. A
        refetch of an already-indexed document appends fresh keys next to
        its old ones (LSH band rows carry no tombstones); duplicate
        (probe, match) candidates collapse in :meth:`probe`'s DISTINCT."""
        banded = banded_keys(batch, n=self.n, id_col=self.id_col,
                             text_col=self.text_col)
        hot = (
            banded.groupBy("band", "bucket")
            .agg(F.count("*").alias("c"))
            .filter(F.col("c") > self.max_bucket)
            .select("band", "bucket")
        )
        kept = banded.join(F.broadcast(hot), on=["band", "bucket"],
                           how="left_anti")
        out = kept.withColumn(
            "bkt", F.pmod(md5_60(F.col("bucket")), F.lit(self.n_parts))
        ).localCheckpoint(eager=True)  # batch-sized; isEmpty + write below
        if out.isEmpty():
            return
        self.io.append(self._bands, out, partition_by="bkt",
                       meta={"n_parts": int(self.n_parts)})

    def probe(self, batch: DataFrame) -> DataFrame:
        """``(probe_id, match_id)`` — every batch document paired with
        every indexed document sharing at least one band bucket. The
        corpus-side scan carries a planning-time ``bkt IN (...)``
        partition filter derived from the batch's own band keys."""
        q = banded_keys(batch, n=self.n, id_col=self.id_col,
                        text_col=self.text_col).withColumn(
            "bkt", F.pmod(md5_60(F.col("bucket")), F.lit(self.n_parts))
        ).localCheckpoint(eager=True)  # batch-sized; read twice below
        ids = sorted(r["bkt"] for r in q.select("bkt").distinct().collect())
        try:
            corp = self.io.read(self._bands).filter(F.col("bkt").isin(ids))
        except AnalysisException:
            # a fully-hot corpus commits ZERO band rows: the partitioned
            # snapshot has no parquet files to infer a schema from — the
            # index is legitimately empty, so every probe finds nothing
            return q.select(
                F.col(self.id_col).alias("probe_id"),
                F.col(self.id_col).alias("match_id"),
            ).limit(0)
        return (
            q.select(F.col(self.id_col).alias("probe_id"), "band", "bucket")
            .join(
                corp.select(F.col(self.id_col).alias("match_id"),
                            "band", "bucket"),
                on=["band", "bucket"],
            )
            .select("probe_id", "match_id")
            .distinct()
        )

    def drop(self) -> None:
        if self.io.exists(self._bands):
            self.io.drop(self._bands, check_first=True)


class ExactIndex:
    """Persisted EXACT-duplicate fingerprint index — the cheap sibling of
    :class:`MinHashIndex` for cross-release ingest dedup ("has this byte
    content, after normalization, ever been committed?").

    Fingerprint = ``md5(normalized_text(text))`` — the identical key
    :func:`~spider_spark.operators.dedupe.exact_duplicates` groups on, so
    index verdicts agree with the one-shot sweep by construction. Rows are
    Hive-partitioned by ``bkt = md5_60(fingerprint) % n_parts``; a probe
    computes the batch's fingerprints (a batch-sized projection — no
    shingles, no signatures), collects its ≤ |batch| distinct partition
    ids, and scans only those partitions.

    :meth:`probe_hits` is the gate-shaped entry point: a LEFT SEMI join,
    so a fingerprint duplicated B times in the corpus costs B *scanned*
    rows in one partition but emits one verdict — no pair fan-out. Use
    :meth:`probe` when the caller needs the matching ids (audit trails);
    its output is bounded by duplicate multiplicity, which is the honest
    size of that answer.
    """

    def __init__(self, io: TableIO, name: str = "exx",
                 id_col: str = "doc_id", text_col: str = "text",
                 n_parts: int = 64):
        self.io = io
        self.name = name
        self.id_col = id_col
        self.text_col = text_col
        self.n_parts = n_parts

    @property
    def _fps(self) -> str:
        return f"{self.name}_fps"

    def exists(self) -> bool:
        return self.io.exists(self._fps)

    def _fingerprints(self, docs: DataFrame) -> DataFrame:
        return docs.select(
            F.col(self.id_col),
            F.md5(normalized_text(F.col(self.text_col))).alias("fingerprint"),
        ).withColumn(
            "bkt", F.pmod(md5_60(F.col("fingerprint")), F.lit(self.n_parts))
        )

    def build(self, corpus: DataFrame) -> dict:
        """One projection pass over the corpus → partitioned commit."""
        meta = {"n_parts": int(self.n_parts)}
        self.io.commit_overwrite(self._fps, self._fingerprints(corpus),
                                 partition_by="bkt", meta=meta)
        return meta

    def add(self, batch: DataFrame) -> None:
        """O(batch) delta commit (same manifest fast-append as
        :meth:`MinHashIndex.add`). Refetches append a second identical
        (id, fingerprint) row; :meth:`probe`'s DISTINCT collapses them."""
        out = self._fingerprints(batch).localCheckpoint(eager=True)
        if out.isEmpty():
            return
        self.io.append(self._fps, out, partition_by="bkt",
                       meta={"n_parts": int(self.n_parts)})

    def _pruned(self, q: DataFrame) -> DataFrame | None:
        ids = sorted(r["bkt"] for r in q.select("bkt").distinct().collect())
        try:
            return self.io.read(self._fps).filter(F.col("bkt").isin(ids))
        except AnalysisException:
            return None  # empty index (no data files yet)

    def probe(self, batch: DataFrame) -> DataFrame:
        """``(probe_id, match_id)`` pairs with identical fingerprints."""
        q = self._fingerprints(batch).localCheckpoint(eager=True)
        corp = self._pruned(q)
        if corp is None:
            return q.select(
                F.col(self.id_col).alias("probe_id"),
                F.col(self.id_col).alias("match_id"),
            ).limit(0)
        return (
            q.select(F.col(self.id_col).alias("probe_id"), "fingerprint")
            .join(corp.select(F.col(self.id_col).alias("match_id"),
                              "fingerprint"), on="fingerprint")
            .select("probe_id", "match_id")
            .distinct()
        )

    def probe_hits(self, batch: DataFrame) -> DataFrame:
        """Distinct batch ids whose fingerprint exists in the index — the
        zero-fan-out gate form (left-semi; multiplicity never explodes)."""
        q = self._fingerprints(batch).localCheckpoint(eager=True)
        corp = self._pruned(q)
        if corp is None:
            return q.select(F.col(self.id_col).alias("probe_id")).limit(0)
        return (
            q.join(corp.select("fingerprint"), on="fingerprint",
                   how="left_semi")
            .select(F.col(self.id_col).alias("probe_id"))
            .distinct()
        )

    def drop(self) -> None:
        if self.io.exists(self._fps):
            self.io.drop(self._fps, check_first=True)


def exact_probe_sql(corpus_pred: str, probe_pred: str,
                    table: str = "documents", id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    """DuckDB mirror of ``ExactIndex.build(corpus) + probe(batch)`` over
    predicate-defined slices of ``table`` (same normalization + md5 key)."""
    norm = NORM_SQL.format(x=text_col)
    return f"""
    WITH fps AS (SELECT {id_col}, md5({norm}) AS fingerprint FROM {table}),
    corpus AS (SELECT * FROM fps WHERE {corpus_pred}),
    probe AS (SELECT * FROM fps WHERE {probe_pred})
    SELECT DISTINCT p.{id_col} AS probe_id, c.{id_col} AS match_id
    FROM probe p JOIN corpus c USING (fingerprint)
    """


def minhash_probe_sql(corpus_pred: str, probe_pred: str, n: int = 3,
                      table: str = "documents", id_col: str = "doc_id",
                      text_col: str = "text", max_bucket: int = 200) -> str:
    """DuckDB mirror of ``MinHashIndex.build(corpus) + probe(batch)`` where
    corpus and batch are predicate-defined slices of ``table``: identical
    signatures/banding, the hot-bucket drop computed over the CORPUS side
    only (the build-time guard), cross-set join."""
    return f"""
    WITH {banded_keys_sql(n=n, table=table, id_col=id_col, text_col=text_col)},
    corpus AS (SELECT * FROM banded_all WHERE {corpus_pred}),
    corpus_ok AS (
      SELECT * FROM corpus WHERE (band, bucket) NOT IN (
        SELECT (band, bucket) FROM corpus GROUP BY band, bucket
        HAVING count(*) > {max_bucket})
    ),
    probe AS (SELECT * FROM banded_all WHERE {probe_pred})
    SELECT DISTINCT p.{id_col} AS probe_id, c.{id_col} AS match_id
    FROM probe p JOIN corpus_ok c USING (band, bucket)
    """
