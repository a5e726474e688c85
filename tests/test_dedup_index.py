"""Persisted MinHash-LSH index: probe semantics, pruning, hot-bucket guard."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_spark.operators.dedup_index import (
    ExactIndex,
    MinHashIndex,
    exact_probe_sql,
    minhash_probe_sql,
)
from spider_spark.sources.tableio import ParquetManifestIO


def _doc(i: int, text: str) -> tuple:
    return (i, text)


BASE = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
OTHER = "completely different subject matter about spark shuffle partitions and codegen"


@pytest.fixture(scope="module")
def io(spark, tmp_path_factory):
    return ParquetManifestIO(spark, str(tmp_path_factory.mktemp("mhx_store")))


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [_doc(i, f"{BASE} filler{i}") for i in range(20)]          # near-dup family
    rows += [_doc(100 + i, f"{OTHER} variant {i} " + "x " * i) for i in range(10)]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


@pytest.fixture(scope="module")
def built(io, corpus):
    idx = MinHashIndex(io, n_parts=8)
    meta = idx.build(corpus)
    return idx, meta


class TestProbe:
    def test_near_copy_matches_unrelated_does_not(self, spark, built):
        idx, _ = built
        batch = spark.createDataFrame(
            [
                _doc(900, f"{BASE} filler900"),  # near-copy of the family
                _doc(901, "utterly unrelated text with zero shared shingles at all here"),
            ],
            "doc_id long, text string",
        )
        got = idx.probe(batch).collect()
        by = {}
        for r in got:
            by.setdefault(r["probe_id"], set()).add(r["match_id"])
        assert 900 in by and by[900] <= set(range(20)) and by[900]
        assert 901 not in by

    def test_probe_ids_never_matched_against_each_other(self, spark, built):
        idx, _ = built
        batch = spark.createDataFrame(
            [_doc(910, f"{BASE} a"), _doc(911, f"{BASE} a")],
            "doc_id long, text string",
        )
        got = idx.probe(batch).collect()
        assert all(r["match_id"] < 100 or r["match_id"] >= 100 for r in got)
        assert not any(r["match_id"] in (910, 911) for r in got)


class TestMirrorParity:
    def test_matches_duckdb_mirror_on_split(self, spark, io, corpus):
        # index 2/3 of the docs, probe with the other 1/3 — the exact
        # shape of the driver query, on this richer fixture
        idx = MinHashIndex(io, name="par", n_parts=8)
        idx.build(corpus.filter(F.col("doc_id") % 3 != 0))
        got = {
            tuple(r)
            for r in idx.probe(corpus.filter(F.col("doc_id") % 3 == 0)).collect()
        }
        con = duckdb.connect()
        con.register("t", corpus.toPandas())
        sql = minhash_probe_sql("doc_id % 3 <> 0", "doc_id % 3 = 0", table="t")
        want = set(con.execute(sql).fetchall())
        assert got == want and got


class TestPartitionPruning:
    def test_probe_scans_only_batch_buckets(self, spark, built):
        idx, _ = built
        from spider_spark.operators.dedupe import banded_keys, md5_60

        batch = spark.createDataFrame(
            [_doc(920, f"{BASE} filler920")], "doc_id long, text string"
        )
        ids = sorted(
            r["bkt"]
            for r in banded_keys(batch)
            .select(F.pmod(md5_60(F.col("bucket")), F.lit(idx.n_parts)).alias("bkt"))
            .distinct()
            .collect()
        )
        pruned = idx.io.read(idx._bands).filter(F.col("bkt").isin(ids))
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        scan = next(l for l in plan.splitlines() if "FileScan" in l)
        assert "PartitionFilters: [bkt" in scan, scan
        assert "DataFilters: []" in scan, scan
        assert pruned.count() < idx.io.read(idx._bands).count()


class TestIncrementalAdd:
    """add(): O(batch) delta commits extend the probe target set without
    rewriting the corpus index (the ingest-time path ContinuousCrawler's
    dedup gate appends each wave's surviving content through)."""

    def test_add_extends_probe_targets(self, spark, io, corpus):
        idx = MinHashIndex(io, name="inc", n_parts=8)
        idx.build(corpus.filter(F.col("doc_id") < 100))  # BASE family only
        other_probe = spark.createDataFrame(
            [_doc(950, f"{OTHER} variant 3 x x x")], "doc_id long, text string"
        )
        assert idx.probe(other_probe).count() == 0
        idx.add(corpus.filter(F.col("doc_id") >= 100))   # OTHER variants
        got = {r["match_id"] for r in idx.probe(other_probe).collect()}
        assert got and got <= set(range(100, 110))
        # pre-add content still indexed (old version dirs still referenced)
        base_probe = spark.createDataFrame(
            [_doc(951, f"{BASE} filler951")], "doc_id long, text string"
        )
        assert idx.probe(base_probe).count() > 0

    def test_add_is_delta_commit_and_empty_add_is_noop(self, spark, io, corpus):
        idx = MinHashIndex(io, name="inc2", n_parts=8)
        idx.build(corpus.filter(F.col("doc_id") < 100))
        h0 = io.history(idx._bands)
        idx.add(corpus.filter(F.col("doc_id") >= 100))
        h1 = io.history(idx._bands)
        assert h1[-1]["mode"] == "append"
        assert h1[-1]["dirs"][:-1] == h0[-1]["dirs"], "delta references base"
        idx.add(corpus.limit(0))
        assert io.current_version(idx._bands) == h1[-1]["version"], \
            "empty add must not commit a version"

    def test_added_partitions_still_prune(self, spark, io, corpus):
        idx = MinHashIndex(io, name="inc3", n_parts=8)
        idx.build(corpus.filter(F.col("doc_id") < 100))
        idx.add(corpus.filter(F.col("doc_id") >= 100))
        pruned = io.read(idx._bands).filter(F.col("bkt").isin([0, 1]))
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        scans = [l for l in plan.splitlines() if "FileScan" in l]
        assert len(scans) == 2, "one scan per version dir"
        assert all("PartitionFilters: [bkt" in s for s in scans), plan

    def test_build_then_add_equals_mirror_when_nothing_hot(self, spark, io, corpus):
        idx = MinHashIndex(io, name="inc4", n_parts=8)
        idx.build(corpus.filter(F.col("doc_id") % 3 == 1))
        idx.add(corpus.filter(F.col("doc_id") % 3 == 2))
        got = {
            tuple(r)
            for r in idx.probe(corpus.filter(F.col("doc_id") % 3 == 0)).collect()
        }
        con = duckdb.connect()
        con.register("t", corpus.toPandas())
        sql = minhash_probe_sql("doc_id % 3 <> 0", "doc_id % 3 = 0", table="t")
        want = set(con.execute(sql).fetchall())
        assert got == want and got


class TestHotBucketGuard:
    def test_hot_bucket_dropped_at_build(self, spark, io):
        # 30 byte-identical docs: every band bucket holds 30 > max_bucket=10
        clones = spark.createDataFrame(
            [_doc(i, BASE) for i in range(30)], "doc_id long, text string"
        )
        idx = MinHashIndex(io, name="hot", n_parts=8, max_bucket=10)
        idx.build(clones)
        # the committed index holds zero band rows; probe handles the
        # schema-less empty snapshot and finds nothing
        probe = spark.createDataFrame([_doc(99, BASE)], "doc_id long, text string")
        out = idx.probe(probe)
        assert out.columns == ["probe_id", "match_id"]
        assert out.count() == 0


class TestExactIndex:
    """Persisted exact-fingerprint index: mirror parity across a
    predicate split, normalization-insensitive matching, delta adds,
    the zero-fan-out probe_hits gate form, partition pruning."""

    @pytest.fixture(scope="class")
    def edocs(self, spark):
        rows = [_doc(i, f"unique text number {i} with its own words") for i in range(10)]
        # 10..14: exact dups of 0..4 after normalization (case + spacing)
        rows += [_doc(10 + i, f"  Unique   TEXT number {i} with its OWN words ")
                 for i in range(5)]
        return spark.createDataFrame(rows, "doc_id long, text string").cache()

    def test_probe_matches_mirror_across_split(self, spark, io, edocs):
        idx = ExactIndex(io, name="ex1", n_parts=8)
        idx.build(edocs.filter(F.col("doc_id") < 10))
        got = {tuple(r) for r in idx.probe(edocs.filter(F.col("doc_id") >= 10)).collect()}
        con = duckdb.connect()
        con.register("t", edocs.toPandas())
        want = set(con.execute(
            exact_probe_sql("doc_id < 10", "doc_id >= 10", table="t")
        ).fetchall())
        assert got == want
        assert got == {(10 + i, i) for i in range(5)}, "normalization-exact only"

    def test_probe_hits_is_distinct_probe_side(self, spark, io, edocs):
        idx = ExactIndex(io, name="ex2", n_parts=8)
        idx.build(edocs)  # self-matches included: every doc hits
        hits = idx.probe_hits(edocs.filter(F.col("doc_id") >= 10))
        assert {r["probe_id"] for r in hits.collect()} == set(range(10, 15))
        plan = hits._jdf.queryExecution().executedPlan().toString()
        assert "LeftSemi" in plan, plan

    def test_add_is_delta_and_extends(self, spark, io, edocs):
        idx = ExactIndex(io, name="ex3", n_parts=8)
        idx.build(edocs.filter(F.col("doc_id") < 3))
        h0 = io.history(idx._fps)
        idx.add(edocs.filter((F.col("doc_id") >= 3) & (F.col("doc_id") < 10)))
        h1 = io.history(idx._fps)
        assert h1[-1]["mode"] == "append"
        assert h1[-1]["dirs"][:-1] == h0[-1]["dirs"]
        got = {tuple(r) for r in idx.probe(edocs.filter(F.col("doc_id") >= 10)).collect()}
        assert got == {(10 + i, i) for i in range(5)}
        idx.add(edocs.limit(0))
        assert io.current_version(idx._fps) == h1[-1]["version"]

    def test_probe_scan_is_partition_pruned(self, spark, io, edocs):
        idx = ExactIndex(io, name="ex4", n_parts=64)
        idx.build(edocs.filter(F.col("doc_id") < 10))
        probe = idx.probe(edocs.filter(F.col("doc_id") == 10))
        plan = probe._jdf.queryExecution().executedPlan().toString()
        scans = [l for l in plan.splitlines()
                 if "FileScan" in l and "ex4_fps" in l]
        import re
        assert scans and all(
            re.search(r"PartitionFilters: \[[^\]]*bkt", s) for s in scans
        ), plan

    def test_empty_index_finds_nothing(self, spark, io, edocs):
        idx = ExactIndex(io, name="ex5", n_parts=8)
        idx.build(edocs.limit(0))
        out = idx.probe(edocs.limit(3))
        assert out.columns == ["probe_id", "match_id"] and out.count() == 0
        assert idx.probe_hits(edocs.limit(3)).count() == 0
