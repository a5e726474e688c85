"""Persisted BM25 postings index: search parity with the inline operator,
planning-time term-bucket partition pruning, and index-backed hybrid
retrieval parity (VERDICT r3 findings #4/#5)."""

import pytest
from pyspark.sql import functions as F

from spider_spark.operators.ivf_index import IVFIndex
from spider_spark.operators.lexindex import LexicalIndex, _bucket_of
from spider_spark.operators.search import bm25_topk, hybrid_topk
from spider_spark.sources.tableio import ParquetManifestIO

QUERY = ["spark", "join", "window", "vector"]


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def built(spark, docs, tmp_path_factory):
    io = ParquetManifestIO(spark, str(tmp_path_factory.mktemp("lex")))
    idx = LexicalIndex(io, "test", n_buckets=16)
    stats = idx.build(docs)
    return io, idx, stats


class TestBuildSearch:
    def test_search_matches_inline_bm25(self, docs, built):
        _, idx, _ = built
        want = [
            (r["doc_id"], r["n_matched"], r["score"])
            for r in bm25_topk(docs, QUERY, k=15).collect()
        ]
        got = [
            (r["doc_id"], r["n_matched"], r["score"])
            for r in idx.search(QUERY, k=15).collect()
        ]
        assert got == want

    def test_single_term_and_missing_term(self, docs, built):
        _, idx, _ = built
        for q in (["spark"], ["spark", "zzzznotaterm"]):
            want = [tuple(r) for r in bm25_topk(docs, q, k=5).collect()]
            got = [tuple(r) for r in idx.search(q, k=5).collect()]
            assert got == want

    def test_stats_match_corpus(self, docs, built):
        _, _, stats = built
        assert stats["n_docs"] == docs.count()

    def test_bucket_mirror_agrees_with_jvm(self, spark, built):
        # the driver-side bucket computation must match the Column expr
        # the build partitioned by — otherwise pruning silently drops terms
        from spider_spark.operators.dedupe import md5_60

        _, idx, _ = built
        terms = ["spark", "join", "window", "vector", "the", ""]
        jvm = {
            r["t"]: r["b"]
            for r in spark.createDataFrame([(t,) for t in terms], "t string")
            .select("t", F.pmod(md5_60(F.col("t")), F.lit(idx.n_buckets)).alias("b"))
            .collect()
        }
        for t in terms:
            assert _bucket_of(t, idx.n_buckets) == jvm[t], t


class TestPartitionPruning:
    def test_search_reads_only_query_buckets(self, built):
        io, idx, _ = built
        buckets = sorted({_bucket_of(t, idx.n_buckets) for t in QUERY})
        probed = io.read(idx._postings).filter(
            F.col("term_bucket").isin(buckets)
        )
        plan = probed._jdf.queryExecution().executedPlan().toString()
        scan = next(l for l in plan.splitlines() if "FileScan" in l)
        assert "PartitionFilters: [term_bucket" in scan, scan
        assert "DataFilters: []" in scan, scan
        full = io.read(idx._postings)
        assert probed.count() < full.count()


class TestHybridIndexed:
    def test_full_probe_indexed_hybrid_matches_inline(self, spark, docs, emb,
                                                      built, tmp_path_factory):
        # lexical index is exact; IVF at nprobe == n_centroids probes every
        # list — the indexed hybrid must equal the inline full-scan hybrid
        _, lex_idx, _ = built
        ivf_io = ParquetManifestIO(spark, str(tmp_path_factory.mktemp("ivf")))
        ivf = IVFIndex(ivf_io, "h")
        ivf.build(emb, n_centroids=8, n_iters=2)
        want = [tuple(r) for r in hybrid_topk(
            docs, emb, QUERY, 3, k_each=20, k=10
        ).collect()]
        got = [tuple(r) for r in hybrid_topk(
            docs, emb, QUERY, 3, k_each=20, k=10,
            lex_index=lex_idx, sem_index=ivf, nprobe=8,
        ).collect()]
        assert got == want

    def test_reduced_probe_overlaps(self, spark, docs, emb, built,
                                    tmp_path_factory):
        _, lex_idx, _ = built
        ivf_io = ParquetManifestIO(spark, str(tmp_path_factory.mktemp("ivf2")))
        ivf = IVFIndex(ivf_io, "h2")
        ivf.build(emb, n_centroids=8, n_iters=2)
        want = {r["doc_id"] for r in hybrid_topk(
            docs, emb, QUERY, 3, k_each=20, k=10
        ).collect()}
        got = {r["doc_id"] for r in hybrid_topk(
            docs, emb, QUERY, 3, k_each=20, k=10,
            lex_index=lex_idx, sem_index=ivf, nprobe=4,
        ).collect()}
        assert len(got & want) >= 6, (got, want)


class TestRebuild:
    def test_rebuild_is_atomic_versioned(self, spark, docs, tmp_path):
        io = ParquetManifestIO(spark, str(tmp_path))
        idx = LexicalIndex(io, "r", n_buckets=8)
        idx.build(docs.limit(50))
        v1 = io.current_version(idx._postings)
        idx.build(docs)
        assert io.current_version(idx._postings) > v1
        assert io.latest_meta(idx._stats)["n_docs"] == docs.count()
        assert idx.search(["spark"], k=3).count() <= 3
        idx.drop()
        assert not idx.exists()


class TestIncrementalAdd:
    def test_grown_index_matches_one_shot_build(self, spark, docs, tmp_path):
        io = ParquetManifestIO(spark, str(tmp_path / "inc"))
        idx = LexicalIndex(io, "inc", n_buckets=8)
        even = docs.filter(F.col("doc_id") % 2 == 0)
        odd = docs.filter(F.col("doc_id") % 2 == 1)
        idx.build(even)
        stats = idx.add(odd)
        assert stats["n_docs"] == docs.count()
        assert stats["dirty_termstats"] is True
        want = [tuple(r) for r in bm25_topk(docs, QUERY, k=15).collect()]
        got = [tuple(r) for r in idx.search(QUERY, k=15).collect()]
        assert got == want, "incrementally-grown index must score bit-identically"

    def test_compact_is_purely_physical(self, spark, docs, tmp_path):
        io = ParquetManifestIO(spark, str(tmp_path / "cmp"))
        idx = LexicalIndex(io, "cmp", n_buckets=8)
        idx.build(docs.filter(F.col("doc_id") % 3 == 0))
        idx.add(docs.filter(F.col("doc_id") % 3 != 0))
        before = [tuple(r) for r in idx.search(QUERY, k=15).collect()]
        stats = idx.compact()
        assert stats["dirty_termstats"] is False
        assert stats["n_docs"] == docs.count()
        after = [tuple(r) for r in idx.search(QUERY, k=15).collect()]
        assert after == before
        # compacted search is also parity with the inline operator
        want = [tuple(r) for r in bm25_topk(docs, QUERY, k=15).collect()]
        assert after == want

    def test_add_prunes_appended_partitions(self, spark, docs, tmp_path):
        io = ParquetManifestIO(spark, str(tmp_path / "prn"))
        idx = LexicalIndex(io, "prn", n_buckets=8)
        idx.build(docs.filter(F.col("doc_id") < 100))
        idx.add(docs.filter(F.col("doc_id") >= 100))
        buckets = sorted({_bucket_of(t, idx.n_buckets) for t in QUERY})
        probed = io.read(idx._postings).filter(F.col("term_bucket").isin(buckets))
        plan = probed._jdf.queryExecution().executedPlan().toString()
        scan = next(l for l in plan.splitlines() if "FileScan" in l)
        assert "PartitionFilters: [term_bucket" in scan, scan
        assert probed.count() < io.read(idx._postings).count()

    def test_empty_add_commits_nothing(self, spark, docs, tmp_path):
        io = ParquetManifestIO(spark, str(tmp_path / "emp"))
        idx = LexicalIndex(io, "emp", n_buckets=8)
        idx.build(docs.limit(20))
        v = io.current_version(idx._postings)
        stats = idx.add(docs.limit(0))
        assert io.current_version(idx._postings) == v
        assert stats["n_docs"] == 20 and not stats.get("dirty_termstats")
