"""Persisted IVF index: build/search parity with the inline kmeans probe,
planning-time partition pruning of the inverted lists, and atomic rebuild
through the manifest."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spider_spark.operators.ivf_index import IVFIndex
from spider_spark.operators.similarity import _ivf_topk_pandas, kmeans_centroids
from spider_spark.sources.tableio import ParquetManifestIO


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def built(spark, emb, tmp_path_factory):
    io = ParquetManifestIO(spark, str(tmp_path_factory.mktemp("ivf")))
    idx = IVFIndex(io, "test")
    C = idx.build(emb, n_centroids=8, n_iters=3)
    return io, idx, C


class TestBuildSearch:
    def test_search_matches_inline_kmeans_probe(self, emb, built):
        # same deterministic training → the persisted index must return
        # exactly what the inline path computes from scratch
        _, idx, C = built
        queries = emb.filter(F.col("vec_id") < 5)
        want = {
            (r["qid"], r["rank"]): (r["nid"], r["cos_sim"])
            for r in _ivf_topk_pandas(emb, queries, 5, C, 2,
                                      "vec_id", "embedding").collect()
        }
        got = {
            (r["qid"], r["rank"]): (r["nid"], r["cos_sim"])
            for r in idx.search(queries, k=5, nprobe=2).collect()
        }
        assert got == want

    def test_centroids_roundtrip(self, built):
        _, idx, C = built
        np.testing.assert_allclose(idx.centroids(), C)

    def test_training_is_deterministic(self, emb, built):
        _, _, C = built
        C2 = kmeans_centroids(emb, n_centroids=8, n_iters=3)
        np.testing.assert_array_equal(C, C2)


class TestPartitionPruning:
    def test_probe_reads_only_probed_lists(self, built):
        io, idx, _ = built
        full = io.read(idx._lists)
        # the partition column survives the manifest read
        assert "list_id" in full.columns
        probed = full.filter(F.col("list_id").isin([0, 3]))
        plan = probed._jdf.queryExecution().executedPlan().toString()
        # planning-time pruning: the IN lands in PartitionFilters (Hive
        # partition dirs), NOT in DataFilters/PushedFilters (row groups)
        scan = next(l for l in plan.splitlines() if "FileScan" in l)
        assert "PartitionFilters: [list_id" in scan, scan
        assert "DataFilters: []" in scan, scan
        # and it actually restricts the rows to the two probed lists
        per_list = {
            r["list_id"]: r["count"]
            for r in full.groupBy("list_id").count().collect()
        }
        assert probed.count() == per_list.get(0, 0) + per_list.get(3, 0)
        assert probed.count() < full.count()


class TestRebuild:
    def test_rebuild_is_atomic_versioned(self, spark, emb, tmp_path):
        io = ParquetManifestIO(spark, str(tmp_path))
        idx = IVFIndex(io, "r")
        idx.build(emb, n_centroids=4, n_iters=1)
        v1 = io.current_version(idx._lists)
        idx.build(emb, n_centroids=8, n_iters=2)
        assert io.current_version(idx._lists) > v1
        assert io.latest_meta(idx._lists)["n_centroids"] == 8
        assert len(idx.centroids()) == 8
        q = emb.filter(F.col("vec_id") < 2)
        assert idx.search(q, k=3, nprobe=1).count() == 2 * 3
        idx.drop()
        assert not idx.exists()


class TestIncrementalAdd:
    def test_full_probe_on_grown_index_is_exact(self, spark, emb, tmp_path):
        from spider_spark.operators.similarity import cosine_topk

        io = ParquetManifestIO(spark, str(tmp_path / "inc"))
        idx = IVFIndex(io, "inc")
        idx.build(emb.filter(F.col("vec_id") % 2 == 0), n_centroids=8, n_iters=2)
        idx.add(emb.filter(F.col("vec_id") % 2 == 1))
        q = emb.filter(F.col("vec_id") < 5)
        got = [tuple(r) for r in idx.search(q, k=5, nprobe=8).collect()]
        want = [tuple(r) for r in cosine_topk(emb, q, k=5).collect()]
        assert got == want, "full probe over grown index = brute force on the union"

    def test_added_rows_share_partition_layout(self, spark, emb, tmp_path):
        io = ParquetManifestIO(spark, str(tmp_path / "lay"))
        idx = IVFIndex(io, "lay")
        idx.build(emb.filter(F.col("vec_id") % 2 == 0), n_centroids=8, n_iters=2)
        idx.add(emb.filter(F.col("vec_id") % 2 == 1))
        lists = io.read(idx._lists)
        assert lists.count() == emb.count()
        # pruning still plans on the partition column over both versions
        pr = lists.filter(F.col("list_id").isin([0, 1]))
        plan = pr._jdf.queryExecution().executedPlan().toString()
        scan = next(l for l in plan.splitlines() if "FileScan" in l)
        assert "PartitionFilters: [list_id" in scan, scan
        assert pr.count() < emb.count()

    def test_empty_add_commits_nothing(self, spark, emb, tmp_path):
        io = ParquetManifestIO(spark, str(tmp_path / "emp"))
        idx = IVFIndex(io, "emp")
        idx.build(emb.limit(40), n_centroids=4, n_iters=2)
        v = io.current_version(idx._lists)
        idx.add(emb.limit(0))
        assert io.current_version(idx._lists) == v
