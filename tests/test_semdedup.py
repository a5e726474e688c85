"""SemDeDup tests: DuckDB-mirror parity (literal-centroid mode), the
keep-the-outlier rule on a constructed cluster fixture, the hot-cluster
guard, and kmeans-mode determinism + semantics vs a NumPy reference."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from spider_spark.operators.semdedup import semdedup_flags, semdedup_sql

THRESHOLD = 0.4  # the driver-contract near-dup threshold


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def _mirror(emb, **kw):
    con = duckdb.connect()
    con.register("embeddings", emb.toPandas())
    return set(map(tuple, con.execute(semdedup_sql(dim=64, **kw)).fetchall()))


class TestOracleParity:
    def test_matches_duckdb_mirror(self, emb):
        got = {
            tuple(r)
            for r in semdedup_flags(emb, threshold=THRESHOLD,
                                    n_centroids=8).collect()
        }
        want = _mirror(emb, threshold=THRESHOLD, n_centroids=8)
        assert got == want
        removed = {t[0] for t in got if not t[3]}
        assert removed, "fixture corpus must exercise removals"
        assert len(got) == emb.count(), "every document gets a verdict"

    def test_guard_matches_mirror_when_it_fires(self, emb):
        # cap below the largest cluster so at least one cluster opts out
        sizes = (
            semdedup_flags(emb, threshold=THRESHOLD, n_centroids=8)
            .groupBy("cluster").count().collect()
        )
        cap = max(r["count"] for r in sizes) - 1
        got = {
            tuple(r)
            for r in semdedup_flags(emb, threshold=THRESHOLD, n_centroids=8,
                                    max_cluster=cap).collect()
        }
        want = _mirror(emb, threshold=THRESHOLD, n_centroids=8,
                       max_cluster=cap)
        assert got == want
        # recall-safe drift: the guard only ever ADDS keepers
        unguarded_kept = {
            t[0]
            for t in _mirror(emb, threshold=THRESHOLD, n_centroids=8)
            if t[3]
        }
        assert unguarded_kept <= {t[0] for t in got if t[3]}


class TestKeepRule:
    """Constructed 2-cluster corpus (dim 4, centroids = vectors 0 and 1):
    cluster 0 holds a near-dup chain where vector 3 is the farthest from
    the centroid (must be THE survivor); cluster 1 holds a cent_sim tie
    (5 vs 6 — higher id loses)."""

    VECS = {
        0: [1.0, 0.0, 0.0, 0.0],    # centroid 0 (cent_sim 1.0)
        1: [0.0, 1.0, 0.0, 0.0],    # centroid 1 (cent_sim 1.0)
        2: [0.9, 0.1, 0.0, 0.0],    # ~c0: pairs with 0 (.9939) and 3 (.9909)
        3: [0.8, 0.2, 0.01, 0.0],   # ~c0: lowest cent_sim (.9701); (0,3)=.9701 < τ
        4: [0.3, 0.85, 0.0, 0.0],   # ~c1: below τ against 1/5/6 — always kept
        5: [0.0, 0.9, 0.03, 0.0],   # ~c1: cent_sim .999445 ties with 6; (5,6)=.9978
        6: [0.0, 0.9, -0.03, 0.0],  # ~c1: tie loser (higher id)
    }
    TAU = 0.99

    @pytest.fixture()
    def df(self, spark):
        return spark.createDataFrame(
            [(i, v) for i, v in sorted(self.VECS.items())],
            "vec_id long, embedding array<float>",
        )

    def _flags(self, df, **kw):
        rows = semdedup_flags(df, n_centroids=2, **kw).collect()
        return {r["vec_id"]: r for r in rows}

    def test_outlier_survives_chain(self, df):
        got = self._flags(df, threshold=self.TAU)
        # cluster 0: 2 removes 0, 3 removes 2; cluster 1: 5 removes 1
        # (centroid vectors always lose — cent_sim 1.0), 5's tie removes 6
        assert {i for i, r in got.items() if not r["kept"]} == {0, 1, 2, 6}
        # cluster sanity: 0/2/3 with centroid 0, the rest with centroid 1
        assert {i for i, r in got.items() if r["cluster"] == 0} == {0, 2, 3}
        # 3 survives because its cent_sim is the chain's lowest
        assert got[3]["cent_sim"] < got[2]["cent_sim"] < got[0]["cent_sim"]

    def test_cent_sim_tie_removes_higher_id(self, df):
        got = self._flags(df, threshold=self.TAU)
        assert got[5]["cent_sim"] == got[6]["cent_sim"]
        assert got[5]["kept"] and not got[6]["kept"]

    def test_fixture_matches_mirror(self, df):
        got = {tuple(r) for r in semdedup_flags(df, threshold=self.TAU,
                                                n_centroids=2).collect()}
        con = duckdb.connect()
        con.register("embeddings", df.toPandas())
        want = set(map(tuple, con.execute(
            semdedup_sql(threshold=self.TAU, n_centroids=2, dim=4)
        ).fetchall()))
        assert got == want

    def test_hot_cluster_guard_keeps_members(self, df):
        # cluster 1 has 4 members, cluster 0 has 3: cap=3 exempts only
        # cluster 1 — its losers (1, 6) are now kept, cluster 0 unchanged
        got = self._flags(df, threshold=self.TAU, max_cluster=3)
        assert {i for i, r in got.items() if not r["kept"]} == {0, 2}


class TestPlanShape:
    def test_literal_mode_jvm_only_cluster_keyed(self, emb):
        plan = (
            semdedup_flags(emb, threshold=THRESHOLD, n_centroids=4,
                           max_cluster=100_000)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # literal-centroid mode is pure JVM: assignment is a constant-folded
        # projection, never a Python/Arrow eval node
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # the pair join is keyed on cluster (Σ|cluster|² candidate volume,
        # never a cartesian), and the hot-cluster guard is a broadcast
        # anti-join — the small side never shuffles the corpus
        assert "hashpartitioning(cluster" in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


class TestKMeansMode:
    def test_deterministic(self, emb):
        a = sorted(map(tuple, semdedup_flags(
            emb, threshold=THRESHOLD, n_centroids=8, centroids_as="kmeans"
        ).collect()))
        b = sorted(map(tuple, semdedup_flags(
            emb, threshold=THRESHOLD, n_centroids=8, centroids_as="kmeans"
        ).collect()))
        assert a == b

    def test_semantics_vs_numpy(self, emb):
        rows = semdedup_flags(emb, threshold=THRESHOLD, n_centroids=8,
                              centroids_as="kmeans").collect()
        ids = np.array([r["vec_id"] for r in rows])
        raw = {
            r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.select("vec_id", "embedding").collect()
        }
        X = np.array([raw[i] for i in ids])
        nrm = np.linalg.norm(X, axis=1)
        cos = np.round((X @ X.T) / np.outer(nrm, nrm), 6)
        cluster = np.array([r["cluster"] for r in rows])
        cent = np.array([r["cent_sim"] for r in rows])
        kept = np.array([r["kept"] for r in rows])
        removed_any = False
        for i in range(len(ids)):
            same = (cluster == cluster[i]) & (ids != ids[i])
            dup = same & (cos[i] >= THRESHOLD)
            # removed iff some duplicate outranks it under (cent_sim, id)
            outranked = dup & (
                (cent < cent[i]) | ((cent == cent[i]) & (ids < ids[i]))
            )
            assert kept[i] == (not outranked.any()), ids[i]
            removed_any = removed_any or not kept[i]
        assert removed_any, "kmeans mode must exercise removals too"

    def test_rejects_unknown_mode(self, emb):
        with pytest.raises(ValueError, match="centroids_as"):
            semdedup_flags(emb, centroids_as="nope")


class TestKMeansQualityPin:
    """Quality pin for the production (kmeans) path against the
    oracle-checked literal-centroid mode — the IVF-recall-style bound
    the r4 verdict asked for: on a corpus with genuine cluster
    structure, per-document keep/remove verdicts from the two modes
    must agree on ≥ PIN of documents (cluster IDs are mode-relative
    label permutations, so only the verdicts compare).

    Fixture: 4 well-separated unit directions in dim 16; ids 0..3 ARE
    the directions (so literal mode's lowest-id centroids coincide with
    the true centers), and each cluster holds 24 deterministic small
    perturbations including planted near-dup pairs. kmeans trained on
    this corpus recovers (approximately) the same centers, so verdicts
    agree except at cluster-boundary/tie artifacts — bounded by PIN."""

    PIN = 0.90
    TAU = 0.95

    @pytest.fixture(scope="class")
    def clustered(self, spark):
        rng = np.random.RandomState(7)
        dim, K, per = 16, 4, 24
        dirs = np.zeros((K, dim))
        for k in range(K):
            dirs[k, 4 * k: 4 * k + 4] = [1.0, 0.6, 0.3, 0.1]
        dirs /= np.linalg.norm(dirs, axis=1)[:, None]
        rows = []
        for k in range(K):
            rows.append((k, [float(x) for x in dirs[k]]))
        nid = K
        for k in range(K):
            for j in range(per):
                base = dirs[k] + 0.05 * rng.randn(dim)
                rows.append((nid, [float(x) for x in base]))
                nid += 1
                if j % 4 == 0:  # planted near-dup of the point above
                    rows.append((
                        nid,
                        [float(x) for x in base + 0.001 * rng.randn(dim)],
                    ))
                    nid += 1
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        ).cache()

    def test_kmeans_flags_agree_with_literal_mode(self, clustered):
        lit = {
            r["vec_id"]: r["kept"]
            for r in semdedup_flags(clustered, threshold=self.TAU,
                                    n_centroids=4).collect()
        }
        km = {
            r["vec_id"]: r["kept"]
            for r in semdedup_flags(clustered, threshold=self.TAU,
                                    n_centroids=4,
                                    centroids_as="kmeans").collect()
        }
        assert set(lit) == set(km)
        agree = sum(lit[i] == km[i] for i in lit) / len(lit)
        assert agree >= self.PIN, f"verdict agreement {agree:.3f} < {self.PIN}"
        # both modes must actually remove the planted near-dups
        assert sum(not v for v in lit.values()) >= 10
        assert sum(not v for v in km.values()) >= 10
