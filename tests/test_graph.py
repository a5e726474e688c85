"""Graph operators: connected components + integer fixed-point PageRank.

Both are verified against independent references that share no code with
the operators: a pure-Python union-find for components, and a pure-Python
integer PageRank replaying the exact fixed-point arithmetic. The driver's
DuckDB oracles (`dup_clusters`, `host_pagerank`) add the cross-engine
check; these tests pin semantics and convergence behavior."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from spider_spark.operators.graph import (
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_SCALE,
    connected_components,
    pagerank,
)


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min id of component
    comps = {}
    for x in list(parent):
        comps.setdefault(find(x), []).append(x)
    out = {}
    for members in comps.values():
        lo = min(members)
        for m in members:
            out[m] = lo
    return out


def _reference_pagerank(edges, n_iter):
    """Integer fixed-point mirror of operators.graph.pagerank."""
    from collections import Counter

    wed = Counter(edges)
    deg = Counter(s for s, _ in edges)
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    base = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // (PR_DAMP_DEN * n)
    rank = {v: PR_SCALE // n for v in nodes}
    for _ in range(n_iter):
        inc = {v: 0 for v in nodes}
        for (s, d), w in wed.items():
            inc[d] += (rank[s] // deg[s]) * w
        share = sum(rank[v] for v in nodes if v not in deg) // n
        rank = {
            v: base + (PR_DAMP_NUM * (inc[v] + share)) // PR_DAMP_DEN
            for v in nodes
        }
    return rank


class TestConnectedComponents:
    def test_random_graph_matches_union_find(self, spark):
        rng = random.Random(7)
        pairs = sorted(
            {
                tuple(sorted(rng.sample(range(120), 2)))
                for _ in range(90)
            }
        )
        df = spark.createDataFrame(pairs, "id_a long, id_b long")
        got = {r["id"]: r["cluster_id"] for r in connected_components(df).collect()}
        assert got == _union_find(pairs)

    def test_path_graph_needs_log_rounds(self, spark):
        # a 64-node path has diameter 63; pointer jumping must close it
        # well within max_iter=10 (hash-min alone would need ~63 rounds)
        pairs = [(i, i + 1) for i in range(63)]
        df = spark.createDataFrame(pairs, "id_a long, id_b long")
        got = connected_components(df, max_iter=10).collect()
        assert {r["cluster_id"] for r in got} == {0}
        assert len(got) == 64

    def test_empty_pairs(self, spark):
        df = spark.createDataFrame([], "id_a long, id_b long")
        assert connected_components(df).count() == 0

    def test_cluster_of_disjoint_pairs(self, spark):
        pairs = [(10, 4), (7, 2), (9, 9)]
        df = spark.createDataFrame(pairs, "id_a long, id_b long")
        got = {r["id"]: r["cluster_id"] for r in connected_components(df).collect()}
        assert got == {10: 4, 4: 4, 7: 2, 2: 2, 9: 9}


class TestPagerank:
    def test_matches_integer_reference(self, spark):
        edges = [(i % 9, (5 * i + 3) % 9) for i in range(60)] + [(1, 2)] * 7
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["rank_fp"] for r in pagerank(df, n_iter=8).collect()}
        assert got == _reference_pagerank(edges, n_iter=8)

    def test_mass_is_conserved_up_to_truncation(self, spark):
        edges = [(i, (i + 1) % 12) for i in range(12)]
        df = spark.createDataFrame(edges, "src long, dst long")
        total = (
            pagerank(df, n_iter=10)
            .agg(F.sum("rank_fp").alias("t"))
            .collect()[0]["t"]
        )
        # integer division only ever truncates downward, a few units per
        # node per iteration
        assert PR_SCALE * 0.999 <= total <= PR_SCALE

    def test_uniform_cycle_is_uniform(self, spark):
        edges = [(i, (i + 1) % 10) for i in range(10)]
        df = spark.createDataFrame(edges, "src long, dst long")
        ranks = {r["rank_fp"] for r in pagerank(df, n_iter=6).collect()}
        assert len(ranks) == 1  # symmetry ⇒ identical fixed-point ranks

    def test_sink_receiving_extra_links_ranks_higher(self, spark):
        edges = [(i, (i + 1) % 10) for i in range(10)] + [(i, 0) for i in range(1, 10)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["rank_fp"] for r in pagerank(df, n_iter=10).collect()}
        assert got[0] == max(got.values())

    def test_sink_mass_is_redistributed_not_dropped(self, spark):
        # a pure sink graph: every node points at 9, which has no
        # out-edges — without redistribution total mass decays ~0.85^k
        # (VERDICT r3 finding #6); with it mass stays ~scale
        edges = [(i, 9) for i in range(9)]
        df = spark.createDataFrame(edges, "src long, dst long")
        out = pagerank(df, n_iter=10)
        total = out.agg(F.sum("rank_fp").alias("t")).collect()[0]["t"]
        assert PR_SCALE * 0.999 <= total <= PR_SCALE
        got = {r["node"]: r["rank_fp"] for r in out.collect()}
        assert got == _reference_pagerank(edges, n_iter=10)

    def test_matches_duckdb_mirror_with_sinks(self, spark):
        import duckdb

        from spider_spark.operators.graph import pagerank_sql

        edges = [(0, 1), (0, 2), (1, 2), (3, 2), (2, 4)]  # 4 is a sink
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["rank_fp"] for r in pagerank(df, n_iter=6).collect()}
        vals = ", ".join(f"({s}, {d})" for s, d in edges)
        sql = pagerank_sql(
            f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", n_iter=6
        )
        want = {r[0]: r[1] for r in duckdb.connect().execute(sql).fetchall()}
        assert got == want


def _reference_hits(edges, n_iter, scale):
    """Plain-Python integer HITS mirroring the operator's arithmetic."""
    from collections import Counter

    w = Counter(edges)
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    hub = {n: scale for n in nodes}
    auth = {}
    for _ in range(n_iter):
        araw = Counter()
        for (s, d), wt in w.items():
            araw[d] += wt * hub[s]
        tot = sum(araw.values())
        auth = {n: araw.get(n, 0) // max(1, tot // scale) for n in nodes}
        hraw = Counter()
        for (s, d), wt in w.items():
            hraw[s] += wt * auth[d]
        tot = sum(hraw.values())
        hub = {n: hraw.get(n, 0) // max(1, tot // scale) for n in nodes}
    return {n: (auth[n], hub[n]) for n in nodes}


class TestHits:
    def test_matches_integer_reference(self, spark):
        from spider_spark.operators.graph import HITS_SCALE, hits

        edges = [(i % 7, (3 * i + 1) % 7) for i in range(40)] + [(0, 3)] * 5
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: (r["auth_fp"], r["hub_fp"])
            for r in hits(df, n_iter=6).collect()
        }
        assert got == _reference_hits(edges, n_iter=6, scale=HITS_SCALE)

    def test_star_graph_roles(self, spark):
        from spider_spark.operators.graph import hits

        # many hub pages each linking the one authority
        edges = [(i, 99) for i in range(1, 10)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: (r["auth_fp"], r["hub_fp"])
            for r in hits(df, n_iter=4).collect()
        }
        assert got[99][0] == max(a for a, _ in got.values())  # top authority
        assert got[99][1] == 0  # no out-links: zero hub score
        hubs = {got[i][1] for i in range(1, 10)}
        assert len(hubs) == 1 and hubs.pop() > 0  # symmetric hubs

    def test_normalization_bounds_scores(self, spark):
        from spider_spark.operators.graph import HITS_SCALE, hits

        edges = [(i, (i + 1) % 20) for i in range(20)] + [(i, 7) for i in range(20) if i != 7]
        df = spark.createDataFrame(edges, "src long, dst long")
        out = hits(df, n_iter=8)
        tot_a = out.agg(F.sum("auth_fp")).collect()[0][0]
        # divide-only normalization: tot/q with q = tot div scale, so the
        # renormalized total lands in (scale/2, 2·scale)
        assert HITS_SCALE / 2 < tot_a < 2 * HITS_SCALE

    def test_matches_duckdb_mirror(self, spark):
        import duckdb

        from spider_spark.operators.graph import hits, hits_sql

        edges = [(0, 1), (0, 2), (1, 2), (3, 2), (2, 4), (4, 0), (3, 4)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: (r["auth_fp"], r["hub_fp"])
            for r in hits(df, n_iter=5).collect()
        }
        vals = ", ".join(f"({s}, {d})" for s, d in edges)
        sql = hits_sql(
            f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", n_iter=5
        )
        want = {r[0]: (r[1], r[2]) for r in duckdb.connect().execute(sql).fetchall()}
        assert got == want


class TestTrustRank:
    """Seed-biased teleport semantics + mirror parity (the contract query
    hash-checks the full arithmetic; these make the semantics visible)."""

    EDGES = [
        ("seed", "good"), ("good", "better"),
        # a dense spam clique nothing trusted points at
        ("spam1", "spam2"), ("spam2", "spam1"), ("spam1", "spam1"),
    ]

    def _run(self, spark, seeds, n_iter=6):
        from spider_spark.operators.graph import trustrank

        e = spark.createDataFrame(self.EDGES, "src string, dst string")
        s = spark.createDataFrame([(x,) for x in seeds], "node string")
        return {r["node"]: r["trust_fp"]
                for r in trustrank(e, s, n_iter=n_iter).collect()}

    def test_unreachable_spam_gets_zero(self, spark):
        got = self._run(spark, ["seed"])
        assert got["spam1"] == 0 and got["spam2"] == 0
        assert got["seed"] > 0 and got["good"] > 0 and got["better"] > 0
        # trust decays with distance from the seed
        assert got["seed"] > got["good"] > got["better"]

    def test_plain_pagerank_rewards_the_clique(self, spark):
        from spider_spark.operators.graph import pagerank

        e = spark.createDataFrame(self.EDGES, "src string, dst string")
        pr = {r["node"]: r["rank_fp"] for r in pagerank(e, n_iter=6).collect()}
        got = self._run(spark, ["seed"])
        # the self-reinforcing clique outranks the honest chain under
        # uniform teleport, and scores zero under seed-biased teleport —
        # the exact inversion TrustRank exists for
        assert pr["spam1"] > pr["good"]
        assert got["spam1"] == 0 < got["good"]

    def test_seed_outside_graph_rejected(self, spark):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            self._run(spark, ["nowhere"])

    def test_mirror_parity(self, spark):
        import duckdb

        from spider_spark.operators.graph import trustrank_sql

        got = self._run(spark, ["seed", "spam1"], n_iter=4)
        con = duckdb.connect()
        edges_sql = " UNION ALL ".join(
            f"SELECT '{a}' AS src, '{b}' AS dst" for a, b in self.EDGES)
        want = {r[0]: r[1] for r in con.execute(trustrank_sql(
            edges_sql, "SELECT 'seed' AS node UNION ALL SELECT 'spam1'",
            n_iter=4)).fetchall()}
        assert got == want


def _reference_opic(edges, n_iter, scale):
    """Pure-Python replay of the OPIC integer spec (shares no code with
    the operator)."""
    from collections import Counter, defaultdict

    wed = Counter(edges)
    deg = Counter()
    for (s, _d), w in wed.items():
        deg[s] += w
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    cash = {v: scale // n for v in nodes}
    hist = {v: 0 for v in nodes}
    virt = scale - (scale // n) * n
    for _ in range(n_iter):
        vshare, vkeep = virt // n, virt % n
        tv = sum(
            cash[u] - (cash[u] // (deg.get(u, 0) + 1)) * deg.get(u, 0)
            for u in nodes
        )
        inbound = defaultdict(int)
        for (s, d), w in wed.items():
            inbound[d] += (cash[s] // (deg[s] + 1)) * w
        for u in nodes:
            hist[u] += cash[u]
        cash = {v: inbound[v] + vshare for v in nodes}
        virt = tv + vkeep
    return {v: (hist[v], cash[v]) for v in nodes}, virt


class TestOpic:
    EDGES = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "a"),
        ("d", "a"),             # d has in-degree 0 in reverse: a source
        ("b", "e"),             # e is a sink (dangling)
    ]

    @pytest.fixture(scope="class")
    def edf(self, spark):
        return spark.createDataFrame(self.EDGES, "src string, dst string").cache()

    def test_matches_reference_and_conserves_mass(self, spark, edf):
        from spider_spark.operators.graph import opic

        stats = {}
        got = {
            r["node"]: (r["hist_fp"], r["cash_fp"])
            for r in opic(edf, n_iter=7, stats=stats).collect()
        }
        want, virt = _reference_opic(self.EDGES, 7, PR_SCALE)
        assert got == want
        assert stats["virt"] == virt
        # exact conservation: circulating + virtual cash == scale
        assert sum(c for _h, c in got.values()) + stats["virt"] == PR_SCALE

    def test_importance_orders_by_link_mass(self, spark, edf):
        from spider_spark.operators.graph import opic

        hist = {
            r["node"]: r["hist_fp"]
            for r in opic(edf, n_iter=12).collect()
        }
        # a and c sit on the 2-cycle with doubled c→a edges: they dominate
        assert hist["a"] > hist["e"] and hist["c"] > hist["e"]
        # the source d only ever receives virtual shares
        assert hist["d"] < hist["a"]

    def test_matches_duckdb_mirror(self, spark, edf):
        import duckdb

        from spider_spark.operators.graph import opic, opic_sql

        got = {
            (r["node"], r["hist_fp"], r["cash_fp"])
            for r in opic(edf, n_iter=5).collect()
        }
        con = duckdb.connect()
        con.register("e", edf.toPandas())
        want = set(
            con.execute(opic_sql("SELECT src, dst FROM e", n_iter=5)).fetchall()
        )
        assert got == want

    def test_dangling_cash_routes_through_virtual(self, spark):
        from spider_spark.operators.graph import opic

        # single edge a→b: b is dangling; its cash must return via the
        # virtual node (uniformly), never vanish
        df = spark.createDataFrame([("a", "b")], "src string, dst string")
        stats = {}
        out = {r["node"]: r for r in opic(df, n_iter=6, stats=stats).collect()}
        total = sum(r["cash_fp"] for r in out.values()) + stats["virt"]
        assert total == PR_SCALE
        assert out["a"]["cash_fp"] > 0  # replenished by the virtual node


class TestLabelPropagation:
    @pytest.fixture(scope="class")
    def cliques(self, spark):
        # two 4-cliques {a0..a3}, {b0..b3} joined by ONE bridge a0-b0:
        # within-clique majority must dominate the single bridge vote
        import itertools
        rows = []
        for prefix in ("a", "b"):
            for x, y in itertools.combinations(range(4), 2):
                rows.append((f"{prefix}{x}", f"{prefix}{y}"))
        rows.append(("a0", "b0"))
        return spark.createDataFrame(rows, "src string, dst string").cache()

    @staticmethod
    def _reference(rows, n_iter):
        """Python replay of the frozen synchronous rule."""
        from collections import Counter, defaultdict
        und = defaultdict(list)
        for s, d in rows:
            und[s].append(d)
            und[d].append(s)
        labels = {n: n for n in und}
        for _ in range(n_iter):
            new = {}
            for n in und:
                c = Counter(labels[x] for x in und[n])
                new[n] = min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            labels = new
        return labels

    def test_cliques_converge(self, cliques):
        from spider_spark.operators.graph import label_propagation

        got = dict(
            map(tuple, label_propagation(cliques, n_iter=5).collect()))
        assert len({got[f"a{i}"] for i in range(4)}) == 1
        assert len({got[f"b{i}"] for i in range(4)}) == 1
        assert got["a0"] != got["b1"]  # bridge does not merge the cliques

    def test_matches_reference(self, cliques):
        from spider_spark.operators.graph import label_propagation

        rows = [(r["src"], r["dst"]) for r in cliques.collect()]
        for it in (1, 3):
            ref = self._reference(rows, it)
            got = dict(map(tuple,
                           label_propagation(cliques, n_iter=it).collect()))
            assert got == ref, it

    def test_sql_mirror_bit_exact(self, cliques):
        from spider_spark.operators.graph import (
            label_propagation, label_propagation_sql)

        spark_rows = sorted(
            map(tuple, label_propagation(cliques, n_iter=3).collect()))
        con = duckdb.connect()
        con.register("edges", cliques.toPandas())
        duck_rows = sorted(con.execute(
            label_propagation_sql("SELECT * FROM edges", n_iter=3)
        ).fetchall())
        assert spark_rows == duck_rows

    def test_parallel_edges_are_weight(self, spark):
        from spider_spark.operators.graph import label_propagation

        # x's single neighbor-set vote is y,y,z: doubled edge wins
        e = spark.createDataFrame(
            [("x", "y"), ("x", "y"), ("x", "z"), ("y", "q"), ("z", "q")],
            "src string, dst string")
        got = dict(map(tuple, label_propagation(e, n_iter=1).collect()))
        assert got["x"] == "y"


class TestTriangleCounts:
    @staticmethod
    def _reference(pairs):
        """Brute-force: adjacency sets over the simple undirected graph."""
        adj = {}
        for a, b in pairs:
            if a == b:
                continue
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        out = {}
        for n, nbrs in adj.items():
            t = 0
            for x in nbrs:
                t += len(adj[x] & nbrs)
            t //= 2  # each triangle's other edge counted twice
            deg = len(nbrs)
            cc = (2 * t * 1_000_000) // (deg * (deg - 1)) if deg >= 2 else 0
            out[n] = (deg, t, cc)
        return out

    def test_random_graph_matches_brute_force(self, spark):
        from spider_spark.operators.graph import triangle_counts

        rng = random.Random(7)
        pairs = [(rng.randrange(30), rng.randrange(30)) for _ in range(150)]
        e = spark.createDataFrame(pairs, "src long, dst long")
        got = {r["node"]: (r["degree"], r["triangles"], r["cc_ppm"])
               for r in triangle_counts(e).collect()}
        assert got == self._reference(pairs)

    def test_clique_and_path(self, spark):
        from spider_spark.operators.graph import triangle_counts

        # K4 plus a pendant path: clique nodes have cc 10^6, path has 0
        pairs = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        pairs += [(3, 4), (4, 5)]
        e = spark.createDataFrame(pairs, "src long, dst long")
        got = {r["node"]: r for r in triangle_counts(e).collect()}
        for n in range(3):
            assert got[n]["triangles"] == 3 and got[n]["cc_ppm"] == 1_000_000
        assert got[4]["triangles"] == 0 and got[4]["cc_ppm"] == 0
        assert got[5]["cc_ppm"] == 0  # degree 1

    def test_parallel_and_reversed_edges_collapse(self, spark):
        from spider_spark.operators.graph import triangle_counts

        e = spark.createDataFrame(
            [(0, 1), (1, 0), (0, 1), (1, 2), (2, 0), (2, 2)],
            "src long, dst long")
        got = {r["node"]: (r["degree"], r["triangles"])
               for r in triangle_counts(e).collect()}
        assert got == {0: (2, 1), 1: (2, 1), 2: (2, 1)}

    def test_sql_mirror_bit_exact(self, spark):
        from spider_spark.operators.graph import (
            triangle_counts, triangle_counts_sql)

        rng = random.Random(11)
        pairs = [(rng.randrange(25), rng.randrange(25)) for _ in range(120)]
        e = spark.createDataFrame(pairs, "src long, dst long")
        spark_rows = sorted(map(tuple, triangle_counts(e).collect()))
        con = duckdb.connect()
        con.register("tedges", e.toPandas())
        duck_rows = sorted(map(tuple, con.execute(
            triangle_counts_sql("SELECT * FROM tedges")).fetchall()))
        assert spark_rows == duck_rows


class TestBfsDistance:
    @staticmethod
    def _reference(pairs, seeds, max_hops, directed=True):
        adj = {}
        for a, b in pairs:
            if a == b:
                continue
            adj.setdefault(a, set()).add(b)
            if not directed:
                adj.setdefault(b, set()).add(a)
        dist = {s: 0 for s in seeds}
        frontier = set(seeds)
        for h in range(1, max_hops + 1):
            nxt = set()
            for n in frontier:
                nxt |= adj.get(n, set())
            nxt -= dist.keys()
            if not nxt:
                break
            for n in nxt:
                dist[n] = h
            frontier = nxt
        return dist

    def test_random_graph_matches_reference(self, spark):
        from spider_spark.operators.graph import bfs_distance

        rng = random.Random(3)
        pairs = [(rng.randrange(40), rng.randrange(40)) for _ in range(90)]
        seeds = [1, 5, 9]
        e = spark.createDataFrame(pairs, "src long, dst long")
        sd = spark.createDataFrame([(s,) for s in seeds], "node long")
        for directed in (True, False):
            got = dict(map(tuple,
                           bfs_distance(e, sd, max_hops=6,
                                        directed=directed).collect()))
            assert got == self._reference(pairs, seeds, 6, directed), directed

    def test_hop_bound_and_isolated_seed(self, spark):
        from spider_spark.operators.graph import bfs_distance

        e = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (3, 4)], "src long, dst long")
        sd = spark.createDataFrame([(0,), (99,)], "node long")
        got = dict(map(tuple, bfs_distance(e, sd, max_hops=2).collect()))
        assert got == {0: 0, 99: 0, 1: 1, 2: 2}

    def test_direction_matters(self, spark):
        from spider_spark.operators.graph import bfs_distance

        e = spark.createDataFrame([(1, 0), (2, 1)], "src long, dst long")
        sd = spark.createDataFrame([(0,)], "node long")
        got = dict(map(tuple, bfs_distance(e, sd, max_hops=4).collect()))
        assert got == {0: 0}
        got = dict(map(tuple,
                       bfs_distance(e, sd, max_hops=4,
                                    directed=False).collect()))
        assert got == {0: 0, 1: 1, 2: 2}

    def test_sql_mirror_bit_exact(self, spark):
        from spider_spark.operators.graph import bfs_distance, bfs_distance_sql

        rng = random.Random(13)
        pairs = [(rng.randrange(30), rng.randrange(30)) for _ in range(70)]
        e = spark.createDataFrame(pairs, "src long, dst long")
        sd = spark.createDataFrame([(2,), (8,)], "node long")
        con = duckdb.connect()
        con.register("bedges", e.toPandas())
        con.register("bseeds", sd.toPandas())
        for directed in (True, False):
            spark_rows = sorted(map(tuple, bfs_distance(
                e, sd, max_hops=5, directed=directed).collect()))
            duck_rows = sorted(map(tuple, con.execute(bfs_distance_sql(
                "SELECT * FROM bedges", "SELECT * FROM bseeds",
                max_hops=5, directed=directed)).fetchall()))
            assert spark_rows == duck_rows, directed


class TestCcAddPairs:
    def test_incremental_equals_one_shot(self, spark):
        from spider_spark.operators.graph import cc_add_pairs, connected_components

        rng = random.Random(23)
        all_pairs = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
        for cut in (10, 40, 79):
            old = spark.createDataFrame(all_pairs[:cut], "id_a long, id_b long")
            new = spark.createDataFrame(all_pairs[cut:], "id_a long, id_b long")
            base = connected_components(old)
            grown = dict(map(tuple, cc_add_pairs(base, new).collect()))
            full = dict(map(tuple, connected_components(
                spark.createDataFrame(all_pairs, "id_a long, id_b long")
            ).collect()))
            assert grown == full, cut

    def test_singletons_survive_and_can_merge(self, spark):
        from spider_spark.operators.graph import cc_add_pairs

        # labeling with a singleton cluster (7,7) and a pair cluster
        labels = spark.createDataFrame(
            [(1, 1), (2, 1), (7, 7)], "id long, cluster_id long")
        # batch touches nothing: everything survives verbatim
        empty = spark.createDataFrame([], "id_a long, id_b long")
        assert dict(map(tuple, cc_add_pairs(labels, empty).collect())) == {
            1: 1, 2: 1, 7: 7}
        # batch merges the singleton into the pair cluster + a new node
        batch = spark.createDataFrame([(7, 2), (9, 7)], "id_a long, id_b long")
        assert dict(map(tuple, cc_add_pairs(labels, batch).collect())) == {
            1: 1, 2: 1, 7: 1, 9: 1}

    def test_flat_base_converges_fast(self, spark):
        from spider_spark.operators.graph import (
            cc_add_pairs, connected_components)

        # a path graph needs ~log(n) rounds from scratch; grown from its
        # own labeling plus one edge, the star form converges in O(1)
        path = [(i, i + 1) for i in range(32)]
        full_stats: dict = {}
        base = connected_components(
            spark.createDataFrame(path, "id_a long, id_b long"),
            stats=full_stats)
        inc_stats: dict = {}
        cc_add_pairs(base, spark.createDataFrame(
            [(32, 33)], "id_a long, id_b long"), stats=inc_stats).collect()
        assert inc_stats["rounds"] < full_stats["rounds"]
        assert inc_stats["rounds"] <= 3


class TestModularity:
    @staticmethod
    def _reference_q(pairs, labels):
        """Float Newman modularity over the undirected multigraph."""
        edges = [(a, b) for a, b in pairs if a != b]
        m = len(edges)
        intra, dsum = {}, {}
        for a, b in edges:
            la, lb = labels[a], labels[b]
            dsum[la] = dsum.get(la, 0) + 1
            dsum[lb] = dsum.get(lb, 0) + 1
            if la == lb:
                intra[la] = intra.get(la, 0) + 1
        return sum(
            intra.get(c, 0) / m - (dsum.get(c, 0) / (2 * m)) ** 2
            for c in set(labels.values()))

    def test_matches_reference_on_cliques(self, spark):
        from spider_spark.operators.graph import modularity_contributions

        # two K4 cliques + one bridge: strong community structure
        pairs = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        pairs += [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
        pairs += [(0, 4)]
        labels = {n: (0 if n < 4 else 4) for n in range(8)}
        e = spark.createDataFrame(pairs, "src long, dst long")
        lab = spark.createDataFrame(list(labels.items()),
                                    "node long, label long")
        rows = modularity_contributions(e, lab).collect()
        m = len(pairs)
        q = sum(int(r["contrib_num"]) for r in rows) / (4 * m * m)
        assert abs(q - self._reference_q(pairs, labels)) < 1e-12
        assert q > 0.3  # real structure scores well clear of zero
        # degenerate one-community partition scores exactly 0
        lab1 = spark.createDataFrame([(n, 0) for n in range(8)],
                                     "node long, label long")
        rows1 = modularity_contributions(e, lab1).collect()
        assert sum(int(r["contrib_num"]) for r in rows1) == 0

    def test_random_partition_scores_near_zero(self, spark):
        from spider_spark.operators.graph import modularity_contributions

        rng = random.Random(5)
        pairs = [(rng.randrange(30), rng.randrange(30)) for _ in range(120)]
        labels = {n: n % 3 for n in range(30)}  # structure-blind partition
        e = spark.createDataFrame(pairs, "src long, dst long")
        lab = spark.createDataFrame(list(labels.items()),
                                    "node long, label long")
        rows = modularity_contributions(e, lab).collect()
        m = len([p for p in pairs if p[0] != p[1]])
        q = sum(int(r["contrib_num"]) for r in rows) / (4 * m * m)
        assert abs(q - self._reference_q(pairs, labels)) < 1e-12
        assert abs(q) < 0.12

    def test_sql_mirror_bit_exact(self, spark):
        import duckdb

        from spider_spark.operators.graph import (
            modularity_contributions, modularity_contributions_sql)

        rng = random.Random(9)
        pairs = [(rng.randrange(20), rng.randrange(20)) for _ in range(60)]
        labels = [(n, n % 4) for n in range(20)]
        e = spark.createDataFrame(pairs, "src long, dst long")
        lab = spark.createDataFrame(labels, "node long, label long")
        spark_rows = sorted(
            (r["label"], r["n_nodes"], r["intra_edges"], r["degree_sum"],
             int(r["contrib_num"]))
            for r in modularity_contributions(e, lab).collect())
        con = duckdb.connect()
        con.register("qedges", e.toPandas())
        con.register("qlabels", lab.toPandas())
        duck_rows = sorted(
            (a, b, c, d, int(n)) for a, b, c, d, n in con.execute(
                modularity_contributions_sql(
                    "SELECT * FROM qedges",
                    "SELECT * FROM qlabels")).fetchall())
        assert spark_rows == duck_rows


class TestKCore:
    @staticmethod
    def _reference(pairs, k):
        adj = {}
        for a, b in pairs:
            if a == b:
                continue
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        changed = True
        while changed:
            changed = False
            for n in list(adj):
                if len(adj[n]) < k:
                    for m in adj.pop(n):
                        adj[m].discard(n)
                    changed = True
        return {n: len(v) for n, v in adj.items() if v}

    def test_matches_reference(self, spark):
        from spider_spark.operators.graph import k_core

        rng = random.Random(17)
        pairs = [(rng.randrange(40), rng.randrange(40)) for _ in range(100)]
        e = spark.createDataFrame(pairs, "src long, dst long")
        for k in (2, 3, 4):
            got = dict(map(tuple, k_core(e, k=k, n_iter=15).collect()))
            assert got == self._reference(pairs, k), k

    def test_pendant_chain_peels_fully(self, spark):
        from spider_spark.operators.graph import k_core

        # triangle + a long pendant chain: the whole chain peels at k=2
        pairs = [(0, 1), (1, 2), (2, 0)] + [(i, i + 1) for i in range(2, 12)]
        e = spark.createDataFrame(pairs, "src long, dst long")
        got = dict(map(tuple, k_core(e, k=2, n_iter=12).collect()))
        assert got == {0: 2, 1: 2, 2: 2}
        # k above the densest structure: empty core
        assert k_core(e, k=3, n_iter=12).count() == 0

    def test_sql_mirror_bit_exact(self, spark):
        import duckdb

        from spider_spark.operators.graph import k_core, k_core_sql

        rng = random.Random(21)
        pairs = [(rng.randrange(25), rng.randrange(25)) for _ in range(70)]
        e = spark.createDataFrame(pairs, "src long, dst long")
        spark_rows = sorted(map(tuple, k_core(e, k=2, n_iter=6).collect()))
        con = duckdb.connect()
        con.register("kcedges", e.toPandas())
        duck_rows = sorted(map(tuple, con.execute(k_core_sql(
            "SELECT * FROM kcedges", k=2, n_iter=6)).fetchall()))
        assert spark_rows == duck_rows


class TestEdgeReciprocity:
    def test_matches_hand_computed(self, spark):
        from spider_spark.operators.graph import edge_reciprocity

        # 0↔1 mutual; 0→2 one-way; 2→0 makes 0→2 mutual too; 3→0 one-way;
        # duplicate and self edges ignored
        e = spark.createDataFrame(
            [(0, 1), (1, 0), (0, 2), (2, 0), (3, 0), (3, 0), (2, 2)],
            "src long, dst long")
        got = {r["node"]: (r["n_out"], r["n_reciprocal"],
                           r["reciprocity_ppm"])
               for r in edge_reciprocity(e).collect()}
        assert got == {
            0: (2, 2, 1_000_000),
            1: (1, 1, 1_000_000),
            2: (1, 1, 1_000_000),
            3: (1, 0, 0),
        }

    def test_sql_mirror_bit_exact(self, spark):
        import duckdb

        from spider_spark.operators.graph import (
            edge_reciprocity, edge_reciprocity_sql)

        rng = random.Random(31)
        pairs = [(rng.randrange(15), rng.randrange(15)) for _ in range(60)]
        e = spark.createDataFrame(pairs, "src long, dst long")
        spark_rows = sorted(map(tuple, edge_reciprocity(e).collect()))
        con = duckdb.connect()
        con.register("redges", e.toPandas())
        duck_rows = sorted(map(tuple, con.execute(edge_reciprocity_sql(
            "SELECT * FROM redges")).fetchall()))
        assert spark_rows == duck_rows


class TestSessionPlanShapes:
    """The session's new operators are JVM-only join/agg plans: no
    Python eval nodes, no cartesian products."""

    def _assert_clean(self, df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan
        return plan

    def test_graph_ops_are_jvm_only(self, spark):
        from spider_spark.operators.graph import (
            bfs_distance, edge_reciprocity, k_core,
            modularity_contributions, triangle_counts)

        e = spark.createDataFrame(
            [(i, (i + 1) % 12) for i in range(12)] + [(0, 6)],
            "src long, dst long")
        sd = spark.createDataFrame([(0,)], "node long")
        lab = spark.createDataFrame([(i, i % 3) for i in range(12)],
                                    "node long, label long")
        self._assert_clean(triangle_counts(e, checkpoint=False))
        self._assert_clean(bfs_distance(e, sd, max_hops=2, checkpoint=False))
        self._assert_clean(k_core(e, k=2, n_iter=2, checkpoint=False))
        self._assert_clean(modularity_contributions(e, lab))
        self._assert_clean(edge_reciprocity(e))

    def test_text_ops_are_jvm_only(self, spark):
        from spider_spark.functions.script import script_profile
        from spider_spark.operators.contentspam import content_spam_features
        from spider_spark.operators.fuzzy import fuzzy_match, vocab_counts
        from spider_spark.operators.packing import epoch_order
        from spider_spark.operators.percolate import stored_query_match

        docs = spark.createDataFrame(
            [(0, "alpha beta gamma"), (1, "beta gamma delta")],
            "doc_id long, text string")
        qs = spark.createDataFrame([("betta",)], "query string")
        rules = spark.createDataFrame([("r", ["beta"])],
                                      "query_id string, terms array<string>")
        self._assert_clean(script_profile(docs))
        self._assert_clean(content_spam_features(docs, n_popular=2))
        self._assert_clean(fuzzy_match(qs, vocab_counts(docs)))
        self._assert_clean(epoch_order(docs))
        self._assert_clean(stored_query_match(docs, rules))
