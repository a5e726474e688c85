"""Cross-release diff tests: status semantics on a constructed release
pair, DuckDB-mirror parity, and the normalized-fingerprint equivalence
(whitespace/case churn is NOT a change — same key as exact dedup)."""

import duckdb
import pytest

from spider_spark.operators.release import release_diff, release_diff_sql


@pytest.fixture(scope="module")
def releases(spark):
    old = spark.createDataFrame(
        [
            (1, "alpha doc"),        # unchanged
            (2, "beta doc v1"),      # changed in new
            (3, "  Gamma   DOC  "),  # unchanged modulo normalization
            (4, "retired doc"),      # removed in new
        ],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            (1, "alpha doc"),
            (2, "beta doc v2"),
            (3, "gamma doc"),
            (5, "brand new doc"),    # added in new
        ],
        ["doc_id", "text"],
    )
    return old, new


class TestStatusSemantics:
    def test_all_four_statuses(self, releases):
        old, new = releases
        got = {r["doc_id"]: r["status"] for r in release_diff(old, new).collect()}
        assert got == {
            1: "unchanged",
            2: "changed",
            3: "unchanged",  # normalization absorbs whitespace/case churn
            4: "removed",
            5: "added",
        }

    def test_swap_symmetry(self, releases):
        # diff(new, old) is diff(old, new) with added <-> removed swapped
        # and changed/unchanged fixed — the defining property of a diff
        old, new = releases
        fwd = {r["doc_id"]: r["status"] for r in release_diff(old, new).collect()}
        rev = {r["doc_id"]: r["status"] for r in release_diff(new, old).collect()}
        swap = {"added": "removed", "removed": "added",
                "changed": "changed", "unchanged": "unchanged"}
        assert rev == {k: swap[v] for k, v in fwd.items()}

    def test_matches_duckdb_mirror(self, releases):
        old, new = releases
        con = duckdb.connect()
        con.register("old_rel", old.toPandas())
        con.register("new_rel", new.toPandas())
        mirror = set(map(tuple, con.execute(
            release_diff_sql("old_rel", "new_rel")
        ).fetchall()))
        got = {tuple(r) for r in release_diff(old, new).collect()}
        assert got == mirror


class TestPlanShape:
    def test_bucketed_releases_diff_exchange_free(self, spark):
        """The docstring's scale claim, pinned: two releases bucketed on
        the id diff with NO hash exchange — the full outer join reads both
        sides from their bucket layout (the text column is consumed by the
        md5 inside the scan-side projection, never shuffled)."""
        from pyspark.sql import functions as F

        old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            base = spark.range(0, 500).select(
                F.col("id").alias("doc_id"),
                F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
            )
            base.write.bucketBy(8, "doc_id").mode("overwrite").saveAsTable(
                "rel_diff_old"
            )
            base.filter("doc_id % 3 != 0").write.bucketBy(8, "doc_id").mode(
                "overwrite"
            ).saveAsTable("rel_diff_new")
            d = release_diff(
                spark.table("rel_diff_old"), spark.table("rel_diff_new")
            )
            plan = d._jdf.queryExecution().executedPlan().toString()
            assert "Exchange hashpartitioning" not in plan, plan
            # and the result is still right
            by = {r["status"] for r in d.collect()}
            assert by == {"removed", "unchanged"}
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
            spark.sql("DROP TABLE IF EXISTS rel_diff_old")
            spark.sql("DROP TABLE IF EXISTS rel_diff_new")


class TestDriverQuery:
    def test_every_status_present_at_fixture_sf(self, spark, sf_dir):
        import __spark_entry__ as entry

        rows = entry._q_release_diff(spark, sf_dir).collect()
        by_status: dict[str, int] = {}
        for r in rows:
            by_status[r["status"]] = by_status.get(r["status"], 0) + 1
        assert set(by_status) == {"added", "removed", "changed", "unchanged"}
        docs = entry._docs(spark, sf_dir).count()
        # every current doc plus every retired-only doc gets a verdict
        assert sum(by_status.values()) == docs + by_status["removed"]


class TestTokenDrift:
    @pytest.fixture(scope="class")
    def pair(self, spark):
        old = spark.createDataFrame(
            [(0, "alpha beta beta"), (1, "alpha gamma")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(0, "alpha beta"), (1, "alpha delta delta delta")],
            "doc_id long, text string",
        )
        return old, new

    def test_exact_cross_multiplied_drift(self, spark, pair):
        from spider_spark.operators.release import token_drift

        old, new = pair
        # T_old = 5, T_new = 6
        got = {r["term"]: (r["n_old"], r["n_new"], int(r["drift"]))
               for r in token_drift(old, new, k=10).collect()}
        assert got["delta"] == (0, 3, 3 * 5 - 0)          # new term rises
        assert got["gamma"] == (1, 0, 0 - 1 * 6)          # dropped term falls
        assert got["beta"] == (2, 1, 1 * 5 - 2 * 6)       # share shrank
        assert got["alpha"] == (2, 2, 2 * 5 - 2 * 6)      # flat count, rate shift

    def test_ordering_is_total_and_by_magnitude(self, spark, pair):
        from spider_spark.operators.release import token_drift

        old, new = pair
        rows = token_drift(old, new, k=10).collect()
        mags = [abs(int(r["drift"])) for r in rows]
        assert mags == sorted(mags, reverse=True)

    def test_matches_duckdb_mirror(self, spark, pair):
        import duckdb

        from spider_spark.operators.release import token_drift, token_drift_sql

        old, new = pair
        got = [(r["term"], r["n_old"], r["n_new"], int(r["drift"]))
               for r in token_drift(old, new, k=10).collect()]
        con = duckdb.connect()
        con.register("old_rel", old.toPandas())
        con.register("new_rel", new.toPandas())
        want = [(t, a, b, int(d)) for t, a, b, d in
                con.execute(token_drift_sql("old_rel", "new_rel", k=10)).fetchall()]
        assert got == want
