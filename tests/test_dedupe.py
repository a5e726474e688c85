"""Dedup-suite tests on crafted corpora with hand-computable answers."""

import pytest
from pyspark.sql import functions as F

from spider_spark.operators.dedupe import (
    exact_duplicates,
    jaccard_pairs,
    jaccard_pairs_sql,
    lsh_candidate_pairs,
    shingles,
    simhash,
    simhash_near_pairs,
    simhash_near_pairs_sql,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "The  Quick Brown Fox jumps over the lazy dog"),  # exact dup of 0 (normalized)
        (2, "the quick brown fox jumps over the sleepy dog"),  # near dup of 0
        (3, "completely different text about spark engines and parquet files"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


class TestExactDupes:
    def test_groups(self, docs):
        got = exact_duplicates(docs).collect()
        assert len(got) == 1
        assert got[0]["n_dups"] == 3
        assert got[0]["keep_id"] == 0


class TestJaccard:
    def test_pair_values(self, docs):
        pairs = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in jaccard_pairs(docs, threshold=0.3).collect()
        }
        # exact dups: identical shingle sets -> jaccard 1.0
        assert pairs[(0, 1)] == 1.0
        assert pairs[(0, 4)] == 1.0
        assert pairs[(1, 4)] == 1.0
        # 9-word docs differing in word 8: 7 distinct 3-gram shingles each,
        # 5 shared -> 5 / (7 + 7 - 5) = 5/9
        assert abs(pairs[(0, 2)] - 5 / 9) < 1e-12
        assert (0, 3) not in pairs

    def test_threshold_filters(self, docs):
        got = {
            (r["id_a"], r["id_b"])
            for r in jaccard_pairs(docs, threshold=0.9).collect()
        }
        assert got == {(0, 1), (0, 4), (1, 4)}


class TestJaccardHotShingle:
    """The sf0.01 oracle corpus never trips the max_bucket skew guard, so this
    fixture forces it: a boilerplate phrase shared by more docs than
    max_bucket. Spark must match the DuckDB mirror exactly — in particular
    the per-doc denominator must be computed AFTER the hot-shingle drop
    (VERDICT r2 finding #1)."""

    @pytest.fixture(scope="class")
    def hot_docs(self, spark):
        boiler = "subscribe to our newsletter today"
        rows = [
            (i, f"{boiler} article {i} body alpha{i} beta{i} gamma{i}")
            for i in range(8)
        ]
        # a genuine near-dup pair whose similarity rides non-hot shingles
        rows += [
            (100, f"{boiler} shared body text one two three four five"),
            (101, f"{boiler} shared body text one two three four six"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string").cache()

    def test_guard_fires(self, hot_docs):
        sh = shingles(hot_docs)
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("b"))
            .filter(F.col("b") > 5)
            .count()
        )
        assert hot > 0, "fixture must contain a shingle hotter than max_bucket"

    def test_matches_oracle_under_hot_shingle(self, hot_docs):
        import duckdb

        max_bucket, threshold = 5, 0.2
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in jaccard_pairs(
                hot_docs, threshold=threshold, max_bucket=max_bucket
            ).collect()
        }
        con = duckdb.connect()
        con.register("documents", hot_docs.toPandas())
        want = {
            (r[0], r[1]): r[2]
            for r in con.execute(
                jaccard_pairs_sql(threshold=threshold, max_bucket=max_bucket)
            ).fetchall()
        }
        assert set(got) == set(want)
        for k, v in want.items():
            assert abs(got[k] - v) < 1e-12
        # the near-dup pair must survive on post-filter shingles
        assert (100, 101) in got


class TestMinHashLSH:
    def test_exact_dups_always_candidates(self, docs):
        got = {
            (r["id_a"], r["id_b"])
            for r in lsh_candidate_pairs(docs).collect()
        }
        # identical signatures collide in every band
        assert {(0, 1), (0, 4), (1, 4)} <= got
        # unrelated doc should not pair with anything
        assert not any(3 in p for p in got)


class TestSimHash:
    def test_identical_texts_same_hash(self, docs):
        sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
        assert sh[0] == sh[1] == sh[4]
        assert sh[0] != sh[3]

    def test_near_pairs_hamming(self, docs):
        got = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in simhash_near_pairs(docs, max_hamming=10).collect()
        }
        assert got[(0, 1)] == 0
        assert got[(0, 4)] == 0
        # near-dup doc 2 within a few bits of doc 0
        assert (0, 2) in got and got[(0, 2)] <= 10
        assert not any(3 in p for p in got)


class TestSimHashHotBucket:
    """A templated corpus where one simhash band bucket holds more docs than
    max_bucket (VERDICT r3 finding #2): the guard must drop those buckets,
    Spark must still hash-match the DuckDB mirror under the cap, and a
    legitimate duplicate pair outside the hot bucket must survive."""

    @pytest.fixture(scope="class")
    def hot_docs(self, spark):
        # 8 byte-identical templated pages -> identical simhash -> every
        # band bucket holds 8 > max_bucket=5
        rows = [(i, "subscribe to our newsletter today for daily updates")
                for i in range(8)]
        # a genuine duplicate pair with different content: identical
        # simhash (hamming 0), bucket population 2 <= max_bucket
        rows += [
            (100, "spark engines process parquet files across many executors"),
            (101, "spark engines process parquet files across many executors"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string").cache()

    def test_guard_fires(self, hot_docs):
        counts = (
            simhash(hot_docs)
            .groupBy("simhash")
            .agg(F.count("*").alias("c"))
            .collect()
        )
        assert max(r["c"] for r in counts) > 5, \
            "fixture must make a band bucket hotter than max_bucket"

    def test_matches_oracle_under_hot_bucket(self, hot_docs):
        import duckdb

        max_bucket, max_hamming = 5, 3
        got = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in simhash_near_pairs(
                hot_docs, max_hamming=max_hamming, max_bucket=max_bucket
            ).collect()
        }
        con = duckdb.connect()
        con.register("documents", hot_docs.toPandas())
        want = {
            (r[0], r[1]): r[2]
            for r in con.execute(
                simhash_near_pairs_sql(
                    max_hamming=max_hamming, max_bucket=max_bucket
                )
            ).fetchall()
        }
        assert got == want
        # the hot templated pairs are gone; the legitimate pair survives
        assert (100, 101) in got and got[(100, 101)] == 0
        assert not any(a < 100 for a, _ in got)


class TestContainment:
    """Directed containment (quote/aggregator detection): asymmetric hits
    Jaccard can't see, direction semantics, and mirror parity."""

    @pytest.fixture(scope="class")
    def cdocs(self, spark):
        base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                "lambda mu nu xi omicron pi rho sigma tau upsilon")
        rows = [
            (1, base),                                   # long source
            (2, "alpha beta gamma delta epsilon zeta"),  # excerpt of 1
            (3, "unrelated words entirely different content here now"),
            (4, base + " phi"),                          # near-dup of 1
        ]
        return spark.createDataFrame(rows, "doc_id long, text string").cache()

    def test_excerpt_detected_directionally(self, cdocs):
        from spider_spark.operators.dedupe import containment_pairs

        got = {(r["inner_id"], r["outer_id"]): r["containment"]
               for r in containment_pairs(cdocs, threshold=0.9).collect()}
        # the excerpt is contained in its source, not vice versa
        assert got[(2, 1)] == 1.0
        assert (1, 2) not in got
        assert got[(2, 4)] == 1.0           # excerpt also inside the near-dup
        # mutual containment of the near-dup pair: both directions
        assert (1, 4) in got and (4, 1) in got
        assert all(k[0] != 3 and k[1] != 3 for k in got)

    def test_jaccard_blind_to_excerpt(self, cdocs):
        from spider_spark.operators.dedupe import jaccard_pairs

        j = {(r["id_a"], r["id_b"]) for r in
             jaccard_pairs(cdocs, threshold=0.5).collect()}
        assert (1, 2) not in j and (2, 1) not in j

    def test_mirror_parity(self, cdocs):
        import duckdb

        from spider_spark.operators.dedupe import (
            containment_pairs,
            containment_pairs_sql,
        )

        got = {(r["inner_id"], r["outer_id"]): round(r["containment"], 9)
               for r in containment_pairs(cdocs, threshold=0.5).collect()}
        con = duckdb.connect()
        con.register("cdocs_rel", cdocs.toPandas())
        want = {(r[0], r[1]): round(r[2], 9) for r in con.execute(
            containment_pairs_sql(threshold=0.5, table="cdocs_rel")
        ).fetchall()}
        assert got == want and got
