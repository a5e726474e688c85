"""Dedup-suite tests on crafted corpora with hand-computable answers."""

import pytest
from pyspark.sql import functions as F

from spider_spark.operators.dedupe import (
    exact_duplicates,
    jaccard_pairs,
    lsh_candidate_pairs,
    simhash,
    simhash_near_pairs,
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
