"""Winnowing fingerprint selection (operators/winnow.py).

Pins: the paper's guarantee (any shared run of ≥ w+k-1 words shares a
selected hash), the rightmost-min tie rule, the short-document rule
(m < w → one window at s=0), bit-exact DuckDB-mirror parity, and the
expected selection density (≈ 2/(w+1) on random-ish text).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from spider_spark.operators.winnow import (
    DEFAULT_K,
    DEFAULT_W,
    positional_grams,
    winnow_fingerprints,
    winnow_sql,
)


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _fps(spark, rows, k=DEFAULT_K, w=DEFAULT_W):
    out = winnow_fingerprints(_docs_df(spark, rows), k=k, w=w).collect()
    return {(r.doc_id, r.pos, r.h) for r in out}


class TestGuarantee:
    def test_shared_long_run_shares_a_fingerprint(self, spark):
        """Theorem (Schleimer et al. §3): a duplicated substring of
        length ≥ w+k-1 words is guaranteed to contribute at least one
        common selected hash in both documents."""
        k, w = DEFAULT_K, DEFAULT_W
        run = " ".join(f"shared{i}" for i in range(w + k - 1))
        rows = [
            (1, f"alpha beta gamma {run} delta epsilon"),
            (2, f"one two {run} three four five six"),
        ]
        fps = _fps(spark, rows, k, w)
        h1 = {h for d, p, h in fps if d == 1}
        h2 = {h for d, p, h in fps if d == 2}
        assert h1 & h2, "guaranteed shared fingerprint missing"

    def test_disjoint_texts_share_nothing(self, spark):
        rows = [
            (1, " ".join(f"aa{i}" for i in range(20))),
            (2, " ".join(f"bb{i}" for i in range(20))),
        ]
        fps = _fps(spark, rows)
        h1 = {h for d, p, h in fps if d == 1}
        h2 = {h for d, p, h in fps if d == 2}
        assert not (h1 & h2)


class TestRules:
    def test_rightmost_min_on_ties(self, spark):
        """A repeated gram means the same (minimum) hash appears at
        several in-window positions: the selected pos must be the
        RIGHTMOST one per window. 'x y z' repeated makes every gram
        hash equal, so each window selects its last position."""
        text = " ".join(["tok"] * 10)  # every 3-gram identical
        fps = _fps(spark, [(1, text)], k=3, w=4)
        # grams m = 8, valid starts s = 0..4, window [s, s+3] → rightmost
        # min at s+3; selected positions are {3,4,5,6,7}
        assert {p for _, p, _ in fps} == {3, 4, 5, 6, 7}

    def test_short_doc_single_window(self, spark):
        """m < w: one window at s=0 over the whole gram run — every
        document yields at least one fingerprint."""
        fps = _fps(spark, [(1, "just four little words")], k=3, w=8)
        assert len(fps) == 1
        (_, pos, _), = fps
        assert 0 <= pos <= 1  # m = 2 grams

    def test_density(self, spark):
        """Expected density on distinct-gram text ≈ 2/(w+1) (paper §5);
        allow a generous band."""
        words = " ".join(f"w{i * 7919 % 104729}" for i in range(4000))
        fps = _fps(spark, [(1, words)], k=DEFAULT_K, w=DEFAULT_W)
        m = 4000 - (DEFAULT_K - 1)
        density = len(fps) / m
        expect = 2.0 / (DEFAULT_W + 1)
        assert 0.5 * expect < density < 1.5 * expect


class TestMirror:
    def test_duckdb_parity(self, spark):
        rows = [
            (1, "the quick brown fox jumps over the lazy dog the quick brown fox"),
            (2, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"),
            (3, "tok tok tok tok tok tok"),
            (4, "tiny"),
        ]
        got = sorted(_fps(spark, rows))
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents (doc_id BIGINT, text VARCHAR)"
        )
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        exp = sorted(map(tuple, con.execute(winnow_sql()).fetchall()))
        assert got == exp


class TestPlan:
    def test_no_python_nodes(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        plan = winnow_fingerprints(docs)._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
