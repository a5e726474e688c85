"""Distributed BPE training + encoding (operators/bpe.py)."""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from spider_spark.operators.bpe import (
    bpe_apply,
    bpe_apply_sql,
    bpe_train,
    bpe_train_sql,
    merge_pair,
    word_vocab,
)


def _ref_bpe(words_freq: dict[str, int], n_merges: int):
    """Direct Python replay of the frozen algorithm: overlapping pair
    counts, (cnt DESC, left ASC, right ASC) argmax, leftmost-greedy
    non-overlapping merge."""
    vocab = {w: list(w) for w in words_freq}
    merges = []
    for k in range(n_merges):
        counts: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += words_freq[w]
        if not counts:
            break
        (l, r), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((k, l, r, cnt))
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            vocab[w] = out
    return merges, vocab


@pytest.fixture(scope="module")
def docs(spark):
    # the Sennrich toy corpus shape, plus an overlap-run word and a
    # one-char word (never contributes pairs)
    base = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
        + ["aaaa"] * 2 + ["x"] * 4
    )
    rows = [(i, " ".join(base[i::3])) for i in range(3)]  # spread over 3 docs
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def _words_freq(docs) -> dict[str, int]:
    freq: Counter = Counter()
    for r in docs.collect():
        freq.update(r["text"].split())
    return dict(freq)


class TestTrain:
    def test_matches_reference(self, docs):
        ref_merges, _ = _ref_bpe(_words_freq(docs), 8)
        got = [
            (r["rank"], r["left_sym"], r["right_sym"], r["pair_count"])
            for r in bpe_train(docs, n_merges=8).orderBy("rank").collect()
        ]
        assert got == ref_merges

    def test_overlap_run_is_leftmost_greedy(self, spark):
        d = spark.createDataFrame([(0, "aaaa aaaa")], "doc_id long, text string")
        m = bpe_train(d, n_merges=2).orderBy("rank").collect()
        # round 0: (a,a) appears 3x per word * 2 words = 6 (overlapping)
        assert (m[0]["left_sym"], m[0]["right_sym"], m[0]["pair_count"]) == (
            "a", "a", 6)
        # after the greedy merge each word is [aa, aa] -> pair (aa,aa) x2
        assert (m[1]["left_sym"], m[1]["right_sym"], m[1]["pair_count"]) == (
            "aa", "aa", 2)

    def test_early_stop_when_no_pairs(self, spark):
        d = spark.createDataFrame([(0, "a b c a")], "doc_id long, text string")
        assert bpe_train(d, n_merges=5).count() == 0

    def test_sql_mirror_bit_exact(self, docs):
        spark_rows = [
            tuple(r) for r in bpe_train(docs, n_merges=6).orderBy("rank").collect()
        ]
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        duck_rows = con.execute(bpe_train_sql(n_merges=6)).fetchall()
        assert spark_rows == duck_rows


class TestApply:
    def test_tokens_match_reference_vocab(self, docs):
        merges_df = bpe_train(docs, n_merges=8)
        out = {r["doc_id"]: r for r in
               bpe_apply(docs, merges_df).collect()}
        _, ref_vocab = _ref_bpe(_words_freq(docs), 8)
        for r in docs.collect():
            want = [t for w in r["text"].split() for t in ref_vocab[w]]
            assert out[r["doc_id"]]["tokens"] == " ".join(want)
            assert out[r["doc_id"]]["n_tokens"] == len(want)

    def test_content_preserved(self, docs):
        merges_df = bpe_train(docs, n_merges=8)
        out = {r["doc_id"]: r for r in bpe_apply(docs, merges_df).collect()}
        for r in docs.collect():
            assert out[r["doc_id"]]["tokens"].replace(" ", "") == (
                r["text"].replace(" ", ""))

    def test_empty_doc_survives(self, spark):
        d = spark.createDataFrame(
            [(0, "ab ab"), (1, "")], "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               bpe_apply(d, bpe_train(d, n_merges=1)).collect()}
        assert out[1]["n_tokens"] == 0 and out[1]["tokens"] == ""
        assert out[0]["tokens"] == "ab ab"

    def test_sql_mirror_bit_exact(self, docs):
        merges_df = bpe_train(docs, n_merges=6)
        spark_rows = sorted(
            tuple(r) for r in bpe_apply(docs, merges_df).collect()
        )
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        duck_rows = sorted(con.execute(bpe_apply_sql(n_merges=6)).fetchall())
        assert spark_rows == duck_rows


class TestPlanShape:
    def test_merge_fold_is_jvm_only(self, docs):
        v = word_vocab(docs).withColumn("syms", merge_pair(F.col("syms"), "a", "a"))
        plan = v._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
