"""Content-spam features (operators/contentspam.py) vs a pure-Python
reference and the DuckDB mirror."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pytest

from spider_spark.operators.contentspam import (
    content_spam_features,
    content_spam_features_sql,
)


def _norm(t):
    return " ".join(t.lower().split())


def _reference(rows, n_popular):
    corpus = Counter()
    for _, t in rows:
        corpus.update(_norm(t).split(" "))
    popular = set(
        w for w, _ in sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))
        [:n_popular])
    out = {}
    for i, t in rows:
        ws = _norm(t).split(" ")
        n = len(ws)
        cnt = Counter(ws)
        s = sum(c * math.log(c) for c in cnt.values())
        out[i] = (
            n,
            (sum(map(len, ws)) * 1_000_000) // max(n, 1),
            (sum(c for w, c in cnt.items() if w in popular) * 1_000_000)
            // max(n, 1),
            (len(cnt) * 1_000_000) // max(n, 1),
            round(math.log(max(n, 1)) - s / max(n, 1), 6),
        )
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the the the the spam spam spam keyword keyword"),
        (2, "Buy cheap BUY cheap buy CHEAP pharmaceuticals now"),
        (3, "every word here is completely unique honestly"),
        (4, "x"),
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


class TestContentSpamFeatures:
    def test_matches_reference(self, spark, corpus):
        rows, df = corpus
        got = {r["doc_id"]: (r["n_words"], r["avg_word_len_micro"],
                             r["frac_popular_ppm"],
                             r["distinct_word_ratio_ppm"], r["word_entropy"])
               for r in content_spam_features(df, n_popular=3).collect()}
        want = _reference(rows, 3)
        for i in want:
            assert got[i][:4] == want[i][:4], i
            assert got[i][4] == pytest.approx(want[i][4], abs=2e-6), i

    def test_signals_separate_spam(self, spark, corpus):
        _, df = corpus
        got = {r["doc_id"]: r for r in
               content_spam_features(df, n_popular=3).collect()}
        # the stuffed doc 1: low diversity, high popular-word share;
        # the all-unique doc 3: full diversity, max entropy = ln(n)
        assert got[1]["distinct_word_ratio_ppm"] < got[3]["distinct_word_ratio_ppm"]
        assert got[1]["frac_popular_ppm"] > got[3]["frac_popular_ppm"]
        assert got[3]["distinct_word_ratio_ppm"] == 1_000_000
        assert got[3]["word_entropy"] == pytest.approx(
            math.log(got[3]["n_words"]), abs=1e-6)
        # single-word doc: entropy 0, avg len exact
        assert got[4]["word_entropy"] == 0.0
        assert got[4]["avg_word_len_micro"] == 1_000_000

    def test_sql_mirror(self, spark, corpus):
        _, df = corpus
        spark_rows = sorted(map(tuple,
                                content_spam_features(df, n_popular=3)
                                .collect()))
        con = duckdb.connect()
        con.register("csdocs", df.toPandas())
        duck_rows = sorted(map(tuple, con.execute(content_spam_features_sql(
            "SELECT * FROM csdocs", n_popular=3)).fetchall()))
        assert len(spark_rows) == len(duck_rows)
        for srow, drow in zip(spark_rows, duck_rows):
            assert srow[:5] == drow[:5]
            assert srow[5] == pytest.approx(drow[5], abs=2e-6)

    def test_rejects_bad_n_popular(self, spark, corpus):
        _, df = corpus
        with pytest.raises(ValueError):
            content_spam_features(df, n_popular=0)
