"""CCNet-style perplexity scoring + tercile bucketing."""

from __future__ import annotations

import duckdb
import pytest

from spider_spark.functions.perplexity import (
    _tercile_cuts,
    doc_perplexity,
    perplexity_buckets,
    perplexity_buckets_sql,
)

ROWS = [
    (1, "the government of the people works for the people and the nation", "en"),
    (2, "zzqx vmkw pflj xxyz qqq jjj wwww zxzx", "en"),
    (3, "die regierung arbeitet für die menschen in deutschland", "de"),
    (4, "el gobierno trabaja para las personas del mundo", "es"),
    (5, "le gouvernement travaille pour les personnes", "fr"),
    (6, "这是中文文本没有模型", "zh"),
    (7, "", "en"),
    (8, "school children learn language and history together", "en"),
    (9, "word salad example text about nothing in particular", "en"),
    (10, "qqq www eee rrr ttt yyy uuu", "de"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        ROWS, "doc_id long, text string, lang string"
    ).cache()


class TestDocPerplexity:
    def test_fluent_text_scores_below_gibberish(self, spark, corpus):
        ppl = {r["doc_id"]: r["ppl_milli"] for r in doc_perplexity(corpus).collect()}
        assert ppl[1] < ppl[2]          # real en < en gibberish
        assert ppl[3] < ppl[10]         # real de < de gibberish

    def test_unmodeled_lang_and_empty_text_are_null(self, spark, corpus):
        ppl = {r["doc_id"]: r["ppl_milli"] for r in doc_perplexity(corpus).collect()}
        assert ppl[6] is None and ppl[7] is None
        assert len(ppl) == len(ROWS)    # every input row survives

    def test_deterministic_across_layouts(self, spark, corpus):
        a = sorted(tuple(r) for r in doc_perplexity(corpus).collect())
        b = sorted(tuple(r) for r in doc_perplexity(corpus.repartition(7)).collect())
        assert a == b


class TestTercileCuts:
    def test_equal_count_split(self):
        hist = [("en", v, 1) for v in (10, 20, 30, 40, 50, 60, 70, 80, 90)]
        assert _tercile_cuts(hist)["en"] == (30, 60)

    def test_heavy_value_spans_buckets(self):
        # one value holds 7 of 9 docs: both cutoffs land on it
        hist = [("en", 10, 1), ("en", 20, 7), ("en", 30, 1)]
        assert _tercile_cuts(hist)["en"] == (20, 20)

    def test_per_language_independence(self):
        hist = [("en", 10, 2), ("en", 99, 1), ("de", 5, 1), ("de", 6, 1), ("de", 7, 1)]
        cuts = _tercile_cuts(hist)
        assert cuts["en"] == (10, 10)
        assert cuts["de"] == (5, 6)


class TestPerplexityBuckets:
    def test_bucket_semantics(self, spark, corpus):
        got = {r["doc_id"]: r["bucket"] for r in perplexity_buckets(corpus).collect()}
        assert got[6] == "unscored" and got[7] == "unscored"
        # en scored ppls rank 1 < 8 < 9 < 2 → head/head/middle/tail
        assert got[1] == "head" and got[2] == "tail"

    def test_matches_duckdb_mirror(self, spark, corpus):
        got = sorted(tuple(r) for r in perplexity_buckets(corpus).collect())
        con = duckdb.connect()
        con.register("t", corpus.toPandas())
        want = sorted(tuple(r) for r in con.execute(perplexity_buckets_sql("t")).fetchall())
        assert got == want

    def test_all_unmodeled_corpus(self, spark):
        df = spark.createDataFrame([(1, "文本", "zh")], "doc_id long, text string, lang string")
        out = perplexity_buckets(df).collect()
        assert [(r["doc_id"], r["ppl_milli"], r["bucket"]) for r in out] == [
            (1, None, "unscored")
        ]
