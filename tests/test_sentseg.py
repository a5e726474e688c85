"""Sentence segmentation + sentence-level dedup (functions/sentseg.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from spider_spark.functions.sentseg import (
    sentence_dedup,
    sentence_dedup_sql,
    split_sentences,
    split_sentences_sql,
)


def _split_one(spark, text):
    return (
        spark.range(1)
        .select(split_sentences(F.lit(text)).alias("s"))
        .collect()[0]["s"]
    )


class TestSplitter:
    def test_basic_boundaries(self, spark):
        assert _split_one(spark, "One fish. Two fish! Red fish? Blue fish") == [
            "One fish.", "Two fish!", "Red fish?", "Blue fish",
        ]

    def test_consecutive_boundaries_all_found(self, spark):
        # each boundary's capital is consumed by the previous match's
        # replacement scan — the rewrite must still find every one
        assert _split_one(spark, "A. B. C. D.") == ["A.", "B.", "C.", "D."]

    def test_requires_capital_or_opener(self, spark):
        assert _split_one(spark, "version 2.5 is out. next week") == [
            "version 2.5 is out. next week",
        ]
        assert _split_one(spark, 'He said. "Quote starts') == [
            "He said.", '"Quote starts',
        ]
        assert _split_one(spark, "Count up. 9 lives left") == [
            "Count up.", "9 lives left",
        ]

    def test_whitespace_collapsed_first(self, spark):
        assert _split_one(spark, "  One.\n\n  Two.\tThree  ") == [
            "One.", "Two.", "Three",
        ]

    def test_multi_punct_kept_with_left_sentence(self, spark):
        assert _split_one(spark, "What?! Really. Yes") == [
            "What?!", "Really.", "Yes",
        ]

    def test_empty_yields_one_empty_sentence(self, spark):
        assert _split_one(spark, "") == [""]
        assert _split_one(spark, "   ") == [""]

    def test_sql_mirror_bit_exact(self, spark):
        texts = [
            "One fish. Two fish! Red fish? Blue fish",
            "A. B. C. D.",
            "version 2.5 is out. next week",
            'He said. "Quote starts',
            "Count up. 9 lives left",
            "  One.\n\n  Two.\tThree  ",
            "What?! Really. Yes",
            "",
            "   ",
            "no boundary here at all",
        ]
        got = [_split_one(spark, t) for t in texts]
        con = duckdb.connect()
        want = [
            con.execute(
                f"SELECT {split_sentences_sql('t')} FROM (SELECT ? AS t)", [t]
            ).fetchone()[0]
            for t in texts
        ]
        assert got == want


class TestSentenceDedup:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        boiler = "Subscribe to our newsletter today."
        rows = [
            (0, f"Alpha body zero. {boiler} Unique tail zero."),
            (1, f"{boiler} Alpha body one. Unique tail one."),
            (2, f"Alpha body two. Unique tail two. {boiler}"),
            (3, "Only original sentences here. Nothing shared at all."),
            (4, ""),  # empty doc: one empty sentence, kept (df == 1)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string").cache()

    def test_hot_sentence_dropped_everywhere(self, docs):
        out = {r["doc_id"]: r for r in sentence_dedup(docs, max_df=2).collect()}
        assert out[0]["clean_text"] == "Alpha body zero. Unique tail zero."
        assert out[1]["clean_text"] == "Alpha body one. Unique tail one."
        assert out[2]["clean_text"] == "Alpha body two. Unique tail two."
        assert out[3]["clean_text"] == (
            "Only original sentences here. Nothing shared at all."
        )
        assert out[0]["n_segments"] == 3 and out[0]["n_kept"] == 2
        assert out[4]["n_segments"] == 1 and out[4]["n_kept"] == 1

    def test_below_threshold_kept(self, docs):
        out = {r["doc_id"]: r for r in sentence_dedup(docs, max_df=3).collect()}
        assert "Subscribe to our newsletter today." in out[0]["clean_text"]

    def test_sql_mirror_bit_exact(self, docs):
        spark_rows = sorted(
            tuple(r) for r in sentence_dedup(docs, max_df=2).collect()
        )
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        duck_rows = sorted(con.execute(sentence_dedup_sql(max_df=2)).fetchall())
        assert spark_rows == duck_rows

    def test_splitter_plan_is_jvm_only(self, docs):
        plan = (
            docs.select(split_sentences(F.col("text")))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
