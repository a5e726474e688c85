"""DSIR importance resampling: weight semantics, Gumbel-top-k
determinism, and DuckDB-mirror parity (operators/dsir.py)."""

from __future__ import annotations

import duckdb
import pytest

from spider_spark.operators.dsir import (
    _diff_table,
    dsir_select,
    dsir_select_sql,
    dsir_weights,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


class TestWeights:
    def test_target_lang_scores_higher_on_average(self, spark):
        """The importance weight must, per gram, rank target-language text
        above every other language — the point of the estimator. Uses the
        held-out REAL-language sentences from test_textfns (the synthetic
        sf corpus's languages are deliberately near-identical at the
        trigram level, so they cannot exercise a discriminative cut)."""
        from pyspark.sql import functions as F

        from spider_spark.functions.perplexity import _gram_col
        from tests.test_textfns import HELD_OUT

        rows = [
            (i, lang, s)
            for i, (lang, s) in enumerate(
                (lang, s) for lang, sents in HELD_OUT.items() for s in sents
            )
        ]
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        w = dsir_weights(df, target_lang="en")
        per_gram = (
            df.select("doc_id", "lang",
                      F.size(_gram_col(F.col("text"))).alias("n"))
            .join(w, "doc_id")
            .groupBy("lang")
            .agg(F.avg(F.col("weight_milli") / F.col("n")).alias("m"))
        )
        means = dict(per_gram.collect())
        others = [v for k, v in means.items() if k != "en"]
        assert means["en"] > max(others), means

    def test_empty_doc_weight_zero(self, spark):
        df = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id long, text string")
        got = dict(dsir_weights(df).collect())
        assert got == {1: 0, 2: 0}

    def test_unknown_target_raises(self):
        with pytest.raises(ValueError):
            _diff_table("klingon")


class TestSelect:
    def test_deterministic_and_k_rows(self, docs):
        a = [tuple(r) for r in dsir_select(docs, k=50).collect()]
        b = [tuple(r) for r in dsir_select(docs, k=50).collect()]
        assert a == b and len(a) == 50
        # keys strictly ordered (total order ⇒ no ambiguity at the cut)
        keys = [r[2] for r in a]
        assert keys == sorted(keys, reverse=True)

    def test_sql_mirror_bit_exact(self, spark, docs, sf_dir):
        spark_rows = [tuple(r) for r in dsir_select(docs, k=50).collect()]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS"
            f" SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        duck_rows = con.execute(dsir_select_sql(k=50)).fetchall()
        assert spark_rows == duck_rows
