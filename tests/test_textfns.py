"""Text-analysis function tests (token counts, quality, fingerprints,
language ID) against hand-computed expectations."""

import pytest
from pyspark.sql import functions as F

from spider_spark.functions.text import (
    alpha_ratio,
    bpe_ish_token_count,
    fingerprint_md5,
    make_lang_id_udf,
    mean_word_len,
    quality_score,
    rolling_fingerprint,
    token_count,
)


def one(spark, text, col_fn):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col_fn(F.col("text")).alias("v")).collect()[0]["v"]


class TestTokenCounts:
    def test_whitespace_tokens(self, spark):
        assert one(spark, "a b  c", token_count) == 3
        assert one(spark, "", token_count) == 0
        assert one(spark, "   ", token_count) == 0
        assert one(spark, "single", token_count) == 1

    def test_bpe_ish(self, spark):
        # 'Hello' ',' 'world' '!' -> 4
        assert one(spark, "Hello, world!", bpe_ish_token_count) == 4
        assert one(spark, "", bpe_ish_token_count) == 0


class TestQuality:
    def test_ratios(self, spark):
        assert one(spark, "abcd", alpha_ratio) == 1.0
        assert one(spark, "ab12", alpha_ratio) == 0.5
        assert one(spark, "ab cd", mean_word_len) == 2.0

    def test_quality_bounds(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        stats = docs.select(quality_score(F.col("text")).alias("q")).agg(
            F.min("q").alias("lo"), F.max("q").alias("hi")
        ).collect()[0]
        assert 0.0 <= stats["lo"] <= stats["hi"] <= 1.0


class TestFingerprints:
    def test_exact_fp_normalization(self, spark):
        a = one(spark, "Hello   World", fingerprint_md5)
        b = one(spark, "  hello world ", fingerprint_md5)
        c = one(spark, "hello worlds", fingerprint_md5)
        assert a == b != c

    def test_rolling_fp_deterministic_and_local(self, spark):
        base = " ".join(f"w{i}" for i in range(40))
        a = one(spark, base, rolling_fingerprint)
        b = one(spark, base, rolling_fingerprint)
        assert a == b
        # shorter than the window: whole text is the single gram
        short = one(spark, "only three words", rolling_fingerprint)
        assert short is not None


class TestLangID:
    @pytest.mark.parametrize(
        "text,lang",
        [
            ("the cat sat on the mat and it was happy", "en"),
            ("der hund ist nicht in der küche und das ist gut", "de"),
            ("el perro es muy grande y no está en la casa", "es"),
            ("le chien est dans la maison et il est content", "fr"),
            ("", "und"),
            ("zzz qqq xxx", "und"),
        ],
    )
    def test_lang(self, spark, text, lang):
        udf = make_lang_id_udf()
        df = spark.createDataFrame([(text,)], "text string")
        assert df.select(udf(F.col("text")).alias("v")).collect()[0]["v"] == lang
