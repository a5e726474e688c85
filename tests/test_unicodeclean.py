"""Unicode normalization cleaning (functions/unicodeclean.py): kernel
semantics, NFC composition, DuckDB-mirror parity, Arrow plan shape."""

import unicodedata

import pytest
from pyspark.sql import functions as F

from spider_spark.functions.unicodeclean import (
    clean_unicode,
    clean_unicode_sql,
    clean_unicode_udf,
)

CASES = [
    (0, "Café ​naïve x\r\ny\x07z"),  # NFD+zw+nbsp+crlf+ctrl
    (1, "plain ascii with\ttab\nand newline"),
    (2, None),
    (3, "already NFC: Café naïve"),
    (4, "bidi ‪embed‬ end­soft﻿bom"),
    (5, "narrow nbsp and ⁠word joiner"),
    (6, "Привіт світ"),  # Cyrillic, already clean
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CASES, "doc_id long, text string").cache()


class TestCleanUnicode:
    def test_kernel_semantics(self):
        got = clean_unicode(CASES[0][1])
        assert got == "Café naïve x\nyz"
        assert unicodedata.is_normalized("NFC", got)
        # idempotent
        assert clean_unicode(got) == got
        # fast path returns the identical object for clean ASCII
        s = CASES[1][1]
        assert clean_unicode(s) is s
        assert clean_unicode(None) is None

    def test_udf_matches_kernel(self, docs):
        got = {
            r["doc_id"]: r["cleaned"]
            for r in docs.select(
                "doc_id", clean_unicode_udf(F.col("text")).alias("cleaned")
            ).collect()
        }
        for i, s in CASES:
            assert got[i] == clean_unicode(s), f"doc {i}"

    def test_matches_duckdb_mirror(self, docs):
        import duckdb

        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        want = dict(
            con.execute(
                f"SELECT doc_id, {clean_unicode_sql('text')} FROM documents"
            ).fetchall()
        )
        got = {
            r["doc_id"]: r["cleaned"]
            for r in docs.select(
                "doc_id", clean_unicode_udf(F.col("text")).alias("cleaned")
            ).collect()
        }
        assert got == want

    def test_single_arrow_pass(self, docs):
        plan = (
            docs.select(clean_unicode_udf(F.col("text")).alias("c"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("ArrowEvalPython") == 1
