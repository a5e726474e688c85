"""Tracking-parameter URL scrubbing (functions/urlkit.py
strip_tracking_params): JVM-only plan, exact-key matching, query-drop
semantics, and DuckDB mirror parity."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from spider_spark.functions.urlkit import (
    strip_tracking_params,
    strip_tracking_params_sql,
)

CASES = [
    # (input, expected)
    ("http://a.example/p", "http://a.example/p"),                # no query
    ("http://a.example/p?id=3", "http://a.example/p?id=3"),      # clean query
    ("http://a.example/p?utm_source=f&id=3", "http://a.example/p?id=3"),
    ("http://a.example/p?id=3&fbclid=xyz", "http://a.example/p?id=3"),
    ("http://a.example/p?gclid=1&utm_campaign=c", "http://a.example/p"),
    ("http://a.example/p?a=1&utm_medium=m&b=2", "http://a.example/p?a=1&b=2"),
    ("http://a.example/p?utm_sourcex=1", "http://a.example/p?utm_sourcex=1"),
    ("http://a.example/p?x=a=b&gclid=q", "http://a.example/p?x=a=b"),
    ("http://a.example/p?gclid", "http://a.example/p"),          # bare key
]


class TestStripTrackingParams:
    def test_cases(self, spark):
        df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
        got = [
            r["clean"]
            for r in df.select(
                strip_tracking_params("url").alias("clean")).collect()
        ]
        assert got == [want for _, want in CASES]

    def test_plan_is_jvm_only(self, spark):
        df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
        plan = (
            df.select(strip_tracking_params("url").alias("clean"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan and "Arrow" not in plan

    def test_duckdb_mirror_parity(self, spark):
        con = duckdb.connect()
        import pandas as pd

        con.register("rel", pd.DataFrame({"url": [u for u, _ in CASES]}))
        want = [
            r[0] for r in con.execute(
                f"SELECT {strip_tracking_params_sql('url')} FROM rel"
            ).fetchall()
        ]
        df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
        got = [
            r["clean"]
            for r in df.select(
                strip_tracking_params("url").alias("clean")).collect()
        ]
        assert got == want == [w for _, w in CASES]

    def test_custom_param_list(self, spark):
        df = spark.createDataFrame(
            [("http://a.example/?sid=1&id=2",)], "url string")
        got = df.select(
            strip_tracking_params("url", params=("sid",)).alias("c")
        ).collect()[0]["c"]
        assert got == "http://a.example/?id=2"


class TestFoldUrlVariants:
    CASES = [
        ("https://www.a.example/p/index.html", "https://a.example/p"),
        ("https://a.example/p/", "https://a.example/p"),
        ("https://a.example/p", "https://a.example/p"),
        ("https://www.a.example/p/?utm_source=x", "https://a.example/p"),
        ("https://a.example/", "https://a.example"),
        # a surviving real query pins the path rules OFF
        ("https://a.example/p/index.php?id=2", "https://a.example/p/index.php?id=2"),
        ("http://www.b.example/default.aspx", "http://b.example"),
        # www only strips as a host PREFIX
        ("https://notwww.example/p", "https://notwww.example/p"),
    ]

    def test_cases_and_mirror(self, spark):
        import pandas as pd

        from spider_spark.functions.urlkit import (
            fold_url_variants,
            fold_url_variants_sql,
        )

        df = spark.createDataFrame([(u,) for u, _ in self.CASES], "url string")
        got = [r["f"] for r in
               df.select(fold_url_variants("url").alias("f")).collect()]
        con = duckdb.connect()
        con.register("rel", pd.DataFrame({"url": [u for u, _ in self.CASES]}))
        want = [r[0] for r in con.execute(
            f"SELECT {fold_url_variants_sql('url')} FROM rel").fetchall()]
        assert got == want == [w for _, w in self.CASES]

    def test_plan_is_jvm_only(self, spark):
        from spider_spark.functions.urlkit import fold_url_variants

        df = spark.createDataFrame([("https://a.example/",)], "url string")
        plan = (df.select(fold_url_variants("url").alias("f"))
                ._jdf.queryExecution().executedPlan().toString())
        assert "Python" not in plan and "Arrow" not in plan
