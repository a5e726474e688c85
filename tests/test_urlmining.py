"""URL template mining: family collapse semantics + DuckDB mirror parity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from spider_spark.operators.urlmining import (
    url_template,
    url_templates,
    url_templates_sql,
)


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        ("https://a.example/2024/3/14/post-77",),
        ("https://a.example/2024/11/2/post-9001",),     # same family
        ("https://a.example/session/deadbeefcafe1234",),
        ("https://a.example/session/0123456789abcdef",),  # same family (hex)
        ("https://a.example/about",),
        ("https://b.example/2024/3/14/post-77",),       # same shape, other host
        ("https://a.example",),                          # empty path → /
        ("https://a.example/item?id=123&page=4",),      # query digits templated
    ]
    return spark.createDataFrame(rows, "url string").cache()


class TestTemplates:
    def test_family_collapse(self, spark, pages):
        got = {
            (r["host"], r["template"]): (r["n_urls"], r["example_url"], r["depth"])
            for r in url_templates(pages).collect()
        }
        assert got[("a.example", "/{n}/{n}/{n}/post-{n}")] == (
            2, "https://a.example/2024/11/2/post-9001", 4)
        assert got[("a.example", "/session/{hex}")][0] == 2
        assert got[("b.example", "/{n}/{n}/{n}/post-{n}")][0] == 1
        assert got[("a.example", "/")] == (1, "https://a.example", 0)
        assert got[("a.example", "/item?id={n}&page={n}")] == (
            1, "https://a.example/item?id=123&page=4", 1)
        assert got[("a.example", "/about")][0] == 1

    def test_hex_beats_digits(self, spark):
        # a ≥8-char hex run must template as {hex}, not a digit/letter mix
        df = spark.createDataFrame(
            [("https://x.example/h/12345678",), ("https://x.example/h/1234567",)],
            "url string",
        )
        tpls = {r[0] for r in df.select(url_template(F.col("url"))).collect()}
        assert tpls == {"/h/{hex}", "/h/{n}"}

    def test_matches_duckdb_mirror(self, spark, pages):
        got = sorted(tuple(r) for r in url_templates(pages).collect())
        con = duckdb.connect()
        con.register("pages", pages.toPandas())
        want = sorted(tuple(r) for r in con.execute(url_templates_sql()).fetchall())
        assert got == want

    def test_jvm_only_plan(self, pages):
        plan = (
            url_templates(pages)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
