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


class TestDustRules:
    @pytest.fixture(scope="class")
    def urls(self, spark):
        rows = []
        # h1: an a↔amp alias family over 4 contents + one p↔print pair
        for i in range(4):
            rows += [(f"http://h1.example/a/p{i}", f"c{i}"),
                     (f"http://h1.example/amp/p{i}", f"c{i}")]
        rows += [("http://h1.example/p/x", "cp"),
                 ("http://h1.example/print/x", "cp")]
        # h2: same segment alias on another host — must NOT merge with h1
        rows += [("http://h2.example/a/q0", "d0"),
                 ("http://h2.example/amp/q0", "d0"),
                 ("http://h2.example/a/q1", "d1"),
                 ("http://h2.example/amp/q1", "d1")]
        # cross-host same-content pair: ignored (different hosts)
        rows += [("http://h1.example/a/z", "cx"),
                 ("http://h2.example/a/z", "cx")]
        # two-segment mismatch: ignored
        rows += [("http://h1.example/u/v/w", "cm"),
                 ("http://h1.example/uu/vv/w", "cm")]
        # different path lengths: ignored
        rows += [("http://h1.example/one", "cl"),
                 ("http://h1.example/one/two", "cl")]
        # hot fingerprint (mirror-wide duplicate): guard must drop it
        rows += [(f"http://h3.example/m{j}/page", "hot") for j in range(9)]
        return spark.createDataFrame(rows, "url string, fp string").cache()

    def test_rules_and_support(self, urls):
        from spider_spark.operators.urlmining import dust_rules

        got = {(r["host"], r["seg_from"], r["seg_to"]): r["support"]
               for r in dust_rules(urls, min_support=1, max_bucket=4).collect()}
        assert got[("h1.example", "a", "amp")] == 4
        assert got[("h2.example", "a", "amp")] == 2
        assert got[("h1.example", "p", "print")] == 1
        # guard: the 9-URL hot fingerprint would contribute 36 h3 pairs
        assert not any(h == "h3.example" for h, _, _ in got)
        # structural exclusions never appear
        assert ("h1.example", "u", "uu") not in got
        assert ("h1.example", "one", "two") not in got

    def test_min_support_floor(self, urls):
        from spider_spark.operators.urlmining import dust_rules

        got = dust_rules(urls, min_support=2, max_bucket=4).collect()
        assert {(r["host"], r["seg_from"], r["seg_to"]) for r in got} == {
            ("h1.example", "a", "amp"), ("h2.example", "a", "amp"),
        }

    def test_sql_mirror_bit_exact(self, urls):
        from spider_spark.operators.urlmining import dust_rules, dust_rules_sql

        spark_rows = [tuple(r) for r in
                      dust_rules(urls, min_support=1, max_bucket=4).collect()]
        con = duckdb.connect()
        con.register("urls", urls.toPandas())
        duck_rows = con.execute(
            dust_rules_sql("urls", min_support=1, max_bucket=4)
        ).fetchall()
        assert spark_rows == duck_rows

    def test_rejects_bad_params(self, urls):
        from spider_spark.operators.urlmining import dust_rules

        with pytest.raises(ValueError):
            dust_rules(urls, min_support=0)
        with pytest.raises(ValueError):
            dust_rules(urls, max_bucket=1)
