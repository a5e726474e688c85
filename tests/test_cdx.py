"""CDX capture index: SURT normalization, DuckDB-mirror parity, the
driver-side bucket mirror, and partition-pruned domain lookups
(operators/cdx.py)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_spark.operators.cdx import (
    CdxIndex,
    _bucket_of,
    cdx_entries,
    dom_key_expr,
    dom_key_of,
    surt_expr,
    surt_sql,
)
from spider_spark.operators.dedupe import md5_60
from spider_spark.sources.tableio import ParquetManifestIO

MESSY = [
    "https://www.h3.example:8080/d/7?b=2&a=1",
    "https://h3.example/d/7",
    "https://H3.EXAMPLE",
    "https://sub.deep.h9.example/a/b?z=1&y=2&x=3",
    "http://www.example/only",            # single post-www label
    "https://h1.example/p/q/",            # trailing slash preserved in path
]


def _df(spark):
    return spark.createDataFrame(
        [(u, 1704067200 + i, f"text {i}") for i, u in enumerate(MESSY)],
        "url string, warc_ts long, text string",
    )


class TestSurt:
    def test_normalization(self, spark):
        got = dict(
            _df(spark).select("url", surt_expr(F.col("url")).alias("s")).collect()
        )
        assert got["https://www.h3.example:8080/d/7?b=2&a=1"] == \
            "example,h3)/d/7?a=1&b=2"
        assert got["https://h3.example/d/7"] == "example,h3)/d/7"
        assert got["https://H3.EXAMPLE"] == "example,h3)/"
        assert got["https://sub.deep.h9.example/a/b?z=1&y=2&x=3"] == \
            "example,h9,deep,sub)/a/b?x=3&y=2&z=1"
        assert got["http://www.example/only"] == "example)/only"

    def test_sql_mirror_bit_exact(self, spark):
        spark_rows = sorted(
            tuple(r) for r in cdx_entries(_df(spark)).collect()
        )
        con = duckdb.connect()
        con.register("pages", _df(spark).toPandas())
        duck_rows = sorted(
            tuple(r)
            for r in con.execute(
                f"SELECT {surt_sql('url')} AS surt, url,"
                f" warc_ts AS ts, md5(text) AS digest FROM pages"
            ).fetchall()
        )
        assert spark_rows == duck_rows

    def test_dom_key_mirrors(self, spark):
        jvm = dict(
            _df(spark).select("url", dom_key_expr(F.col("url")).alias("d")).collect()
        )
        for u in MESSY:
            host = u.split("://")[1].split("/")[0].split(":")[0]
            assert dom_key_of(host) == jvm[u], u
        # SURT-prefix and hostname forms agree
        assert dom_key_of("example,h3)/d/") == "example,h3"
        assert dom_key_of("www.h3.example") == "example,h3"

    def test_bucket_python_mirror_matches_jvm(self, spark):
        keys = ["example,h3", "example,h9", "example", "org,wiki"]
        df = spark.createDataFrame([(k,) for k in keys], "k string").select(
            "k", F.pmod(md5_60(F.col("k")), F.lit(64)).alias("b")
        )
        jvm = dict(df.collect())
        for k in keys:
            assert _bucket_of(k, 64) == jvm[k], k


class TestCdxIndex:
    @pytest.fixture(scope="class")
    def built(self, spark, tmp_path_factory):
        io = ParquetManifestIO(spark, str(tmp_path_factory.mktemp("cdx")))
        idx = CdxIndex(io, n_parts=16)
        idx.build(_df(spark))
        return io, idx

    def test_lookup_rows(self, spark, built):
        _, idx = built
        got = sorted(r["surt"] for r in idx.lookup("h3.example").collect())
        assert got == [
            "example,h3)/",
            "example,h3)/d/7",
            "example,h3)/d/7?a=1&b=2",
        ]
        # full SURT prefix narrows further
        got = [r["url"] for r in idx.lookup("example,h3)/d/").collect()]
        assert sorted(got) == [
            "https://h3.example/d/7",
            "https://www.h3.example:8080/d/7?b=2&a=1",
        ]

    def test_lookup_prunes_partitions(self, spark, built):
        _, idx = built
        plan = idx.lookup("h3.example")._jdf.queryExecution().executedPlan() \
            .toString()
        scan = next(l for l in plan.splitlines() if "FileScan" in l)
        assert "PartitionFilters: [" in scan and "dom_bucket" in scan, scan

    def test_incremental_add(self, spark, built):
        _, idx = built
        delta = spark.createDataFrame(
            [("https://h3.example/new", 1704067300, "fresh")],
            "url string, warc_ts long, text string",
        )
        idx.add(delta)
        got = [r["surt"] for r in idx.lookup("h3.example").collect()]
        assert "example,h3)/new" in got and len(got) == 4
