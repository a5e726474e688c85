"""KV store (Redis DAO analog, S5): save/scan/update quirk parity —
null-title rows never saved, substring-scan get with '' for missing
titles, overwrite=False preserving the stored content ref."""

import pytest
from pyspark.sql import functions as F

from spider_spark.sources.kvstore import KeyValueStore
from spider_spark.sources.tableio import ParquetManifestIO


@pytest.fixture()
def store(spark, tmp_path):
    return KeyValueStore(ParquetManifestIO(spark, str(tmp_path)))


def _rows(spark, rows):
    return spark.createDataFrame(
        rows, "url string, title string, parent string, content_ref string"
    )


class TestSaveQuirks:
    def test_null_title_rows_are_never_saved(self, spark, store):
        store.save(_rows(spark, [
            ("https://a.example/1", "One", "seed", "r1"),
            ("https://a.example/2", None, "seed", "r2"),   # dropped
            ("https://b.example/3", "Three", "seed", "r3"),
        ]))
        assert store.count_all() == 2
        got = {r["url"] for r in store.get("example").collect()}
        assert got == {"https://a.example/1", "https://b.example/3"}

    def test_no_overwrite_keeps_content_ref_refreshes_title(self, spark, store):
        store.save(_rows(spark, [("https://a.example/1", "Old", "p", "ref-old")]))
        store.save(
            _rows(spark, [("https://a.example/1", "New", "p2", "ref-new")]),
            overwrite=False,
        )
        row = store.io.read(store.name).collect()[0]
        assert row["title"] == "New"           # hmset always refreshes
        assert row["content_ref"] == "ref-old"  # update() kept the old file
        store.save(
            _rows(spark, [("https://a.example/1", "New2", "p3", "ref-new2")])
        )
        row = store.io.read(store.name).collect()[0]
        assert row["content_ref"] == "ref-new2"  # overwrite replaces


class TestScan:
    def test_substring_scan_and_limit(self, spark, store):
        store.save(_rows(spark, [
            (f"https://h{i % 3}.example/d/{i}", f"Doc {i}", "s", f"r{i}")
            for i in range(30)
        ]))
        got = store.get("h1.example", limit=5).collect()
        assert len(got) == 5
        assert all("h1.example" in r["url"] for r in got)
        # deterministic subset: first 5 by url
        urls = sorted(
            f"https://h1.example/d/{i}" for i in range(30) if i % 3 == 1
        )
        assert [r["url"] for r in got] == urls[:5]

    def test_get_on_empty_store_and_drop_all(self, spark, store):
        assert store.get("anything").count() == 0
        assert store.count_all() == 0
        store.save(_rows(spark, [("https://a.example/1", "T", "p", "r")]))
        store.drop_all()
        assert store.count_all() == 0
