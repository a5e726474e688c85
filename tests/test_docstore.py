"""JsonDocStore (SURVEY S6/P3 — the Mongo DAO analog): append-only doc
sink, the url==parent get quirk, count, drop."""

import pytest
from pyspark.sql import functions as F

from spider_spark.errors import TableNotFoundError
from spider_spark.sources.docstore import JsonDocStore


@pytest.fixture()
def store(spark, tmp_path):
    return JsonDocStore(spark, str(tmp_path / "docs"))


def docs_df(spark, rows):
    return spark.createDataFrame(
        rows, "url string, title string, parent string, content_ref string"
    )


class TestDocStore:
    def test_save_is_append_only_insert(self, spark, store):
        store.save(docs_df(spark, [("u1", "A", "p", "f1")]))
        store.save(docs_df(spark, [("u1", "B", "p", "f2"), ("u2", "C", "p", "f3")]))
        # no upsert: both u1 documents exist (insert_one semantics)
        assert store.count_all() == 3

    def test_get_quirk_filters_url_not_parent(self, spark, store):
        """mongodb_database.py:73 queries {'url': parent} — get returns
        the document whose URL equals the argument, not the children."""
        store.save(docs_df(spark, [
            ("https://seed/", "Seed", "https://seed/", "f0"),
            ("https://child/1", "C1", "https://seed/", "f1"),
            ("https://child/2", "C2", "https://seed/", "f2"),
        ]))
        got = store.get("https://seed/", limit=10).collect()
        assert [(r["url"], r["title"]) for r in got] == [("https://seed/", "Seed")]

    def test_get_projection_and_limit(self, spark, store):
        store.save(docs_df(spark, [("u", f"T{i}", "p", f"f{i}") for i in range(5)]))
        got = store.get("u", limit=3)
        assert got.columns == ["url", "title"]
        assert got.count() == 3

    def test_drop_and_taxonomy(self, spark, store):
        store.save(docs_df(spark, [("u1", "A", "p", "f1")]))
        store.drop()
        with pytest.raises(TableNotFoundError):
            store.count_all()
        store.drop(check_first=True)  # idempotent
        with pytest.raises(TableNotFoundError):
            store.drop(check_first=False)

    def test_crawl_results_through_doc_sink(self, spark, store):
        """End-to-end: fetched crawl rows saved as documents; the quirky
        get finds the seed's own document."""
        from spider_spark.plans.crawl import CrawlConfig, CrawlEngine
        from spider_spark.sources.pages import synthetic_pages

        pages = synthetic_pages(spark, 60).localCheckpoint(eager=True)
        seed = "https://h0.example/d/2"
        res = CrawlEngine(spark, pages, CrawlConfig(depth=2, verify_text=False)).crawl(seed)
        store.save(
            res.results.filter(F.col("fetched"))
            .select("url", "title", "parent", "content_ref")
        )
        assert store.count_all() == res.successful_crawls
        got = store.get(seed).collect()
        assert len(got) == 1 and got[0]["url"] == seed and got[0]["title"] == "Doc 2"
