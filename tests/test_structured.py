"""Structured-metadata extraction (functions/structured.py): JSON-LD
entity flattening and OpenGraph head properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark.functions.structured import (
    extract_jsonld,
    extract_opengraph,
    jsonld_entities,
    opengraph_df,
)


def _page(block: str) -> str:
    return f"<html><head>{block}</head><body>x</body></html>"


class TestJsonLd:
    def test_single_object_full(self):
        e = extract_jsonld(_page(
            '<script type="application/ld+json">'
            '{"@type":"NewsArticle","headline":"H",'
            '"datePublished":"2024-01-01T10:20:30Z",'
            '"author":{"name":"A"}}</script>'))
        assert e == [{"type": "NewsArticle", "headline": "H",
                      "published_epoch": 1704104430, "author": "A"}]

    def test_graph_array_and_name_fallback(self):
        e = extract_jsonld(_page(
            '<script type="application/ld+json">{"@graph":['
            '{"@type":"Article","headline":"G"},'
            '{"@type":"Organization","name":"Org"}]}</script>'))
        assert [x["type"] for x in e] == ["Article", "Organization"]
        assert e[1]["headline"] == "Org"  # name fallback

    def test_top_level_array_and_author_forms(self):
        e = extract_jsonld(_page(
            '<script type="application/ld+json">['
            '{"@type":"A","author":"plain"},'
            '{"@type":"B","author":[{"name":"first"},{"name":"second"}]},'
            '{"@type":["C","ignored"],"author":{"noname":1}}]</script>'))
        assert [x["author"] for x in e] == ["plain", "first", None]
        assert e[2]["type"] == "C"  # first of a type list

    def test_malformed_block_isolated(self):
        e = extract_jsonld(_page(
            '<script type="application/ld+json">{oops</script>'
            '<script type="application/ld+json">'
            '{"@type":"Article","headline":"ok"}</script>'))
        assert [x["headline"] for x in e] == ["ok"]

    def test_non_ld_scripts_and_empty_entities_skipped(self):
        assert extract_jsonld(_page(
            '<script>var x = {"@type":"Nope"};</script>'
            '<script type="application/ld+json">{"irrelevant":1}</script>'
        )) == []
        assert extract_jsonld("") == []

    def test_bad_date_is_null_not_error(self):
        e = extract_jsonld(_page(
            '<script type="application/ld+json">'
            '{"@type":"A","datePublished":"last tuesday"}</script>'))
        assert e[0]["published_epoch"] is None


class TestOpenGraph:
    def test_full_and_first_wins(self):
        t = extract_opengraph(_page(
            '<meta property="og:title" content="T1">'
            '<meta property="og:title" content="T2">'
            '<meta property="og:type" content="article">'
            '<meta property="og:image" content="i.png">'
            '<meta property="og:url" content="u">'))
        assert t == ("T1", "article", "i.png", "u")

    def test_head_scoped_and_case(self):
        t = extract_opengraph(
            '<html><head><meta property="OG:TYPE" content="video">'
            "</head><body>"
            '<meta property="og:title" content="body decoy">'
            "</body></html>")
        assert t == (None, "video", None, None)

    def test_empty_content_skipped(self):
        assert extract_opengraph(_page(
            '<meta property="og:title" content="">')) == (None,) * 4


class TestSparkWiring:
    def test_single_arrow_pass_each(self, spark):
        pages = spark.createDataFrame(
            [("u1", _page(
                '<script type="application/ld+json">'
                '{"@type":"A","headline":"h"}</script>'
                '<meta property="og:title" content="t">'))],
            "url string, html string")
        ents = jsonld_entities(pages)
        og = opengraph_df(pages)
        for df in (ents, og):
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert plan.count("ArrowEvalPython") == 1, plan
        assert ents.collect()[0]["headline"] == "h"
        assert og.collect()[0]["og_title"] == "t"
