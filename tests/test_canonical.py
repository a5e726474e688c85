"""rel=canonical extraction + cluster consolidation
(functions/parse.py extract_canonical, operators/canonical.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark.functions.parse import extract_canonical
from spider_spark.operators.canonical import canonical_clusters, canonical_map

BASE = "https://h1.example/d/7"


class TestExtractCanonical:
    def test_absolute(self):
        h = '<html><head><link rel="canonical" href="https://a.example/x"></head></html>'
        assert extract_canonical(h, BASE) == "https://a.example/x"

    def test_none_declared(self):
        assert extract_canonical("<html><head></head><body>x</body></html>", BASE) is None

    def test_first_wins(self):
        h = ('<head><link rel="canonical" href="https://a.example/1">'
             '<link rel="canonical" href="https://a.example/2"></head>')
        assert extract_canonical(h, BASE) == "https://a.example/1"

    def test_rel_token_list_and_case(self):
        h = '<head><link REL="alternate Canonical" href="https://a.example/t"></head>'
        assert extract_canonical(h, BASE) == "https://a.example/t"

    def test_non_canonical_links_skipped(self):
        h = ('<head><link rel="stylesheet" href="/s.css">'
             '<link rel="canonical" href="https://a.example/c"></head>')
        assert extract_canonical(h, BASE) == "https://a.example/c"

    def test_missing_href_skipped(self):
        h = ('<head><link rel="canonical">'
             '<link rel="canonical" href="https://a.example/c"></head>')
        assert extract_canonical(h, BASE) == "https://a.example/c"

    def test_relative_resolves_against_base(self):
        h = '<head><link rel="canonical" href="/d/9"></head>'
        assert extract_canonical(h, BASE) == "https://h1.example/d/9"

    def test_relative_without_base_is_unusable(self):
        h = '<head><link rel="canonical" href="/d/9"></head>'
        assert extract_canonical(h, None) is None

    def test_body_declaration_ignored(self):
        h = ('<html><head><title>t</title></head>'
             '<body><link rel="canonical" href="https://a.example/b"></body></html>')
        assert extract_canonical(h, BASE) is None

    def test_after_head_close_ignored(self):
        h = ('<head></head>'
             '<link rel="canonical" href="https://a.example/late">')
        assert extract_canonical(h, BASE) is None

    def test_bytes_input_and_malformed(self):
        h = b'<head><link rel="canonical" href="https://a.example/b"'
        # unterminated tag: tolerant parse, no crash; may or may not yield
        assert extract_canonical(h, BASE) in (None, "https://a.example/b")
        assert extract_canonical(b"\xff\xfe<head></head>", BASE) is None

    def test_normalization_via_url_algebra(self):
        h = '<head><link rel="canonical" href="HTTPS://A.Example:443/P"></head>'
        assert extract_canonical(h, BASE) == "https://a.example/P"


def _pages(spark):
    rows = [
        # cluster of 3 → leader a/1 (one member relative)
        ("https://a.example/1", "<head><title>t</title></head>"),
        ("https://a.example/2",
         '<head><link rel="canonical" href="https://a.example/1"></head>'),
        ("https://a.example/3",
         '<head><link rel="canonical" href="/1"></head>'),
        # singleton, no declaration
        ("https://b.example/x", "<head></head>"),
        # self-declaration → singleton with canonical_url set
        ("https://b.example/y",
         '<head><link rel="canonical" href="https://b.example/y"></head>'),
    ]
    return spark.createDataFrame(rows, "url string, html_s string").select(
        "url", F.encode(F.concat(F.lit("<html>"), "html_s",
                                 F.lit("<body>x</body></html>")),
                        "UTF-8").alias("html"))


class TestCanonicalClusters:
    def test_clusters(self, spark):
        out = {r["url"]: (r["canonical_key"], r["cluster_size"])
               for r in canonical_clusters(_pages(spark)).collect()}
        assert out["https://a.example/1"] == ("https://a.example/1", 3)
        assert out["https://a.example/2"] == ("https://a.example/1", 3)
        assert out["https://a.example/3"] == ("https://a.example/1", 3)
        assert out["https://b.example/x"] == ("https://b.example/x", 1)
        assert out["https://b.example/y"] == ("https://b.example/y", 1)

    def test_canonical_url_nullability(self, spark):
        per = {r["url"]: r["canonical_url"]
               for r in canonical_map(_pages(spark)).collect()}
        assert per["https://a.example/1"] is None
        assert per["https://a.example/3"] == "https://a.example/1"
        assert per["https://b.example/y"] == "https://b.example/y"

    def test_parse_kernel_runs_once(self, spark):
        """Plan pin: ONE ArrowEvalPython — the window count must reuse the
        parsed projection, not re-evaluate the kernel per consumer."""
        plan = (canonical_clusters(_pages(spark))
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("ArrowEvalPython") == 1


from spider_spark.functions.parse import extract_meta_robots


class TestExtractMetaRobots:
    def test_absent(self):
        assert extract_meta_robots("<head></head><body>x</body>") == (False, False)

    def test_noindex_nofollow_tokens(self):
        assert extract_meta_robots(
            '<head><meta name="robots" content="noindex"></head>') == (True, False)
        assert extract_meta_robots(
            '<head><meta name="robots" content="nofollow"></head>') == (False, True)
        assert extract_meta_robots(
            '<head><meta name="robots" content="noindex, nofollow"></head>') == (True, True)

    def test_none_means_both(self):
        assert extract_meta_robots(
            '<head><meta name="robots" content="none"></head>') == (True, True)

    def test_case_and_whitespace(self):
        assert extract_meta_robots(
            '<head><meta name=" ROBOTS " content=" NoIndex ,  NOFOLLOW "></head>'
        ) == (True, True)

    def test_affirmative_is_noop(self):
        assert extract_meta_robots(
            '<head><meta name="robots" content="index, follow"></head>') == (False, False)
        assert extract_meta_robots(
            '<head><meta name="robots" content="all"></head>') == (False, False)

    def test_multiple_tags_most_restrictive(self):
        assert extract_meta_robots(
            '<head><meta name="robots" content="noindex">'
            '<meta name="robots" content="nofollow"></head>') == (True, True)

    def test_body_and_other_names_ignored(self):
        assert extract_meta_robots(
            '<head><meta name="googlebot" content="noindex"></head>'
            '<body><meta name="robots" content="none"></body>') == (False, False)

    def test_bytes_and_malformed(self):
        assert extract_meta_robots(
            b'<head><meta name="robots" content="noindex"') in ((False, False), (True, False))


from spider_spark.functions.parse import (
    audit_head,
    extract_meta_robots,
    parse_page,
)

AUDIT_PAGES = [
    '<html lang="EN-GB"><head><title>T1</title>'
    '<link rel="canonical" href="/c">'
    '<meta name="robots" content="noindex"></head><body>x</body></html>',
    '<html><head></head><body><link rel="canonical" href="/b">'
    '<meta name="robots" content="none"></body></html>',
    '<head><link rel="canonical" href="https://a.example/1">'
    '<link rel="canonical" href="https://a.example/2">'
    '<meta name="robots" content="nofollow">'
    '<meta name="ROBOTS" content="NOINDEX"></head>',
    '<head><title>A\nB</title></head>',
    '<html><head></head><body><title>body title</title></body></html>',
    "<head></head>",
]


class TestAuditHead:
    def test_agrees_with_individual_kernels(self):
        from spider_spark.functions.parse import extract_html_lang

        for h in AUDIT_PAGES + [
            '<html xml:lang=" ES ">x</html>',      # xml:lang fallback
            '<html lang="">x</html>',               # empty → None
            '<html>x</html><html lang="fr">',       # first html wins
        ]:
            fused = audit_head(h, BASE)
            want = (
                parse_page(h)[0],
                extract_canonical(h, BASE),
                *extract_meta_robots(h),
                extract_html_lang(h),
            )
            assert fused == want, h
        assert audit_head(AUDIT_PAGES[0], BASE)[4] == "en-gb"

    def test_one_arrow_pass(self, spark):
        from spider_spark.functions.parse import make_head_audit_udf

        df = spark.createDataFrame(
            [(bytearray(AUDIT_PAGES[0].encode()), BASE)],
            "html binary, url string")
        a = make_head_audit_udf()
        out = df.select(a(F.col("html"), F.col("url")).alias("a")).select(
            "a.title", "a.canonical_url", "a.noindex", "a.nofollow")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("ArrowEvalPython") == 1
        row = out.collect()[0]
        assert (row["title"], row["canonical_url"],
                row["noindex"], row["nofollow"]) == (
            "T1", "https://h1.example/c", True, False)
