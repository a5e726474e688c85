"""SymSpell delete-neighborhood fuzzy matching (operators/fuzzy.py).

Pinned against a brute-force levenshtein reference (shares no code with
the operator) and the DuckDB mirror; the driver's `fuzzy_term_match`
oracle adds the cross-engine check on real corpus text.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_spark.operators.fuzzy import (
    fuzzy_match,
    fuzzy_match_sql,
    vocab_counts,
)


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _reference_best(queries, vocab):
    """Brute-force scan: best (dist ASC, freq DESC, term ASC) within 1."""
    out = {}
    for q in queries:
        cands = [(1 if _lev(q, t) == 1 else 0 if q == t else 9, -f, t)
                 for t, f in vocab.items() if _lev(q, t) <= 1]
        if cands:
            d, nf, t = min(cands)
            out[q] = (t, -nf, d)
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the crawler fetches the remote page"),
        (1, "the crawler parses every remote link"),
        (2, "remote pages link the crawler onward"),
        (3, "politeness budget gates the crawler"),
        (4, "budget politeness budget budget"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestFuzzyMatch:
    def test_matches_brute_force(self, spark, corpus):
        vocab_rows = dict(map(tuple, vocab_counts(corpus).collect()))
        queries = ["crawler", "crawlr", "crawlers", "budgret", "xyzzy",
                   "remot", "bremote", "pxge", "zzzz"]
        qdf = spark.createDataFrame([(q,) for q in queries], "query string")
        got = {r["query"]: (r["term"], r["freq"], r["dist"])
               for r in fuzzy_match(qdf, vocab_counts(corpus)).collect()}
        assert got == _reference_best(queries, vocab_rows)
        # sanity on the fixture itself: typo corrected, exact kept, miss absent
        assert got["crawlr"] == ("crawler", 4, 1)
        assert got["crawler"][2] == 0
        assert got["pxge"] == ("page", 1, 1)  # substitution reaches "page"
        assert "xyzzy" not in got and "zzzz" not in got

    def test_frequency_breaks_ties(self, spark):
        vocab = spark.createDataFrame(
            [("cat", 3), ("car", 10), ("cap", 10)], "term string, freq long")
        qdf = spark.createDataFrame([("caq",)], "query string")
        row = fuzzy_match(qdf, vocab).collect()[0]
        # all three are distance 1; freq 10 beats 3, "cap" < "car"
        assert (row["term"], row["freq"], row["dist"]) == ("cap", 10, 1)

    def test_transposition_out_of_reach(self, spark):
        # "act"/"cat" is Damerau distance 1 but Levenshtein 2: no match
        vocab = spark.createDataFrame([("cat", 5)], "term string, freq long")
        qdf = spark.createDataFrame([("act",)], "query string")
        assert fuzzy_match(qdf, vocab).count() == 0

    def test_min_len_guard(self, spark, corpus):
        assert vocab_counts(corpus, min_len=8).filter(
            "length(term) < 8").count() == 0
        with pytest.raises(ValueError):
            vocab_counts(corpus, min_len=1)

    def test_sql_mirror_bit_exact(self, spark, corpus):
        queries = ["crawlr", "crawler", "budgret", "remot", "qqq",
                   "politness", "gatez"]
        qdf = spark.createDataFrame([(q,) for q in queries], "query string")
        spark_rows = sorted(map(tuple, fuzzy_match(
            qdf, vocab_counts(corpus)).collect()))
        con = duckdb.connect()
        con.register("fdocs", corpus.toPandas())
        con.register("fqueries", pd.DataFrame({"query": queries}))
        duck_rows = sorted(map(tuple, con.execute(fuzzy_match_sql(
            "SELECT * FROM fqueries", "SELECT * FROM fdocs")).fetchall()))
        assert spark_rows == duck_rows


class TestUnicodeEdits:
    def test_multibyte_chars_count_as_one_edit(self, spark):
        """The confirm must be CHAR-exact in both engines: DuckDB's
        builtin levenshtein counts bytes ('café'→'cafe' = 2), which
        would silently diverge from Spark's char count on any accented
        candidate — the rule here is byte-width-blind."""
        import duckdb
        import pandas as pd

        docs = spark.createDataFrame(
            [(0, "café straße 日本 café café straße")],
            "doc_id long, text string")
        queries = ["cafe", "cafés", "strase", "strasse", "日木", "日本語"]
        qdf = spark.createDataFrame([(q,) for q in queries], "query string")
        vocab = vocab_counts(docs, min_len=2)
        got = {r["query"]: (r["term"], r["dist"])
               for r in fuzzy_match(qdf, vocab).collect()}
        assert got["cafe"] == ("café", 1)      # substitution é→e
        assert got["cafés"] == ("café", 1)     # deletion
        assert got["日木"] == ("日本", 1)
        assert got["strase"] == ("straße", 1)  # ß→s is one substitution
        assert "strasse" not in got            # ß→ss is two char edits
        assert got["日本語"] == ("日本", 1)     # one multibyte deletion
        # mirror parity on the same multibyte fixture
        con = duckdb.connect()
        con.register("udocs", docs.toPandas())
        con.register("uqueries", pd.DataFrame({"query": queries}))
        duck_rows = sorted(map(tuple, con.execute(fuzzy_match_sql(
            "SELECT * FROM uqueries", "SELECT * FROM udocs",
            min_len=2)).fetchall()))
        spark_rows = sorted(map(tuple, fuzzy_match(qdf, vocab).collect()))
        assert spark_rows == duck_rows


class TestFuzzyIndex:
    @pytest.fixture(scope="class")
    def built(self, spark, tmp_path_factory):
        from spider_spark.operators.fuzzy import FuzzyIndex
        from spider_spark.sources.tableio import ParquetManifestIO

        corpus = spark.createDataFrame(
            [(0, "the crawler fetches the remote page"),
             (1, "the crawler parses every remote link"),
             (2, "remote pages link the crawler onward")],
            "doc_id long, text string")
        io = ParquetManifestIO(spark, str(tmp_path_factory.mktemp("fz")))
        idx = FuzzyIndex(io, n_buckets=16)
        idx.build(vocab_counts(corpus))
        return corpus, io, idx

    def test_search_equals_inline(self, spark, built):
        corpus, _, idx = built
        queries = ["crawlr", "crawler", "remot", "zzz", "pagee"]
        qdf = spark.createDataFrame([(q,) for q in queries], "query string")
        want = sorted(map(tuple, fuzzy_match(
            qdf, vocab_counts(corpus)).collect()))
        got = sorted(map(tuple, idx.search(qdf).collect()))
        assert got == want and len(got) > 0

    def test_search_prunes_partitions(self, spark, built):
        from spider_spark.operators.fuzzy import _bucket_of, _py_deletes

        _, io, idx = built
        keys = {d for d in _py_deletes("crawlr")}
        buckets = sorted({_bucket_of(d, idx.n_buckets) for d in keys})
        probed = io.read(idx._table).filter(
            F.col("dkey_bucket").isin(buckets))
        plan = probed._jdf.queryExecution().executedPlan().toString()
        scan_line = next(l for l in plan.splitlines() if "FileScan" in l)
        assert "PartitionFilters: [dkey_bucket" in scan_line, scan_line
        assert probed.count() < io.read(idx._table).count()

    def test_py_delete_mirror_matches_jvm(self, spark, built):
        from spider_spark.operators.fuzzy import (
            _bucket_of, _py_deletes, delete_neighborhood)
        from spider_spark.operators.dedupe import md5_60

        terms = ["crawler", "a", "café", "日本語"]
        tdf = spark.createDataFrame([(t,) for t in terms], "t string")
        jvm = {r["t"]: (r["d"], r["b"]) for r in tdf.select(
            "t", delete_neighborhood("t").alias("d")).select(
            "t", "d",
            F.transform("d", lambda x: F.pmod(md5_60(x), F.lit(16)))
            .alias("b")).collect()}
        for t in terms:
            assert _py_deletes(t) == list(jvm[t][0]), t
            assert [_bucket_of(d, 16) for d in _py_deletes(t)] == \
                list(jvm[t][1]), t

    def test_grown_equals_one_shot(self, spark, tmp_path):
        from spider_spark.operators.fuzzy import FuzzyIndex
        from spider_spark.sources.tableio import ParquetManifestIO

        v1 = spark.createDataFrame([("alpha", 3), ("beta", 2)],
                                   "term string, freq long")
        v2 = spark.createDataFrame([("alpha", 4), ("gamma", 1)],
                                   "term string, freq long")
        grown = FuzzyIndex(ParquetManifestIO(spark, str(tmp_path / "g")),
                           n_buckets=8)
        grown.build(v1)
        grown.add(v2)
        oneshot = FuzzyIndex(ParquetManifestIO(spark, str(tmp_path / "o")),
                             n_buckets=8)
        oneshot.build(spark.createDataFrame(
            [("alpha", 7), ("beta", 2), ("gamma", 1)],
            "term string, freq long"))
        qdf = spark.createDataFrame(
            [("alpa",), ("betta",), ("gama",), ("alpha",)], "query string")
        assert sorted(map(tuple, grown.search(qdf).collect())) == \
            sorted(map(tuple, oneshot.search(qdf).collect()))
        # and the merged frequency actually surfaced (3+4)
        got = {r["query"]: r["freq"] for r in grown.search(qdf).collect()}
        assert got["alpha"] == 7
