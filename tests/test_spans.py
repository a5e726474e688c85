"""Sub-document dedup: duplicate-span stats + segment-frequency filter."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from spider_spark.operators.spans import (
    segment_filter_chunks_sql,
    segment_frequency_filter,
    span_dup_stats,
    span_dup_stats_sql,
    span_windows,
    word_chunks,
)


def _words(n, tag):
    return " ".join(f"{tag}{i}" for i in range(n))


class TestSpanWindows:
    def test_positions_and_counts(self, spark):
        # 12 words, width 8, stride 2 → starts 1, 3, 5 (5+7=12 fits; 7 doesn't)
        docs = spark.createDataFrame([(0, _words(12, "w"))], "doc_id long, text string")
        got = span_windows(docs, width=8, stride=2).collect()
        assert sorted(r["pos"] for r in got) == [1, 3, 5]

    def test_short_doc_emits_nothing(self, spark):
        docs = spark.createDataFrame([(0, _words(7, "w"))], "doc_id long, text string")
        assert span_windows(docs, width=8, stride=2).count() == 0

    def test_hash_is_content_addressed(self, spark):
        # the same 8-word run at different positions in different docs hashes equal
        span = _words(8, "s")
        docs = spark.createDataFrame(
            [(0, f"a b {span}"), (1, f"{span} x y z")], "doc_id long, text string"
        )
        rows = span_windows(docs, width=8, stride=1).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], set()).add(r["span_hash"])
        assert by_doc[0] & by_doc[1], "shared span must produce a shared hash"


class TestSpanDupStats:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        shared = _words(9, "dup")  # 9 = width + stride - 1 → guaranteed detectable
        rows = [
            (0, f"{_words(6, 'a')} {shared} {_words(5, 'b')}"),
            (1, f"{shared} {_words(11, 'c')}"),
            (2, _words(20, "uniq")),           # no duplication
            (3, f"{_words(8, 'rep')} filler0 filler1 {_words(8, 'rep')}"),  # within-doc
            (4, _words(3, "tiny")),            # shorter than width → 0 windows
        ]
        return spark.createDataFrame(rows, "doc_id long, text string").cache()

    def test_guarantee_and_zero_cases(self, spark, corpus):
        got = {r["doc_id"]: r for r in span_dup_stats(corpus, width=8, stride=2).collect()}
        assert set(got) == {0, 1, 2, 3, 4}, "every input doc must appear"
        # the shared 9-word span must be flagged in BOTH docs (width+stride-1 rule)
        assert got[0]["n_dup_windows"] > 0
        assert got[1]["n_dup_windows"] > 0
        # within-doc repetition counts as duplication too (Lee et al. semantics)
        assert got[3]["n_dup_windows"] > 0
        assert got[2]["n_dup_windows"] == 0
        assert got[4]["n_windows"] == 0 and got[4]["dup_fraction"] == 0.0

    def test_matches_duckdb_mirror(self, spark, corpus):
        got = {
            (r["doc_id"]): (r["n_windows"], r["n_dup_windows"], round(r["dup_fraction"], 9))
            for r in span_dup_stats(corpus, width=8, stride=2).collect()
        }
        con = duckdb.connect()
        con.register("documents", corpus.toPandas())
        want = {
            r[0]: (r[1], r[2], round(r[3], 9))
            for r in con.execute(span_dup_stats_sql(width=8, stride=2)).fetchall()
        }
        assert got == want

    def test_jvm_only_plan(self, corpus):
        plan = span_dup_stats(corpus)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestSegmentFilter:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        # boilerplate segment in 4 docs; rare segments in ≤1 doc each
        rows = [
            (0, ["cookie banner", "alpha one", "beta two"]),
            (1, ["gamma three", "cookie banner", "delta four"]),
            (2, ["cookie banner", "epsilon five"]),
            (3, ["cookie banner", "cookie banner"]),  # df counts this doc ONCE
            (4, ["zeta six"]),
        ]
        return spark.createDataFrame(rows, "doc_id long, segs array<string>").cache()

    def test_hot_segment_stripped_everywhere_order_kept(self, spark, docs):
        out = {
            r["doc_id"]: r
            for r in segment_frequency_filter(docs, "segs", max_df=3).collect()
        }
        assert out[0]["clean_text"] == "alpha one beta two"
        assert out[1]["clean_text"] == "gamma three delta four"
        assert out[2]["clean_text"] == "epsilon five"
        assert out[3]["clean_text"] == "" and out[3]["n_kept"] == 0
        assert out[4]["clean_text"] == "zeta six"
        assert out[0]["n_segments"] == 3 and out[0]["n_kept"] == 2

    def test_df_counts_distinct_docs(self, spark, docs):
        # df('cookie banner') = 4 docs (doc 3 counted once) → max_df=4 keeps it
        out = {
            r["doc_id"]: r["n_kept"]
            for r in segment_frequency_filter(docs, "segs", max_df=4).collect()
        }
        assert out[3] == 2, "within-doc duplicates must not inflate df"

    def test_chunks_composition_matches_duckdb(self, spark):
        boiler = "subscribe now"  # one 2-word chunk when aligned
        rows = [(i, f"{boiler} body{i} text{i} tail{i} odd") for i in range(5)]
        rows.append((99, "lonely document words here"))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = segment_frequency_filter(
            docs.withColumn("segs", word_chunks("text", 2)), "segs", max_df=3
        )
        got = {
            r["doc_id"]: (r["clean_text"], r["n_segments"], r["n_kept"])
            for r in out.collect()
        }
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        want = {
            r[0]: (r[1], r[2], r[3])
            for r in con.execute(segment_filter_chunks_sql(2, 3)).fetchall()
        }
        assert got == want
        assert all("subscribe" not in v[0] for v in got.values())

    def test_jvm_only_plan(self, docs):
        plan = (
            segment_frequency_filter(docs, "segs", max_df=3)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestHostBoilerplate:
    @pytest.fixture(scope="class")
    def cleaned(self, spark):
        from spider_spark.operators.spans import host_boilerplate_filter

        # hostA: 4 pages, NAV on all, BANNER on all; hostB: 3 pages,
        # BANNER quoted on ONE page only; hostC: 2 pages (below min_df=3
        # even for its universal NAV line).
        rows = []
        for d in range(4):
            rows.append((d, "a.example", ["NAV-A", "BANNER", f"body a{d}"]))
        for d in range(4, 7):
            segs = ["NAV-B", f"body b{d}"]
            if d == 4:
                segs.insert(1, "BANNER")
            rows.append((d, "b.example", segs))
        for d in range(7, 9):
            rows.append((d, "c.example", ["NAV-C", f"body c{d}"]))
        docs = spark.createDataFrame(
            rows, "doc_id long, host string, segs array<string>")
        out = host_boilerplate_filter(docs, "host", "segs",
                                      min_df=3, frac=(1, 2))
        return {r["doc_id"]: r for r in out.collect()}

    def test_host_scoped_strip(self, cleaned):
        # BANNER vanishes from hostA (df 4/4) but survives on hostB's
        # one quoting page (df 1 < min_df) — the distinction the
        # corpus-wide filter cannot express (global df would be 5).
        assert cleaned[0]["clean_text"] == "body a0"
        assert cleaned[4]["clean_text"] == "BANNER body b4"

    def test_nav_stripped_only_where_df_clears_min(self, cleaned):
        assert cleaned[5]["clean_text"] == "body b5"      # NAV-B df 3 ≥ 3
        assert cleaned[7]["clean_text"] == "NAV-C body c7"  # df 2 < min_df

    def test_counts_and_order(self, cleaned):
        r = cleaned[4]
        assert (r["n_segments"], r["n_kept"]) == (3, 2)
        assert all(cleaned[d]["n_segments"] - cleaned[d]["n_kept"] in (1, 2)
                   or cleaned[d]["n_kept"] == cleaned[d]["n_segments"]
                   for d in cleaned)

    def test_relative_fraction_gate(self, spark):
        from spider_spark.operators.spans import host_boilerplate_filter

        # 8 pages; a segment on 3 of them passes min_df but fails the
        # ≥1/2-of-pages test → kept.
        rows = [(d, "h.example",
                 (["PROMO"] if d < 3 else []) + [f"body {d}"])
                for d in range(8)]
        docs = spark.createDataFrame(
            rows, "doc_id long, host string, segs array<string>")
        out = host_boilerplate_filter(docs, "host", "segs",
                                      min_df=3, frac=(1, 2))
        got = {r["doc_id"]: r["clean_text"] for r in out.collect()}
        assert got[0] == "PROMO body 0"

    def test_jvm_only_plan(self, spark):
        from spider_spark.operators.spans import host_boilerplate_filter

        docs = spark.createDataFrame(
            [(0, "h", ["x", "y"])],
            "doc_id long, host string, segs array<string>")
        out = host_boilerplate_filter(docs, "host", "segs")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan, plan


class TestCollapseRepeats:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        rows = [
            (0, ["a", "a", "b", "b", "b", "c"]),
            (1, ["x", "y", "x"]),          # non-consecutive repeat kept
            (2, ["z"]),
            (3, []),
        ]
        return spark.createDataFrame(rows, "doc_id long, segs array<string>")

    def test_collapse_rule(self, docs):
        from spider_spark.operators.spans import collapse_repeat_segments

        got = {r["doc_id"]: r for r in
               collapse_repeat_segments(docs, "segs").collect()}
        assert got[0]["clean_text"] == "a b c" and got[0]["n_collapsed"] == 3
        assert got[1]["clean_text"] == "x y x" and got[1]["n_collapsed"] == 0
        assert got[2]["clean_text"] == "z"
        assert got[3]["clean_text"] == "" and got[3]["n_segments"] == 0

    def test_word_level_sql_mirror(self, spark):
        from spider_spark.functions.text import normalized_text
        from spider_spark.operators.spans import (
            collapse_repeat_segments, collapse_repeat_words_sql)

        docs = spark.createDataFrame(
            [(0, "spam spam spam eggs"), (1, "one  ONE one two"),
             (2, ""), (3, "no repeats at all")],
            "doc_id long, text string",
        )
        with_segs = docs.select(
            "doc_id",
            F.split(normalized_text(F.col("text")), " ").alias("segs"),
        )
        spark_rows = sorted(
            tuple(r) for r in collapse_repeat_segments(with_segs, "segs").collect()
        )
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        duck_rows = sorted(con.execute(collapse_repeat_words_sql()).fetchall())
        assert spark_rows == duck_rows

    def test_plan_is_jvm_only(self, docs):
        from spider_spark.operators.spans import collapse_repeat_segments

        plan = (
            collapse_repeat_segments(docs, "segs")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "Exchange" not in plan
