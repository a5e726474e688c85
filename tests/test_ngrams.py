"""Corpus n-gram counts + deterministic top-k (operators/ngrams.py)."""

from __future__ import annotations

import duckdb
import pytest

from spider_spark.operators.ngrams import ngram_counts, top_ngrams, top_ngrams_sql


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat"),            # exactly one trigram
        (3, "the  CAT   sat on"),      # normalization folds into doc 1's grams
        (4, "short"),                  # < n words → no grams
        (5, ""),                       # empty → no grams
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestCounts:
    def test_counts_and_edges(self, docs):
        got = dict(ngram_counts(docs, n=3).collect())
        assert got["the cat sat"] == 3
        assert got["cat sat on"] == 2
        assert got["sat on the"] == 1
        assert sum(got.values()) == 4 + 1 + 2  # docs 1,2,3 only

    def test_topk_total_order(self, docs):
        top = top_ngrams(docs, n=3, k=3).collect()
        assert [(r["gram"], r["n_occurrences"]) for r in top] == [
            ("the cat sat", 3),
            ("cat sat on", 2),
            ("on the mat", 1),  # ties broken ASC by gram
        ]

    def test_sql_mirror_bit_exact(self, docs):
        spark_rows = [tuple(r) for r in top_ngrams(docs, n=3, k=10).collect()]
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        duck_rows = con.execute(top_ngrams_sql(n=3, k=10)).fetchall()
        assert spark_rows == duck_rows


class TestBigramPMI:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        # "san francisco" always together (strong collocation); "the" is
        # everywhere (any bigram with it scores low); "red car"/"red sun"
        # split "red"'s mass
        rows = [
            (0, "san francisco is the best city in the bay"),
            (1, "the red car and the red sun"),
            (2, "san francisco fog rolls over the bay"),
            (3, "the car in san francisco is red"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string").cache()

    def test_collocation_outranks_common_pairs(self, spark, docs):
        from spider_spark.operators.ngrams import bigram_pmi

        rows = bigram_pmi(docs, k=20, min_count=2).collect()
        got = {r["gram"]: r for r in rows}
        assert "san francisco" in got
        sf = got["san francisco"]
        assert sf["n_xy"] == 3 and sf["n_x"] == 3 and sf["n_y"] == 3
        # perfectly-bound pair must outrank anything involving "the"
        the_pmis = [r["pmi"] for r in rows if "the" in r["gram"].split()]
        assert all(sf["pmi"] > p for p in the_pmis)

    def test_min_count_floors(self, spark, docs):
        from spider_spark.operators.ngrams import bigram_pmi

        grams = {r["gram"] for r in bigram_pmi(docs, k=50, min_count=2).collect()}
        assert "fog rolls" not in grams, "hapax pair floored by min_count"

    def test_matches_duckdb_mirror(self, spark, docs):
        import duckdb

        from spider_spark.operators.ngrams import bigram_pmi, bigram_pmi_sql

        got = [tuple(r) for r in bigram_pmi(docs, k=20, min_count=1).collect()]
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        want = [tuple(r) for r in
                con.execute(bigram_pmi_sql(k=20, min_count=1)).fetchall()]
        assert got == want

    def test_jvm_only_plan(self, docs):
        from spider_spark.operators.ngrams import bigram_pmi

        plan = (
            bigram_pmi(docs, k=5, min_count=1)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "TakeOrderedAndProject" in plan


class TestKneserNey:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        # "york" occurs often but ONLY after "new" → high raw bigram count,
        # minimal continuation count (the KN signature case); "the" follows
        # many distinct words → high continuation count despite modest
        # per-bigram frequency.
        rows = [
            (0, "new york is big and new york is busy"),
            (1, "in new york the trains run under the river"),
            (2, "over the hill past the mill and into the town"),
            (3, "the cat saw the dog near the barn"),
            (4, "new york again and again the lights"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string").cache()

    @staticmethod
    def _reference(rows, min_count, d_milli):
        """Exact-fraction Python replay of the operator's formula."""
        from fractions import Fraction
        from collections import Counter, defaultdict

        bi = Counter()
        for _, text in rows:
            w = text.lower().split()
            for a, b in zip(w, w[1:]):
                bi[(a, b)] += 1
        ctx_tot, fanout, cont = Counter(), Counter(), Counter()
        for (a, b), n in bi.items():
            ctx_tot[a] += n
            fanout[a] += 1
            cont[b] += 1
        t = len(bi)
        out = {}
        for (a, b), n in bi.items():
            if n < min_count:
                continue
            p = Fraction(
                (1000 * n - d_milli) * t + d_milli * fanout[a] * cont[b],
                1000 * ctx_tot[a] * t,
            )
            out[f"{a} {b}"] = (n, ctx_tot[a], fanout[a], cont[b],
                               (p.numerator * 1000000) // p.denominator)
        return out

    def test_matches_exact_fraction_reference(self, docs):
        from spider_spark.operators.ngrams import kn_bigram_probs

        rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
        ref = self._reference(rows, min_count=2, d_milli=750)
        got = kn_bigram_probs(docs, k=100, min_count=2, d_milli=750).collect()
        assert len(got) == len(ref)
        for r in got:
            assert ref[r["gram"]] == (
                r["n_xy"], r["n_ctx"], r["fanout_x"], r["cont_y"], r["prob_ppm"]
            ), r["gram"]

    def test_continuation_beats_raw_frequency(self, docs):
        """'the' completes many contexts, 'york' only one: for equal raw
        bigram counts a *-the bigram must carry more continuation mass."""
        from spider_spark.operators.ngrams import kn_bigram_probs

        got = {r["gram"]: r for r in
               kn_bigram_probs(docs, k=100, min_count=1).collect()}
        assert got["new york"]["cont_y"] == 1
        assert got["into the"]["cont_y"] > 3

    def test_sql_mirror_bit_exact(self, docs):
        from spider_spark.operators.ngrams import kn_bigram_probs, kn_bigram_probs_sql

        spark_rows = [tuple(r) for r in
                      kn_bigram_probs(docs, k=50, min_count=1).collect()]
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        duck_rows = con.execute(kn_bigram_probs_sql(k=50, min_count=1)).fetchall()
        assert spark_rows == duck_rows

    def test_rejects_bad_params(self, docs):
        from spider_spark.operators.ngrams import kn_bigram_probs

        with pytest.raises(ValueError):
            kn_bigram_probs(docs, d_milli=0)
        with pytest.raises(ValueError):
            kn_bigram_probs(docs, d_milli=1000)
        with pytest.raises(ValueError):
            kn_bigram_probs(docs, min_count=0)
