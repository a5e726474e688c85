"""Text-analysis function tests (token counts, quality, fingerprints,
language ID) against hand-computed expectations."""

import pytest
from pyspark.sql import functions as F

from spider_spark.functions.text import (
    alpha_ratio,
    bpe_ish_token_count,
    fingerprint_md5,
    make_lang_id_udf,
    mean_word_len,
    quality_score,
    rolling_fingerprint,
    token_count,
)


def one(spark, text, col_fn):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col_fn(F.col("text")).alias("v")).collect()[0]["v"]


class TestTokenCounts:
    def test_whitespace_tokens(self, spark):
        assert one(spark, "a b  c", token_count) == 3
        assert one(spark, "", token_count) == 0
        assert one(spark, "   ", token_count) == 0
        assert one(spark, "single", token_count) == 1

    def test_bpe_ish(self, spark):
        # 'Hello' ',' 'world' '!' -> 4
        assert one(spark, "Hello, world!", bpe_ish_token_count) == 4
        assert one(spark, "", bpe_ish_token_count) == 0


class TestQuality:
    def test_ratios(self, spark):
        assert one(spark, "abcd", alpha_ratio) == 1.0
        assert one(spark, "ab12", alpha_ratio) == 0.5
        assert one(spark, "ab cd", mean_word_len) == 2.0

    def test_quality_bounds(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        stats = docs.select(quality_score(F.col("text")).alias("q")).agg(
            F.min("q").alias("lo"), F.max("q").alias("hi")
        ).collect()[0]
        assert 0.0 <= stats["lo"] <= stats["hi"] <= 1.0


class TestFingerprints:
    def test_exact_fp_normalization(self, spark):
        a = one(spark, "Hello   World", fingerprint_md5)
        b = one(spark, "  hello world ", fingerprint_md5)
        c = one(spark, "hello worlds", fingerprint_md5)
        assert a == b != c

    def test_rolling_fp_deterministic_and_local(self, spark):
        base = " ".join(f"w{i}" for i in range(40))
        a = one(spark, base, rolling_fingerprint)
        b = one(spark, base, rolling_fingerprint)
        assert a == b
        # shorter than the window: whole text is the single gram
        short = one(spark, "only three words", rolling_fingerprint)
        assert short is not None


class TestLangID:
    @pytest.mark.parametrize(
        "text,lang",
        [
            ("the cat sat on the mat and it was happy", "en"),
            ("der hund ist nicht in der küche und das ist gut", "de"),
            ("el perro es muy grande y no está en la casa", "es"),
            ("le chien est dans la maison et il est content", "fr"),
            ("", "und"),
            ("zzz qqq xxx", "und"),
        ],
    )
    def test_lang(self, spark, text, lang):
        udf = make_lang_id_udf()
        df = spark.createDataFrame([(text,)], "text string")
        assert df.select(udf(F.col("text")).alias("v")).collect()[0]["v"] == lang


HELD_OUT = {
    # content-word sentences sharing (almost) no vocabulary with the
    # training lists — the char-trigram model must generalize via
    # morphology (VERDICT r2 next-9 'done' criterion)
    "en": ["scientists discovered remarkable evidence within ancient settlements",
           "weather conditions improved throughout the entire northern region"],
    "de": ["wichtige entscheidungen wurden gestern während der sitzung getroffen",
           "zahlreiche besucher kamen trotz des schlechten wetters zur veranstaltung"],
    "es": ["los investigadores encontraron resultados importantes durante la excavación",
           "muchas personas llegaron temprano para conseguir buenas entradas"],
    "fr": ["les chercheurs ont découvert des résultats remarquables pendant cette période",
           "plusieurs personnes sont arrivées tôt pour obtenir leurs places"],
    "uk": ["дослідники знайшли важливі результати під час розкопок",
           "багато людей прийшли рано щоб отримати гарні місця"],
    "it": ["i ricercatori hanno trovato risultati importanti durante gli scavi",
           "molte persone sono arrivate presto per ottenere buoni posti"],
    "pt": ["os pesquisadores encontraram resultados importantes durante a escavação",
           "muitas pessoas chegaram cedo para conseguir bons lugares"],
    "nl": ["de onderzoekers vonden belangrijke resultaten tijdens de opgravingen",
           "veel mensen kwamen vroeg om goede plaatsen te krijgen"],
    "pl": ["badacze znaleźli ważne wyniki podczas wykopalisk",
           "wiele osób przyszło wcześnie żeby zdobyć dobre miejsca"],
    "sv": ["forskarna hittade viktiga resultat under utgrävningarna",
           "många människor kom tidigt för att få bra platser"],
}


class TestLangIDHeldOut:
    def test_heldout_accuracy(self, spark):
        """The trigram NB model must identify held-out multilingual docs
        well above the 10% random baseline (measured: 90%+; pinned ≥ 80%
        to absorb future vocabulary tweaks)."""
        rows = [(lang, s) for lang, sents in HELD_OUT.items() for s in sents]
        df = spark.createDataFrame(rows, "lang string, text string")
        udf = make_lang_id_udf()
        got = df.select("lang", udf(F.col("text")).alias("pred")).collect()
        acc = sum(r["lang"] == r["pred"] for r in got) / len(got)
        assert acc >= 0.8, f"held-out accuracy {acc:.2f}"

    def test_kernel_matches_duckdb_oracle(self, spark):
        """The integer-score reduction is engine-exact: Spark predictions
        over the held-out corpus equal the SQL mirror's, doc for doc."""
        import duckdb

        from spider_spark.functions.text import lang_id_sql

        rows = [
            (i, s)
            for i, s in enumerate(
                s for sents in HELD_OUT.values() for s in sents
            )
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        udf = make_lang_id_udf()
        got = {
            r["pred"]: r["n"]
            for r in df.select(udf(F.col("text")).alias("pred"))
            .groupBy("pred").agg(F.count("*").alias("n")).collect()
        }
        con = duckdb.connect()
        con.register("documents", df.toPandas())
        want = dict(con.execute(lang_id_sql()).fetchall())
        assert got == want


class TestGopherRules:
    """Published Gopher rule bundle: hand-checkable rule firings + DuckDB
    mirror parity (integer cross-multiplication tests, no float ratios)."""

    @pytest.fixture(scope="class")
    def crafted(self, spark):
        good = " ".join(
            "the quick brown fox jumps over with that have lazy dogs".split()
            * 6
        )  # 60 words, stopwords present, all-alpha, mean len ~4
        rows = [
            (0, good),
            (1, "short doc"),                          # fails word count
            (2, " ".join(["####"] * 60)),              # symbols + no alpha + no stopwords
            (3, good + "\n" + "\n".join(["- item"] * 20)),  # bullet-heavy
            (4, good.replace("dogs", "dogs...") + " " +
                " ".join(["filler"] * 0)),             # a few ellipses, still ok
        ]
        return spark.createDataFrame(rows, "doc_id long, text string").cache()

    def test_rule_firings(self, crafted):
        got = {r["doc_id"]: r.asDict() for r in
               __import__("spider_spark.functions.text",
                          fromlist=["gopher_rules"]).gopher_rules(crafted).collect()}
        assert got[0]["passes"] is True
        assert got[1]["word_count_ok"] is False and got[1]["passes"] is False
        assert got[2]["alpha_words_ok"] is False
        assert got[2]["stopwords_ok"] is False
        assert got[3]["bullet_ok"] is False and got[3]["passes"] is False

    def test_matches_duckdb_mirror(self, spark, crafted, sf_dir):
        import duckdb

        from spider_spark.functions.text import gopher_rules, gopher_rules_sql

        for df in (crafted, spark.read.parquet(f"{sf_dir}/documents.parquet")):
            got = {tuple(r) for r in gopher_rules(df).collect()}
            con = duckdb.connect()
            con.register("documents", df.toPandas())
            want = {tuple(r) for r in con.execute(gopher_rules_sql()).fetchall()}
            assert got == want
