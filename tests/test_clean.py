"""C4 line-level cleaning + PII redaction: hand-checkable rule firings and
bit-exact DuckDB mirror parity (the Java-regex ∩ RE2 contract)."""

import duckdb
import pytest

from spider_spark.functions.clean import (
    c4_clean,
    c4_clean_sql,
    pii_redact,
    pii_redact_sql,
)


class TestC4Clean:
    @pytest.fixture(scope="class")
    def crafted(self, spark):
        rows = [
            # every line kept, 3+ sentences -> keep
            (0, "The quick brown fox jumps over it.\n"
                "A second sentence sits right here!\n"
                'He said "it ends with a quote."'),
            # short lines and no terminal punctuation -> all dropped
            (1, "nav\nhome\nabout us\ncontact"),
            # javascript line dropped, rest kept but only 2 sentences
            (2, "Please enable javascript to view this page.\n"
                "Here is one real sentence for you.\n"
                "And here is the second real one."),
            # lorem ipsum page-level drop despite clean lines
            (3, "Lorem ipsum dolor sit amet something here.\n"
                "A first real sentence lives right here.\n"
                "A second real sentence lives right here.\n"
                "A third real sentence lives right here."),
            # curly brace page-level drop
            (4, "This page contains some code { return 1; }\n"
                "A first real sentence lives right here.\n"
                "A second real sentence lives right here.\n"
                "A third real sentence lives right here."),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string").cache()

    def test_rule_firings(self, crafted):
        got = {r["doc_id"]: r.asDict() for r in c4_clean(crafted).collect()}
        assert got[0]["keep"] is True and got[0]["n_lines_kept"] == 3
        assert got[1]["n_lines_kept"] == 0 and got[1]["keep"] is False
        # the javascript line is gone; the two real sentences survive but
        # the page fails the >=3-sentence rule
        assert got[2]["n_lines_kept"] == 2 and got[2]["keep"] is False
        assert "javascript" not in got[2]["clean_text"]
        assert got[3]["keep"] is False and got[3]["n_sentences"] >= 3
        assert got[4]["keep"] is False

    def test_matches_duckdb_mirror(self, spark, crafted, sf_dir):
        for df in (crafted, spark.read.parquet(f"{sf_dir}/documents.parquet")):
            got = {tuple(r) for r in c4_clean(df).collect()}
            con = duckdb.connect()
            con.register("documents", df.toPandas())
            want = {tuple(r) for r in con.execute(c4_clean_sql()).fetchall()}
            assert got == want


class TestPIIRedact:
    @pytest.fixture(scope="class")
    def crafted(self, spark):
        rows = [
            (0, "Mail me at jane.doe+spam@example.co.uk or call "
                "+1 555-123-4567 now."),
            (1, "Server at 192.168.0.1 and 10.0.0.255, admin@host.org."),
            (2, "No pii here at all, just text."),
            # phone pattern must not eat an already-redacted ip
            (3, "ip 8.8.8.8 then digits 12345678901 trailing"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string").cache()

    def test_redaction(self, crafted):
        got = {r["doc_id"]: r.asDict() for r in pii_redact(crafted).collect()}
        assert got[0]["n_emails"] == 1 and got[0]["n_phones"] == 1
        assert "<EMAIL>" in got[0]["redacted"]
        assert "<PHONE>" in got[0]["redacted"]
        assert got[1]["n_ips"] == 2 and got[1]["n_emails"] == 1
        assert got[1]["redacted"].count("<IP>") == 2
        assert got[2]["redacted"] == got[2]["redacted"] and got[2]["n_ips"] == 0
        assert got[3]["n_ips"] == 1 and got[3]["n_phones"] == 1

    def test_matches_duckdb_mirror(self, spark, crafted, sf_dir):
        for df in (crafted, spark.read.parquet(f"{sf_dir}/documents.parquet")):
            got = {tuple(r) for r in pii_redact(df).collect()}
            con = duckdb.connect()
            con.register("documents", df.toPandas())
            want = {tuple(r) for r in con.execute(pii_redact_sql()).fetchall()}
            assert got == want


class TestCardRedact:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        rows = [
            (0, "pay with 4111111111111111 today"),            # valid Visa test
            (1, "fake 4111111111111112 stays"),                # checksum fails
            (2, "grouped 4012 8888 8888 1881 and 5500-0000-0000-0004"),
            (3, "short 4222222222222 works"),                  # 13-digit valid
            (4, "order id 123456789012345 is not a card"),     # 15d, fails Luhn
            (5, "no digits at all"),
            (6, "twice 4111111111111111 and 4111111111111111"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string").cache()

    def test_validated_redaction(self, docs):
        from spider_spark.functions.clean import card_redact

        got = {r["doc_id"]: r for r in card_redact(docs).collect()}
        assert got[0]["redacted"] == "pay with <CARD> today"
        assert got[0]["n_cards"] == 1
        assert got[1]["redacted"] == "fake 4111111111111112 stays"
        assert got[1]["n_cards"] == 0
        assert got[2]["redacted"] == "grouped <CARD> and <CARD>"
        assert got[2]["n_cards"] == 2
        assert got[3]["redacted"] == "short <CARD> works"
        assert got[4]["n_cards"] == 0
        assert got[5]["redacted"] == "no digits at all"
        assert got[6]["redacted"] == "twice <CARD> and <CARD>"
        assert got[6]["n_cards"] == 2

    def test_sql_mirror_bit_exact(self, docs):
        from spider_spark.functions.clean import card_redact, card_redact_sql

        spark_rows = sorted(tuple(r) for r in card_redact(docs).collect())
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        duck_rows = sorted(con.execute(card_redact_sql()).fetchall())
        assert spark_rows == duck_rows

    def test_plan_is_jvm_only(self, docs):
        from spider_spark.functions.clean import card_redact

        plan = card_redact(docs)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
