"""Content-defined chunking + chunk-level storage dedup (operators/cdc.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from spider_spark.operators.cdc import (
    cdc_chunks,
    cdc_dedup_stats,
    cdc_dedup_stats_sql,
)

BODY = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega "
        "one two three four five six seven eight nine ten")


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BODY),
        # same body with ONE word prepended: fixed blocks would misalign
        # everywhere; CDC must re-align after the first boundary
        (1, "INSERTED " + BODY),
        (2, "tiny doc"),          # shorter than k -> one chunk
        (3, ""),                  # empty -> zero chunks
        (4, BODY),                # exact duplicate of doc 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


class TestChunks:
    def test_chunks_reassemble_to_text(self, docs):
        ch = cdc_chunks(docs, k=3, p=4).collect()
        by_doc: dict = {}
        for r in ch:
            by_doc.setdefault(r["doc_id"], []).append((r["cpos"], r["chunk"]))
        for r in docs.collect():
            norm = " ".join(r["text"].lower().split())
            got = " ".join(c for _, c in sorted(by_doc.get(r["doc_id"], [])))
            assert got == norm, r["doc_id"]

    def test_shift_realigns(self, docs):
        """After one prepended word, all but the first chunk(s) of doc 1
        must hash-match doc 0's chunks (the CDC property)."""
        ch = cdc_chunks(docs, k=3, p=4)
        h0 = {r["c_hash"] for r in ch.filter(F.col("doc_id") == 0).collect()}
        rows1 = sorted(
            (r["cpos"], r["c_hash"])
            for r in ch.filter(F.col("doc_id") == 1).collect()
        )
        shared = [h for _, h in rows1 if h in h0]
        assert len(shared) >= len(rows1) - 2  # only the head chunk differs
        assert len(rows1) > 3  # the fixture actually chunks

    def test_short_doc_single_chunk(self, docs):
        rows = cdc_chunks(docs, k=3, p=4).filter(F.col("doc_id") == 2).collect()
        assert len(rows) == 1 and rows[0]["chunk"] == "tiny doc"


class TestDedupStats:
    def test_exact_dup_fully_saved(self, docs):
        got = {r["doc_id"]: r for r in cdc_dedup_stats(docs, k=3, p=4).collect()}
        # docs 0 and 4 are identical: every chunk of both is dup
        assert got[0]["n_dup_chunks"] == got[0]["n_chunks"]
        assert got[4]["n_dup_chunks"] == got[4]["n_chunks"]
        assert got[0]["dup_words"] == len(BODY.split())
        # doc 1 shares its re-aligned tail, keeps its head
        assert 0 < got[1]["n_dup_chunks"] <= got[1]["n_chunks"]
        # empty doc reports zeros but is present
        assert got[3]["n_chunks"] == 0 and got[3]["dup_words"] == 0
        assert got[2]["n_dup_chunks"] == 0

    def test_sql_mirror_bit_exact(self, docs):
        spark_rows = sorted(
            tuple(r) for r in cdc_dedup_stats(docs, k=3, p=4).collect()
        )
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        duck_rows = sorted(
            con.execute(cdc_dedup_stats_sql(k=3, p=4)).fetchall()
        )
        assert spark_rows == duck_rows

    def test_plan_is_jvm_only(self, docs):
        plan = (
            cdc_chunks(docs, k=3, p=4)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_rejects_bad_params(self, docs):
        with pytest.raises(ValueError):
            cdc_chunks(docs, k=0)
        with pytest.raises(ValueError):
            cdc_chunks(docs, p=1)
