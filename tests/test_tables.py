"""HTML table extraction: grid semantics, tag-soup tolerance, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_spark.functions.tables import extract_tables, table_rows


class TestKernel:
    def test_basic_grid(self):
        html = (
            "<html><body><table>"
            "<tr><th>Name</th><th> Value </th></tr>"
            "<tr><td>alpha</td><td>1</td></tr>"
            "<tr><td>beta</td><td>2</td></tr>"
            "</table></body></html>"
        )
        rows = extract_tables(html)
        assert rows == [
            {"table_idx": 0, "row_idx": 0, "is_header": True,
             "cells": ["Name", "Value"]},
            {"table_idx": 0, "row_idx": 1, "is_header": False,
             "cells": ["alpha", "1"]},
            {"table_idx": 0, "row_idx": 2, "is_header": False,
             "cells": ["beta", "2"]},
        ]

    def test_unclosed_cells_and_rows(self):
        # tag soup: no </td>, no </tr> — siblings close implicitly
        html = "<table><tr><td>a<td>b<tr><td>c<td>d</table>"
        rows = extract_tables(html)
        assert [r["cells"] for r in rows] == [["a", "b"], ["c", "d"]]

    def test_nested_table_is_its_own_grid(self):
        html = (
            "<table><tr><td>outer "
            "<table><tr><td>inner</td></tr></table>"
            "</td><td>last</td></tr></table>"
        )
        rows = extract_tables(html)
        by_tbl = {}
        for r in rows:
            by_tbl.setdefault(r["table_idx"], []).append(r["cells"])
        assert by_tbl[1] == [["inner"]]
        assert by_tbl[0] == [["outer", "last"]], "inner text must not leak out"

    def test_whitespace_collapse_and_mixed_header(self):
        html = "<table><tr><th>h</th><td>d</td></tr></table>"
        (row,) = extract_tables(html)
        assert row["is_header"] is False, "mixed th/td row is not a header row"
        html2 = "<table><tr><td>  a \n  b\t c </td></tr></table>"
        assert extract_tables(html2)[0]["cells"] == ["a b c"]

    def test_no_tables_and_garbage(self):
        assert extract_tables("<p>plain</p>") == []
        assert extract_tables(b"\xff\xfe garbage <table><tr><td>x") == [
            {"table_idx": 0, "row_idx": 0, "is_header": False, "cells": ["x"]}
        ]

    def test_rowless_cell_gets_implicit_row(self):
        assert extract_tables("<table><td>x</td></table>")[0]["cells"] == ["x"]


class TestRelation:
    @pytest.fixture(scope="class")
    def pages(self, spark):
        rows = [
            ("u0", "<table><tr><th>k</th></tr><tr><td>v</td></tr></table>"),
            ("u1", "<p>no tables here</p>"),
            ("u2", "<table><tr><td>a</td></tr></table>"
                   "<table><tr><td>b</td></tr></table>"),
        ]
        return spark.createDataFrame(rows, "url string, html string").cache()

    def test_exploded_relation(self, spark, pages):
        got = sorted(
            (r["url"], r["table_idx"], r["row_idx"], r["is_header"],
             tuple(r["cells"]))
            for r in table_rows(pages).collect()
        )
        assert got == [
            ("u0", 0, 0, True, ("k",)),
            ("u0", 0, 1, False, ("v",)),
            ("u2", 0, 0, False, ("a",)),
            ("u2", 1, 0, False, ("b",)),
        ]

    def test_single_arrow_eval(self, pages):
        plan = (
            table_rows(pages)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("ArrowEvalPython") == 1, plan
