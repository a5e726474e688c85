"""HTML table extraction: ``<table>`` grids as a relational output.

Web tables are the densest structured data on crawled pages (WebTables /
WDC-corpus lineage: entity attributes, statistics, leaderboards), and a
training-data pipeline mines them for QA pairs and grounding sets. The
reference crawler extracts only ``<title>`` and links; this module adds
the table layer as one tolerant Arrow kernel:

* every ``<table>`` on the page becomes a numbered grid (document
  order); nested tables are their own grids — a cell containing a
  ``<table>`` contributes the inner table separately and the inner
  text never leaks into the outer cell (innermost-open-table wins,
  the stack discipline);
* every ``<tr>`` yields one row of whitespace-collapsed cell strings
  (``<td>``/``<th>``; unclosed cells/rows implicitly close at the next
  sibling start — the tag soup real pages emit);
* ``is_header`` marks rows whose cells are all ``<th>`` (≥1 cell).

Output relation (``table_rows``): ``(url, table_idx, row_idx,
is_header, cells: array<string>)`` — exploded via ``explode_outer +
isNotNull`` so Catalyst never double-evaluates the kernel (the
InferFiltersFromGenerate trap, see operators/anchors.py). One Arrow
pass per page; everything downstream is plain columns.

Reference parity: no analog (crawler.py parses title/links only);
extraction extension layer.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["extract_tables", "table_rows"]

ROW_SCHEMA = ArrayType(
    StructType(
        [
            StructField("table_idx", LongType(), True),
            StructField("row_idx", LongType(), True),
            StructField("is_header", BooleanType(), True),
            StructField("cells", ArrayType(StringType()), True),
        ]
    )
)


class _TableParser(HTMLParser):
    """Stack of open tables; rows/cells close implicitly on the next
    sibling start tag (tag-soup tolerance)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.tables: list[list[tuple[bool, list[str]]]] = []
        self._stack: list[dict] = []  # {"rows": [...], "idx": int}

    # -- helpers ---------------------------------------------------------
    def _top(self):
        return self._stack[-1] if self._stack else None

    def _close_cell(self, t):
        if t.get("cell") is not None:
            text = " ".join("".join(t["cell"]).split())
            t["row"].append(text)
            t["row_th"].append(t["cell_th"])
            t["cell"] = None

    def _close_row(self, t):
        self._close_cell(t)
        if t.get("row") is not None:
            cells = t["row"]
            header = bool(cells) and all(t["row_th"])
            self.tables[t["idx"]].append((header, cells))
            t["row"] = None

    # -- parser events ----------------------------------------------------
    def handle_starttag(self, tag, attrs):
        t = self._top()
        if tag == "table":
            self.tables.append([])
            self._stack.append(
                {"idx": len(self.tables) - 1, "row": None, "row_th": [],
                 "cell": None, "cell_th": False}
            )
        elif t is None:
            return
        elif tag == "tr":
            self._close_row(t)
            t["row"], t["row_th"] = [], []
        elif tag in ("td", "th"):
            if t["row"] is None:  # row-less cell: implicit <tr>
                t["row"], t["row_th"] = [], []
            self._close_cell(t)
            t["cell"], t["cell_th"] = [], tag == "th"

    def handle_endtag(self, tag):
        t = self._top()
        if t is None:
            return
        if tag in ("td", "th"):
            self._close_cell(t)
        elif tag == "tr":
            self._close_row(t)
        elif tag == "table":
            self._close_row(t)
            self._stack.pop()

    def handle_data(self, data):
        t = self._top()
        if t is not None and t.get("cell") is not None:
            t["cell"].append(data)

    def finish(self):
        while self._stack:
            self._close_row(self._top())
            self._stack.pop()


def extract_tables(html: bytes | str) -> list[dict]:
    """Row dicts (module schema) for every table row on the page —
    document order of tables, top-to-bottom rows; tolerant (any parser
    failure yields the rows parsed so far, never an exception)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _TableParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    p.finish()
    out: list[dict] = []
    for ti, rows in enumerate(p.tables):
        for ri, (header, cells) in enumerate(rows):
            out.append(
                {"table_idx": ti, "row_idx": ri,
                 "is_header": header, "cells": cells}
            )
    return out


def table_rows(pages: DataFrame, html_col: str = "html",
               url_col: str = "url") -> DataFrame:
    """Pages → exploded ``(url, table_idx, row_idx, is_header, cells)``
    relation in one Arrow pass."""

    @pandas_udf(ROW_SCHEMA)
    def tables_udf(html: pd.Series) -> pd.Series:
        return html.map(extract_tables)

    return (
        pages.select(
            F.col(url_col).alias("url"),
            tables_udf(F.col(html_col)).alias("_t"),
        )
        .select("url", F.explode_outer("_t").alias("t"))
        .filter(F.col("t").isNotNull())
        .select(
            "url",
            F.col("t.table_idx").alias("table_idx"),
            F.col("t.row_idx").alias("row_idx"),
            F.col("t.is_header").alias("is_header"),
            F.col("t.cells").alias("cells"),
        )
    )
