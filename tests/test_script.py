"""Writing-script profile (functions/script.py) vs a pure-Python
codepoint-range reference and the DuckDB mirror."""

from __future__ import annotations

import duckdb
import pytest

from spider_spark.functions.script import (
    SCRIPT_CLASSES,
    script_profile,
    script_profile_sql,
)

_RANGES = {
    "latin": [(0x41, 0x5A), (0x61, 0x7A), (0xC0, 0xFF), (0x100, 0x17F),
              (0x180, 0x24F)],
    "cyrillic": [(0x400, 0x4FF), (0x500, 0x52F)],
    "greek": [(0x370, 0x3FF)],
    "han": [(0x3400, 0x4DBF), (0x4E00, 0x9FFF)],
    "kana": [(0x3040, 0x309F), (0x30A0, 0x30FF)],
    "hangul": [(0x1100, 0x11FF), (0xAC00, 0xD7AF)],
    "arabic": [(0x600, 0x6FF), (0x750, 0x77F)],
    "hebrew": [(0x590, 0x5FF)],
    "devanagari": [(0x900, 0x97F)],
    "thai": [(0xE00, 0xE7F)],
    "digit": [(0x30, 0x39)],
}


def _reference(text):
    counts = {n: 0 for n in _RANGES}
    scored = 0
    for ch in text:
        if ch.isspace():
            continue
        scored += 1
        cp = ord(ch)
        for name, spans in _RANGES.items():
            if any(lo <= cp <= hi for lo, hi in spans):
                counts[name] += 1
                break  # ranges are disjoint
    other = scored - sum(counts.values())
    row = {"n_chars_scored": scored}
    for n in _RANGES:
        row[f"{n}_ppm"] = counts[n] * 1_000_000 // max(scored, 1)
    row["other_ppm"] = other * 1_000_000 // max(scored, 1)
    best = max(counts.items(), key=lambda kv: (kv[1], [-ord(c) for c in kv[0]]))
    row["main_script"] = best[0] if best[1] > 0 else "other"
    return row


FIXTURE = [
    (0, "Plain English text with twelve words and the digits 123."),
    (1, "Русский текст про веб-краулер"),
    (2, "日本語のテキストとカタカナ"),
    (3, "한국어 문서입니다"),
    (4, "نص عربي قصير"),
    (5, "mixed Русский and English 3:1"),
    (6, "   \t\n  "),
    (7, "!!! ??? ***"),
    (8, "Ωμέγα και άλφα"),
    (9, "हिन्दी पाठ และ ไทย"),
    # U+000B vertical tab: Java \s includes it, RE2's does not — the
    # explicit literal whitespace classes must agree on it (ADVICE r4)
    (10, "vertical\x0btab\x0bseparated words"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(FIXTURE, "doc_id long, text string")


class TestScriptProfile:
    def test_matches_reference(self, spark, docs):
        got = {r["doc_id"]: r.asDict() for r in script_profile(docs).collect()}
        for i, text in FIXTURE:
            want = _reference(text)
            for k, v in want.items():
                assert got[i][k] == v, (i, k, got[i][k], v)

    def test_main_script_calls(self, spark, docs):
        got = {r["doc_id"]: r["main_script"]
               for r in script_profile(docs).collect()}
        assert got[0] == "latin" and got[1] == "cyrillic"
        assert got[2] in ("kana", "han") and got[3] == "hangul"
        assert got[4] == "arabic" and got[6] == "other" and got[7] == "other"
        assert got[8] == "greek"

    def test_sql_mirror_bit_exact(self, spark, docs):
        spark_rows = sorted(map(tuple, script_profile(docs).collect()))
        con = duckdb.connect()
        con.register("spdocs", docs.toPandas())
        duck_rows = sorted(map(tuple, con.execute(
            script_profile_sql("SELECT * FROM spdocs")).fetchall()))
        assert spark_rows == duck_rows

    def test_ranges_are_disjoint(self):
        # the reference's `break` and other_ppm arithmetic both assume it
        spans = [s for v in _RANGES.values() for s in v]
        spans.sort()
        for (al, ah), (bl, bh) in zip(spans, spans[1:]):
            assert ah < bl, ((al, ah), (bl, bh))
        assert set(_RANGES) == set(SCRIPT_CLASSES)
