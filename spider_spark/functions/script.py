"""Per-document writing-script profile — charset composition ratios.

Multilingual corpus curation needs a signal UPSTREAM of language ID:
the trigram classifier (functions/text.py lang_id) is trained on a
known language set and misfires on scripts it never saw, mixed-script
spam (Latin keywords stuffed into CJK pages) is invisible to a
language label, and mojibake repair (functions/encoding.py) wants a
cheap "this page claims Russian but is 90% replacement-class Latin"
contradiction detector. The script profile is that signal: exact
codepoint-class composition of every document, as integer
parts-per-million.

Classes are EXPLICIT codepoint ranges, not ``\\p{script=...}``
properties — Java regex and RE2 bind script properties to different
Unicode table versions, so a property-based count could drift between
the engine and the oracle; literal ranges are version-proof and
identical in both. Coverage is the majority blocks of each script
(Latin incl. the two supplement/extended blocks, Cyrillic, Greek, Han
incl. Ext-A, Hiragana+Katakana, Hangul syllables+jamo, Arabic incl.
supplement, Hebrew, Devanagari, Thai, ASCII digits); ``other_ppm``
absorbs the tail, whitespace is excluded from the denominator.

Everything is ``length(x) − length(regexp_replace(x, class, ''))``
chains — WholeStageCodegen, no UDF, no explode; the DuckDB mirror is
the same chain with RE2's ``'g'`` flag. ``main_script`` is the frozen
``(count DESC, name ASC)`` argmax — a ``greatest``-of-structs in Spark,
``list_sort``-of-structs in the mirror (DuckDB's greatest is
scalar-only), ties broken identically via an inverted-name field.

Reference parity: no analog in the reference (an asyncio crawler);
multilingual curation extension beside lang_id and unicode_clean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["SCRIPT_CLASSES", "script_profile", "script_profile_sql"]

PPM = 1_000_000

# name → disjoint codepoint ranges; rendered per engine (Java spells a
# codepoint \uXXXX, RE2 spells it \x{XXXX} — one literal can't serve both)
SCRIPT_CLASSES: dict[str, list[tuple[int, int]]] = {
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


def _java_class(ranges: list[tuple[int, int]]) -> str:
    return "[" + "".join(f"\\u{lo:04X}-\\u{hi:04X}" for lo, hi in ranges) + "]"


def _re2_class(ranges: list[tuple[int, int]]) -> str:
    return ("[" + "".join(f"\\x{{{lo:04X}}}-\\x{{{hi:04X}}}"
                          for lo, hi in ranges) + "]")


# Whitespace pinned as explicit literals per engine: Java's \s includes
# \x0B (vertical tab) while RE2's does not, so the engine-dependent
# class would diverge on any text containing U+000B. Both classes below
# name exactly { space, \t, \n, \x0B, \f, \r } — ASCII whitespace, the
# set Java \s matches — in each engine's literal syntax.
_WS_JAVA = "[ \\t\\n\\x0B\\f\\r]"
_WS_RE2 = "[ \\t\\n\\x{000B}\\f\\r]"


def _count(col, cls: str):
    return F.length(col) - F.length(F.regexp_replace(col, cls, ""))


def script_profile(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """``(id, n_chars_scored, <class>_ppm ..., other_ppm, main_script)``
    per document. ``n_chars_scored`` excludes whitespace;
    ``main_script`` is the frozen (count DESC, name ASC) argmax over
    the named classes (``'other'`` only when every class count is 0)."""
    col = F.col(text_col)
    total = (F.length(col) - _count(col, _WS_JAVA)).alias("n_chars_scored")
    base = docs.select(
        F.col(id_col), total,
        *[_count(col, _java_class(rng)).alias(f"_c_{name}")
          for name, rng in SCRIPT_CLASSES.items()],
    )
    named_sum = None
    for name in SCRIPT_CLASSES:
        c = F.col(f"_c_{name}")
        named_sum = c if named_sum is None else named_sum + c
    denom = "greatest(n_chars_scored, 1)"
    sel = [id_col, "n_chars_scored"]
    for name in SCRIPT_CLASSES:
        sel.append(F.expr(f"(_c_{name} * {PPM}) div {denom}")
                   .alias(f"{name}_ppm"))
    other = F.greatest(F.col("n_chars_scored") - named_sum, F.lit(0))
    base = base.withColumn("_c_other_", other)
    sel.append(F.expr(f"(_c_other_ * {PPM}) div {denom}").alias("other_ppm"))
    best = F.greatest(*[
        F.struct(F.col(f"_c_{name}").alias("c"),
                 # name DESC inside greatest ⇒ name ASC wins ties
                 F.lit(_inv(name)).alias("inv"),
                 F.lit(name).alias("name"))
        for name in SCRIPT_CLASSES
    ])
    sel.append(F.when(best["c"] > 0, best["name"])
               .otherwise(F.lit("other")).alias("main_script"))
    return base.select(*sel)


def _inv(name: str) -> str:
    """Lexicographic inversion (per-byte 'z'+'a'−ch) so the MAX struct
    realizes the (count DESC, name ASC) order — ties on count fall to
    the lexicographically smallest name in both engines."""
    return "".join(chr(ord("z") + ord("a") - ord(ch)) for ch in name)


def script_profile_sql(docs_rel: str = "SELECT * FROM documents",
                       text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """DuckDB mirror of :func:`script_profile` — identical ranges and
    arithmetic; the argmax replays via the same inverted-name trick
    (RE2 needs the explicit ``'g'`` flag Java implies)."""
    def cnt(cls: str) -> str:
        e = cls.replace("'", "''")
        return (f"(length({text_col}) - "
                f"length(regexp_replace({text_col}, '{e}', '', 'g')))")

    counts = ", ".join(
        f"{cnt(_re2_class(rng))}::BIGINT AS _c_{name}"
        for name, rng in SCRIPT_CLASSES.items())
    named_sum = " + ".join(f"_c_{n}" for n in SCRIPT_CLASSES)
    ppms = ", ".join(
        f"(_c_{n} * {PPM}) // greatest(n_chars_scored, 1) AS {n}_ppm"
        for n in SCRIPT_CLASSES)
    structs = ", ".join(
        f"struct_pack(c := _c_{n}, inv := '{_inv(n)}', nm := '{n}')"
        for n in SCRIPT_CLASSES)
    last = len(SCRIPT_CLASSES)
    return f"""
    WITH sp_base AS (
      SELECT {id_col},
             (length({text_col}) - {cnt(_WS_RE2)})::BIGINT AS n_chars_scored,
             {counts}
      FROM ({docs_rel})
    ),
    sp_more AS (
      SELECT *, greatest(n_chars_scored - ({named_sum}), 0) AS _c_other_,
             list_sort([{structs}])[{last}] AS _best
      FROM sp_base
    )
    SELECT {id_col}, n_chars_scored, {ppms},
           (_c_other_ * {PPM}) // greatest(n_chars_scored, 1) AS other_ppm,
           CASE WHEN _best.c > 0 THEN _best.nm ELSE 'other' END
             AS main_script
    FROM sp_more
    """
