"""Soft-404 detection (200-OK error pages).

Web servers routinely answer a missing page with status 200 and an
"oops, not found" body — the archived-web literature calls these
soft 404s (Bar-Yossef et al., "Sic transit gloria telae", WWW 2004).
A crawl corpus that keeps them pollutes dedup (error templates are
massive near-dup clusters), link analysis (phantom targets), and
training data. The reference trusts status codes alone
(crawler.py:121-138 — any parseable 200 body is saved); this module
adds the content-side verdict.

Deterministic rule bundle, the :mod:`spider_spark.functions.mime`
pattern — every rule is a named JVM Column predicate and the SAME rule
table renders to a DuckDB mirror, so the decision procedure itself is
oracle-checked:

* ``title_hit`` — the page title matches an error phrase ("404",
  "not found", "page unavailable", "error" as a standalone word);
* ``marker_hit`` — the body text contains an error marker phrase
  ("page not found", "does not exist", "no longer available",
  "been removed", "page cannot be found");
* ``short`` — the body is under ``short_chars`` characters (error
  templates are tiny once boilerplate is stripped).

Verdict: ``soft404 = title_hit OR (marker_hit AND short)`` — a long
article QUOTING "page not found" survives; a short page saying it, or
any page titling it, is flagged. All thresholds are integers; zero
Python; whole-stage codegen throughout.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["TITLE_RE", "MARKER_PHRASES", "DEFAULT_SHORT_CHARS",
           "soft404_flags", "soft404_sql", "make_soft404_gate"]

# standalone-word error phrases over the lowercased title (RE2-safe —
# the same regex runs in Spark and DuckDB). Bare "error" is deliberately
# absent: "error handling in python" / "error-free" are legitimate
# titles — precision over recall for a destructive gate.
TITLE_RE = (
    r"(^|[^0-9a-z])(404|not found|page not found|page unavailable)"
    r"($|[^0-9a-z])"
)

# literal marker phrases over the lowercased body text — first-match-wins
# is irrelevant (OR semantics), order kept for readability
MARKER_PHRASES: tuple[str, ...] = (
    "page not found",
    "does not exist",
    "no longer available",
    "been removed",
    "page cannot be found",
)

DEFAULT_SHORT_CHARS = 400


def soft404_flags(title_col: str | Column, text_col: str | Column,
                  short_chars: int = DEFAULT_SHORT_CHARS) -> Column:
    """``struct(title_hit, marker_hit, short, soft404)`` for a page.
    NULL title → no title hit; NULL text → marker false, short true
    (an empty body is the strongest soft-404 shape)."""
    t = F.col(title_col) if isinstance(title_col, str) else title_col
    x = F.col(text_col) if isinstance(text_col, str) else text_col
    lt = F.lower(F.coalesce(t, F.lit("")))
    lx = F.lower(F.coalesce(x, F.lit("")))
    title_hit = lt.rlike(TITLE_RE)
    marker_hit = None
    for p in MARKER_PHRASES:
        c = lx.contains(p)
        marker_hit = c if marker_hit is None else (marker_hit | c)
    short = F.length(lx) < short_chars
    return F.struct(
        title_hit.alias("title_hit"),
        marker_hit.alias("marker_hit"),
        short.alias("short"),
        (title_hit | (marker_hit & short)).alias("soft404"),
    )


def soft404_sql(title_sql: str, text_sql: str,
                short_chars: int = DEFAULT_SHORT_CHARS) -> dict[str, str]:
    """DuckDB mirror: column-name → SQL expression map rendering the
    SAME rule table (regex, phrases, threshold) over the given title
    and text expressions."""
    lt = f"lower(coalesce({title_sql}, ''))"
    lx = f"lower(coalesce({text_sql}, ''))"
    title_hit = f"regexp_matches({lt}, '{TITLE_RE}')"
    marker_hit = " OR ".join(
        f"contains({lx}, '{p}')" for p in MARKER_PHRASES)
    short = f"length({lx}) < {short_chars}"
    return {
        "title_hit": title_hit,
        "marker_hit": f"({marker_hit})",
        "short": short,
        "soft404": f"({title_hit} OR (({marker_hit}) AND {short}))",
    }


def make_soft404_gate(short_chars: int = DEFAULT_SHORT_CHARS):
    """A ready-made ``CrawlEngine(content_gate=…)`` hook: gate fetched
    pages whose content is a soft 404. The engine records gated pages
    as ``fetched=true`` with a NULL ``content_ref`` — the
    failed-download signal — exactly like the near-dup content gate.
    Consumes the gate input's ``title`` column when present (the engine
    passes it); a title-less relation still gets the marker+short
    half of the verdict."""

    def gate(df):
        title = (F.col("title") if "title" in df.columns
                 else F.lit(None).cast("string"))
        return df.filter(
            soft404_flags(title, F.col("text"), short_chars)["soft404"])

    return gate
