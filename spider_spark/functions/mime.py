"""Content-type sniffing over raw fetched bytes (magic numbers).

A Common-Crawl-style ingest sees every payload a server returns —
HTML, PDFs, images, gzip members, WARC files, plain text, junk. The
pipeline's routing decision (parse as HTML / hand to a media UDF /
drop) must come from the BYTES, not the URL suffix or a Content-Type
header (both routinely lie). This is the WHATWG-style sniff: match
well-known magic prefixes, then markup detection on the
whitespace/BOM-trimmed head, then a printable-text heuristic, else
opaque binary.

Everything is JVM Column algebra over a byte-preserving ISO-8859-1
decode of the binary column — zero Python in the hot path, and the
identical rule table renders to a DuckDB mirror so the decision
procedure itself (not just a replayed expectation) is oracle-checked.

The reference never routes on payload type (aiohttp hands it text and
BeautifulSoup tolerates anything, crawler.py:121-138); at corpus scale
mis-routing binary payloads through an HTML parser is pure waste, so
the sniff runs ahead of parse.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (magic prefix over raw bytes, mime) — first match wins, order matters
MAGIC_PREFIXES: tuple[tuple[str, str], ...] = (
    ("%PDF-", "application/pdf"),
    ("\x89PNG\r\n\x1a\n", "image/png"),
    ("\xff\xd8\xff", "image/jpeg"),
    ("GIF87a", "image/gif"),
    ("GIF89a", "image/gif"),
    ("\x1f\x8b", "application/gzip"),
    ("PK\x03\x04", "application/zip"),
    ("WARC/", "application/warc"),
)

# leading UTF-8 BOM (as latin-1 codepoints) + ASCII whitespace
_LEAD_RE = "^(?:ï»¿)?[ \\t\\r\\n]*"
# control bytes that never appear in text payloads
_CTRL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"

MIME_TEXT = "text/plain"
MIME_BINARY = "application/octet-stream"


def sniff_mime(binary_col: str | Column) -> Column:
    """Sniffed mime string for a BINARY column. Byte-preserving decode →
    prefix matches → trimmed-head markup checks (``<!doctype html`` /
    ``<html`` / ``<?xml``, case-insensitive) → control-byte scan of the
    first 256 bytes deciding text vs opaque binary. Whole-stage codegen
    throughout."""
    b = F.col(binary_col) if isinstance(binary_col, str) else binary_col
    s = F.decode(b, "ISO-8859-1")
    lead = F.lower(F.regexp_replace(F.substring(s, 1, 256), _LEAD_RE, ""))
    head = F.substring(s, 1, 256)
    out = None
    for prefix, mime in MAGIC_PREFIXES:
        cond = s.startswith(prefix)
        out = F.when(cond, mime) if out is None else out.when(cond, mime)
    out = (
        out
        .when(s.startswith("RIFF") & (F.substring(s, 9, 4) == "WEBP"),
              "image/webp")
        .when(lead.startswith("<!doctype html") | lead.startswith("<html"),
              "text/html")
        .when(lead.startswith("<?xml"), "application/xml")
        .when(head.rlike(_CTRL_RE), MIME_BINARY)
        .otherwise(MIME_TEXT)
    )
    return out


def _duck_lit(s: str) -> str:
    """DuckDB expression for a string literal that may contain control /
    high bytes: printable runs stay quoted, everything else goes through
    chr()."""
    parts: list[str] = []
    run = ""
    for ch in s:
        if 32 <= ord(ch) < 127 and ch != "'":
            run += ch
        else:
            if run:
                parts.append(f"'{run}'")
                run = ""
            parts.append(f"chr({ord(ch)})")
    if run:
        parts.append(f"'{run}'")
    return " || ".join(parts) if parts else "''"


def sniff_mime_sql(content_expr: str) -> str:
    """DuckDB mirror of :func:`sniff_mime` over a VARCHAR expression
    holding the same codepoints the engine sees after its latin-1
    decode (synthetic corpora are built from exactly such strings)."""
    s = content_expr
    lead = (f"lower(regexp_replace(substr({s}, 1, 256), "
            f"'{_LEAD_RE}', ''))")
    head = f"substr({s}, 1, 256)"
    whens = [
        f"WHEN starts_with({s}, {_duck_lit(p)}) THEN '{m}'"
        for p, m in MAGIC_PREFIXES
    ]
    whens.append(
        f"WHEN starts_with({s}, 'RIFF') AND substr({s}, 9, 4) = 'WEBP' "
        "THEN 'image/webp'")
    whens.append(
        f"WHEN starts_with({lead}, '<!doctype html') "
        f"OR starts_with({lead}, '<html') THEN 'text/html'")
    whens.append(f"WHEN starts_with({lead}, '<?xml') THEN 'application/xml'")
    whens.append(
        f"WHEN regexp_matches({head}, '{_CTRL_RE}') THEN '{MIME_BINARY}'")
    return "CASE " + " ".join(whens) + f" ELSE '{MIME_TEXT}' END"
