"""Unicode normalization cleaning — the canonical-form pass webtext
pipelines run next to mojibake repair (:mod:`spider_spark.functions.encoding`).

Crawled text arrives with invisible characters (zero-width spaces from
CMS editors, BOMs glued mid-string by naive concatenation, bidi control
codes from template engines, soft hyphens from justified layouts), with
NBSP used as layout glue, with Windows line endings, and in mixed Unicode
normalization forms (NFD from macOS filesystems and some CMSes) — all of
which silently break tokenizers, dedup fingerprints, and n-gram models
("naïve" in NFC and NFD are different byte strings). The cleaning pass,
in this exact order (the DuckDB mirror replays the same composition):

1. strip invisible format characters: zero-width space/joiner family
   (U+200B–U+200F, U+2060–U+2064), bidi embedding/override controls
   (U+202A–U+202E), BOM/ZWNBSP (U+FEFF), soft hyphen (U+00AD);
2. map NBSP (U+00A0) and narrow NBSP (U+202F) to a regular space;
3. normalize line endings (CRLF / lone CR → LF);
4. drop the remaining C0/C1 control characters except LF and TAB;
5. canonical-compose to **NFC** (``unicodedata.normalize``).

The kernel is per-row Python but Arrow-batched (one pass, the mojibake
discipline), with a scan-only fast path: pure-ASCII strings without CR or
stray controls are already clean and NFC by construction.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

__all__ = ["clean_unicode", "clean_unicode_udf", "clean_unicode_sql"]

_INVISIBLE = re.compile(
    "[\u200B-\u200F\u2060-\u2064\u202A-\u202E\uFEFF\u00AD]"
)
_NBSP = re.compile("[\u00A0\u202F]")
_CRLF = re.compile("\r\n?")
_CONTROLS = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]")
# fast path: chars whose presence forces the slow path — anything
# non-ASCII, plus CR and the ASCII controls the cleaner strips
_NEEDS_WORK = re.compile("[^\x20-\x7e\n\t]")


def clean_unicode(s: str | None) -> str | None:
    """Apply the five-step cleaning above; None passes through."""
    if s is None:
        return None
    if _NEEDS_WORK.search(s) is None:
        return s
    s = _INVISIBLE.sub("", s)
    s = _NBSP.sub(" ", s)
    s = _CRLF.sub("\n", s)
    s = _CONTROLS.sub("", s)
    return unicodedata.normalize("NFC", s)


@pandas_udf(StringType())
def clean_unicode_udf(texts: pd.Series) -> pd.Series:
    return texts.map(clean_unicode)


def clean_unicode_sql(x: str) -> str:
    """DuckDB mirror: the same five regex/normalize steps in the same
    order (RE2 ``\\x{...}`` classes; DuckDB's ``nfc_normalize`` is the
    same Unicode canonical composition as Python's ``unicodedata``)."""
    inv = r"[\x{200B}-\x{200F}\x{2060}-\x{2064}\x{202A}-\x{202E}\x{FEFF}\x{00AD}]"
    nbsp = r"[\x{00A0}\x{202F}]"
    ctrl = r"[\x{0000}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}\x{007F}-\x{009F}]"
    expr = f"regexp_replace({x}, '{inv}', '', 'g')"
    expr = f"regexp_replace({expr}, '{nbsp}', ' ', 'g')"
    expr = f"regexp_replace({expr}, '\\r\\n?', chr(10), 'g')"
    expr = f"regexp_replace({expr}, '{ctrl}', '', 'g')"
    return f"nfc_normalize({expr})"
