"""Mojibake repair — fixing UTF-8 text that was mis-decoded upstream.

The single most common corruption in crawled text is UTF-8 bytes decoded
as Latin-1/Windows-1252 somewhere in the serving or archiving chain:
``é`` (UTF-8 ``C3 A9``) surfaces as ``Ã©``, ``'`` (``E2 80 99``) as
``â€™``, Cyrillic as ``Ð¿Ñ€``-soup. Every production webtext pipeline runs
a repair pass (the ftfy ``fix_encoding`` step); this is that pass as a
deterministic, dependency-free kernel:

* attempt the inverse transform — re-encode the text through **sloppy
  Windows-1252** (cp1252, falling back to the raw Latin-1 byte for the
  five code points cp1252 leaves undefined, so BOTH common mis-decodings
  invert) and strictly re-decode as UTF-8;
* accept only when the strict decode succeeds AND changes the text — a
  legitimately-encoded string virtually never round-trips, because lone
  accented characters are invalid UTF-8 lead/continuation sequences;
* repeat up to ``max_passes`` times for double-encoded mojibake, stopping
  at the first fixed point.

Texts with no high code point (``> U+007F``) are returned untouched
without attempting anything, so the ASCII fast path is a character scan.

The kernel is per-row Python but runs Arrow-batched (the same hot-path
discipline as the HTML parse); everything around it stays JVM-side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

__all__ = ["fix_mojibake", "fix_mojibake_udf"]

def _sloppy_cp1252_bytes(s: str) -> bytes | None:
    """Encode via Windows-1252, falling back per-character to the raw
    Latin-1 byte for the C1 range cp1252 can't encode (U+0080–U+009F —
    a Latin-1 mis-decode surfaces bytes 0x80–0x9F as exactly those
    control characters). None when any character can't map to a single
    byte (genuine non-Latin text — nothing to invert)."""
    try:
        return s.encode("cp1252")
    except UnicodeEncodeError:
        out = bytearray()
        for ch in s:
            try:
                out += ch.encode("cp1252")
            except UnicodeEncodeError:
                cp = ord(ch)
                if 0x80 <= cp <= 0xFF:
                    out.append(cp)
                else:
                    return None
        return bytes(out)


def fix_mojibake(s: str | None, max_passes: int = 3) -> str | None:
    """Repair UTF-8-as-Latin-1/cp1252 mojibake; returns the input
    unchanged when no repair applies (see module docstring)."""
    if s is None:
        return None
    cur = s
    for _ in range(max_passes):
        if not any(ord(ch) > 0x7F for ch in cur):
            break  # pure ASCII can't be mojibake
        raw = _sloppy_cp1252_bytes(cur)
        if raw is None:
            break
        try:
            decoded = raw.decode("utf-8", errors="strict")
        except UnicodeDecodeError:
            break
        if decoded == cur:
            break
        cur = decoded
    return cur


@pandas_udf(StringType())
def fix_mojibake_udf(text: pd.Series) -> pd.Series:
    return text.map(fix_mojibake)
