"""Corpus-cleaning operators: the published C4 line-level heuristics and
PII redaction — the two standard "scrub" passes a webtext training-data
pipeline runs between crawl and dedup.

Both are pure Column expressions (one projection, no shuffle, no UDF —
whole-stage codegen end to end) and each ships a DuckDB mirror built from
the identical string/regex semantics so the driver's oracle hash-checks
them value-for-value. Regexes stay inside the conservative subset that
behaves identically under Java regex (Spark) and RE2 (DuckDB): character
classes, bounded/unbounded greedy quantifiers, alternation, ``\\b`` — no
lookaround, no backreferences.

At 100 TB both operators are embarrassingly parallel scans: the filter and
projection push to the parquet reader, nothing shuffles, and output size
is bounded by input size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# C4 cleaning (Raffel et al. 2020, §2.2)
# ---------------------------------------------------------------------------

C4_BAD_PHRASES = ["lorem ipsum"]
C4_MIN_WORDS_PER_LINE = 5
C4_MIN_SENTENCES = 3


def _line_kept(line):
    """Keep a line iff it ends in terminal punctuation, has ≥5 words, and
    does not mention javascript (the C4 boilerplate tell)."""
    r = F.rtrim(line)
    ends_ok = (
        r.endswith(".") | r.endswith("!") | r.endswith("?") | r.endswith('"')
    )
    n_words = F.size(F.split(F.trim(line), r"\s+"))
    no_js = ~F.contains(F.lower(line), F.lit("javascript"))
    return ends_ok & (n_words >= C4_MIN_WORDS_PER_LINE) & no_js


def c4_clean(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document C4 cleaning: line filtering plus the page-level drop
    rules, as published —

    line level (kept lines are re-joined into ``clean_text``):
      * line must end in a terminal punctuation mark (``.`` ``!`` ``?``
        ``"``);
      * line must have at least 5 words;
      * any line containing the word "javascript" is removed.

    page level (the ``keep`` flag):
      * cleaned page must have at least 3 sentences (terminal-punctuation
        count over the kept lines);
      * pages containing "lorem ipsum" are dropped;
      * pages containing ``{`` are dropped (code tell).

    Returns ``(doc_id, clean_text, n_lines_kept, n_sentences, keep)``.
    One projection over the scan — no shuffle, no UDF."""
    raw = F.col(text_col)
    lines = F.split(raw, "\n")
    kept = F.filter(lines, _line_kept)
    clean = F.array_join(F.transform(kept, F.trim), "\n")
    n_sent = F.regexp_count(clean, F.lit(r"[.!?]")).cast("int")
    low = F.lower(raw)
    bad = None
    for p in C4_BAD_PHRASES:
        c = F.contains(low, F.lit(p))
        bad = c if bad is None else bad | c
    keep = (
        (n_sent >= C4_MIN_SENTENCES)
        & ~bad
        & ~F.contains(raw, F.lit("{"))
    )
    return docs.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.size(kept).cast("int").alias("n_lines_kept"),
        n_sent.alias("n_sentences"),
        keep.alias("keep"),
    )


def c4_clean_sql(table: str = "documents", text_col: str = "text",
                 id_col: str = "doc_id") -> str:
    """DuckDB mirror of :func:`c4_clean` — identical line predicate,
    join, sentence count, and page rules."""
    line_pred = (
        "(rtrim(l) LIKE '%.' OR rtrim(l) LIKE '%!' OR rtrim(l) LIKE '%?' "
        "OR rtrim(l) LIKE '%\"') "
        f"AND len(string_split_regex(trim(l), '\\s+')) >= {C4_MIN_WORDS_PER_LINE} "
        "AND NOT contains(lower(l), 'javascript')"
    )
    bad = " OR ".join(
        f"contains(lower(raw), '{p}')" for p in C4_BAD_PHRASES
    )
    return f"""
    WITH base AS (
      SELECT {id_col}, {text_col} AS raw,
             list_filter(string_split({text_col}, chr(10)),
                         l -> {line_pred}) AS kept
      FROM {table}
    ),
    j AS (
      SELECT {id_col}, raw,
             coalesce(array_to_string(list_transform(kept, l -> trim(l)),
                                      chr(10)), '') AS clean_text,
             len(kept)::INT AS n_lines_kept
      FROM base
    )
    SELECT {id_col}, clean_text, n_lines_kept,
           len(regexp_extract_all(clean_text, '[.!?]'))::INT AS n_sentences,
           (len(regexp_extract_all(clean_text, '[.!?]')) >= {C4_MIN_SENTENCES}
            AND NOT ({bad})
            AND NOT contains(raw, '{{')) AS keep
    FROM j
    """


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Patterns chosen from the Java-regex ∩ RE2 common subset (no lookaround).
# Application order matters and is part of the contract: emails first (their
# local parts may contain digits), then IPs, then phones (whose pattern
# would otherwise eat dotted quads).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\d[\d\- ]{7,}\d"


def pii_redact(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Redact emails, IPv4 addresses, and phone-shaped digit runs with
    typed placeholders, counting each. Returns ``(doc_id, redacted,
    n_emails, n_ips, n_phones)``. Pure Column expressions — the regex
    engine runs JVM-side inside codegen; nothing shuffles."""
    raw = F.col(text_col)
    n_emails = F.regexp_count(raw, F.lit(PII_EMAIL)).cast("int")
    step1 = F.regexp_replace(raw, PII_EMAIL, "<EMAIL>")
    n_ips = F.regexp_count(step1, F.lit(PII_IPV4)).cast("int")
    step2 = F.regexp_replace(step1, PII_IPV4, "<IP>")
    n_phones = F.regexp_count(step2, F.lit(PII_PHONE)).cast("int")
    step3 = F.regexp_replace(step2, PII_PHONE, "<PHONE>")
    return docs.select(
        F.col(id_col),
        step3.alias("redacted"),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_phones.alias("n_phones"),
    )


def pii_redact_sql(table: str = "documents", text_col: str = "text",
                   id_col: str = "doc_id") -> str:
    """DuckDB mirror of :func:`pii_redact` — same patterns, same order,
    global replacement."""
    e, i, p = PII_EMAIL, PII_IPV4, PII_PHONE
    return f"""
    WITH s1 AS (
      SELECT {id_col},
             len(regexp_extract_all({text_col}, '{e}'))::INT AS n_emails,
             regexp_replace({text_col}, '{e}', '<EMAIL>', 'g') AS t
      FROM {table}
    ),
    s2 AS (
      SELECT {id_col}, n_emails,
             len(regexp_extract_all(t, '{i}'))::INT AS n_ips,
             regexp_replace(t, '{i}', '<IP>', 'g') AS t
      FROM s1
    )
    SELECT {id_col},
           regexp_replace(t, '{p}', '<PHONE>', 'g') AS redacted,
           n_emails, n_ips,
           len(regexp_extract_all(t, '{p}'))::INT AS n_phones
    FROM s2
    """


# ---------------------------------------------------------------------------
# Luhn-validated payment-card redaction
# ---------------------------------------------------------------------------

# 13-19 digits, optionally space/hyphen separated — the PAN surface shape.
# The checksum, not the regex, decides: bare IDs and order numbers match
# the pattern constantly, and redacting them destroys innocent text.
CARD_PATTERN = r"\b\d(?:[ -]?\d){12,18}\b"


def _luhn_valid(cand):
    """Luhn checksum (ISO/IEC 7812) of a candidate match as pure array
    algebra: strip separators, double every second digit from the right,
    subtract 9 past 9, sum ≡ 0 (mod 10). No Python, no UDF."""
    d = F.regexp_replace(cand, "[^0-9]", "")
    n = F.length(d)
    total = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0),
        lambda acc, i: acc + F.when(
            (n - i) % 2 == 1,
            F.when(
                d.substr(i, F.lit(1)).cast("int") * 2 > 9,
                d.substr(i, F.lit(1)).cast("int") * 2 - 9,
            ).otherwise(d.substr(i, F.lit(1)).cast("int") * 2),
        ).otherwise(d.substr(i, F.lit(1)).cast("int")),
    )
    return (n >= 13) & (n <= 19) & (total % 10 == 0)


def card_redact(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Redact Luhn-valid payment-card numbers: extract every PAN-shaped
    candidate, keep only those passing the checksum, replace each
    validated literal everywhere it occurs. Returns ``(doc_id,
    redacted, n_cards)`` with ``n_cards`` counting validated match
    instances. The two-stage extract-validate-replace runs as one
    codegen projection (``regexp_extract_all`` → array ``filter`` with
    the Luhn fold → ``aggregate`` of literal ``replace``) — a plain
    ``regexp_replace`` cannot express the checksum gate, and redacting
    every 16-digit run would mangle order ids and ISBNs."""
    raw = F.col(text_col)
    cands = F.regexp_extract_all(raw, F.lit(CARD_PATTERN), 0)
    valid = F.filter(cands, _luhn_valid)
    redacted = F.aggregate(
        valid, raw, lambda acc, c: F.replace(acc, c, F.lit("<CARD>"))
    )
    return docs.select(
        F.col(id_col),
        redacted.alias("redacted"),
        F.size(valid).cast("int").alias("n_cards"),
    )


def card_redact_sql(table: str = "documents", text_col: str = "text",
                    id_col: str = "doc_id") -> str:
    """DuckDB mirror of :func:`card_redact` — same pattern, checksum
    fold, and literal replacement order."""
    strip = "regexp_replace({c}, '[^0-9]', '', 'g')"
    luhn = (
        "len(" + strip.format(c="c") + ") BETWEEN 13 AND 19 AND "
        "list_sum(list_transform(range(1, len(" + strip.format(c="c") + ") + 1), "
        "i -> CASE WHEN (len(" + strip.format(c="c") + ") - i) % 2 = 1 "
        "THEN CASE WHEN 2 * (" + strip.format(c="c") + ")[i:i]::INT > 9 "
        "THEN 2 * (" + strip.format(c="c") + ")[i:i]::INT - 9 "
        "ELSE 2 * (" + strip.format(c="c") + ")[i:i]::INT END "
        "ELSE (" + strip.format(c="c") + ")[i:i]::INT END)) % 10 = 0"
    )
    return f"""
    WITH v AS (
      SELECT {id_col}, {text_col} AS raw,
             list_filter(
               regexp_extract_all({text_col}, '{CARD_PATTERN}'),
               c -> {luhn}
             ) AS valid
      FROM {table}
    )
    SELECT {id_col},
           list_reduce(
             [raw] || valid,
             (acc, c) -> replace(acc, c, '<CARD>')
           ) AS redacted,
           len(valid)::INT AS n_cards
    FROM v
    """
