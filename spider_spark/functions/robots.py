"""robots.txt parsing (RFC 9309) as an Arrow-batched kernel.

The politeness scheduler (operators/politeness.py) consumes a structured
``host → (disallow_prefixes, crawl_delay)`` table; this module is the
missing producer: it turns *fetched robots.txt bodies* into that table,
plus the ``Sitemap:`` URLs that feed sitemap ingestion
(sources/sitemap.py) — closing the fetch → parse → schedule loop the
reference's crawler performs implicitly by calling out to the live site.

Semantics (RFC 9309 + the de-facto extensions every large crawler
honors):

* line format ``field: value``; ``#`` starts a comment; field names are
  case-insensitive; unknown fields are ignored;
* one or more consecutive ``User-agent`` lines open a *group*; the
  rules that follow belong to every agent named; a ``User-agent`` line
  after at least one rule starts a new group;
* group selection: all groups naming our product token exactly
  (case-insensitive) merge; if none, the ``*`` groups merge; if
  neither, everything is allowed;
* ``Disallow`` values are path prefixes (percent-encoding left as-is —
  the frontier's canonical URLs keep theirs too); an empty value
  disallows nothing;
* **full RFC 9309 path matching** rides a second output column:
  ``rules`` carries every Allow AND Disallow pattern of the selected
  groups compiled to a SQL ``LIKE`` pattern (``*`` → ``%``, trailing
  ``$`` anchors by dropping the implicit suffix wildcard, specials
  escaped with ``^``) plus the raw-pattern octet length the RFC's
  longest-match precedence ranks by (ties → Allow). The politeness gate
  (operators/politeness.py ``_with_rules``) evaluates the whole verdict
  as one JVM ``aggregate`` over that array — no Python in the per-URL
  path, and the identical ``LIKE … ESCAPE '^'`` semantics exist in
  DuckDB, so the matcher is oracle-checkable end-to-end. The legacy
  ``disallow_prefixes`` column (prefix-only, Allow ignored —
  conservative) is still emitted for back-compat consumers;
* ``Crawl-delay`` (non-standard, widely honored): seconds, float; the
  smallest value across selected groups wins (most polite);
* ``Sitemap`` is *global* per RFC — collected from anywhere in the
  file, any group.

Scale shape: the parse is per-row string work inside ONE Arrow-batched
pandas UDF (the same budget class as the HTML kernel in
functions/parse.py) — no shuffle; output rows ≡ input rows. The result
feeds ``RobotsRules.from_df`` unchanged, so rules stay relational all
the way into the per-round politeness join (never collected).

Reference parity: the reference delegates robots handling to the live
site's responses (no explicit parser); this implements the standard
client side. Cited for the politeness join contract:
spider_spark/operators/politeness.py ROBOTS_SCHEMA.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "parse_robots_txt", "parse_robots_df", "compile_like_pattern",
    "ROBOTS_PARSED_SCHEMA", "RULE_SCHEMA",
]

RULE_SCHEMA = StructType([
    StructField("lk", StringType(), False),      # compiled LIKE pattern
    StructField("len", IntegerType(), False),    # raw-pattern octets (RFC rank)
    StructField("allow", BooleanType(), False),
])

ROBOTS_PARSED_SCHEMA = StructType([
    StructField("disallow_prefixes", ArrayType(StringType(), False), False),
    StructField("crawl_delay", DoubleType(), True),
    StructField("sitemaps", ArrayType(StringType(), False), False),
    StructField("rules", ArrayType(RULE_SCHEMA, False), False),
])

LIKE_ESCAPE = "^"  # shared with the politeness matcher and the DuckDB mirror


def compile_like_pattern(pat: str) -> str:
    """Compile one robots path pattern to a SQL ``LIKE`` pattern with
    escape char ``^``: ``*`` → ``%``; a trailing ``$`` anchors the match
    (no trailing ``%``); ``%``/``_``/``^`` occurring literally are
    escaped. A ``$`` anywhere else is a literal octet per RFC 9309."""
    anchored = pat.endswith("$")
    body = pat[:-1] if anchored else pat
    out = []
    for ch in body:
        if ch == "*":
            out.append("%")
        elif ch in ("%", "_", LIKE_ESCAPE):
            out.append(LIKE_ESCAPE + ch)
        else:
            out.append(ch)
    if not anchored:
        out.append("%")
    return "".join(out)


def _parse_groups(
    body: str, agent: str = "spider"
) -> tuple[list[tuple[str, bool]], float | None, list[str]]:
    """Shared kernel: ``(rules, crawl_delay, sitemaps)`` for ``agent``,
    where ``rules`` is the sorted-unique ``(pattern, is_allow)`` set of
    the selected groups (group selection per RFC 9309; see module
    docstring). Sorted-unique because longest-match precedence is
    order-independent — a canonical order keeps output deterministic and
    oracle-comparable."""
    agent_lc = agent.lower()
    # group := (agent_tokens, rules[(pattern, is_allow)], crawl_delay)
    groups: list[tuple[list[str], list[tuple[str, bool]], float | None]] = []
    sitemaps: list[str] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    cur_delay: float | None = None
    in_agent_run = False  # consecutive User-agent lines extend the group

    def close_group() -> None:
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None

    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "sitemap":
            if value:
                sitemaps.append(value)
            continue
        if field == "user-agent":
            if not in_agent_run:
                close_group()
                in_agent_run = True
            if value:
                cur_agents.append(value.lower())
            continue
        in_agent_run = False
        if not cur_agents:
            continue  # rules before any group are undefined — ignored
        if field in ("disallow", "allow"):
            # empty Disallow = allow everything; empty Allow is a no-op —
            # either way an empty value contributes no rule
            if value:
                cur_rules.append((value, field == "allow"))
        elif field == "crawl-delay":
            try:
                d = float(value)
            except ValueError:
                continue
            if d >= 0 and (cur_delay is None or d < cur_delay):
                cur_delay = d
    close_group()

    exact = [g for g in groups if agent_lc in g[0]]
    chosen = exact or [g for g in groups if "*" in g[0]]
    rules = sorted({r for g in chosen for r in g[1]})
    delays = [g[2] for g in chosen if g[2] is not None]
    return rules, (min(delays) if delays else None), sitemaps


def parse_robots_txt(
    body: str, agent: str = "spider"
) -> tuple[list[str], float | None, list[str]]:
    """Back-compat kernel surface: ``(disallow_prefixes, crawl_delay,
    sitemaps)`` for ``agent`` — the prefix-only view (Allow rules
    dropped), sorted-unique."""
    rules, delay, sitemaps = _parse_groups(body, agent)
    return [p for p, is_allow in rules if not is_allow], delay, sitemaps


def make_robots_udf(agent: str = "spider"):
    @pandas_udf(ROBOTS_PARSED_SCHEMA)
    def robots_udf(body: pd.Series) -> pd.DataFrame:
        rows = [_parse_groups(b, agent) for b in body]
        return pd.DataFrame(
            {
                "disallow_prefixes": [
                    [p for p, is_allow in r[0] if not is_allow] for r in rows
                ],
                "crawl_delay": [r[1] for r in rows],
                "sitemaps": [r[2] for r in rows],
                "rules": [
                    [
                        {
                            "lk": compile_like_pattern(p),
                            "len": len(p.encode("utf-8")),
                            "allow": is_allow,
                        }
                        for p, is_allow in r[0]
                    ]
                    for r in rows
                ],
            }
        )

    return robots_udf


def parse_robots_df(robots: DataFrame, agent: str = "spider",
                    host_col: str = "host",
                    body_col: str = "robots_txt") -> DataFrame:
    """``(host, disallow_prefixes, crawl_delay, sitemaps, rules)`` from a
    table of fetched robots.txt bodies — column-compatible with
    ``RobotsRules.from_df`` (the ``rules`` column upgrades the politeness
    gate to full RFC 9309 wildcard/Allow longest-match; the ``sitemaps``
    column feeds sitemap ingestion). One Arrow pass, no shuffle."""
    parsed = robots.withColumn(
        "_p", make_robots_udf(agent)(F.col(body_col).cast("string"))
    )
    return parsed.select(
        F.col(host_col).alias("host"),
        F.col("_p.disallow_prefixes").alias("disallow_prefixes"),
        F.col("_p.crawl_delay").alias("crawl_delay"),
        F.col("_p.sitemaps").alias("sitemaps"),
        F.col("_p.rules").alias("rules"),
    )
