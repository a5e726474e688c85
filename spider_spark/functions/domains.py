"""Registrable-domain (eTLD+1) extraction under Public Suffix List
semantics — the grouping key real crawlers use for politeness, crawl
budgets, and host statistics (``a.cdn.example.co.uk`` and
``www.example.co.uk`` are ONE site, ``x.co.uk`` and ``y.co.uk`` are
not).

Implements the published PSL matching algorithm
(https://publicsuffix.org/list/ §Algorithm) over a FROZEN subset of the
public list (the lang-id/classifier frozen-table pattern: deterministic,
versioned in code, oracle-mirrorable):

* exact rules (``co.uk``): public suffix = the rule,
* wildcard rules (``*.ck``): public suffix = one label + the base,
* exception rules (``!www.ck``): the rule minus its leftmost label is
  public (so ``www.ck`` itself is registrable),
* the implicit default rule ``*``: unmatched hosts get a 1-label public
  suffix,
* precedence: exceptions beat everything, else the longest match wins.

Registrable domain = public suffix + one more label; a host that IS a
bare public suffix has none (NULL).

Shape at 100 TB: rules are a broadcast literal table; the corpus side
works on DISTINCT hosts (low cardinality vs pages) exploded into ≤
``max_labels`` suffix candidates — one broadcast join + one host-keyed
aggregate. All-JVM expressions; bit-exact DuckDB mirror.

Reference analog: the reference keys everything on the raw netloc
(yarl's ``URL.host``, spider/url/container.py) — it has no site-level
grouping at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_spark.operators.blocklist import host_suffixes

# Frozen PSL subset: multi-label suffixes crawlers hit constantly, one
# wildcard family and its exception (the list's canonical .ck example),
# single-label TLDs common in the fixtures. Exact single-label rules are
# redundant with the default rule but kept for fidelity to the list.
PSL_EXACT = (
    "com", "org", "net", "edu", "gov", "io", "dev", "app", "example",
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk",
    "au", "com.au", "net.au", "org.au",
    "jp", "co.jp", "ne.jp", "or.jp",
    "br", "com.br", "cn", "com.cn", "in", "co.in",
    "kr", "co.kr", "za", "co.za",
)
PSL_WILDCARD = ("ck", "bd")          # *.ck, *.bd
PSL_EXCEPTION = ("www.ck",)          # !www.ck


def _labels(s: str) -> int:
    return s.count(".") + 1


def psl_rules() -> list[tuple[str, int, int, int]]:
    """Normalized rule rows ``(key, is_exc, public_len, min_host_labels)``:
    a host suffix-matching ``key`` with at least ``min_host_labels``
    labels has a public suffix of ``public_len`` labels; exceptions carry
    ``is_exc=1`` and win outright, ties broken by the longest
    ``public_len`` (the PSL precedence rule)."""
    rows = []
    for r in PSL_EXACT:
        n = _labels(r)
        rows.append((r, 0, n, n))
    for b in PSL_WILDCARD:
        n = _labels(b)
        rows.append((b, 0, n + 1, n + 1))  # needs the wildcard label
    for e in PSL_EXCEPTION:
        n = _labels(e)
        rows.append((e, 1, n - 1, n))
    return rows


def registrable_domains(hosts: DataFrame,
                        host_col: str = "host",
                        max_labels: int = 6) -> DataFrame:
    """``(host, public_suffix, registrable)`` for every DISTINCT host in
    ``hosts``. ``registrable`` is NULL when the host is itself a bare
    public suffix. Join the result back to the page/frontier relation on
    host — never run this over the full corpus directly."""
    spark = hosts.sparkSession
    rules = F.broadcast(
        spark.createDataFrame(
            psl_rules(), "key string, is_exc int, pl int, min_hl int"
        )
    )
    base = hosts.select(F.lower(F.col(host_col)).alias("host")).distinct()
    labs = base.withColumn("L", F.split("host", r"\.")) \
               .withColumn("nh", F.size("L"))
    cand = labs.select(
        "host", "nh",
        F.explode(host_suffixes(F.col("host"), max_labels)).alias("sfx"),
    )
    matched = (
        cand.join(rules, on=[cand["sfx"] == rules["key"],
                             cand["nh"] >= rules["min_hl"]])
        .groupBy("host")
        .agg(F.max(F.struct("is_exc", "pl")).alias("best"))
        .select("host", F.col("best.pl").alias("pl"))
    )
    out = (
        labs.join(matched, on="host", how="left")
        .withColumn("pl", F.coalesce(F.col("pl"), F.lit(1)))  # default rule
    )
    def tail(n):  # last n labels joined with '.'
        return F.array_join(F.slice(F.col("L"), -n, n), ".")
    return out.select(
        "host",
        F.when(F.col("nh") >= F.col("pl"),
               tail(F.col("pl"))).alias("public_suffix"),
        F.when(F.col("nh") >= F.col("pl") + 1,
               tail(F.col("pl") + 1)).alias("registrable"),
    )


def registrable_domains_sql(hosts_sql: str, host_col: str = "host",
                            max_labels: int = 6) -> str:
    """DuckDB mirror of :func:`registrable_domains` over ``hosts_sql``
    (must yield ``host_col``) — identical rule table, suffix generation,
    precedence struct-max, and tail-slice arithmetic."""
    vals = ", ".join(
        f"('{k}', {e}, {pl}, {mh})" for k, e, pl, mh in psl_rules()
    )
    return f"""
    WITH hosts0 AS ({hosts_sql}),
    rules(key, is_exc, pl, min_hl) AS (VALUES {vals}),
    base AS (SELECT DISTINCT lower({host_col}) AS host FROM hosts0),
    labs AS (SELECT host, string_split(host, '.') AS L,
                    len(string_split(host, '.')) AS nh FROM base),
    cand AS (
      SELECT host, nh,
             unnest([array_to_string(L[nh - i + 1:], '.')
                     FOR i IN range(1, least(nh, {max_labels}) + 1)]) AS sfx
      FROM labs
    ),
    matched AS (
      SELECT host, max(struct_pack(is_exc := is_exc, pl := pl)) AS best
      FROM cand JOIN rules ON cand.sfx = rules.key AND cand.nh >= rules.min_hl
      GROUP BY host
    ),
    res AS (
      SELECT labs.host, labs.L, labs.nh,
             coalesce(matched.best.pl, 1) AS pl
      FROM labs LEFT JOIN matched ON labs.host = matched.host
    )
    SELECT host,
      CASE WHEN nh >= pl
           THEN array_to_string(L[nh - pl + 1:], '.') END AS public_suffix,
      CASE WHEN nh >= pl + 1
           THEN array_to_string(L[nh - pl:], '.') END AS registrable
    FROM res
    """
