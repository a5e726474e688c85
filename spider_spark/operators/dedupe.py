"""Document deduplication suite for training-data pipelines.

Four dedup families over a ``documents(doc_id, text, ...)`` table, each
expressed with JVM-side Column expressions (no Python in the hot path) and
each paired with a DuckDB-SQL mirror built from the *same constants*, so
the driver's oracle can verify them value-for-value:

* exact dedup — md5 fingerprint of normalized text (hash-groupBy);
* n-gram Jaccard — word-shingle explode + shingle-key join; exact
  similarity, quadratic only within shingle buckets;
* MinHash + LSH — 32 seeded linear permutations over a shared 60-bit md5
  base hash, banded into buckets; candidate pairs = same (band, bucket).
  The permutation constants live in this module and are embedded into both
  the Spark plan and the oracle SQL;
* SimHash — 60-bit sign-aggregated token hash; near-dup pairs via 15-bit
  band buckets confirmed by hamming distance.

Scale notes: every family is shuffle-bounded by its key (fingerprint,
shingle, band-bucket), never all-pairs; the LSH band join is the standard
10^9-document design (shingle→minhash→band→bucket-join). Skewed buckets
(boilerplate shingles) are capped via a bucket-size limit before the
pair-join, the same guard production near-dup pipelines use.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spider_spark.functions.text import normalized_text

# -- shared hashing (identical in Spark and DuckDB) --------------------------

_P31 = 2147483647  # 2^31 - 1; keeps a*h+b inside signed 64-bit on both engines
_K_PERMS = 32
_N_BANDS = 8  # 4 rows/band → LSH threshold ≈ (1/8)^(1/4) ≈ 0.59 Jaccard
_rng = random.Random(42)
PERM_A = [_rng.randrange(1, _P31) for _ in range(_K_PERMS)]
PERM_B = [_rng.randrange(0, _P31) for _ in range(_K_PERMS)]

SIMHASH_BITS = 60


def md5_60(col: Column) -> Column:
    """60-bit integer hash both engines compute identically.
    SQL: ``('0x' || substr(md5(x), 1, 15))::BIGINT``."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_60_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


NORM_SQL = "trim(regexp_replace(lower({x}), '\\s+', ' ', 'g'))"


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (after normalization) documents: one row per
    duplicated fingerprint with the group's member count and canonical
    (minimum) id. Pure hash-groupBy — one shuffle on the fingerprint."""
    fp = F.md5(normalized_text(F.col(text_col))).alias("fingerprint")
    return (
        docs.select(F.col(id_col), fp)
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_dups"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# word-shingles (shared by Jaccard + MinHash)
# ---------------------------------------------------------------------------


def shingles(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Distinct word ``n``-gram shingles per document, exploded to
    ``(id, shingle)`` rows. Documents shorter than ``n`` words yield their
    whole text as the single shingle."""
    words = F.split(normalized_text(F.col(text_col)), " ")
    count = F.greatest(F.size(words) - (n - 1), F.lit(1))
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        )
    )
    return docs.select(F.col(id_col), F.explode(grams).alias("shingle"))


def shingles_sql(n: int = 3, id_col: str = "doc_id", text_col: str = "text",
                 table: str = "documents") -> str:
    """DuckDB mirror of :func:`shingles` (same normalization, same grams)."""
    norm = NORM_SQL.format(x=text_col)
    return f"""
    SELECT {id_col}, unnest(list_distinct(sh)) AS shingle FROM (
      SELECT {id_col},
             [array_to_string(words[i:i+{n - 1}], ' ')
              FOR i IN range(1, greatest(len(words) - {n - 1}, 1) + 1)] AS sh
      FROM (SELECT {id_col}, string_split({norm}, ' ') AS words FROM {table})
    )
    """


# ---------------------------------------------------------------------------
# exact n-gram Jaccard
# ---------------------------------------------------------------------------


def jaccard_pairs(docs: DataFrame, threshold: float = 0.5, n: int = 3,
                  id_col: str = "doc_id", text_col: str = "text",
                  max_bucket: int = 1000) -> DataFrame:
    """All document pairs with word-``n``-gram Jaccard ≥ ``threshold``.

    Plan shape: shingle explode → join on the shingle key (pairs only form
    inside a shingle's bucket) → group by pair → exact ``|∩| / |A|+|B|-|∩|``.
    ``max_bucket`` drops degenerate boilerplate shingles shared by more
    than that many docs (skew guard: a shingle in B docs makes B² join
    rows)."""
    sh = shingles(docs, n=n, id_col=id_col, text_col=text_col)
    hot = sh.groupBy("shingle").agg(F.count("*").alias("b")).filter(
        F.col("b") > max_bucket
    )
    sh = sh.join(F.broadcast(hot.select("shingle")), on="shingle", how="left_anti")
    # per-doc sizes come from the POST-hot-filter set: a dropped boilerplate
    # shingle must vanish from the denominator too, or jaccard diverges from
    # the oracle's `sizes ... FROM ok` the moment any bucket exceeds max_bucket
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        inter.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sz_a"),
                   on="id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "sz_b"),
              on="id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def jaccard_pairs_sql(threshold: float = 0.5, n: int = 3, table: str = "documents",
                      id_col: str = "doc_id", text_col: str = "text",
                      max_bucket: int = 1000) -> str:
    sh = shingles_sql(n=n, id_col=id_col, text_col=text_col, table=table)
    return f"""
    WITH sh AS ({sh}),
    ok AS (SELECT * FROM sh WHERE shingle NOT IN (
       SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > {max_bucket})),
    sizes AS (SELECT {id_col} AS id, count(*) AS sz FROM ok GROUP BY {id_col}),
    inter AS (
      SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, count(*) AS n_common
      FROM ok a JOIN ok b USING (shingle)
      WHERE a.{id_col} < b.{id_col}
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           n_common * 1.0 / (sa.sz + sb.sz - n_common) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE n_common * 1.0 / (sa.sz + sb.sz - n_common) >= {threshold}
    """


# ---------------------------------------------------------------------------
# directed containment (quote / aggregator detection)
# ---------------------------------------------------------------------------


def containment_pairs(docs: DataFrame, threshold: float = 0.7, n: int = 3,
                      id_col: str = "doc_id", text_col: str = "text",
                      max_bucket: int = 1000) -> DataFrame:
    """Directed near-superset pairs: ``(inner_id, outer_id, containment)``
    where ``containment = |shingles(inner) ∩ shingles(outer)| /
    |shingles(inner)| ≥ threshold``. The asymmetric Broder measure —
    Jaccard misses the aggregator/quote case where a short document sits
    almost wholly inside a long one (the union denominator dilutes it);
    containment normalizes by the CONTAINED side only. Both directions of
    an unordered pair are tested; mutual containment emits two rows.

    Same plan shape (and skew guard) as :func:`jaccard_pairs`: shingle
    explode → hot-shingle broadcast anti-join → pair intersection counts
    inside shingle buckets → one size join; the direction split is a
    projection, not extra shuffles."""
    sh = shingles(docs, n=n, id_col=id_col, text_col=text_col)
    hot = sh.groupBy("shingle").agg(F.count("*").alias("b")).filter(
        F.col("b") > max_bucket
    )
    sh = sh.join(F.broadcast(hot.select("shingle")), on="shingle", how="left_anti")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    joined = (
        inter.join(sizes.withColumnRenamed(id_col, "id_a")
                   .withColumnRenamed("sz", "sz_a"), on="id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b")
              .withColumnRenamed("sz", "sz_b"), on="id_b")
    )
    # both directions come off ONE pass over `joined` (array + explode);
    # a union of two filtered branches would recompute the whole
    # shingle-join subtree twice
    both = joined.select(
        F.explode(F.array(
            F.struct(
                F.col("id_a").alias("inner_id"),
                F.col("id_b").alias("outer_id"),
                (F.col("n_common") / F.col("sz_a")).alias("containment"),
            ),
            F.struct(
                F.col("id_b").alias("inner_id"),
                F.col("id_a").alias("outer_id"),
                (F.col("n_common") / F.col("sz_b")).alias("containment"),
            ),
        )).alias("p")
    )
    return both.select("p.*").filter(F.col("containment") >= threshold)


def containment_pairs_sql(threshold: float = 0.7, n: int = 3,
                          table: str = "documents", id_col: str = "doc_id",
                          text_col: str = "text",
                          max_bucket: int = 1000) -> str:
    sh = shingles_sql(n=n, id_col=id_col, text_col=text_col, table=table)
    return f"""
    WITH sh AS ({sh}),
    ok AS (SELECT * FROM sh WHERE shingle NOT IN (
       SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > {max_bucket})),
    sizes AS (SELECT {id_col} AS id, count(*) AS sz FROM ok GROUP BY {id_col}),
    inter AS (
      SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, count(*) AS n_common
      FROM ok a JOIN ok b USING (shingle)
      WHERE a.{id_col} < b.{id_col}
      GROUP BY 1, 2
    ),
    joined AS (
      SELECT id_a, id_b, n_common, sa.sz AS sz_a, sb.sz AS sz_b
      FROM inter JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
    )
    SELECT id_a AS inner_id, id_b AS outer_id,
           n_common * 1.0 / sz_a AS containment
    FROM joined WHERE n_common * 1.0 / sz_a >= {threshold}
    UNION ALL
    SELECT id_b, id_a, n_common * 1.0 / sz_b
    FROM joined WHERE n_common * 1.0 / sz_b >= {threshold}
    """


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Per-document MinHash signature: for each of the 32 permutations
    ``(a_i * h30(shingle) + b_i) mod (2^31-1)``, the minimum over the
    document's shingles. 32 map-side-combinable ``min`` aggregates — one
    shuffle keyed by document."""
    sh = shingles(docs, n=n, id_col=id_col, text_col=text_col)
    h30 = (md5_60(F.col("shingle")) % _P31).alias("h30")
    hashed = sh.select(F.col(id_col), h30)
    aggs = [
        F.min((F.lit(PERM_A[i]) * F.col("h30") + F.lit(PERM_B[i])) % _P31).alias(f"mh{i}")
        for i in range(_K_PERMS)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def banded_keys(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """LSH band keys ``(id_col, band, bucket)`` — one row per (doc, band).
    One pass: bands come from a single explode over the signature row — a
    per-band union would recompute the whole signature aggregation
    (shingle explode + 32-way min shuffle) once per band. Shared by the
    one-shot :func:`lsh_candidate_pairs` sweep and the persisted
    :class:`~spider_spark.operators.dedup_index.MinHashIndex`."""
    sig = minhash_signatures(docs, n=n, id_col=id_col, text_col=text_col)
    rows_per = _K_PERMS // _N_BANDS
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    ",", *[f"mh{b * rows_per + j}" for j in range(rows_per)]
                )
            ).alias("bucket"),
        )
        for b in range(_N_BANDS)
    ]
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def lsh_candidate_pairs(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                        text_col: str = "text", max_bucket: int = 200) -> DataFrame:
    """Near-duplicate *candidate* pairs: documents whose signatures collide
    in at least one of the 8 bands (4 rows each). Buckets larger than
    ``max_bucket`` are dropped (skew guard)."""
    banded = banded_keys(docs, n=n, id_col=id_col, text_col=text_col)
    hot = banded.groupBy("band", "bucket").agg(F.count("*").alias("c")).filter(
        F.col("c") > max_bucket
    )
    banded = banded.join(F.broadcast(hot.select("band", "bucket")),
                         on=["band", "bucket"], how="left_anti")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def banded_keys_sql(n: int = 3, table: str = "documents",
                    id_col: str = "doc_id", text_col: str = "text") -> str:
    """CTE chain ``sh, hashed, sig, banded_all`` mirroring
    :func:`banded_keys` — callers splice it after ``WITH`` and select from
    ``banded_all``."""
    sh = shingles_sql(n=n, id_col=id_col, text_col=text_col, table=table)
    mins = ",\n      ".join(
        f"min(({PERM_A[i]}::BIGINT * h30 + {PERM_B[i]}) % {_P31}) AS mh{i}"
        for i in range(_K_PERMS)
    )
    rows_per = _K_PERMS // _N_BANDS
    band_selects = "\n      UNION ALL\n      ".join(
        "SELECT {id}, {b} AS band, md5({cat}) AS bucket FROM sig".format(
            id=id_col,
            b=b,
            cat="||','||".join(
                f"mh{b * rows_per + j}::VARCHAR" for j in range(rows_per)
            ),
        )
        for b in range(_N_BANDS)
    )
    return f"""sh AS ({sh}),
    hashed AS (SELECT {id_col}, {md5_60_sql('shingle')} % {_P31} AS h30 FROM sh),
    sig AS (SELECT {id_col},
      {mins}
      FROM hashed GROUP BY {id_col}),
    banded_all AS (
      {band_selects}
    )"""


def lsh_candidate_pairs_sql(n: int = 3, table: str = "documents",
                            id_col: str = "doc_id", text_col: str = "text",
                            max_bucket: int = 200) -> str:
    return f"""
    WITH {banded_keys_sql(n=n, table=table, id_col=id_col, text_col=text_col)},
    banded AS (
      SELECT * FROM banded_all WHERE (band, bucket) NOT IN (
        SELECT (band, bucket) FROM banded_all GROUP BY band, bucket
        HAVING count(*) > {max_bucket})
    )
    SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
    FROM banded a JOIN banded b USING (band, bucket)
    WHERE a.{id_col} < b.{id_col}
    """


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """60-bit SimHash per document: each token occurrence votes ±1 on every
    bit of its 60-bit hash; the sign of each bit's sum forms the
    fingerprint. 60 conditional-sum aggregates, one doc-keyed shuffle."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("tok"),
    ).withColumn("h", md5_60(F.col("tok")))
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    summed = toks.groupBy(id_col).agg(*bit_aggs)
    sh = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sh = term if sh is None else sh + term
    return summed.select(F.col(id_col), sh.alias("simhash"))


def simhash_sql(table: str = "documents", id_col: str = "doc_id",
                text_col: str = "text") -> str:
    norm = NORM_SQL.format(x=text_col)
    sums = ",\n      ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(SIMHASH_BITS)
    )
    bits = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j}::BIGINT ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return f"""
    WITH toks AS (
      SELECT {id_col}, unnest(string_split({norm}, ' ')) AS tok FROM {table}
    ),
    hashed AS (SELECT {id_col}, {md5_60_sql('tok')} AS h FROM toks),
    summed AS (SELECT {id_col}, {sums} FROM hashed GROUP BY {id_col})
    SELECT {id_col}, {bits} AS simhash FROM summed
    """


def minhash_signatures_sql(n: int = 3, table: str = "documents",
                           id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB mirror of :func:`minhash_signatures` (same permutations)."""
    sh = shingles_sql(n=n, id_col=id_col, text_col=text_col, table=table)
    mins = ",\n      ".join(
        f"min(({PERM_A[i]}::BIGINT * h30 + {PERM_B[i]}) % {_P31}) AS mh{i}"
        for i in range(_K_PERMS)
    )
    return f"""
    WITH sh AS ({sh}),
    hashed AS (SELECT {id_col}, {md5_60_sql('shingle')} % {_P31} AS h30 FROM sh)
    SELECT {id_col},
      {mins}
    FROM hashed GROUP BY {id_col}
    """


def simhash_near_pairs_sql(max_hamming: int = 3, table: str = "documents",
                           id_col: str = "doc_id", text_col: str = "text",
                           max_bucket: int = 200) -> str:
    """DuckDB mirror of :func:`simhash_near_pairs`: same 15-bit bands, same
    hot-bucket cap, same exact hamming confirmation via ``bit_count(xor)``."""
    base = simhash_sql(table=table, id_col=id_col, text_col=text_col)
    band_selects = "\n      UNION ALL\n      ".join(
        f"SELECT {id_col}, simhash, {b} AS band, "
        f"(simhash >> {b * 15}) & 32767 AS bucket FROM sh"
        for b in range(4)
    )
    return f"""
    WITH sh AS ({base}),
    bands_all AS (
      {band_selects}
    ),
    bands AS (
      SELECT * FROM bands_all WHERE (band, bucket) NOT IN (
        SELECT (band, bucket) FROM bands_all GROUP BY band, bucket
        HAVING count(*) > {max_bucket})
    )
    SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b,
           bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
    FROM bands a JOIN bands b USING (band, bucket)
    WHERE a.{id_col} < b.{id_col}
      AND bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3,
                       id_col: str = "doc_id", text_col: str = "text",
                       max_bucket: int = 200) -> DataFrame:
    """Near-dup pairs by SimHash: 15-bit band buckets (any pair within
    hamming ≤ 3 of a 60-bit hash must agree on at least one of 4 bands),
    confirmed with an exact ``bit_count(xor)`` check.

    ``max_bucket`` is the same skew guard the jaccard and LSH paths carry:
    a degenerate corpus (thousands of templated or near-empty pages that
    share a band value) would otherwise make one (band, bucket) self-join
    B² rows on a single task. Buckets over the cap are dropped via a
    broadcast anti-join before the pair join; the SQL mirror applies the
    identical cap so the oracle still hash-matches."""
    sh = simhash(docs, id_col=id_col, text_col=text_col)
    # single-pass banding (explode, not per-band union: a union would
    # recompute the 60-aggregate simhash once per band)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), b * 15).bitwiseAND(0x7FFF).alias("bucket"),
        )
        for b in range(4)
    ]
    bands = sh.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*band_structs)).alias("bb")
    ).select(
        id_col, "simhash",
        F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"),
    )
    hot = bands.groupBy("band", "bucket").agg(F.count("*").alias("c")).filter(
        F.col("c") > max_bucket
    )
    bands = bands.join(F.broadcast(hot.select("band", "bucket")),
                       on=["band", "bucket"], how="left_anti")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
