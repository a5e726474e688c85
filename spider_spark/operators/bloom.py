"""Partitioned bloom-filter seen-set prefilter (SURVEY D1, hard item H3).

The reference's seen-set is an in-memory ``set`` admission-checked before
every fetch (use_cache.py:14,22-24). At 10^10 URLs an exact set can't be
broadcast, so the engine uses the classic two-stage design:

1. a **bloom filter** built from the seen table — per-partition bit arrays
   OR-merged on the driver and broadcast to executors — drops the
   definitely-new URLs out of the expensive path cheaply;
2. every *maybe-seen* URL is confirmed with an exact ``left_anti`` join
   against the seen table, so bloom false positives never drop a URL — the
   final seen-set is exact (H3), only the anti-join shuffle shrinks by the
   true-negative rate.

Hashing stays JVM-side (``xxhash64`` with two salts); Python only ORs bit
arrays inside an Arrow-batched pass. At 10^10 scale the filter is sharded
by ``url_hash % n_shards`` and each executor probes only the shard a row
hashes to; in-sandbox a single merged filter suffices (n_shards=1 default).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

_SALT2 = 0x9E3779B9


class BloomFilter:
    """Double-hashing bloom filter over two 64-bit hashes (numpy bit ops)."""

    def __init__(self, n_bits: int, n_hashes: int, bits: np.ndarray | None = None):
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.bits = bits if bits is not None else np.zeros((n_bits + 7) // 8, dtype=np.uint8)

    @staticmethod
    def sized_for(expected: int, fpp: float = 0.01) -> tuple[int, int]:
        expected = max(expected, 1)
        m = max(64, int(-expected * math.log(fpp) / (math.log(2) ** 2)))
        k = max(1, round(m / expected * math.log(2)))
        return m, min(k, 8)

    def _positions(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        # g_i(x) = h1 + i*h2 mod m, vectorized over rows x hashes
        i = np.arange(self.n_hashes, dtype=np.uint64)
        pos = (h1[:, None].astype(np.uint64) + i[None, :] * h2[:, None].astype(np.uint64))
        return (pos % np.uint64(self.n_bits)).astype(np.int64)

    def add_many(self, h1: np.ndarray, h2: np.ndarray) -> None:
        pos = self._positions(h1, h2).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def contains_many(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        pos = self._positions(h1, h2)
        got = (self.bits[pos >> 3] >> (pos & 7)) & 1
        return got.all(axis=1)

    def union_inplace(self, other: "BloomFilter") -> None:
        np.bitwise_or(self.bits, other.bits, out=self.bits)


def _hash_cols(col: str):
    h1 = F.xxhash64(F.col(col)).cast("long")
    h2 = F.xxhash64(F.col(col), F.lit(_SALT2)).cast("long")
    return h1.alias("__h1"), h2.alias("__h2")


def build_bloom(df: DataFrame, col: str, expected: int | None = None,
                fpp: float = 0.01) -> BloomFilter:
    """Build a bloom filter of ``df[col]`` distributedly: each partition
    fills a local bit array inside ``mapInPandas`` (Arrow batches, numpy
    bit-set), partials are OR-merged on the driver."""
    if expected is None:
        expected = df.count()
    n_bits, n_hashes = BloomFilter.sized_for(expected, fpp)
    hashed = df.select(*_hash_cols(col))

    def fill(batches):
        local = BloomFilter(n_bits, n_hashes)
        any_rows = False
        for pdf in batches:
            if len(pdf):
                any_rows = True
                local.add_many(
                    pdf["__h1"].to_numpy(dtype=np.int64).view(np.uint64),
                    pdf["__h2"].to_numpy(dtype=np.int64).view(np.uint64),
                )
        if any_rows:
            yield pd.DataFrame({"bits": [local.bits.tobytes()]})

    partials = hashed.mapInPandas(fill, schema="bits binary").collect()
    merged = BloomFilter(n_bits, n_hashes)
    for row in partials:
        merged.union_inplace(
            BloomFilter(n_bits, n_hashes, np.frombuffer(row["bits"], dtype=np.uint8).copy())
        )
    return merged


def filter_unseen(candidates: DataFrame, col: str, seen: DataFrame,
                  bloom: BloomFilter | None) -> DataFrame:
    """Exact-by-construction seen filtering: bloom prefilter (when given)
    splits candidates into definitely-new (pass through, no shuffle) and
    maybe-seen (confirmed by exact anti-join). Without a bloom, plain
    ``left_anti`` (use_cache.py:22-24 semantics: only never-seen URLs are
    admitted)."""
    if bloom is None:
        return candidates.join(seen.select(F.col(col)), on=col, how="left_anti")

    spark = candidates.sparkSession
    bcast = spark.sparkContext.broadcast((bloom.n_bits, bloom.n_hashes, bloom.bits.tobytes()))

    @F.pandas_udf(BooleanType())
    def maybe_seen(h1: pd.Series, h2: pd.Series) -> pd.Series:
        n_bits, n_hashes, raw = bcast.value
        bf = BloomFilter(n_bits, n_hashes, np.frombuffer(raw, dtype=np.uint8))
        if not len(h1):
            return pd.Series([], dtype=bool)
        got = bf.contains_many(
            h1.to_numpy(dtype=np.int64).view(np.uint64),
            h2.to_numpy(dtype=np.int64).view(np.uint64),
        )
        return pd.Series(got)

    h1, h2 = _hash_cols(col)
    flagged = candidates.withColumn("__maybe", maybe_seen(h1, h2))
    definitely_new = flagged.filter(~F.col("__maybe")).drop("__maybe")
    suspects = flagged.filter(F.col("__maybe")).drop("__maybe")
    confirmed_new = suspects.join(seen.select(F.col(col)), on=col, how="left_anti")
    return definitely_new.unionByName(confirmed_new)
