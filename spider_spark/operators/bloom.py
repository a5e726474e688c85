"""Partitioned (sharded) bloom-filter seen-set prefilter (SURVEY D1, H3).

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

Hashing stays JVM-side (``xxhash64`` with salts); Python only ORs bit
arrays inside an Arrow-batched pass.

**Sharding (the 10^10 path).** A monolithic filter for 10^10 URLs at 1%
fpp is ~12 GB — unbroadcastable. :class:`ShardedBloom` splits the key
space by ``xxhash64(url, SHARD_SALT) % n_shards``; each shard is an
independent bloom filter under its own broadcast variable, so an executor
task materializes only the shards its rows actually hash to (Spark
broadcasts fetch lazily on first ``.value`` access). Probe batches group
rows by shard and test each group against just that shard.

**Sizing follows the data, not a constructor constant.** The engine tracks
the exact number of keys added (it knows every round's admission count);
when the running count crosses the sized-for capacity,
:meth:`ShardedBloom.saturated` turns true and the crawl plan rebuilds the
filter from the seen table at geometrically larger capacity — fpp stays
near nominal no matter how far the crawl outgrows the initial hint
(tests/test_properties.py pins fpp ≤ 2× nominal at 10× overrun).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

_SALT2 = 0x9E3779B9
_SHARD_SALT = 0x5BD1E995

# in-memory mode holds every shard on the driver simultaneously; past this
# bound the build fails loudly and points at spill mode (VERDICT r3 #3).
# 4 GiB ≈ a 1%-fpp bloom for ~3.6e9 keys; beyond that, spill_dir=.
MAX_DRIVER_FILTER_BYTES = 4 << 30


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


class ShardedBloom:
    """``n_shards`` independent bloom filters partitioning the key space by
    ``xxhash64(key, SHARD_SALT) % n_shards``. ``n_items`` is the exact
    running key count (maintained by the caller, who knows every batch's
    cardinality); ``saturated`` signals the rebuild-bigger point."""

    def __init__(self, expected: int, fpp: float = 0.01, n_shards: int = 1,
                 spill_dir: str | None = None,
                 max_driver_bytes: int = MAX_DRIVER_FILTER_BYTES):
        self.n_shards = max(1, n_shards)
        self.fpp = fpp
        self.expected = max(1, expected)
        per_shard = max(1, self.expected // self.n_shards)
        n_bits, n_hashes = BloomFilter.sized_for(per_shard, fpp)
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.spill_dir = spill_dir
        shard_bytes = (n_bits + 7) // 8
        if spill_dir is None:
            total = self.n_shards * shard_bytes
            if total > max_driver_bytes:
                raise ValueError(
                    f"in-memory ShardedBloom would hold {total / 2**30:.1f} GiB "
                    f"on the driver ({self.n_shards} shards × {shard_bytes} B "
                    f"for {self.expected:,} keys at fpp={fpp}), over the "
                    f"{max_driver_bytes / 2**30:.1f} GiB bound — pass "
                    "spill_dir= (shared-filesystem shard store: driver holds "
                    "only paths, executors build/probe shards directly) or "
                    "raise max_driver_bytes explicitly"
                )
            self.shards = [BloomFilter(n_bits, n_hashes)
                           for _ in range(self.n_shards)]
        else:
            from spider_spark.operators.shardstore import ShardStore

            self.store = ShardStore(spill_dir, dtype="uint8")
            # None = shard never written (empty filter: definite miss)
            self.shard_paths: list[str | None] = [None] * self.n_shards
            self.version = 0
        self.n_items = 0
        # broadcast handles created by filter_unseen probes against this
        # filter; the engine destroys them once the round's jobs have
        # materialized — without this a long crawl accumulates one
        # filter-size broadcast generation per round on driver + executors
        # (VERDICT r2 next-2 / ADVICE)
        self._live_bcasts: list = []

    @property
    def saturated(self) -> bool:
        return self.n_items > self.expected

    @property
    def spilled(self) -> bool:
        return self.spill_dir is not None

    def gc_spill(self) -> int:
        """Drop superseded shard files (call once the jobs that probed the
        previous version have run — the broadcast-destroy point)."""
        return self.store.gc(self.shard_paths) if self.spilled else 0

    def register_broadcasts(self, handles: list) -> None:
        self._live_bcasts.extend(handles)

    def destroy_broadcasts(self) -> int:
        """Destroy every broadcast registered against this filter. Safe
        once the consuming jobs have run (the crawl plan materializes both
        probe branches inside the dedupe phase). Returns the number
        destroyed."""
        n = len(self._live_bcasts)
        for b in self._live_bcasts:
            try:
                b.destroy()
            except Exception:
                pass  # already destroyed / context gone
        self._live_bcasts.clear()
        return n

    def union_shard_inplace(self, shard: int, bits: np.ndarray) -> None:
        np.bitwise_or(self.shards[shard].bits, bits, out=self.shards[shard].bits)


def _hash_cols(col: str, n_shards: int):
    h1 = F.xxhash64(F.col(col)).cast("long")
    h2 = F.xxhash64(F.col(col), F.lit(_SALT2)).cast("long")
    sh = F.pmod(F.xxhash64(F.col(col), F.lit(_SHARD_SALT)), F.lit(n_shards)).cast("int")
    return h1.alias("__h1"), h2.alias("__h2"), sh.alias("__shard")


def build_into(bloom: ShardedBloom, df: DataFrame, col: str,
               count_items: bool = True) -> ShardedBloom:
    """Add ``df[col]`` to ``bloom`` distributedly: each partition fills
    local per-shard bit arrays inside ``mapInPandas`` (Arrow batches,
    numpy bit-set); per-(partition, shard) partials are OR-merged on the
    driver — driver traffic is bit arrays, never keys. When the caller
    already knows the exact batch cardinality it passes
    ``count_items=False`` and bumps ``n_items`` itself (saves a count)."""
    n_bits, n_hashes, n_shards = bloom.n_bits, bloom.n_hashes, bloom.n_shards
    hashed = df.select(*_hash_cols(col, n_shards))
    # the fill is a cheap vectorized pass but each task round-trips a
    # Python worker; cap task count at the core count so a many-partition
    # input (e.g. a union of checkpoints) doesn't pay per-task overhead
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if hashed.rdd.getNumPartitions() > parallelism:
        hashed = hashed.coalesce(parallelism)

    def fill(batches):
        local: dict[int, BloomFilter] = {}
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            n += len(pdf)
            h1 = pdf["__h1"].to_numpy(dtype=np.int64).view(np.uint64)
            h2 = pdf["__h2"].to_numpy(dtype=np.int64).view(np.uint64)
            sh = pdf["__shard"].to_numpy(dtype=np.int32)
            for s in np.unique(sh):
                m = sh == s
                bf = local.get(int(s))
                if bf is None:
                    bf = local[int(s)] = BloomFilter(n_bits, n_hashes)
                bf.add_many(h1[m], h2[m])
        if local:
            yield pd.DataFrame(
                {
                    "shard": list(local),
                    "bits": [bf.bits.tobytes() for bf in local.values()],
                    "n": [n] + [0] * (len(local) - 1),
                }
            )

    partials = hashed.mapInPandas(fill, schema="shard int, bits binary, n long")
    if bloom.spilled:
        # per-partition partials never land on the driver: they shuffle to
        # one task per shard, which ORs them with the shard's current file
        # and writes the next version (atomic). The driver collects only
        # (shard, path, n) rows.
        store = bloom.store
        version = bloom.version + 1
        base_paths = list(bloom.shard_paths)

        def merge(batches):
            acc: dict[int, np.ndarray] = {}
            n = 0
            for pdf in batches:
                for _, row in pdf.iterrows():
                    s = int(row["shard"])
                    bits = np.frombuffer(row["bits"], dtype=np.uint8)
                    cur = acc.get(s)
                    if cur is None:
                        base = base_paths[s]
                        cur = acc[s] = (
                            store.read(base, use_cache=False)
                            if base is not None
                            else np.zeros(len(bits), dtype=np.uint8)
                        )
                    np.bitwise_or(cur, bits, out=cur)
                    n += int(row["n"])
            if acc:
                yield pd.DataFrame(
                    {
                        "shard": list(acc),
                        "path": [store.write(s, version, a)
                                 for s, a in acc.items()],
                        "n": [n] + [0] * (len(acc) - 1),
                    }
                )

        rows = (
            partials.repartition(bloom.n_shards, F.col("shard"))
            .mapInPandas(merge, schema="shard int, path string, n long")
            .collect()
        )
        bloom.version = version
        for r in rows:
            bloom.shard_paths[r["shard"]] = r["path"]
            if count_items:
                bloom.n_items += r["n"]
        return bloom
    for row in partials.collect():
        bloom.union_shard_inplace(
            row["shard"], np.frombuffer(row["bits"], dtype=np.uint8)
        )
        if count_items:
            bloom.n_items += row["n"]
    return bloom


def make_fill_stats_collector(bloom: ShardedBloom, col: str):
    """A ``stats_collector`` for :func:`ranking.with_global_rank` that ALSO
    fills ``bloom`` with the ranked rows' ``col`` keys — one mapInPandas
    pass over the ranking checkpoint yields BOTH the per-group rank stats
    (cnt, min_mid, max_mid per ``__rkey``; a task may hold several groups
    in bucket mode) and the bloom shard partials. This folds the crawl's
    two remaining per-round driver jobs (rank stats-collect +
    bloom-partials collect) into one, and drops the stats groupBy shuffle
    entirely (VERDICT r2 next-3)."""
    n_bits, n_hashes, n_shards = bloom.n_bits, bloom.n_hashes, bloom.n_shards

    def collect(parted: DataFrame):
        h1, h2, sh = _hash_cols(col, n_shards)
        hashed = parted.select(h1, h2, sh, F.col("__rkey"), F.col("__mid"))

        def fill_and_stats(batches):
            local: dict[int, BloomFilter] = {}
            # __rkey -> [cnt, min_mid, max_mid]; groups never span tasks
            # (hash partitioning in bucket mode, identity in range mode)
            groups: dict[int, list[int]] = {}
            for pdf in batches:
                if not len(pdf):
                    continue
                agg = pdf.groupby("__rkey")["__mid"].agg(["count", "min", "max"])
                for key, row in agg.iterrows():
                    g = groups.get(int(key))
                    if g is None:
                        groups[int(key)] = [int(row["count"]), int(row["min"]),
                                            int(row["max"])]
                    else:
                        g[0] += int(row["count"])
                        g[1] = min(g[1], int(row["min"]))
                        g[2] = max(g[2], int(row["max"]))
                h1v = pdf["__h1"].to_numpy(dtype=np.int64).view(np.uint64)
                h2v = pdf["__h2"].to_numpy(dtype=np.int64).view(np.uint64)
                shv = pdf["__shard"].to_numpy(dtype=np.int32)
                for s in np.unique(shv):
                    m = shv == s
                    bf = local.get(int(s))
                    if bf is None:
                        bf = local[int(s)] = BloomFilter(n_bits, n_hashes)
                    bf.add_many(h1v[m], h2v[m])
            if not groups:
                return
            keys = list(groups)
            yield pd.DataFrame(
                {
                    "rkey": keys + [-1] * len(local),
                    "cnt": [groups[k][0] for k in keys] + [0] * len(local),
                    "min_mid": [groups[k][1] for k in keys] + [-1] * len(local),
                    "max_mid": [groups[k][2] for k in keys] + [-1] * len(local),
                    "shard": [-1] * len(keys) + list(local),
                    "bits": [None] * len(keys)
                    + [bf.bits.tobytes() for bf in local.values()],
                }
            )

        out = hashed.mapInPandas(
            fill_and_stats,
            schema=(
                "rkey long, cnt long, min_mid long, max_mid long, "
                "shard int, bits binary"
            ),
        )
        if bloom.spilled:
            # the shard partials must not land on the driver: persist the
            # fold output, pull back only the tiny stats rows, and OR the
            # bit partials into the shard files with one shard-keyed job
            out = out.persist()
            try:
                rows = out.filter(F.col("shard") < 0).drop("shard", "bits").collect()
                stats = [
                    {"__rkey": r["rkey"], "cnt": r["cnt"],
                     "min_mid": r["min_mid"], "max_mid": r["max_mid"]}
                    for r in rows
                ]
                store = bloom.store
                version = bloom.version + 1
                base_paths = list(bloom.shard_paths)

                def merge(batches):
                    acc: dict[int, np.ndarray] = {}
                    for pdf in batches:
                        for _, row in pdf.iterrows():
                            s = int(row["shard"])
                            bits = np.frombuffer(row["bits"], dtype=np.uint8)
                            cur = acc.get(s)
                            if cur is None:
                                base = base_paths[s]
                                cur = acc[s] = (
                                    store.read(base, use_cache=False)
                                    if base is not None
                                    else np.zeros(len(bits), dtype=np.uint8)
                                )
                            np.bitwise_or(cur, bits, out=cur)
                    if acc:
                        yield pd.DataFrame(
                            {
                                "shard": list(acc),
                                "path": [store.write(s, version, a)
                                         for s, a in acc.items()],
                            }
                        )

                merged = (
                    out.filter(F.col("shard") >= 0)
                    .select("shard", "bits")
                    .repartition(bloom.n_shards, F.col("shard"))
                    .mapInPandas(merge, schema="shard int, path string")
                    .collect()
                )
                bloom.version = version
                for r in merged:
                    bloom.shard_paths[r["shard"]] = r["path"]
            finally:
                out.unpersist()
            return stats
        stats = []
        for r in out.collect():
            if r["shard"] < 0:
                stats.append(
                    {"__rkey": r["rkey"], "cnt": r["cnt"],
                     "min_mid": r["min_mid"], "max_mid": r["max_mid"]}
                )
            else:
                bloom.union_shard_inplace(
                    r["shard"], np.frombuffer(r["bits"], dtype=np.uint8)
                )
        return stats

    return collect


def build_bloom(df: DataFrame, col: str, expected: int | None = None,
                fpp: float = 0.01, n_shards: int = 1,
                spill_dir: str | None = None) -> ShardedBloom:
    """Build a fresh sharded bloom of ``df[col]`` (sized for ``expected``,
    defaulting to an exact count of ``df``)."""
    if expected is None:
        expected = df.count()
    return build_into(
        ShardedBloom(expected, fpp, n_shards, spill_dir=spill_dir), df, col
    )


def filter_unseen(candidates: DataFrame, col: str, seen: DataFrame,
                  bloom: ShardedBloom | None, materialize=None,
                  materialize_confirmed: bool = True) -> DataFrame:
    """Exact-by-construction seen filtering: bloom prefilter (when given)
    splits candidates into definitely-new (pass through, no shuffle) and
    maybe-seen (confirmed by exact anti-join). Without a bloom, plain
    ``left_anti`` (use_cache.py:22-24 semantics: only never-seen URLs are
    admitted).

    ``materialize`` (optional, e.g. an eager localCheckpoint) is applied
    to the flagged candidates (one pass through the Python probe,
    consumed by both branches) and — when ``materialize_confirmed`` —
    to the anti-join output (one pass through the seen shuffle). The
    returned union is then cheap JVM filters over materialized data,
    safe for consumers that evaluate their input twice (range-partition
    sampling). A consumer that evaluates its input exactly ONCE (the
    crawl's bucket-mode ranking shuffle) passes
    ``materialize_confirmed=False``: the anti-join then folds into the
    consumer's own job — one materialization for the whole
    dedupe→rank chain. Either way the probe's broadcasts are consumed by
    the flagged materialization alone, so the caller may destroy them as
    soon as this returns (given ``materialize`` was eager)."""
    if bloom is None:
        return candidates.join(seen.select(F.col(col)), on=col, how="left_anti")

    n_bits, n_hashes = bloom.n_bits, bloom.n_hashes
    if bloom.spilled:
        # spill mode: no broadcasts and no driver copy — tasks read the
        # shards their rows hash to straight from the shard store through
        # the per-worker cache (versioned paths, never stale)
        store = bloom.store
        shard_paths = list(bloom.shard_paths)

        @F.pandas_udf(BooleanType())
        def maybe_seen(h1: pd.Series, h2: pd.Series, sh: pd.Series) -> pd.Series:
            if not len(h1):
                return pd.Series([], dtype=bool)
            h1v = h1.to_numpy(dtype=np.int64).view(np.uint64)
            h2v = h2.to_numpy(dtype=np.int64).view(np.uint64)
            shv = sh.to_numpy(dtype=np.int32)
            out = np.zeros(len(h1v), dtype=bool)
            for s in np.unique(shv):
                path = shard_paths[int(s)]
                if path is None:
                    continue  # empty shard: definite miss
                bf = BloomFilter(n_bits, n_hashes, store.read(path))
                m = shv == s
                out[m] = bf.contains_many(h1v[m], h2v[m])
            return pd.Series(out)
    else:
        sc = candidates.sparkSession.sparkContext
        # one broadcast variable PER SHARD: broadcasts materialize lazily on
        # first .value access, so a task whose batch never touches shard s
        # never pulls shard s's bits — the property that keeps a 12 GB
        # aggregate filter usable on executors with a fraction of that memory
        shard_bcasts = [sc.broadcast(bf.bits.tobytes()) for bf in bloom.shards]
        # tracked so the caller can destroy them once the probe's jobs ran —
        # each round otherwise leaks a full filter-size broadcast generation
        bloom.register_broadcasts(shard_bcasts)

        @F.pandas_udf(BooleanType())
        def maybe_seen(h1: pd.Series, h2: pd.Series, sh: pd.Series) -> pd.Series:
            if not len(h1):
                return pd.Series([], dtype=bool)
            h1v = h1.to_numpy(dtype=np.int64).view(np.uint64)
            h2v = h2.to_numpy(dtype=np.int64).view(np.uint64)
            shv = sh.to_numpy(dtype=np.int32)
            out = np.zeros(len(h1v), dtype=bool)
            for s in np.unique(shv):
                bf = BloomFilter(
                    n_bits, n_hashes,
                    np.frombuffer(shard_bcasts[int(s)].value, dtype=np.uint8),
                )
                m = shv == s
                out[m] = bf.contains_many(h1v[m], h2v[m])
            return pd.Series(out)

    h1, h2, sh = _hash_cols(col, bloom.n_shards)
    flagged = candidates.withColumn("__maybe", maybe_seen(h1, h2, sh))
    if materialize is not None:
        flagged = materialize(flagged)
    definitely_new = flagged.filter(~F.col("__maybe")).drop("__maybe")
    suspects = flagged.filter(F.col("__maybe")).drop("__maybe")
    confirmed_new = suspects.join(seen.select(F.col(col)), on=col, how="left_anti")
    if materialize is not None and materialize_confirmed:
        confirmed_new = materialize(confirmed_new)
    return definitely_new.unionByName(confirmed_new)
